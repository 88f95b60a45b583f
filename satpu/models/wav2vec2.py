"""wav2vec 2.0 encoder in flax.linen.

The reference's strongest ASR-BN models put a wav2vec2-large front end before
the TDNN-F stack (tuning/tdnnf_wav2vec2*.py via
utils/import_fairseq_model.py:81-113, torchaudio architecture + converted
fairseq/voxpopuli checkpoints). This is the same computation graph as
HuggingFace ``Wav2Vec2Model`` (which we golden-test against):

- conv feature extractor: 7 temporal convs (512ch; k 10,3,3,3,3,2,2;
  s 5,2,2,2,2,2,2), group-norm on layer 0, GELU,
- feature projection: LayerNorm -> Linear(512 -> d),
- encoder: grouped conv positional embedding (k=128, g=16) + transformer
  stack; both post-norm ("base"-style) and pre-norm / stable-layer-norm
  ("large"-style, do_stable_layer_norm=True) variants.

Parameters are stored in torch layouts (linear [out, in], conv [out, in, k])
for 1:1 checkpoint conversion (convert_wav2vec2).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .torchlayers import Conv1d, Linear


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = True  # "large"-style pre-norm
    layer_norm_eps: float = 1e-5
    # "layer" = LayerNorm (+conv bias) after EVERY extractor conv (fairseq
    # extractor_mode="layer_norm": wav2vec2-large / voxpopuli — the B5
    # front); "group" = GroupNorm after conv 0 only (base models)
    feat_extract_norm: str = "layer"
    conv_bias: bool = True

    @classmethod
    def large(cls) -> "Wav2Vec2Config":
        return cls()

    @classmethod
    def base(cls) -> "Wav2Vec2Config":
        return cls(hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
                   intermediate_size=3072, do_stable_layer_norm=False,
                   feat_extract_norm="group", conv_bias=False)


class _LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        x = x.astype(jnp.float32)  # f32 op under autocast (torch amp list)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + self.eps) * w + b


class FeatureExtractor(nn.Module):
    """7-layer conv waveform encoder; input [B, T] -> [B, T', 512]."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        h = x[:, :, None]  # [B, T, 1]
        in_dim = 1
        for i, (dim, k, s) in enumerate(zip(c.conv_dim, c.conv_kernel, c.conv_stride)):
            h = Conv1d(in_dim, dim, k, stride=s, use_bias=c.conv_bias,
                       name=f"conv_layers_{i}_conv")(h)
            if c.feat_extract_norm == "layer":
                # extractor_mode="layer_norm" (wav2vec2-large / voxpopuli):
                # LayerNorm over channels after every conv
                h = _LayerNorm(dim, c.layer_norm_eps,
                               name=f"conv_layers_{i}_layer_norm")(h)
            elif i == 0:
                # GroupNorm with num_groups == channels (per-channel IN over time)
                h = h.astype(jnp.float32)  # f32 norm under autocast
                mean = jnp.mean(h, axis=1, keepdims=True)
                var = jnp.var(h, axis=1, keepdims=True)
                h = (h - mean) / jnp.sqrt(var + c.layer_norm_eps)
                w = self.param("conv_layers_0_layer_norm_weight",
                               nn.initializers.ones, (dim,))
                b = self.param("conv_layers_0_layer_norm_bias",
                               nn.initializers.zeros, (dim,))
                h = h * w + b
            h = nn.gelu(h, approximate=False)
            in_dim = dim
        return h


class SelfAttention(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        d = c.hidden_size
        H = c.num_attention_heads
        hd = d // H
        q = Linear(d, d, name="q_proj")(x) * (hd**-0.5)
        k = Linear(d, d, name="k_proj")(x)
        v = Linear(d, d, name="v_proj")(x)
        B, T, _ = x.shape

        def split(t):
            return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k))
        # f32 softmax under autocast (torch amp's fp32 list); the QK einsum
        # itself may run bf16 (Linear outputs) with XLA's f32 accumulation
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(attn.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, d)
        return Linear(d, d, name="out_proj")(out)


class EncoderLayer(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        d = c.hidden_size
        if c.do_stable_layer_norm:  # pre-norm
            h = _LayerNorm(d, c.layer_norm_eps, name="layer_norm")(x)
            x = x + SelfAttention(c, name="attention")(h)
            h = _LayerNorm(d, c.layer_norm_eps, name="final_layer_norm")(x)
            h = nn.gelu(Linear(d, c.intermediate_size, name="feed_forward_intermediate_dense")(h),
                        approximate=False)
            x = x + Linear(c.intermediate_size, d, name="feed_forward_output_dense")(h)
        else:  # post-norm
            x = x + SelfAttention(c, name="attention")(x)
            x = _LayerNorm(d, c.layer_norm_eps, name="layer_norm")(x)
            h = nn.gelu(Linear(d, c.intermediate_size, name="feed_forward_intermediate_dense")(x),
                        approximate=False)
            x = x + Linear(c.intermediate_size, d, name="feed_forward_output_dense")(h)
            x = _LayerNorm(d, c.layer_norm_eps, name="final_layer_norm")(x)
        return x


class Wav2Vec2Model(nn.Module):
    """Waveform [B, T] -> features [B, T', hidden]. No masking/quantizer
    (inference/fine-tune path only, like the reference's use)."""

    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav: jnp.ndarray,
                 num_layers: Optional[int] = None) -> jnp.ndarray:
        c = self.cfg
        feats = FeatureExtractor(c, name="feature_extractor")(wav)
        h = _LayerNorm(c.conv_dim[-1], c.layer_norm_eps, name="feature_projection_layer_norm")(feats)
        h = Linear(c.conv_dim[-1], c.hidden_size, name="feature_projection_projection")(h)

        # conv positional embedding (k=128 grouped, with the torch same-pad
        # trick: pad k//2 both sides then drop the last step if k is even)
        k = c.num_conv_pos_embeddings
        pos = Conv1d(c.hidden_size, c.hidden_size, k, padding=k // 2,
                     groups=c.num_conv_pos_embedding_groups,
                     name="pos_conv_embed_conv")(h)
        if k % 2 == 0:
            pos = pos[:, :-1, :]
        h = h + nn.gelu(pos, approximate=False)
        if not c.do_stable_layer_norm:
            h = _LayerNorm(c.hidden_size, c.layer_norm_eps, name="encoder_layer_norm")(h)

        n = num_layers if num_layers is not None else c.num_hidden_layers
        for i in range(n):
            h = EncoderLayer(c, name=f"layers_{i}")(h)
        if c.do_stable_layer_norm:
            h = _LayerNorm(c.hidden_size, c.layer_norm_eps, name="encoder_layer_norm")(h)
        return h


def convert_wav2vec2(hf_state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """HuggingFace Wav2Vec2Model state_dict -> satpu flax params.

    Handles the weight-normed positional conv (folds g*v/||v||) and the HF
    naming scheme; fairseq checkpoints can be imported by first converting to
    HF naming (transformers' conversion script or the reference's key map,
    utils/import_fairseq_model.py:37-77).
    """

    def np_(t):
        try:
            return t.detach().cpu().numpy().astype(np.float32)
        except AttributeError:
            return np.asarray(t, dtype=np.float32)

    p: Dict[str, Any] = {}

    def put(path, val):
        node = p
        for q in path[:-1]:
            node = node.setdefault(q, {})
        node[path[-1]] = val

    sd = {k: v for k, v in hf_state_dict.items()}
    prefix = "wav2vec2." if any(k.startswith("wav2vec2.") for k in sd) else ""

    def g(key):
        return np_(sd[prefix + key])

    # feature extractor
    n_convs = len([k for k in sd if "feature_extractor.conv_layers" in k and k.endswith("conv.weight")])
    layer_mode = (prefix + "feature_extractor.conv_layers.1.layer_norm.weight"
                  in sd)
    for i in range(n_convs):
        put(("feature_extractor", f"conv_layers_{i}_conv", "weight"),
            g(f"feature_extractor.conv_layers.{i}.conv.weight"))
        if prefix + f"feature_extractor.conv_layers.{i}.conv.bias" in sd:
            put(("feature_extractor", f"conv_layers_{i}_conv", "bias"),
                g(f"feature_extractor.conv_layers.{i}.conv.bias"))
        if layer_mode:
            put(("feature_extractor", f"conv_layers_{i}_layer_norm", "weight"),
                g(f"feature_extractor.conv_layers.{i}.layer_norm.weight"))
            put(("feature_extractor", f"conv_layers_{i}_layer_norm", "bias"),
                g(f"feature_extractor.conv_layers.{i}.layer_norm.bias"))
    if (not layer_mode
            and prefix + "feature_extractor.conv_layers.0.layer_norm.weight" in sd):
        put(("feature_extractor", "conv_layers_0_layer_norm_weight"),
            g("feature_extractor.conv_layers.0.layer_norm.weight"))
        put(("feature_extractor", "conv_layers_0_layer_norm_bias"),
            g("feature_extractor.conv_layers.0.layer_norm.bias"))
    put(("feature_projection_layer_norm", "weight"), g("feature_projection.layer_norm.weight"))
    put(("feature_projection_layer_norm", "bias"), g("feature_projection.layer_norm.bias"))
    put(("feature_projection_projection", "weight"), g("feature_projection.projection.weight"))
    put(("feature_projection_projection", "bias"), g("feature_projection.projection.bias"))

    # positional conv: weight-normed in torch -> fold
    base = "encoder.pos_conv_embed.conv."
    if prefix + base + "weight_g" in sd or prefix + base + "parametrizations.weight.original0" in sd:
        if prefix + base + "weight_g" in sd:
            gw = g(base + "weight_g")
            vw = g(base + "weight_v")
        else:
            gw = g(base + "parametrizations.weight.original0")
            vw = g(base + "parametrizations.weight.original1")
        # torch weight_norm(dim=2) on conv weight [out, in/g, k]
        norm = np.sqrt((vw**2).sum(axis=(0, 1), keepdims=True))
        w = gw * vw / norm
    else:
        w = g(base + "weight")
    put(("pos_conv_embed_conv", "weight"), w)
    put(("pos_conv_embed_conv", "bias"), g(base + "bias"))

    n_layers = len({k.split(".")[2 + (1 if prefix else 0)] for k in sd
                    if (prefix + "encoder.layers.") in prefix + k and ".attention.q_proj.weight" in k})
    n_layers = len([k for k in sd if k.endswith(".attention.q_proj.weight")])
    for i in range(n_layers):
        b = f"encoder.layers.{i}."
        lp = (f"layers_{i}",)
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            put(lp + ("attention", name, "weight"), g(b + f"attention.{name}.weight"))
            put(lp + ("attention", name, "bias"), g(b + f"attention.{name}.bias"))
        put(lp + ("layer_norm", "weight"), g(b + "layer_norm.weight"))
        put(lp + ("layer_norm", "bias"), g(b + "layer_norm.bias"))
        put(lp + ("feed_forward_intermediate_dense", "weight"),
            g(b + "feed_forward.intermediate_dense.weight"))
        put(lp + ("feed_forward_intermediate_dense", "bias"),
            g(b + "feed_forward.intermediate_dense.bias"))
        put(lp + ("feed_forward_output_dense", "weight"),
            g(b + "feed_forward.output_dense.weight"))
        put(lp + ("feed_forward_output_dense", "bias"),
            g(b + "feed_forward.output_dense.bias"))
        put(lp + ("final_layer_norm", "weight"), g(b + "final_layer_norm.weight"))
        put(lp + ("final_layer_norm", "bias"), g(b + "final_layer_norm.bias"))
    put(("encoder_layer_norm", "weight"), g("encoder.layer_norm.weight"))
    put(("encoder_layer_norm", "bias"), g("encoder.layer_norm.bias"))
    return {"params": p}


def fairseq_to_hf_names(fairseq_sd: Dict[str, Any]) -> Dict[str, Any]:
    """Rename a raw fairseq/voxpopuli wav2vec2 state_dict to the HF
    convention ``convert_wav2vec2`` consumes (the reference's import path:
    utils/import_fairseq_model.py:37-113 + torchaudio's
    import_fairseq._convert_state_dict)."""
    out: Dict[str, Any] = {}
    for k, v in fairseq_sd.items():
        if k.startswith("w2v_encoder."):
            k = k[len("w2v_encoder."):]
        if k.startswith("w2v_model."):
            k = k[len("w2v_model."):]
        nk = None
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, sub = parts[2], ".".join(parts[3:])
            if sub in ("0.weight",):
                nk = f"feature_extractor.conv_layers.{i}.conv.weight"
            elif sub in ("0.bias",):
                nk = f"feature_extractor.conv_layers.{i}.conv.bias"
            elif sub.startswith("2.1.") or sub.startswith("2."):
                # group/layer norm (first layer in group_norm mode, every
                # layer in layer_norm mode)
                tail = sub.split(".")[-1]
                nk = f"feature_extractor.conv_layers.{i}.layer_norm.{tail}"
        elif k.startswith("layer_norm."):  # pre-projection LN
            nk = "feature_projection.layer_norm." + k.split(".", 1)[1]
        elif k.startswith("post_extract_proj."):
            nk = "feature_projection.projection." + k.split(".", 1)[1]
        elif k.startswith("encoder.pos_conv.0."):
            nk = "encoder.pos_conv_embed.conv." + k[len("encoder.pos_conv.0."):]
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i, sub = parts[2], ".".join(parts[3:])
            sub = (sub.replace("self_attn_layer_norm", "layer_norm")
                      .replace("self_attn.", "attention.")
                      .replace("fc1.", "feed_forward.intermediate_dense.")
                      .replace("fc2.", "feed_forward.output_dense."))
            nk = f"encoder.layers.{i}.{sub}"
        elif k.startswith("encoder.layer_norm."):
            nk = k
        if nk is not None:
            out[nk] = v
    return out


def convert_fairseq_wav2vec2(fairseq_sd: Dict[str, Any]) -> Dict[str, Any]:
    """Raw fairseq/voxpopuli wav2vec2 state_dict -> satpu flax params."""
    return convert_wav2vec2(fairseq_to_hf_names(fairseq_sd))


def import_fairseq_checkpoint(path: str) -> Dict[str, Any]:
    """Load a fairseq .pt (voxpopuli releases, s3prl-converted) and convert
    (the reference's _load, utils/import_fairseq_model.py:18-34)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=True)
    if "model_weight" in data:  # s3prl-converted
        sd = data["model_weight"]
    elif "model" in data:
        sd = data["model"]
    else:
        sd = data
    return convert_fairseq_wav2vec2(sd)
