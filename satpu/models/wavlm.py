"""WavLM encoder in flax.linen + the sidekit WavLmFrontEnd.

The reference's ASV front-end option (sidekit/preprocessor.py:79-163) wraps a
pretrained WavLM-large from s3prl, takes ALL hidden states, combines them
with learned softmax weights, instance-norms, and (optionally) drops channels.

WavLM = wav2vec 2.0 plus gated relative position bias in self-attention
(Chen et al., 2022). The graph here matches HuggingFace ``WavLMModel``
(golden-tested): a T5-style bucketed relative position embedding shared
across layers, per-layer GRU-style gating computed from the (pre-norm)
hidden states. Feature extractor / projection / positional conv are the
wav2vec2 modules. Parameters use torch layouts for 1:1 conversion.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .torchlayers import Conv1d, Linear
from .wav2vec2 import FeatureExtractor, Wav2Vec2Config, _LayerNorm


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    do_stable_layer_norm: bool = True  # wavlm-large
    layer_norm_eps: float = 1e-5
    # HF WavLMConfig defaults (group-norm extractor, no conv biases);
    # wavlm-large overrides to the layer-norm extractor like w2v2-large
    feat_extract_norm: str = "group"
    conv_bias: bool = False

    @classmethod
    def large(cls) -> "WavLMConfig":
        return cls(feat_extract_norm="layer", conv_bias=True)

    @classmethod
    def base(cls) -> "WavLMConfig":
        return cls(hidden_size=768, num_hidden_layers=12,
                   num_attention_heads=12, intermediate_size=3072,
                   do_stable_layer_norm=False)

    def w2v2(self) -> Wav2Vec2Config:
        """The matching wav2vec2 config for the shared conv modules."""
        return Wav2Vec2Config(
            conv_dim=self.conv_dim, conv_kernel=self.conv_kernel,
            conv_stride=self.conv_stride, hidden_size=self.hidden_size,
            num_conv_pos_embeddings=self.num_conv_pos_embeddings,
            num_conv_pos_embedding_groups=self.num_conv_pos_embedding_groups,
            do_stable_layer_norm=self.do_stable_layer_norm,
            layer_norm_eps=self.layer_norm_eps,
            feat_extract_norm=self.feat_extract_norm,
            conv_bias=self.conv_bias)


def relative_positions_bucket(relative_positions: np.ndarray, num_buckets: int,
                              max_distance: int) -> np.ndarray:
    """T5-style log-bucketing (HF WavLMAttention._relative_positions_bucket).
    Static (numpy) — positions depend only on the sequence length."""
    num_buckets = num_buckets // 2
    buckets = (relative_positions > 0).astype(np.int64) * num_buckets
    rel = np.abs(relative_positions)
    max_exact = num_buckets // 2
    is_small = rel < max_exact
    large = np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
    large = large / math.log(max_distance / max_exact)
    large = (max_exact + large * (num_buckets - max_exact)).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return buckets + np.where(is_small, rel, large)


class WavLMAttention(nn.Module):
    """MHA with gated relative position bias (HF WavLMAttention)."""

    cfg: WavLMConfig
    has_relative_position_bias: bool = False  # embedding lives on layer 0

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 position_bias: Optional[jnp.ndarray] = None):
        c = self.cfg
        d, H = c.hidden_size, c.num_attention_heads
        hd = d // H
        B, T, _ = x.shape
        if position_bias is None:
            assert self.has_relative_position_bias
            emb = self.param("rel_attn_embed", nn.initializers.normal(0.02),
                             (c.num_buckets, H))
            pos = np.arange(T)
            buckets = relative_positions_bucket(pos[None, :] - pos[:, None],
                                                c.num_buckets,
                                                c.max_bucket_distance)
            position_bias = jnp.transpose(emb[jnp.asarray(buckets)], (2, 0, 1))  # [H, T, T]

        # gate from the (pre-attention) hidden states (modeling_wavlm.py)
        gh = x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # [B, H, T, hd]
        proj = Linear(hd, 8, name="gru_rel_pos_linear")(gh)
        proj = proj.reshape(B, H, T, 2, 4).sum(-1)
        gate_a, gate_b = jax.nn.sigmoid(proj[..., 0]), jax.nn.sigmoid(proj[..., 1])
        const = self.param("gru_rel_pos_const", nn.initializers.ones, (1, H, 1, 1))
        gate = gate_a * (gate_b * const[:, :, 0, 0][..., None] - 1.0) + 2.0  # [B, H, T]
        gated_bias = gate[..., None] * position_bias[None]  # [B, H, T, T]

        q = Linear(d, d, name="q_proj")(x) * (hd**-0.5)
        k = Linear(d, d, name="k_proj")(x)
        v = Linear(d, d, name="v_proj")(x)

        def split(t):
            return t.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k)) + gated_bias
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, d)
        return Linear(d, d, name="out_proj")(out), position_bias


class WavLMEncoderLayer(nn.Module):
    cfg: WavLMConfig
    has_relative_position_bias: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, position_bias: Optional[jnp.ndarray]):
        c = self.cfg
        d = c.hidden_size
        attn = WavLMAttention(c, self.has_relative_position_bias,
                              name="attention")
        if c.do_stable_layer_norm:  # pre-norm (large)
            h = _LayerNorm(d, c.layer_norm_eps, name="layer_norm")(x)
            a, position_bias = attn(h, position_bias)
            x = x + a
            h = _LayerNorm(d, c.layer_norm_eps, name="final_layer_norm")(x)
            h = nn.gelu(Linear(d, c.intermediate_size,
                               name="feed_forward_intermediate_dense")(h),
                        approximate=False)
            x = x + Linear(c.intermediate_size, d,
                           name="feed_forward_output_dense")(h)
        else:  # post-norm (base)
            a, position_bias = attn(x, position_bias)
            x = _LayerNorm(d, c.layer_norm_eps, name="layer_norm")(x + a)
            h = nn.gelu(Linear(d, c.intermediate_size,
                               name="feed_forward_intermediate_dense")(x),
                        approximate=False)
            x = _LayerNorm(d, c.layer_norm_eps, name="final_layer_norm")(
                x + Linear(c.intermediate_size, d,
                           name="feed_forward_output_dense")(h))
        return x, position_bias


class WavLMModel(nn.Module):
    """Waveform [B, T] -> hidden states. ``return_all=True`` yields the list
    of per-layer states (the WavLmFrontEnd input)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, return_all: bool = False):
        c = self.cfg
        w2 = c.w2v2()
        feats = FeatureExtractor(w2, name="feature_extractor")(wav)
        h = _LayerNorm(c.conv_dim[-1], c.layer_norm_eps,
                       name="feature_projection_layer_norm")(feats)
        h = Linear(c.conv_dim[-1], c.hidden_size,
                   name="feature_projection_projection")(h)
        k = c.num_conv_pos_embeddings
        pos = Conv1d(c.hidden_size, c.hidden_size, k, padding=k // 2,
                     groups=c.num_conv_pos_embedding_groups,
                     name="pos_conv_embed_conv")(h)
        if k % 2 == 0:
            pos = pos[:, :-1, :]
        h = h + nn.gelu(pos, approximate=False)
        if not c.do_stable_layer_norm:
            h = _LayerNorm(c.hidden_size, c.layer_norm_eps,
                           name="encoder_layer_norm")(h)
        states: List[jnp.ndarray] = [h]
        position_bias = None
        for i in range(c.num_hidden_layers):
            h, position_bias = WavLMEncoderLayer(
                c, has_relative_position_bias=(i == 0),
                name=f"layers_{i}")(h, position_bias)
            states.append(h)
        if c.do_stable_layer_norm:
            h = _LayerNorm(c.hidden_size, c.layer_norm_eps,
                           name="encoder_layer_norm")(h)
            states[-1] = h
        return states if return_all else h


class WavLmFrontEnd(nn.Module):
    """sidekit/preprocessor.py:79-163: softmax-weighted sum of all WavLM
    hidden states -> instance norm -> optional channel dropout.
    [B, T] audio -> [B, frames, hidden]."""

    cfg: WavLMConfig
    channels_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        states = WavLMModel(self.cfg, name="feature_extract")(x, return_all=True)
        n = len(states)
        w = self.param("feature_weight", nn.initializers.zeros, (n,))
        weights = jax.nn.softmax(w)
        h = sum(weights[i] * states[i] for i in range(n)) + 1e-6
        from .torchlayers import instance_norm_1d

        h = instance_norm_1d(h)
        if train and self.channels_dropout > 0:
            mask = jax.random.bernoulli(self.make_rng("augment"),
                                        1.0 - self.channels_dropout,
                                        (1, h.shape[1], 1))
            h = h * mask / (1.0 - self.channels_dropout)
        return h


def convert_wavlm(hf_state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """HuggingFace WavLMModel state_dict -> satpu flax params."""
    from .wav2vec2 import convert_wav2vec2

    base = convert_wav2vec2(hf_state_dict)["params"]

    def np_(t):
        try:
            return t.detach().cpu().numpy().astype(np.float32)
        except AttributeError:
            return np.asarray(t, dtype=np.float32)

    sd = dict(hf_state_dict)
    prefix = "wavlm." if any(k.startswith("wavlm.") for k in sd) else ""
    n_layers = len([k for k in sd if k.endswith(".attention.q_proj.weight")])
    for i in range(n_layers):
        b = f"{prefix}encoder.layers.{i}.attention."
        lp = base[f"layers_{i}"]["attention"]
        lp["gru_rel_pos_linear"] = {
            "weight": np_(sd[b + "gru_rel_pos_linear.weight"]),
            "bias": np_(sd[b + "gru_rel_pos_linear.bias"])}
        lp["gru_rel_pos_const"] = np_(sd[b + "gru_rel_pos_const"])
        if b + "rel_attn_embed.weight" in sd:
            lp["rel_attn_embed"] = np_(sd[b + "rel_attn_embed.weight"])
    return {"params": base}
