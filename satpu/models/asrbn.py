"""TDNN-F ASR-BN acoustic models (fbank front), flax.linen.

Rebuild of the reference tuning nets
(egs/asr/librispeech/local/chain/tuning/tdnnf.py and tdnnf_vq.py / tdnnf_dp.py):
fbank80 -> UttCMVN -> replicate-pad -> TDNNF x12 (subsample /2 then /1.5,
net /3) -> prefinal chain+xent heads; bottleneck ("BN") extraction at the
stage-1 prefinal bottleneck (dim 256), optionally vector-quantized
(tdnnf_vq.py:79-108) or Laplace-noised for DP (tdnnf_dp.py:92-94).

The audio -> features step is jitted with the network so XLA fuses the whole
forward; all shapes are static given the input length.
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.fbank import fbank as kaldi_fbank
from ..ops.cmvn import utt_cmvn
from .tdnnf import (
    NaturalAffineTransform,
    TDNNFBatchNorm,
    VQBottleneck,
    get_padding,
    mask_replicate_tail,
    pad_input_replicate,
)


@dataclasses.dataclass(frozen=True)
class TDNNFNetConfig:
    """Architecture hyperparameters (tuning/tdnnf.py:20-33 defaults)."""

    output_dim: int = 3280
    hidden_dim: int = 1024
    bottleneck_dim: int = 128
    prefinal_bottleneck_dim: int = 256
    kernel_size_list: Tuple[int, ...] = (3, 3, 3, 1, 3, 3, 3, 3, 3, 3, 3, 3)
    subsampling_factor_list: Tuple[float, ...] = (1, 1, 1, 2, 1, 1, 1, 1, 1, 1, 1, 1)
    kernel_size_list_after: Tuple[int, ...] = (1, 3, 3, 3)
    subsampling_factor_list_after: Tuple[float, ...] = (1.5, 1, 1, 1)
    p_dropout: float = 0.1
    num_mel_bins: int = 80
    # bottleneck transform at the BN layer: "none" | "vq" | "dp"
    bottleneck: str = "none"
    codebook_size: int = 0  # for vq
    epsilon: float = 0.0  # laplace scale for dp (tdnnf_dp.py: noise b = 1/epsilon)
    # NG-SGD preconditioning on every affine (chain/nn.py:54-137); enable for
    # chain training, leave off for inference/converted checkpoints
    natural_gradient: bool = False
    # "float32" | "bfloat16": matmul compute dtype for serving (interfaces,
    # batch norm, VQ distances stay f32)
    compute_dtype: str = "float32"


class DpLaplaceBottleneck(nn.Module):
    """Laplace-noise bottleneck for differential privacy (tdnnf_dp.py:92-94)."""

    epsilon: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.is_initializing():
            return x
        u = jax.random.uniform(self.make_rng("noise"), x.shape, minval=-0.5 + 1e-7,
                               maxval=0.5)
        b = 1.0 / self.epsilon
        return x - b * jnp.sign(u) * jnp.log1p(-2.0 * jnp.abs(u))


class TDNNFNet(nn.Module):
    """The 13-layer TDNN-F chain network with BN extraction."""

    cfg: TDNNFNetConfig

    def setup(self):
        c = self.cfg
        ks, ss = list(c.kernel_size_list), list(c.subsampling_factor_list)
        self.padding = get_padding(ks, ss) // 2
        self.padding_after = get_padding(
            list(c.kernel_size_list_after), list(c.subsampling_factor_list_after)) // 2

        self.tdnn1 = TDNNFBatchNorm(
            c.num_mel_bins, c.hidden_dim, bottleneck_dim=c.bottleneck_dim,
            context_len=ks[0], subsampling_factor=ss[0], orthonormal_constraint=-1.0, natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype,
            name="tdnn1")

        layers = []
        for i in range(1, len(ks) - 1):
            layers.append(TDNNFBatchNorm(
                c.hidden_dim, c.hidden_dim, bottleneck_dim=c.bottleneck_dim,
                context_len=ks[i], subsampling_factor=ss[i],
                orthonormal_constraint=-1.0,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name=f"tdnnf{i}"))
        # BN layer (stage-1 prefinal): optional VQ / DP bottleneck
        if c.bottleneck == "vq":
            bfunc = VQBottleneck(c.codebook_size, c.prefinal_bottleneck_dim, name="vq_bottleneck")
        elif c.bottleneck == "dp":
            bfunc = DpLaplaceBottleneck(c.epsilon, name="dp_bottleneck")
        else:
            bfunc = None
        layers.append(TDNNFBatchNorm(
            c.hidden_dim, c.hidden_dim, bottleneck_dim=c.prefinal_bottleneck_dim,
            context_len=ks[-1], subsampling_factor=ss[-1], orthonormal_constraint=-1.0,
            bypass_scale=0.0, bottleneck_func=bfunc,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="tdnnf_bn"))
        self.tdnnfs = layers

        after = []
        ksa, ssa = list(c.kernel_size_list_after), list(c.subsampling_factor_list_after)
        for i in range(len(ksa)):
            after.append(TDNNFBatchNorm(
                c.hidden_dim, c.hidden_dim, bottleneck_dim=c.bottleneck_dim,
                context_len=ksa[i], subsampling_factor=ssa[i],
                orthonormal_constraint=-1.0,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name=f"tdnnf_after{i}"))
        self.tdnnfs_after = after

        self.prefinal_chain = TDNNFBatchNorm(
            c.hidden_dim, c.hidden_dim, bottleneck_dim=c.prefinal_bottleneck_dim,
            context_len=1, orthonormal_constraint=-1.0,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="prefinal_chain")
        self.prefinal_xent = TDNNFBatchNorm(
            c.hidden_dim, c.hidden_dim, bottleneck_dim=c.prefinal_bottleneck_dim,
            context_len=1, orthonormal_constraint=-1.0,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="prefinal_xent")
        self.chain_output = NaturalAffineTransform(
            c.output_dim, natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="chain_output")
        self.xent_output = NaturalAffineTransform(
            c.output_dim, natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="xent_output")

    def features(self, wav: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """[B, T] audio in [-1, 1] -> padded CMVN fbank [B, T', 80].

        ``lengths`` ([B] valid sample counts) makes a zero-padded bucket batch
        produce the same valid frames as per-length runs: fbank frames past
        each utterance are replaced by its last valid frame and CMVN stats are
        masked, so one compiled program serves a whole bucket."""
        x = wav * 32768.0
        x = kaldi_fbank(x, num_mel_bins=self.cfg.num_mel_bins, snip_edges=False)
        if lengths is not None:
            feat_len = (lengths + 80) // 160
            x = utt_cmvn(x, lengths=feat_len)
            x = mask_replicate_tail(x, feat_len)
        else:
            x = utt_cmvn(x)
        return pad_input_replicate(x, self.padding)

    def _dropout(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        if train and self.cfg.p_dropout > 0:
            keep = 1.0 - self.cfg.p_dropout
            mask = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
            return jnp.where(mask, x / keep, 0.0)
        return x

    def __call__(self, wav: jnp.ndarray, train: bool = False,
                 lengths: Optional[jnp.ndarray] = None, return_bn: bool = False):
        """Returns (chain_out [B, T_sub, pdf], xent log-softmax)
        [, bn bottleneck when return_bn — the speaker-adversarial tap]."""
        x = self.features(wav, lengths)
        x = self.tdnn1(x, train=train)
        x = self._dropout(x, train)
        bn = None
        for layer in self.tdnnfs[:-1]:
            x = layer(x, train=train)
            x = self._dropout(x, train)
        if return_bn:
            bn = self.tdnnfs[-1](x, return_bottleneck=True, train=train)
        x = self.tdnnfs[-1](x, train=train)
        x = self._dropout(x, train)
        x = pad_input_replicate(x, self.padding_after)
        for layer in self.tdnnfs_after:
            x = layer(x, train=train)
            x = self._dropout(x, train)
        chain_prefinal = self.prefinal_chain(x, train=train)
        xent_prefinal = self.prefinal_xent(x, train=train)
        chain_out = self.chain_output(chain_prefinal)
        xent_out = self.xent_output(xent_prefinal)
        if return_bn:
            return chain_out, jax.nn.log_softmax(xent_out, axis=2), bn
        return chain_out, jax.nn.log_softmax(xent_out, axis=2)

    def extract_bn(self, wav: jnp.ndarray, train: bool = False,
                   lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """[B, T] audio -> [B, T_bn, 256] linguistic bottleneck
        (tuning/tdnnf.py:156-177)."""
        x = self.features(wav, lengths)
        x = self.tdnn1(x, train=train)
        for layer in self.tdnnfs[:-1]:
            x = layer(x, train=train)
        return self.tdnnfs[-1](x, return_bottleneck=True, train=train)


def build_tdnnf_net(**kwargs) -> Tuple[TDNNFNet, TDNNFNetConfig]:
    cfg = TDNNFNetConfig(**kwargs)
    return TDNNFNet(cfg), cfg


class Wav2Vec2TDNNFNet(nn.Module):
    """wav2vec2-fronted chain net (tuning/tdnnf_wav2vec2_vq.py:29-345).

    wav2vec2 last-layer features (+1 replicate-padded frame so the effective
    downsampling is /320) -> 3-layer stage-1 TDNNF (kernels [3,3,3], last is
    the BN layer with optional VQ) -> /1.5 stage-2 [1,3,3,3] -> chain/xent
    heads. Config reuses TDNNFNetConfig with num_mel_bins ignored.
    """

    cfg: TDNNFNetConfig
    w2v2: Any  # Wav2Vec2Config

    def setup(self):
        from .wav2vec2 import Wav2Vec2Model

        c = self.cfg
        self.preprocessor = Wav2Vec2Model(self.w2v2, name="preprocessor")
        ks, ss = list(c.kernel_size_list), list(c.subsampling_factor_list)
        self.padding = get_padding(ks, ss) // 2
        self.padding_after = get_padding(
            list(c.kernel_size_list_after), list(c.subsampling_factor_list_after)) // 2
        input_dim = self.w2v2.hidden_size

        self.tdnn1 = TDNNFBatchNorm(
            input_dim, c.hidden_dim, bottleneck_dim=c.bottleneck_dim,
            context_len=ks[0], subsampling_factor=ss[0], orthonormal_constraint=-1.0, natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype,
            name="tdnn1")
        layers = []
        for i in range(1, len(ks) - 1):
            layers.append(TDNNFBatchNorm(
                c.hidden_dim, c.hidden_dim, bottleneck_dim=c.bottleneck_dim,
                context_len=ks[i], subsampling_factor=ss[i],
                orthonormal_constraint=-1.0,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name=f"tdnnf{i}"))
        bfunc = (VQBottleneck(c.codebook_size, c.prefinal_bottleneck_dim,
                              name="vq_bottleneck") if c.bottleneck == "vq" else
                 DpLaplaceBottleneck(c.epsilon, name="dp_bottleneck")
                 if c.bottleneck == "dp" else None)
        layers.append(TDNNFBatchNorm(
            c.hidden_dim, c.hidden_dim, bottleneck_dim=c.prefinal_bottleneck_dim,
            context_len=ks[-1], subsampling_factor=ss[-1], orthonormal_constraint=-1.0,
            bypass_scale=0.0, bottleneck_func=bfunc,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="tdnnf_bn"))
        self.tdnnfs = layers
        after = []
        ksa, ssa = list(c.kernel_size_list_after), list(c.subsampling_factor_list_after)
        for i in range(len(ksa)):
            after.append(TDNNFBatchNorm(
                c.hidden_dim, c.hidden_dim, bottleneck_dim=c.bottleneck_dim,
                context_len=ksa[i], subsampling_factor=ssa[i],
                orthonormal_constraint=-1.0,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name=f"tdnnf_after{i}"))
        self.tdnnfs_after = after
        self.prefinal_chain = TDNNFBatchNorm(
            c.hidden_dim, c.hidden_dim, bottleneck_dim=c.prefinal_bottleneck_dim,
            context_len=1, orthonormal_constraint=-1.0,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="prefinal_chain")
        self.prefinal_xent = TDNNFBatchNorm(
            c.hidden_dim, c.hidden_dim, bottleneck_dim=c.prefinal_bottleneck_dim,
            context_len=1, orthonormal_constraint=-1.0,
            natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="prefinal_xent")
        self.chain_output = NaturalAffineTransform(
            c.output_dim, natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="chain_output")
        self.xent_output = NaturalAffineTransform(
            c.output_dim, natural_gradient=c.natural_gradient, compute_dtype=c.compute_dtype, name="xent_output")

    def features(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = self.preprocessor(wav)  # [B, T', 1024], /320 after padding below
        x = jnp.concatenate([x, x[:, -1:, :]], axis=1)  # replicate-pad 1 frame
        return pad_input_replicate(x, self.padding)

    def __call__(self, wav: jnp.ndarray, train: bool = False):
        x = self.features(wav)
        x = self.tdnn1(x, train=train)
        for layer in self.tdnnfs:
            x = layer(x, train=train)
        x = pad_input_replicate(x, self.padding_after)
        for layer in self.tdnnfs_after:
            x = layer(x, train=train)
        chain_out = self.chain_output(self.prefinal_chain(x, train=train))
        xent_out = self.xent_output(self.prefinal_xent(x, train=train))
        return chain_out, jax.nn.log_softmax(xent_out, axis=2)

    def extract_bn(self, wav: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.features(wav)
        x = self.tdnn1(x, train=train)
        for layer in self.tdnnfs[:-1]:
            x = layer(x, train=train)
        return self.tdnnfs[-1](x, return_bottleneck=True, train=train)


def wav2vec2_tdnnf_config(output_dim: int = 3280, bottleneck: str = "none",
                          codebook_size: int = 0,
                          epsilon: float = 0.0) -> TDNNFNetConfig:
    """The tuning/tdnnf_wav2vec2*.py layout: kernels [3,3,3] / [1,3,3,3];
    epsilon > 0 selects the Laplace DP bottleneck (tdnnf_wav2vec2_dp.py)."""
    return TDNNFNetConfig(
        output_dim=output_dim,
        kernel_size_list=(3, 3, 3),
        subsampling_factor_list=(1, 1, 1),
        kernel_size_list_after=(1, 3, 3, 3),
        subsampling_factor_list_after=(1.5, 1, 1, 1),
        bottleneck=bottleneck, codebook_size=codebook_size, epsilon=epsilon)


def fbank_num_frames(num_samples: int) -> int:
    """kaldi fbank frame count, snip_edges=False (satpu.ops.fbank)."""
    return (num_samples + 80) // 160


def bn_num_frames(num_samples: int) -> int:
    """extract_bn output frames for a given sample count (stage-1 TDNNF
    subsampling /2 with replicate padding)."""
    return (fbank_num_frames(num_samples) + 1) // 2


def output_num_frames(num_samples: int,
                      cfg: "TDNNFNetConfig" = None) -> int:
    """Chain-head output frames: exact per-layer simulation of the unfold
    splicing arithmetic (splice_frames nwin = (T*D - c*D)//int(s*D) + 1 with
    replicate padding before each stage), validated frame-exact against the
    reference net over a dense length sweep (a closed form fails for lengths
    where the /1.5 stagger straddles a frame boundary)."""
    c_ = cfg or TDNNFNetConfig()
    F = fbank_num_frames(num_samples)
    ks, ss = list(c_.kernel_size_list), list(c_.subsampling_factor_list)
    ksa, ssa = list(c_.kernel_size_list_after), list(c_.subsampling_factor_list_after)
    F += 2 * (get_padding(ks, ss) // 2)
    D = c_.num_mel_bins
    for k, s in zip(ks, ss):
        F = (F * D - k * D) // int(s * D) + 1
        D = c_.hidden_dim
    F += 2 * (get_padding(ksa, ssa) // 2)
    for k, s in zip(ksa, ssa):
        F = (F * D - k * D) // int(s * D) + 1
    return max(F, 0)


def f0_num_frames(num_samples: int) -> int:
    """YAAPT frame count for satpu.ops.yaapt with the anonymizer options
    (frame_space 20ms at 16k): len(range(280, T + 280, 320))."""
    return (num_samples + 319) // 320
