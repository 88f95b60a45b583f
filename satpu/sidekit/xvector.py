"""X-vector speaker-embedding models (reference egs/asv/voxceleb tuning nets).

- ``EcapaXVector``: MelSpecFrontEnd -> SpecAugment -> PreEcapaTDNN ->
  AttentiveStatsPool -> 192-d embedding -> ArcMargin(s=30, m=0.2; 0.4 in
  fine-tune) (tuning/ecapa_tdnn.py:22-88).
- ``ResNetXVector``: PreHalfResNet34 -> AttentivePooling(global context) ->
  256-d embedding -> ArcMargin (tuning/resnet.py:34-76).

forward(x, target) returns ((loss, logits), x_vector) like the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.torchlayers import BatchNorm, Linear
from .archi import PreEcapaTDNN, PreHalfResNet34
from .loss import ArcMarginProduct
from .pooling import AttentivePooling, AttentiveStatsPool
from .preprocessor import mel_spec_frontend, mfcc_frontend, spec_masking


def _normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


@dataclasses.dataclass(frozen=True)
class XVectorConfig:
    num_speakers: int = 1211
    n_mels: int = 80
    arch: str = "ecapa"  # "ecapa" | "resnet"
    channels: int = 512
    embedding_size: int = 192  # 256 for resnet
    arc_s: float = 30.0
    arc_m: float = 0.2
    spec_augment: bool = True
    # "melspec" | "mfcc" | "wavlm" (sidekit/preprocessor.py frontends)
    frontend: str = "melspec"
    wavlm: object = None  # WavLMConfig when frontend == "wavlm"


def _apply_frontend(module, c, wav, train):
    if c.frontend == "mfcc":
        return mfcc_frontend(wav, n_mfcc=c.n_mels)
    if c.frontend == "wavlm":
        from ..models.wavlm import WavLMConfig, WavLmFrontEnd

        cfg = c.wavlm or WavLMConfig.large()
        return WavLmFrontEnd(cfg, name="preprocessor")(wav, train=train)
    return mel_spec_frontend(wav, n_mels=c.n_mels)


class EcapaXVector(nn.Module):
    cfg: XVectorConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, target: Optional[jnp.ndarray] = None,
                 train: bool = False, arc_m: Optional[float] = None):
        c = self.cfg
        x = _apply_frontend(self, c, wav, train)  # [B, T, F]
        if train and c.spec_augment and c.frontend != "wavlm":
            x = spec_masking(x, self.make_rng("augment"))
        in_feat = x.shape[-1]
        x = PreEcapaTDNN(in_feat, c.channels, name="sequence_network")(x, train=train)
        # the trunk may run bf16 under torchlayers.autocast; pooling stats,
        # embedding and ArcMargin stay f32 (torch amp's fp32 list)
        x = x.astype(jnp.float32)
        x = AttentiveStatsPool(c.channels * 3, 128, name="stat_pooling")(x)
        x = Linear(c.channels * 3 * 2, c.embedding_size, use_bias=False,
                   name="before_speaker_embedding_lin")(x)
        x = BatchNorm(c.embedding_size, name="before_speaker_embedding_bn2")(x, train=train)
        x_vector = _normalize(x, axis=1)
        loss, logits = ArcMarginProduct(
            c.embedding_size, c.num_speakers, s=c.arc_s, m=c.arc_m,
            name="after_speaker_embedding")(x, target=target, m=arc_m)
        return (loss, logits), x_vector


class ResNetXVector(nn.Module):
    cfg: XVectorConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray, target: Optional[jnp.ndarray] = None,
                 train: bool = False, arc_m: Optional[float] = None):
        c = self.cfg
        x = _apply_frontend(self, c, wav, train)
        if train and c.spec_augment and c.frontend != "wavlm":
            x = spec_masking(x, self.make_rng("augment"))
        in_feat = x.shape[-1]
        x = PreHalfResNet34(name="sequence_network")(x, train=train)  # [B, F', T', 256]
        x = x.astype(jnp.float32)  # bf16 trunk under autocast; f32 pooling
        x = AttentivePooling(256, in_feat // 8, global_context=True,
                             name="stat_pooling")(x, train=train)
        x = Linear(256 * (in_feat // 8) * 2, c.embedding_size, use_bias=False,
                   name="before_speaker_embedding_lin_be")(x)
        x = BatchNorm(c.embedding_size, name="before_speaker_embedding_bn_be")(x, train=train)
        x_vector = _normalize(x, axis=1)
        loss, logits = ArcMarginProduct(
            c.embedding_size, c.num_speakers, s=c.arc_s, m=c.arc_m,
            name="after_speaker_embedding")(x, target=target, m=arc_m)
        return (loss, logits), x_vector


def build_xvector(cfg: XVectorConfig):
    if cfg.arch == "ecapa":
        return EcapaXVector(cfg)
    if cfg.arch == "resnet":
        return ResNetXVector(dataclasses.replace(cfg, embedding_size=256))
    raise ValueError(cfg.arch)
