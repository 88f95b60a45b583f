"""Speaker-adversarial chain net (reference
egs/asr/librispeech/local/chain/tuning/tdnnf_spkadv.py:33-140).

A TDNNF chain acoustic model whose BN bottleneck additionally feeds — through
a gradient-reversal layer — an x-vector speaker classifier (PreHalfResNet34
trunk + attentive pooling + ArcMargin head). Training adds the speaker CE to
the chain objective; the reversed gradient pushes the bottleneck to be
speaker-invariant (the privacy knob of the ASR-BN extractor).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..sidekit.archi import PreHalfResNet34
from ..sidekit.loss import ArcMarginProduct
from ..sidekit.pooling import AttentivePooling
from .asrbn import TDNNFNet, TDNNFNetConfig
from .tdnnf import rev_grad


class SpkAdvTDNNFNet(nn.Module):
    """(wav, spk_target) -> (chain_out, xent_out) + adversarial speaker loss
    sown into the 'aux_loss' collection (added to the training loss by the
    chain trainer, like the VQ commitment loss)."""

    cfg: TDNNFNetConfig
    num_speakers: int
    adversarial: bool = True  # False = plain multi-task (no grad reversal)
    rev_alpha: float = 1.0
    emb_dim: int = 256
    adv_weight: float = 1.0

    def setup(self):
        self.acoustic = TDNNFNet(self.cfg, name="acoustic")
        self.asi_trunk = PreHalfResNet34(name="asi_trunk")
        # BN dim D -> resnet [B, D/8, T/8, 256]: pooled dim = 256 * D/8
        pooled_channels = 256 * (self.cfg.prefinal_bottleneck_dim // 8)
        self.asi_pool = AttentivePooling(pooled_channels, 1,
                                         global_context=False, name="asi_pool")
        self.asi_emb = nn.Dense(self.emb_dim, name="asi_emb")
        self.asi_margin = ArcMarginProduct(self.emb_dim, self.num_speakers,
                                           s=30.0, m=0.2, name="asi_margin")

    def speaker_logits(self, bn: jnp.ndarray, train: bool = False,
                       target: Optional[jnp.ndarray] = None):
        """bn [B, T, D] -> (loss, logits) of the x-vector branch."""
        h = self.asi_trunk(bn, train=train)
        h = self.asi_pool(h, train=train)
        emb = self.asi_emb(h)
        emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
        return self.asi_margin(emb, target=target)

    def __call__(self, wav: jnp.ndarray, train: bool = False,
                 lengths: Optional[jnp.ndarray] = None,
                 spk_target: Optional[jnp.ndarray] = None):
        chain_out, xent_out, bn = self.acoustic(wav, train=train,
                                                lengths=lengths, return_bn=True)
        if spk_target is None and self.is_initializing():
            # trace the speaker branch at init so its params exist
            spk_target = jnp.zeros((wav.shape[0],), jnp.int32)
        if spk_target is not None:
            h = rev_grad(bn, self.rev_alpha) if self.adversarial else bn
            adv_loss, logits = self.speaker_logits(h, train=train,
                                                   target=spk_target)
            if not self.is_initializing():
                self.sow("aux_loss", "spkadv_loss", self.adv_weight * adv_loss)
                acc = jnp.mean((jnp.argmax(logits, -1) == spk_target)
                               .astype(jnp.float32))
                self.sow("aux_metric", "spkadv_accuracy", acc)
        return chain_out, xent_out

    def extract_bn(self, wav: jnp.ndarray, train: bool = False,
                   lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.acoustic.extract_bn(wav, train=train, lengths=lengths)
