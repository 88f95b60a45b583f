"""ASV training losses (reference satools/satools/sidekit/loss.py), flax.

All losses return (loss, logits) like the reference (loss is NaN when no
target is given, i.e. x-vector extraction mode).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.torchlayers import Linear


def _normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def cross_entropy(logits, target):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target[:, None], axis=1)[:, 0])


class CCELoss(nn.Module):
    """Plain cross-entropy over a linear head (loss.py:16-27)."""

    emb_dim: int
    spk_count: int

    @nn.compact
    def __call__(self, x, target: Optional[jnp.ndarray] = None):
        logits = Linear(self.emb_dim, self.spk_count, name="module")(x)
        if target is None:
            return jnp.nan, logits
        return cross_entropy(logits, target), logits


class ArcMarginProduct(nn.Module):
    """Additive angular margin softmax (loss.py:30-95).

    m is a call-time argument so fine-tuning can raise the margin
    (ecapa_tdnn.py:86-92 change_params) without re-tracing module structure.
    """

    in_features: int
    out_features: int
    s: float = 30.0
    m: float = 0.50
    easy_margin: bool = False

    @nn.compact
    def __call__(self, x, target: Optional[jnp.ndarray] = None,
                 m: Optional[float] = None):
        m = self.m if m is None else m
        w = self.param("weight", nn.initializers.xavier_uniform(),
                       (self.out_features, self.in_features))
        cosine = _normalize(x) @ _normalize(w).T
        if target is None:
            return jnp.nan, cosine * self.s
        cos_m, sin_m = math.cos(m), math.sin(m)
        th = math.cos(math.pi - m)
        mm = math.sin(math.pi - m) * m
        sine = jnp.sqrt(jnp.clip(1.0 - cosine**2, 0.0, 1.0))
        phi = cosine * cos_m - sine * sin_m
        if self.easy_margin:
            phi = jnp.where(cosine > 0, phi, cosine)
        else:
            phi = jnp.where(cosine - th > 0, phi, cosine - mm)
        one_hot = jax.nn.one_hot(target, self.out_features)
        output = (one_hot * phi + (1.0 - one_hot) * cosine) * self.s
        return cross_entropy(output, target), cosine * self.s


class SoftmaxAngularProto(nn.Module):
    """Angular prototypical + CCE (loss.py:98-143). Batch layout: pairs
    [spk0_a, spk0_b, spk1_a, spk1_b, ...]."""

    spk_count: int
    emb_dim: int = 256
    init_w: float = 10.0
    init_b: float = -5.0

    @nn.compact
    def __call__(self, x, target: Optional[jnp.ndarray] = None):
        w = self.param("w", lambda *_: jnp.asarray(self.init_w))
        b = self.param("b", lambda *_: jnp.asarray(self.init_b))
        cce_pred = Linear(self.emb_dim, self.spk_count, name="cce_backend_linear8")(x)
        if target is None:
            return jnp.nan, cce_pred
        xp = x.reshape(-1, 2, x.shape[-1])
        out_anchor = jnp.mean(xp[:, 1:, :], axis=1)
        out_positive = xp[:, 0, :]
        cos = _normalize(out_positive) @ _normalize(out_anchor).T
        cos = cos * w + b
        n = out_positive.shape[0]
        labels = jnp.arange(n)
        loss = cross_entropy(cos, labels) + cross_entropy(cce_pred, target)
        return loss, cce_pred


class CircleMargin(nn.Module):
    """Circle loss with speaker prototypes (loss.py:199-250)."""

    emb_dim: int
    speaker_count: int
    s: float = 64.0
    m: float = 0.35
    k: int = 1

    @nn.compact
    def __call__(self, x, target: Optional[jnp.ndarray] = None):
        w = self.param("weight", nn.initializers.xavier_uniform(),
                       (self.speaker_count * self.k, self.emb_dim))
        cosine = _normalize(x) @ _normalize(w).T
        cosine = jnp.max(cosine.reshape(cosine.shape[0], -1, self.k), axis=-1)
        if target is None:
            return jnp.nan, cosine * self.s
        one_hot = jax.nn.one_hot(target, self.speaker_count).astype(bool)
        pos = jnp.take_along_axis(cosine, target[:, None], axis=1)  # [B, 1]
        neg = cosine[~one_hot].reshape(cosine.shape[0], cosine.shape[1] - 1)
        alpha_p = jnp.clip(-jax.lax.stop_gradient(pos) + 1 + self.m, min=0.0)
        alpha_n = jnp.clip(jax.lax.stop_gradient(neg) + self.m, min=0.0)
        margin_p, margin_n = 1 - self.m, self.m
        loss = jnp.mean(jax.nn.softplus(
            jax.nn.logsumexp(self.s * (-alpha_p * (pos - margin_p)), axis=-1)
            + jax.nn.logsumexp(self.s * (alpha_n * (neg - margin_n)), axis=-1)))
        return loss, cosine * self.s


class AngularProximityMagnet(nn.Module):
    """Angular proximity + magnet BCE loss (loss.py:146-196)."""

    spk_count: int
    emb_dim: int = 256
    init_w: float = 10.0
    init_b: float = -5.0

    @nn.compact
    def __call__(self, x, target: Optional[jnp.ndarray] = None):
        w = self.param("w", lambda *_: jnp.asarray(self.init_w))
        b1 = self.param("b1", lambda *_: jnp.asarray(self.init_b))
        b2 = self.param("b2", lambda *_: jnp.asarray(5.54))
        cce_pred = Linear(self.emb_dim, self.spk_count, name="cce_backend_linear8")(x)
        if target is None:
            return jnp.nan, cce_pred
        xp = x.reshape(-1, 2, x.shape[-1])
        out_anchor = jnp.mean(xp[:, 1:, :], axis=1)
        out_positive = xp[:, 0, :]
        n = out_positive.shape[0]
        ap = (_normalize(out_positive) @ _normalize(out_anchor).T) * w + b1
        cos = out_positive @ out_anchor.T + b2 + math.log(1 / n / (1 - 1 / n))
        labels = jnp.arange(n)
        mask = (labels[:, None] == labels[None, :]).astype(jnp.float32)
        bce = jnp.mean(jnp.maximum(cos, 0) - cos * mask + jnp.log1p(jnp.exp(-jnp.abs(cos))))
        loss = cross_entropy(ap, labels) + bce
        return loss, cce_pred


class CircleProto(nn.Module):
    """Circle loss with speaker prototypes + pairwise similarities
    (loss.py:250-320; Sun et al., CVPR 2020). Batch layout: pairs like
    SoftmaxAngularProto."""

    emb_dim: int
    speaker_count: int
    s: float = 64.0
    m: float = 0.40

    def _circle(self, pos, neg):
        alpha_p = jnp.clip(-jax.lax.stop_gradient(pos) + 1 + self.m, min=0.0)
        alpha_n = jnp.clip(jax.lax.stop_gradient(neg) + self.m, min=0.0)
        margin_p, margin_n = 1 - self.m, self.m
        return jnp.mean(jax.nn.softplus(
            jax.nn.logsumexp(self.s * (-alpha_p * (pos - margin_p)), axis=-1)
            + jax.nn.logsumexp(self.s * (alpha_n * (neg - margin_n)), axis=-1)))

    @nn.compact
    def __call__(self, x, target: Optional[jnp.ndarray] = None):
        w = self.param("weight", nn.initializers.xavier_uniform(),
                       (self.speaker_count, self.emb_dim))
        cosine = _normalize(x) @ _normalize(w).T
        if target is None:
            return jnp.nan, cosine * self.s
        one_hot = jax.nn.one_hot(target, self.speaker_count).astype(bool)
        pos = jnp.take_along_axis(cosine, target[:, None], axis=1)
        neg = cosine[~one_hot].reshape(cosine.shape[0], cosine.shape[1] - 1)
        loss = self._circle(pos, neg)
        # pairwise prototype half (loss.py:298-318)
        xp = x.reshape(-1, 2, x.shape[-1])
        out_anchor = jnp.mean(xp[:, 1:, :], axis=1)
        out_positive = xp[:, 0, :]
        sim = _normalize(out_positive) @ _normalize(out_anchor).T
        n = sim.shape[0]
        eye = jnp.eye(n, dtype=bool)
        ppos = sim[eye][:, None]
        pneg = sim[~eye].reshape(n, n - 1)
        loss = loss + self._circle(ppos, pneg)
        return loss, cosine * self.s
