"""Cepstral mean/variance normalization ops (reference satools/cmvn.py).

- ``utt_cmvn``: per-utterance mean(/var) normalization over time, the
  reference's UttCMVN (cmvn.py:130-170).
- ``utt_cmvn_keep_zeros``: masked variant used for YAAPT F0 (zeros = unvoiced
  frames stay zero and are excluded from the statistics). The reference
  computes the masked stats globally over the whole (possibly batched) tensor;
  we compute them per utterance so results are batch-size invariant (identical
  for batch size 1, which is how the reference trains).
- ``global_cmvn``: apply precomputed kaldi CMVN stats.
- ``length-masked`` variants take a ``lengths`` vector so padded batches give
  the same result as unpadded single utterances (XLA static-shape friendly).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _time_mask(x: jnp.ndarray, lengths: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    if lengths is None:
        return None
    t = x.shape[1]
    mask = jnp.arange(t)[None, :] < lengths[:, None]
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    return mask.astype(x.dtype)


def utt_cmvn(x: jnp.ndarray, var_norm: bool = False,
             lengths: Optional[jnp.ndarray] = None, eps: float = 1e-6) -> jnp.ndarray:
    """Per-utterance CMVN over the time axis.

    x: [B, T, C] (or [B, T]); lengths: optional [B] valid frame counts for
    padded batches.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    mask = _time_mask(x, lengths)
    if mask is None:
        mean = jnp.mean(x, axis=1, keepdims=True)
        if var_norm:
            # torch.var default is unbiased (cmvn.py:158)
            var = jnp.var(x, axis=1, keepdims=True, ddof=1)
    else:
        denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)
        mean = jnp.sum(x * mask, axis=1, keepdims=True) / denom
        if var_norm:
            # unbiased variance to match torch.var default (cmvn.py:158)
            var = jnp.sum(((x - mean) * mask) ** 2, axis=1, keepdims=True) / jnp.maximum(denom - 1.0, 1.0)
    out = x - mean
    if var_norm:
        out = out / jnp.sqrt(var + eps)
    if mask is not None:
        out = out * mask
    return out[0] if squeeze else out


def utt_cmvn_keep_zeros(x: jnp.ndarray, var_norm: bool = True, eps: float = 1e-6) -> jnp.ndarray:
    """Masked CMVN where exact zeros (unvoiced F0) are excluded and preserved.

    x: [B, T] (or [T]). Statistics are taken per utterance over the nonzero
    entries; zeros pass through as zeros (cmvn.py:141-153).
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    voiced = (x != 0).astype(x.dtype)
    reduce_axes = tuple(range(1, x.ndim))
    n = jnp.maximum(jnp.sum(voiced, axis=reduce_axes, keepdims=True), 1.0)
    mean = jnp.sum(x * voiced, axis=reduce_axes, keepdims=True) / n
    out = (x - mean) * voiced
    if var_norm:
        # torch.var is unbiased (n-1 denominator)
        var = jnp.sum((out * voiced) ** 2, axis=reduce_axes, keepdims=True) / jnp.maximum(n - 1.0, 1.0)
        out = out / jnp.sqrt(var + eps)
    out = out * voiced
    return out[0] if squeeze else out


def global_cmvn(x: jnp.ndarray, stats: jnp.ndarray, var_norm: bool = False) -> jnp.ndarray:
    """Apply kaldi global CMVN stats (2 x (dim+1) matrix: sums / sumsq, count)."""
    count = stats[0, -1]
    mean = stats[0, :-1] / count
    out = x - mean
    if var_norm:
        var = stats[1, :-1] / count - mean**2
        out = out / jnp.sqrt(jnp.maximum(var, 1e-10))
    return out
