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
import numpy as np


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


class AdaptivePCMN:
    """Adaptive parametric cepstral mean normalization (reference
    cmvn.py:174-238; Kalinli et al., ICASSP 2019): per-dim grouped context
    convolutions predict (beta, alpha, mu_n) and output beta*x - alpha*mu_n.

    Note: the reference's forward overwrites its result with the permuted
    input (cmvn.py:236-238) — an apparent bug that makes it an identity; we
    implement the paper's behavior. Stateless-functional: ``init`` returns a
    param dict, ``apply`` is jittable.
    """

    def __init__(self, input_dim: int, left_context: int = -10,
                 right_context: int = 10):
        assert left_context < 0 and right_context > 0
        self.input_dim = input_dim
        self.left = left_context
        self.right = right_context
        self.tot_context = right_context - left_context + 1

    def init(self, key) -> dict:
        import jax

        k1, k2, k3 = jax.random.split(key, 3)
        shape = (self.input_dim, self.tot_context)  # grouped: one kernel/dim
        return {
            "beta_w": 0.01 * jax.random.normal(k1, shape),
            "alpha_w": 0.01 * jax.random.normal(k2, shape),
            "mu_n_0_w": 0.01 * jax.random.normal(k3, shape),
            "bias": jnp.zeros((self.input_dim,)),
        }

    def apply(self, params, x: jnp.ndarray) -> jnp.ndarray:
        """x: [B, T, D] -> [B, T, D]."""
        B, T, D = x.shape
        assert D == self.input_dim and T >= self.tot_context
        # replicate pad time by (-left, right)
        left = jnp.repeat(x[:, :1], -self.left, axis=1)
        right = jnp.repeat(x[:, -1:], self.right, axis=1)
        xp = jnp.concatenate([left, x, right], axis=1)  # [B, T+ctx-1, D]
        idx = jnp.arange(T)[:, None] + jnp.arange(self.tot_context)[None, :]
        win = xp[:, idx]  # [B, T, ctx, D]

        def ctx_conv(w):
            # grouped conv: each dim uses its own [ctx] kernel
            return jnp.einsum("btcd,dc->btd", win, w) + params["bias"]

        beta = ctx_conv(params["beta_w"]) + 1.0
        alpha = ctx_conv(params["alpha_w"])
        mu_n0 = ctx_conv(params["mu_n_0_w"])
        return beta * x - alpha * mu_n0


class SpeakerCMVN:
    """Per-speaker global mean/variance normalization over nonzero values
    (reference cmvn.py:243-388, without the pickled-buffer machinery: stats
    are a plain dict that rides checkpoint metadata)."""

    def __init__(self, keep_zeros: bool = True,
                 pass_through_if_not_computed: bool = False):
        self.keep_zeros = keep_zeros
        self.pass_through = pass_through_if_not_computed
        self.stats: dict = {}

    def accumulate(self, features, speaker_id: str) -> None:
        import numpy as np

        f = np.asarray(features)
        vals = f[f != 0] if self.keep_zeros else f.reshape(-1)
        st = self.stats.setdefault(speaker_id,
                                   {"sum": 0.0, "sum_sq": 0.0, "n": 0})
        st["sum"] += float(vals.sum())
        st["sum_sq"] += float((vals ** 2).sum())
        st["n"] += int(vals.size)

    def mean_std(self, speaker_id: str):
        st = self.stats[speaker_id]
        if st["n"] == 0:
            raise ValueError(f"no data accumulated for speaker {speaker_id}")
        mean = st["sum"] / st["n"]
        var = st["sum_sq"] / st["n"] - mean**2
        return mean, float(np.sqrt(var + 1e-6))

    def __call__(self, features, speaker_id: str):
        import numpy as np

        if speaker_id not in self.stats:
            if self.pass_through:
                return features
            raise KeyError(f"stats for speaker {speaker_id} not computed")
        mean, std = self.mean_std(speaker_id)
        f = np.asarray(features, dtype=np.float32).copy()
        if self.keep_zeros:
            nz = f != 0
            f[nz] = (f[nz] - mean) / std
            return f
        return (f - mean) / std

    def to_meta(self) -> dict:
        return {"keep_zeros": self.keep_zeros, "stats": self.stats}

    @classmethod
    def from_meta(cls, meta: dict) -> "SpeakerCMVN":
        out = cls(keep_zeros=meta.get("keep_zeros", True))
        out.stats = dict(meta.get("stats", {}))
        return out


class CMVN:
    """Kaldi-stats-based CMVN applier (reference cmvn.py:9-130).

    ``stats`` maps key -> kaldi (2, dim+1) stats matrix: row 0 = feature sums
    with the frame count in the last column, row 1 = sums of squares. Keys
    are speakers (with ``utt2spk`` routing utterances) or ``None`` for a
    global matrix. The averaged "generic-spk" entry matches the reference's
    unseen-speaker fallback.
    """

    def __init__(self, stats, norm_means: bool = True, norm_vars: bool = False,
                 utt2spk: Optional[dict] = None, reverse: bool = False,
                 std_floor: float = 1e-20):
        import numpy as np

        if not isinstance(stats, dict):
            stats = {None: np.asarray(stats)}
        self.norm_means = norm_means
        self.norm_vars = norm_vars
        self.reverse = reverse
        self.utt2spk = utt2spk
        self.bias: dict = {}
        self.scale: dict = {}
        acc_b = acc_s = None
        for spk, st in stats.items():
            st = np.asarray(st)
            assert st.shape[0] == 2, st.shape
            count = float(np.ravel(st[0, -1])[0])
            mean = st[0, :-1] / count
            var = st[1, :-1] / count - mean * mean
            std = np.maximum(np.sqrt(np.maximum(var, 0.0)), std_floor)
            self.bias[spk] = (-mean).astype(np.float32)
            self.scale[spk] = (1.0 / std).astype(np.float32)
            acc_b = self.bias[spk] if acc_b is None else acc_b + self.bias[spk]
            acc_s = self.scale[spk] if acc_s is None else acc_s + self.scale[spk]
        n = len(stats)
        self.bias["generic-spk"] = acc_b / n
        self.scale["generic-spk"] = acc_s / n

    def __call__(self, x, uttid=None):
        if self.utt2spk is not None and uttid != "generic-spk":
            spk = self.utt2spk[uttid]
        else:
            spk = uttid if uttid in self.bias else None
            if spk not in self.bias:
                spk = "generic-spk"
        b, s = self.bias[spk], self.scale[spk]
        if not self.reverse:
            if self.norm_means:
                x = x + b
            if self.norm_vars:
                x = x * s
        else:
            if self.norm_vars:
                x = x / s
            if self.norm_means:
                x = x - b
        return x

    @classmethod
    def from_ark(cls, path: str, **kw):
        """Per-speaker stats from a kaldi ark/scp of (2, dim+1) matrices."""
        from ..utils import scp_io

        if path.endswith(".scp"):
            r = scp_io.FileReader(path)
            stats = {k: r[k] for k in r.keys()}
        else:
            stats = dict(scp_io.read_ark(path))
        return cls(stats, **kw)
