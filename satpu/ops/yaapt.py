"""YAAPT fundamental-frequency tracker, TPU-native JAX.

Rebuild of the reference TorchScript port (satools/satools/hifigan/yaapt.py,
itself a port of pYAAPT / the Binghamton MATLAB YAAPT: Zahorian & Hu, JASA
123(6), 2008). The reference runs one CPU thread per utterance; here the
whole pipeline is jittable and batched:

- the 50-1500 Hz band-pass biquads are exact 2nd-order recurrences evaluated
  with ``lax.associative_scan`` (parallel prefix, no sequential scan),
- NLFER, the SHC spectral track and both NCCF time tracks are computed for
  ALL frames as dense batched tensor ops (the reference loops python-side over
  voiced frames only); unvoiced frames are masked afterwards,
- the two dynamic programs (dynamic5 over the compacted voiced frames and the
  final candidate Viterbi, yaapt.py:506-570) run as ``lax.scan`` with
  identity-transition padding so compaction keeps a static shape.

Reference quirks that materially shape the output are reproduced:
``nonzero()[0]`` in cmp_rate (yaapt.py:635) limits each NCCF frame to a
single candidate; F.interpolate 'linear' resamples the compacted nonzero
spectral track rather than gap-filling (yaapt.py:293-306); spec_pitch[0:2]
are overwritten with [2:4] (yaapt.py:309-310).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = 1e30

# MXU precision for the banded-DFT / Toeplitz matmuls. HIGH (bf16x3) matches
# f32 to ~1e-6 relative and runs ~30% faster than HIGHEST (bf16x6) on v5e;
# an on-chip A/B over an 8-signal synthetic corpus produced BIT-IDENTICAL F0
# tracks under HIGH vs HIGHEST (the tracker's discrete peak/DP decisions
# absorb 1e-6 perturbations). CPU golden tests always compute exact f32.
MXU_PRECISION = jax.lax.Precision.HIGH

DEFAULTS = dict(
    sr=16000.0, frame_length=35.0, tda_frame_length=35.0, frame_space=10.0,
    f0_min=60.0, f0_max=400.0, fft_length=8192.0, bp_low=50.0, bp_high=1500.0,
    nlfer_thresh1=0.75, nlfer_thresh2=0.1, shc_numharms=3.0, shc_window=40.0,
    shc_maxpeaks=4.0, shc_pwidth=50.0, shc_thresh1=5.0, shc_thresh2=1.25,
    f0_double=150.0, f0_half=150.0, dp5_k1=11.0, nccf_thresh1=0.3,
    nccf_thresh2=0.9, nccf_maxcands=3.0, nccf_pwidth=5.0, merit_boost=0.20,
    merit_pivot=0.99, merit_extra=0.4, median_value=7.0, dp_w1=0.15, dp_w2=0.5,
    dp_w3=0.1, dp_w4=0.9, spec_pitch_min_std=0.05,
)


# ---------------------------------------------------------------------------
# Biquad band-pass (torchaudio lowpass_biquad/highpass_biquad formulas)
# ---------------------------------------------------------------------------


def _biquad_coeffs(fs: float, freq: float, kind: str, Q: float = 0.707):
    w0 = 2.0 * math.pi * freq / fs
    alpha = math.sin(w0) / (2.0 * Q)
    cos_w0 = math.cos(w0)
    if kind == "lowpass":
        b = np.array([(1 - cos_w0) / 2, 1 - cos_w0, (1 - cos_w0) / 2])
    else:  # highpass
        b = np.array([(1 + cos_w0) / 2, -(1 + cos_w0), (1 + cos_w0) / 2])
    a = np.array([1 + alpha, -2 * cos_w0, 1 - alpha])
    return (b / a[0]).astype(np.float64), (a / a[0]).astype(np.float64)


def biquad(x: jnp.ndarray, b, a) -> jnp.ndarray:
    """Exact direct-form-II-transposed biquad via parallel prefix scan.

    y_t = u_t - a1 y_{t-1} - a2 y_{t-2} with u = FIR(b) * x. The 2nd-order
    recurrence is evaluated with an associative scan over affine maps
    (2x2 matrix + offset), exact and O(log T) depth on TPU.
    """
    x64 = x.astype(jnp.float64) if jax.config.jax_enable_x64 else x.astype(jnp.float32)
    b = jnp.asarray(b, dtype=x64.dtype)
    a = jnp.asarray(a, dtype=x64.dtype)
    u = b[0] * x64
    u = u.at[..., 1:].add(b[1] * x64[..., :-1])
    u = u.at[..., 2:].add(b[2] * x64[..., :-2])

    T = x.shape[-1]
    M = jnp.array([[-a[1], -a[2]], [1.0, 0.0]], dtype=x64.dtype)
    Ms = jnp.broadcast_to(M, x64.shape[:-1] + (T, 2, 2))
    vs = jnp.stack([u, jnp.zeros_like(u)], axis=-1)  # [..., T, 2]

    def combine(left, right):
        Ml, vl = left
        Mr, vr = right
        return Mr @ Ml, jnp.einsum("...ij,...j->...i", Mr, vl) + vr

    _, ys = jax.lax.associative_scan(combine, (Ms, vs), axis=-3)
    return ys[..., 0].astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _bandpass_fir(fs: float, bp_low: float, bp_high: float, n_taps: int = 3072) -> np.ndarray:
    """Impulse response of the lowpass(bp_high)->highpass(bp_low) biquad
    cascade, truncated at n_taps. The slowest pole (highpass at 50 Hz,
    |p|~0.986) decays to ~1e-13 by 3072 taps, so this equals the IIR to float
    precision while compiling to a single FFT convolution on TPU."""
    bl, al = _biquad_coeffs(fs, bp_high, "lowpass")
    bh, ah = _biquad_coeffs(fs, bp_low, "highpass")
    x = np.zeros(n_taps)
    x[0] = 1.0
    # direct-form IIR on the impulse (host-side, float64)
    def lfilt(b, a, u):
        y = np.zeros_like(u)
        for t in range(len(u)):
            acc = b[0] * u[t]
            if t >= 1:
                acc += b[1] * u[t - 1] - a[1] * y[t - 1]
            if t >= 2:
                acc += b[2] * u[t - 2] - a[2] * y[t - 2]
            y[t] = acc
        return y

    h = lfilt(bh, ah, lfilt(bl, al, x))
    return h.astype(np.float32)


@functools.lru_cache(maxsize=4)
def _bandpass_toeplitz(fs: float, bp_low: float, bp_high: float,
                       block: int = 512) -> np.ndarray:
    """Block-Toeplitz matrix W [taps+block, block] such that causal FIR
    convolution is y[c*block + j] = sum_u xp[c*block + u] * W[u, j] with xp
    the input front-padded by ``taps`` zeros."""
    h = _bandpass_fir(fs, bp_low, bp_high)
    taps = len(h)
    W = np.zeros((taps + block, block), np.float32)
    for j in range(block):
        u = j + np.arange(1, taps + 1)  # m = j - u + taps runs taps-1 .. 0
        W[u, j] = h[::-1]
    return W


def bandpass(x: jnp.ndarray, fs: float, bp_low: float, bp_high: float,
             block: int = 512) -> jnp.ndarray:
    """lowpass(bp_high) then highpass(bp_low) (yaapt.py:42-51) with the
    (numerically exact) truncated cascade FIR, evaluated as a block-Toeplitz
    matmul on the MXU: overlapping windows of ``taps+block`` samples times a
    constant [taps+block, block] tap matrix. The earlier full-length FFT
    convolution padded 160 k-sample utterances to a 262144-point transform
    through XLA's TPU FFT custom call — measured 2x slower than this matmul
    at B=128 x 10 s (43.8 -> ~26 ms for the two bands)."""
    W = jnp.asarray(_bandpass_toeplitz(fs, bp_low, bp_high, block))
    taps = W.shape[0] - block
    nblk = W.shape[0] // block  # taps is a multiple of block
    T = x.shape[-1]
    nch = (T + block - 1) // block
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(taps, nch * block - T)])
    # accumulated block matmuls over the non-overlapping block view: window
    # c covers xp blocks c..c+nblk-1, so y_c = sum_d xb[c+d] @ W[d*block:
    # (d+1)*block] — measured 7.1 vs 9.5 ms/call for the materialized
    # overlapping-window gather at B=128 x 10 s (no 578 MB window tensor)
    xb = xp.reshape(x.shape[:-1] + (taps // block + nch, block))
    y = None
    for d in range(nblk):
        part = jnp.matmul(xb[..., d:d + nch, :],
                          W[d * block:(d + 1) * block],
                          precision=MXU_PRECISION)
        y = part if y is None else y + part
    y = y.reshape(x.shape[:-1] + (nch * block,))
    return y[..., :T].astype(jnp.float32)


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------


def frame_strided(x: jnp.ndarray, n_frames: int, size: int, hop: int) -> jnp.ndarray:
    idx = (jnp.arange(n_frames) * hop)[:, None] + jnp.arange(size)[None, :]
    return x[..., idx]


def medfilt(x: jnp.ndarray, k: int, valid_len: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """1D median filter with zero padding (yaapt.py:54-69). If ``valid_len`` is
    given, entries at index >= valid_len are treated as zero (compacted
    buffers)."""
    if k <= 1:
        return x
    pad = k // 2
    if valid_len is not None:
        x = jnp.where(jnp.arange(x.shape[-1]) < valid_len, x, 0.0)
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    win = frame_strided(xp, x.shape[-1], k, 1)
    return jnp.median(win, axis=-1)


def compact_by_mask(mask: jnp.ndarray, *arrays):
    """Stable-compact entries where mask is True to the front (static shape).

    Returns (num_valid, gather_idx, compacted...). Invalid tail slots hold the
    value of arrays at arbitrary masked-out positions — callers must mask.
    """
    order = jnp.argsort(~mask, stable=True)
    n = jnp.sum(mask.astype(jnp.int32))
    outs = [a[..., order] if a.ndim == 1 else a[:, order] for a in arrays]
    return n, order, outs


def masked_mean(x, mask, axis=None):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def masked_std(x, mask, axis=None, ddof=1):
    m = mask.astype(x.dtype)
    n = jnp.sum(m, axis=axis)
    mu = jnp.sum(x * m, axis=axis) / jnp.maximum(n, 1.0)
    var = jnp.sum(((x - mu) ** 2) * m, axis=axis) / jnp.maximum(n - ddof, 1.0)
    return jnp.sqrt(var)


def linear_resample_compact(x: jnp.ndarray, num_valid: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) of x[:num_valid]
    to length out_len (yaapt.py:302-306), with dynamic input length."""
    scale = num_valid.astype(jnp.float32) / out_len
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, jnp.maximum(num_valid.astype(jnp.float32) - 1.0, 0.0))
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, jnp.maximum(num_valid - 1, 0))
    frac = pos - lo.astype(jnp.float32)
    return x[lo] * (1.0 - frac) + x[hi] * frac


def viterbi_path_scan(local: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Sequential-reference Viterbi (lax.scan), kept for equivalence tests.

    local [C, T]; trans [C, C, T] with trans[next, prev, t]. Ties resolved
    like the reference (argmin of the flipped array = LAST argmin).
    """
    C, T = local.shape

    def last_argmin(v, axis):
        return v.shape[axis] - 1 - jnp.argmin(jnp.flip(v, axis=axis), axis=axis)

    def step(pcost, inp):
        local_t, trans_t = inp
        aux = pcost[None, :] + trans_t
        K = last_argmin(aux, axis=1)
        ccost = pcost[K] + trans_t[jnp.arange(C), K] + local_t
        return ccost, K

    pcost0 = local[:, 0]
    final_cost, preds = jax.lax.scan(
        step, pcost0, (local.T[1:], jnp.moveaxis(trans, 2, 0)[1:]))
    end = C - 1 - jnp.argmin(final_cost[::-1])

    def back(nxt, pred_t):
        prev = pred_t[nxt]
        return prev, nxt

    first, path_tail_rev = jax.lax.scan(back, end, preds[::-1])
    path = jnp.concatenate([jnp.array([first]), path_tail_rev[::-1]])
    return path  # [T]


def viterbi_path(local: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Lowest-cost candidate path, the reference's path1 (yaapt.py:530-570),
    as PARALLEL prefix work: a 500-step lax.scan costs ~500 dispatch-depth on
    TPU and dominated the whole anonymization profile; min-plus matrix
    products are associative, so the forward costs come from one
    ``associative_scan`` (log2 T levels of tiny CxC min-plus products),
    predecessors are then a single batched argmin over all frames, and the
    backtrace is a second associative scan composing predecessor maps.
    Tie-breaking matches the reference (LAST argmin).

    local [C, T]; trans [C, C, T] with trans[next, prev, t].
    """
    C, T = local.shape
    if T == 1:
        return jnp.array([C - 1 - jnp.argmin(local[::-1, 0])])

    def last_argmin(v, axis):
        return v.shape[axis] - 1 - jnp.argmin(jnp.flip(v, axis=axis), axis=axis)

    # A_t[c, k] = trans[c, k, t] + local[c, t] for t = 1..T-1
    A = jnp.moveaxis(trans[:, :, 1:], 2, 0) + local.T[1:, :, None]  # [T-1, C, C]

    def minplus(left, right):
        # prefix[t] = A_t (.) prefix[t-1]: combine(L, R) = R (.) L
        return jnp.min(right[..., :, :, None] + left[..., None, :, :], axis=-2)

    prefix = jax.lax.associative_scan(minplus, A, axis=0)  # [T-1, C, C]
    # cost_t(c) for t = 0..T-1 ([T, C])
    cost0 = local[:, 0]
    costs = jnp.concatenate(
        [cost0[None, :], jnp.min(prefix + cost0[None, None, :], axis=-1)], axis=0)
    # predecessors for all frames in parallel: K_t[c] = last_argmin_k
    # (cost_{t-1}(k) + trans[c, k, t])
    aux = costs[:-1, None, :] + jnp.moveaxis(trans, 2, 0)[1:]  # [T-1, C, C]
    preds = last_argmin(aux, axis=2)  # [T-1, C]
    end = C - 1 - jnp.argmin(costs[-1][::-1])
    # backtrace: compose predecessor maps with a reverse associative scan.
    # combine(f, g) = g[f] — but map composition via take_along_axis lowers
    # to per-row dynamic gathers (a slow TPU custom call: that scan alone
    # was ~13 ms of the 114 ms B=128 x 10 s F0 dispatch). The equivalent
    # one-hot select g[f][x] = sum_i [f(x)==i] * g(i) is C^2 exact-integer
    # VPU elementwise work per step. (A 0/1-matrix matmul composition was
    # tried first: batched CxC matmuls with C<=6 lower to tiny MXU dots and
    # measured ~4x WORSE than the gather scan.)
    iota_c = jnp.arange(C)

    def compose(f, g):
        oh = f[..., :, None] == iota_c
        return jnp.sum(jnp.where(oh, g[..., None, :], 0), axis=-1)

    suffix = jax.lax.associative_scan(compose, preds, axis=0, reverse=True)
    # suffix[t] applied to `end` without the dynamic row gather suffix[:, end]
    head = jnp.sum(jnp.where(iota_c[None, :] == end, suffix, 0), axis=-1)
    path = jnp.concatenate([head, jnp.array([end])])
    return path  # [T]


# ---------------------------------------------------------------------------
# NLFER (yaapt.py:148-176)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _dft_band_mats(frame_len: int, nfft: int, bin_lo: int, bin_hi: int):
    """Cos/sin DFT matrices for a band of rfft bins (host-side constants)."""
    k = np.arange(bin_lo, bin_hi)
    t = np.arange(frame_len)
    ang = -2.0 * np.pi / nfft * np.outer(t, k)
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


def banded_dft_mag(frames: jnp.ndarray, nfft: int, bin_lo: int, bin_hi: int) -> jnp.ndarray:
    """``abs(rfft(frames, nfft))[..., bin_lo:bin_hi]`` as two MXU matmuls.

    YAAPT zero-pads short analysis frames (560/1120 samples) to an 8192-point
    FFT but only reads a narrow bin band; the direct banded DFT is a
    [frames, L] x [L, bins] matmul — far less compute+memory than the full
    FFT custom call, and it runs on the MXU. HIGHEST precision keeps f32
    accuracy so the downstream peak/DP decisions match the FFT path.
    """
    C, S = _dft_band_mats(frames.shape[-1], nfft, bin_lo, bin_hi)
    re = jnp.matmul(frames, jnp.asarray(C), precision=MXU_PRECISION)
    im = jnp.matmul(frames, jnp.asarray(S), precision=MXU_PRECISION)
    return jnp.sqrt(re * re + im * im)


@functools.lru_cache(maxsize=8)
def _corr_dft_mats(frame_len: int, nfft: int, lag_lo: int, lag_hi: int):
    """Forward/inverse DFT matrices for banded cross-correlation (host-side
    constants): corr[k] = irfft(conj(rfft(a)) * rfft(b))[k] for k in
    [lag_lo, lag_hi)."""
    nbins = nfft // 2 + 1
    b = np.arange(nbins)
    t = np.arange(frame_len)
    ang_f = 2.0 * np.pi / nfft * np.outer(t, b)
    Cf = np.cos(ang_f).astype(np.float32)
    Sf = np.sin(ang_f).astype(np.float32)
    k = np.arange(lag_lo, lag_hi)
    w = np.full(nbins, 2.0)
    w[0] = 1.0
    if nfft % 2 == 0:
        w[-1] = 1.0
    ang_i = 2.0 * np.pi / nfft * np.outer(b, k)
    Ci = (w[:, None] * np.cos(ang_i) / nfft).astype(np.float32)
    Si = (w[:, None] * np.sin(ang_i) / nfft).astype(np.float32)
    return Cf, Sf, Ci, Si


def banded_corr_pairs(signals, pairs, nfft: int, lag_lo: int, lag_hi: int):
    """Linear cross-correlations corr[k] = sum_t a[t] * b[t+k] for a band of
    lags, as banded DFT matmuls on the MXU.

    ``signals``: list of [..., L] arrays (shared leading dims); ``pairs``:
    list of (ia, ib) index pairs into signals. Returns one [..., lag_hi-lag_lo]
    array per pair. Requires nfft >= L + lag_hi (linear, not circular).

    Replaces jnp.fft rfft/irfft round trips: XLA's TPU FFT custom call costs
    ~23 ms per [64k, 1024] batch where the equivalent HIGHEST-precision
    banded DFT matmul pipeline costs ~10 ms per pair (measured on a v5e;
    this took the two NCCF time tracks from 158 ms to ~45 ms at B=128 x 10 s).
    """
    L = signals[0].shape[-1]
    Cf, Sf, Ci, Si = (jnp.asarray(m) for m in
                      _corr_dft_mats(L, nfft, lag_lo, lag_hi))
    P = MXU_PRECISION
    stack = jnp.concatenate([s[..., None, :] for s in signals], axis=-2)
    ar = jnp.matmul(stack, Cf, precision=P)  # [..., n_sig, nbins]
    as_ = jnp.matmul(stack, Sf, precision=P)
    outs = []
    # X = x@Cf - i*(x@Sf); conj(A)*B = (pr, pi) below; corr = pr@Ci - pi@Si
    prs, pis = [], []
    for ia, ib in pairs:
        a_r, a_s = ar[..., ia, :], as_[..., ia, :]
        b_r, b_s = ar[..., ib, :], as_[..., ib, :]
        prs.append(a_r * b_r + a_s * b_s)
        pis.append(a_s * b_r - a_r * b_s)
    pr = jnp.concatenate([p[..., None, :] for p in prs], axis=-2)
    pi = jnp.concatenate([p[..., None, :] for p in pis], axis=-2)
    corr = (jnp.matmul(pr, Ci, precision=P)
            - jnp.matmul(pi, Si, precision=P))  # [..., n_pairs, K]
    return [corr[..., i, :] for i in range(len(pairs))]


def nlfer(filtered: jnp.ndarray, frame_size: int, frame_jump: int, nfft: int,
          p: Dict[str, float]):
    size = filtered.shape[-1]
    fs = p["sr"]
    n_min = int(np.round(p["f0_min"] * 2 / fs * nfft))
    n_max = int(np.round(p["f0_max"] / fs * nfft))
    n_frames = len(range(frame_size // 2, size - frame_size // 2, frame_jump))
    window = jnp.asarray(np.hanning(frame_size + 2)[1:-1].astype(np.float32))
    frames = frame_strided(filtered, n_frames, frame_size, frame_jump) * window
    mag = banded_dft_mag(frames, nfft, n_min - 1, n_max)
    frame_energy = jnp.sum(mag, axis=1).astype(jnp.float32)
    mean_energy = jnp.mean(frame_energy)
    energy = frame_energy / mean_energy
    vuv = energy > p["nlfer_thresh1"]
    return energy, vuv, n_frames


# ---------------------------------------------------------------------------
# Spectral track: SHC + peaks + dynamic5 (yaapt.py:184-312)
# ---------------------------------------------------------------------------


def shc_all_frames(filtered_nl: jnp.ndarray, n_frames: int, frame_size: int,
                   frame_jump: int, nfft: int, p: Dict[str, float]) -> jnp.ndarray:
    """SHC spectra for every frame: [n_frames, max_SHC]."""
    fs = p["sr"]
    nframe_size = frame_size * 2
    delta = fs / nfft
    window_length = int(math.floor(p["shc_window"] / delta))
    if window_length % 2 == 0:
        window_length += 1
    half_window = window_length // 2
    max_shc = int(math.floor((p["f0_max"] + p["shc_pwidth"] * 2) / delta))
    min_shc = int(math.ceil(p["f0_min"] / delta))
    num_harmonics = int(p["shc_numharms"])

    size = filtered_nl.shape[-1]
    pad_to = nframe_size + (n_frames - 1) * frame_jump
    data = jnp.pad(filtered_nl, (0, max(0, pad_to - size)))
    window = jnp.asarray(np.kaiser(nframe_size + 1, 0.5)[:-1].astype(np.float32))
    frames = frame_strided(data, n_frames, nframe_size, frame_jump) * window
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    # SHC[k-? ] see yaapt.py:231-235: SHC[min_shc-1+i] =
    #   sum_j prod_h mag[(min_shc+i)*(h+1) + j]
    i_idx = np.arange(max_shc - min_shc + 1)
    h_idx = np.arange(num_harmonics + 1)
    j_idx = np.arange(window_length)
    gather = ((min_shc + i_idx)[:, None, None] * (h_idx + 1)[None, :, None]
              + j_idx[None, None, :])  # [I, H, J] (indices into half_window-padded mag)
    # only bins < gather.max() are ever read: banded DFT instead of the full
    # 8192-point FFT (reference prepends half_window zeros, yaapt.py:220,229 —
    # padded index b reads rfft bin b - half_window)
    top_bin = int(gather.max()) + 1 - half_window
    mag = banded_dft_mag(frames, nfft, 0, top_bin)
    mag = jnp.pad(mag, ((0, 0), (half_window, 0)))
    I = max_shc - min_shc + 1
    impl = _shc_impl()
    if impl == "pallas":
        shc_band = _shc_band_matmul_pallas(mag, min_shc, I, num_harmonics + 1,
                                           window_length)
    elif impl == "pallas_slices":
        shc_band = _shc_band_pallas(mag, min_shc, I, num_harmonics + 1,
                                    window_length)
    else:
        # (a strided-slice MAC variant — per (h, j) the i-axis walk is a
        # stride-(h+1) lane slice — measured 30% faster in isolation but
        # SLOWER in the fused shc graph (shc 36.8 -> 40.9 ms at B=128x10s);
        # the flat static gather fuses better with the DFT matmul. Mosaic
        # rejects strided vector slices, so out-of-kernel deinterleave for
        # the Pallas kernel goes through the one-hot matmul in
        # _shc_band_matmul_pallas, the TPU default.)
        gathered = mag[:, jnp.asarray(gather.reshape(-1))].reshape(
            (n_frames,) + gather.shape)
        shc_band = jnp.sum(jnp.prod(gathered, axis=2), axis=2)  # [F, I]
    shc = jnp.zeros((n_frames, max_shc), dtype=jnp.float32)
    shc = shc.at[:, min_shc - 1 : max_shc].set(shc_band[:, :I])
    return shc


def _shc_impl() -> str:
    """Select the SHC band implementation.

    - ``pallas`` (TPU default): one-hot deinterleave matmul (an exact MXU
      gather) + the VMEM-resident product-accumulate kernel. The original
      XLA gather formulation re-reads ~19k HBM elements per frame and cost
      ~26 ms of the 114 ms B=128 x 10 s F0 dispatch; the matmul+kernel form
      moves the index work onto the MXU.
    - ``gather`` (CPU default): the flat static-gather formulation.
    - ``pallas_slices``: the legacy strided-slice deinterleave variant
      (measured slower: XLA lane-strided slices are expensive; kept for
      A/B). ``SATPU_PALLAS_SHC=1`` is honored as an alias.

    Override with ``SATPU_SHC_IMPL=gather|pallas|pallas_slices``. The auto
    rule keys on where the computation will actually run: Pallas kernels
    need a real TPU (tests pin jax_default_device to CPU while the axon TPU
    platform is still registered, so default_backend() alone is not enough).
    """
    impl = os.environ.get("SATPU_SHC_IMPL", "auto")
    if impl in ("gather", "pallas", "pallas_slices"):
        return impl
    if os.environ.get("SATPU_PALLAS_SHC", "") == "1":
        return "pallas_slices"
    try:
        on_tpu = jax.default_backend() == "tpu"
        dd = jax.config.jax_default_device
        if dd is not None and getattr(dd, "platform", None) != "tpu":
            on_tpu = False
    except Exception:
        on_tpu = False
    return "pallas" if on_tpu else "gather"


def _shc_band_pallas(mag: jnp.ndarray, min_shc: int, n_out: int, n_harm: int,
                     window_length: int, block_frames: int = 128,
                     interpret: bool = False) -> jnp.ndarray:
    """SHC band via a Pallas kernel.

    The XLA gather formulation re-reads ~19k HBM elements per frame
    (sum_j prod_h mag[(min_shc+i)*(h+1)+j]); here each program holds a block
    of rows in VMEM so HBM traffic is one row read + one band write per
    frame. Mosaic only supports stride-1 vector slices, so the harmonic
    strides are deinterleaved OUTSIDE the kernel: for each stride s,
    Phase_{s,r}[f, q] = mag[f, q*s + r] — in-kernel the (h, j) term is the
    stride-1 slice Phase_{h+1, j%%(h+1)}[:, min_shc + j//(h+1) : ... + I].
    """
    from jax.experimental import pallas as pl

    F, M = mag.shape
    lanes = 128
    I_pad = ((n_out + lanes - 1) // lanes) * lanes
    # phase arrays need entries q up to min_shc + I_pad - 1 + window_length
    Lp = min_shc + I_pad + window_length
    Lp_pad = ((Lp + lanes - 1) // lanes) * lanes
    M_need = Lp_pad * n_harm  # deepest read: q*s + r with s = n_harm
    magp = jnp.pad(mag, ((0, 0), (0, max(0, M_need - M))))

    packs = []
    for s in range(1, n_harm + 1):
        phases = [
            jnp.pad(magp[:, r::s][:, :Lp_pad],
                    ((0, 0), (0, max(0, Lp_pad - magp[:, r::s][:, :Lp_pad].shape[1]))))
            for r in range(s)
        ]
        packs.append(jnp.concatenate(phases, axis=1))  # [F, s*Lp_pad]

    return _shc_pallas_from_packs(packs, F, min_shc, n_out, I_pad, n_harm,
                                  window_length, Lp_pad, block_frames,
                                  interpret)


def _shc_pallas_from_packs(packs, F, min_shc, n_out, I_pad, n_harm,
                           window_length, Lp_pad, block_frames, interpret):
    """Product-accumulate SHC kernel over stride-deinterleaved phase packs.

    ``packs[h]`` is [F, (h+1)*Lp_pad] with pack[h][f, r*Lp_pad + q] =
    mag[f, q*(h+1) + r]; the (h, j) SHC term is then the stride-1 slice
    pack[h][:, (j %% s)*Lp_pad + min_shc + j//s :][:I_pad] (s = h+1), which
    Mosaic supports. Each program holds one block of frames in VMEM, so HBM
    traffic is one pack read + one band write per frame.
    """
    from jax.experimental import pallas as pl

    F_pad = ((F + block_frames - 1) // block_frames) * block_frames
    packs = [jnp.pad(pk, ((0, F_pad - F), (0, 0))) for pk in packs]

    def kernel(*refs):
        pack_refs, out_ref = refs[:-1], refs[-1]
        vals = [r[...] for r in pack_refs]
        acc = jnp.zeros((block_frames, I_pad), jnp.float32)
        for j in range(window_length):
            term = None
            for h in range(n_harm):
                s = h + 1
                start = (j % s) * Lp_pad + min_shc + j // s
                sl = jax.lax.slice(vals[h], (0, start),
                                   (block_frames, start + I_pad), (1, 1))
                term = sl if term is None else term * sl
            acc = acc + term
        out_ref[...] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F_pad, I_pad), jnp.float32),
        grid=(F_pad // block_frames,),
        in_specs=[pl.BlockSpec((block_frames, (s + 1) * Lp_pad), lambda i: (i, 0))
                  for s in range(n_harm)],
        out_specs=pl.BlockSpec((block_frames, I_pad), lambda i: (i, 0)),
        interpret=interpret,
    )(*packs)
    return out[:F, :n_out]


@functools.lru_cache(maxsize=8)
def _shc_deinterleave_mats(M: int, n_harm: int, Lp_pad: int):
    """One-hot phase-deinterleave matrices (host-side constants).

    D_s [M, s*Lp_pad] with D_s[m, r*Lp_pad + q] = [m == q*s + r], so
    mag @ D_s lays out pack_s[f, r*Lp_pad + q] = mag[f, q*s + r] (zero
    beyond M, matching the zero-padded phases the kernel expects).
    """
    mats = []
    q = np.arange(Lp_pad)
    for s in range(1, n_harm + 1):
        D = np.zeros((M, s * Lp_pad), np.float32)
        for r in range(s):
            m = q * s + r
            ok = m < M
            D[m[ok], r * Lp_pad + q[ok]] = 1.0
        mats.append(D)
    return tuple(mats)


def _shc_band_matmul_pallas(mag: jnp.ndarray, min_shc: int, n_out: int,
                            n_harm: int, window_length: int,
                            block_frames: int = 128,
                            interpret: bool = False) -> jnp.ndarray:
    """SHC band: one-hot deinterleave MATMUL + the Pallas kernel (TPU default).

    The strided-slice deinterleave in _shc_band_pallas is what made the
    kernel path lose to the XLA gather (lane-strided slices of [F, M] are
    expensive on this compiler); a 0/1 matrix at MXU_PRECISION is instead an
    EXACT gather (bf16x3 represents f32 exactly; one nonzero per output
    column) that runs at matmul speed, after which every kernel slice is
    stride-1.
    """
    F, M = mag.shape
    lanes = 128
    I_pad = ((n_out + lanes - 1) // lanes) * lanes
    Lp = min_shc + I_pad + window_length
    Lp_pad = ((Lp + lanes - 1) // lanes) * lanes
    # pad the frame axis BEFORE the deinterleave (the [F, sum(s)*Lp_pad]
    # pack pad was a ~1 GB copy at B=128 x 10 s; padding mag costs ~1/4 of
    # that) and emit one matmul per stride so no pack is a slice copy of a
    # fused matmul output
    F_pad = ((F + block_frames - 1) // block_frames) * block_frames
    magp = jnp.pad(mag, ((0, F_pad - F), (0, 0)))
    packs = [jnp.matmul(magp, jnp.asarray(D), precision=MXU_PRECISION)
             for D in _shc_deinterleave_mats(M, n_harm, Lp_pad)]
    return _shc_pallas_from_packs(packs, F_pad, min_shc, n_out, I_pad, n_harm,
                                  window_length, Lp_pad, block_frames,
                                  interpret)[:F]


def peaks_frame(data: jnp.ndarray, delta: float, maxpeaks: int, p: Dict[str, float]):
    """Vectorized peaks() (yaapt.py:383-497) for one SHC frame."""
    thresh1, thresh2 = p["shc_thresh1"], p["shc_thresh2"]
    eps = 1e-14
    width = int(math.floor(p["shc_pwidth"] / delta))
    if width % 2 == 0:
        width += 1
    center = int(math.ceil(width / 2))
    min_lag = max(1, int(math.floor(p["f0_min"] / delta - center)))
    max_lag = min(len(data) - width, int(math.floor(p["f0_max"] / delta + center)))

    max_data = jnp.max(data[min_lag : max_lag + 1])
    data = jnp.where(max_data > eps, data / max_data, data)
    avg_data = jnp.mean(data[min_lag : max_lag + 1])

    # candidate positions n in [min_lag+center+1, max_lag-center+1)
    n_pos = np.arange(min_lag + center + 1, max_lag - center + 1)
    d_n = data[n_pos]
    is_peak = (d_n > data[n_pos - 1]) & (d_n > data[n_pos + 1]) & (d_n > thresh2 * avg_data)
    # centered-argmax check over [n-center, n+center]: strict max vs left,
    # >= max of right (argmax returns first occurrence). Sliding-window maxes
    # via reduce_window instead of materializing the [n_pos, 2*center+1]
    # window gather (1.3 GB at B=128 x 10 s; peaks dropped 23 -> ~8 ms).
    lm = jax.lax.reduce_window(data, -jnp.inf, jax.lax.max,
                               (center,), (1,), "VALID")  # lm[t]=max d[t:t+c]
    left_max = lm[n_pos - center]   # max of data[n-center .. n-1]
    right_max = lm[n_pos + 1]       # max of data[n+1 .. n+center]
    centered = (d_n > left_max) & (d_n >= right_max)
    valid = is_peak & centered

    merit_all = jnp.where(valid, d_n, -1.0)
    # top-maxpeaks by merit desc, ties by lag order: iterative argmax+mask
    # (argmax returns the first occurrence) — a full lane-shuffle sort per
    # frame was one of the hotter ops in the device profile. The masking and
    # the selection run on one-hot rows instead of .at[idx].set / fancy
    # indexing: per-row dynamic scatters/gathers are slow TPU custom calls,
    # where the where+reduce forms fuse into the surrounding elementwise work.
    pos_iota = jnp.arange(merit_all.shape[0])

    def top1(carry, _):
        m = carry
        oh = pos_iota == jnp.argmax(m)
        return jnp.where(oh, -jnp.inf, m), oh

    _, order_oh = jax.lax.scan(top1, merit_all, None, length=maxpeaks)
    # order_oh [maxpeaks, P]: exactly one True per row -> select via masked sum
    sel_valid = jnp.any(order_oh & valid[None, :], axis=1)
    pos_sel = jnp.sum(jnp.where(order_oh, jnp.asarray(n_pos, jnp.float32)[None, :], 0.0), axis=1)
    d_sel = jnp.sum(jnp.where(order_oh, d_n[None, :], 0.0), axis=1)
    pitch = jnp.where(sel_valid, pos_sel * delta, 0.0)
    merit = jnp.where(sel_valid, d_sel, 0.0)
    numpeaks = jnp.sum(valid.astype(jnp.int32))
    numpeaks = jnp.minimum(numpeaks, maxpeaks)

    # Step4 extras (yaapt.py:476-491)
    def with_peaks(pitch, merit, numpeaks):
        def add_extra(pm, cond, value):
            pitch, merit, numpeaks = pm
            new_n = jnp.minimum(numpeaks + 1, maxpeaks)
            idx = new_n - 1
            pitch = jnp.where(cond, pitch.at[idx].set(value), pitch)
            merit = jnp.where(cond, merit.at[idx].set(p["merit_extra"]), merit)
            numpeaks = jnp.where(cond, new_n, numpeaks)
            return pitch, merit, numpeaks

        pm = (pitch, merit, numpeaks)
        pm = add_extra(pm, pm[0][0] > p["f0_double"], pm[0][0] / 2.0)
        pm = add_extra(pm, pm[0][0] < p["f0_half"], pm[0][0] * 2.0)
        pitch, merit, numpeaks = pm
        slots = jnp.arange(maxpeaks)
        fill = slots >= numpeaks
        pitch = jnp.where(fill, pitch[0], pitch)
        merit = jnp.where(fill, merit[0], merit)
        return pitch, merit

    pitch_f, merit_f = with_peaks(pitch, merit, numpeaks)
    has_peaks = numpeaks > 0
    step2_fail = jnp.max(merit) / avg_data < thresh1
    avg_fail = avg_data > 1.0 / thresh1
    no_result = avg_fail | step2_fail | (~has_peaks)
    pitch_out = jnp.where(no_result, jnp.zeros(maxpeaks), pitch_f)
    merit_out = jnp.where(no_result, jnp.ones(maxpeaks), merit_f)
    return pitch_out, merit_out


def spec_track(filtered_nl: jnp.ndarray, energy, vuv, n_frames: int,
               frame_size: int, frame_jump: int, nfft: int, p: Dict[str, float]):
    fs = p["sr"]
    delta = fs / nfft
    maxpeaks = int(p["shc_maxpeaks"])
    shc = shc_all_frames(filtered_nl, n_frames, frame_size, frame_jump, nfft, p)
    pk, mr = jax.vmap(lambda s: peaks_frame(s, delta, maxpeaks, p))(shc)
    cand_pitch = jnp.where(vuv[:, None], pk, 0.0).T  # [maxpeaks, F]
    cand_merit = jnp.where(vuv[:, None], mr, 1.0).T

    voiced_mask = cand_pitch[0, :] > 0.0
    num_voiced, order, (vp, vm) = compact_by_mask(voiced_mask, cand_pitch, cand_merit)
    valid = jnp.arange(n_frames) < num_voiced

    avg_voiced = masked_mean(vp[0], valid)
    std_voiced = masked_std(vp[0], valid)

    delta1 = jnp.abs(vp - 0.8 * avg_voiced) * (3.0 - vm)
    delta1 = jnp.where(valid[None, :], delta1, INF)
    index = jnp.argmin(delta1, axis=0)
    # per-column row select/assign as one-hot masks (maxpeaks rows) instead
    # of fancy-index gathers + scatters
    index_oh = jnp.arange(vp.shape[0])[:, None] == index[None, :]  # [C, F]
    peak_minmrt = jnp.sum(jnp.where(index_oh, vp, 0.0), axis=0)
    merit_minmrt = jnp.sum(jnp.where(index_oh, vm, 0.0), axis=0)
    k_med = max(1, int(p["median_value"]) - 2)
    peak_minmrt_f = medfilt(peak_minmrt, k_med, valid_len=num_voiced)
    new_peak = jnp.where(valid, peak_minmrt_f, peak_minmrt)
    vp = jnp.where(index_oh, new_peak[None, :], vp)
    vm = jnp.where(index_oh, merit_minmrt[None, :], vm)

    # k1 = dp5_k1 * std/avg is data-dependent (yaapt.py:267), so the DP takes
    # a traced scalar weight
    weight_trans = p["dp5_k1"] * std_voiced / avg_voiced
    voiced_pitch = _dynamic5_traced(vp, vm, num_voiced, weight_trans, p["f0_min"])
    voiced_pitch = medfilt(voiced_pitch, k_med, valid_len=num_voiced)

    # fallback when too few voiced candidates (yaapt.py:274-279)
    few = num_voiced <= 2
    voiced_pitch = jnp.where(few, jnp.full_like(voiced_pitch, 150.0), voiced_pitch)

    pitch_avg = masked_mean(voiced_pitch, valid)
    pitch_std = jnp.maximum(masked_std(voiced_pitch, valid),
                            pitch_avg * p["spec_pitch_min_std"])

    spec_pitch = jnp.zeros(n_frames)
    # scatter voiced_pitch (compact) back to voiced positions
    spec_pitch = spec_pitch.at[order].set(jnp.where(valid, voiced_pitch, 0.0))
    spec_pitch = jnp.where(voiced_mask, spec_pitch, 0.0)

    spec_pitch = spec_pitch.at[0].set(
        jnp.where(spec_pitch[0] < pitch_avg / 2, pitch_avg, spec_pitch[0]))
    spec_pitch = spec_pitch.at[-1].set(
        jnp.where(spec_pitch[-1] < pitch_avg / 2, pitch_avg, spec_pitch[-1]))

    # linear RESAMPLING of the nonzero entries (yaapt.py:292-306)
    nz_mask = spec_pitch != 0
    n_nz, nz_order, (nz_vals,) = compact_by_mask(nz_mask, spec_pitch)
    nz_vals = jnp.where(jnp.arange(n_frames) < n_nz, nz_vals, 0.0)
    spec_pitch = linear_resample_compact(nz_vals, n_nz, n_frames)
    spec_pitch = spec_pitch.at[0].set(spec_pitch[2])
    spec_pitch = spec_pitch.at[1].set(spec_pitch[3])
    return spec_pitch, pitch_std


def _dynamic5_traced(pitch_array, merit_array, num_valid, k1, f0_min):
    C, T = pitch_array.shape
    local = 1.0 - merit_array
    d = jnp.abs(pitch_array[None, :, 1:] - pitch_array[:, None, :-1]) / f0_min
    d = 0.05 * d + d**2
    trans = jnp.zeros((C, C, T))
    trans = trans.at[:, :, 1:].set(k1 * d)
    local = jnp.where(jnp.arange(T)[None, :] < num_valid, local, 0.0)
    eye = jnp.eye(C)[:, :, None]
    pad_trans = jnp.where(eye > 0, 0.0, INF)
    trans = jnp.where(jnp.arange(T)[None, None, :] < num_valid, trans, pad_trans)
    path = viterbi_path(local, trans)
    path_oh = jnp.arange(C)[:, None] == path[None, :]
    return jnp.sum(jnp.where(path_oh, pitch_array, 0.0), axis=0)


# ---------------------------------------------------------------------------
# NCCF time track (yaapt.py:577-729)
# ---------------------------------------------------------------------------


def time_track(filtered: jnp.ndarray, spec_pitch, pitch_std, energy, vuv,
               n_frames_total: int, frame_jump: int, signal_len: int,
               p: Dict[str, float]):
    fs = p["sr"]
    tda_frame_length = int(p["tda_frame_length"] * fs / 1000)
    tda_noverlap = tda_frame_length - frame_jump
    tda_nframes = int((signal_len - tda_noverlap) / frame_jump)
    len_spectral = n_frames_total
    tda_nframes = min(tda_nframes, len_spectral)
    spec_pitch_t = spec_pitch[:tda_nframes]

    merit_boost = p["merit_boost"]
    maxcands = int(p["nccf_maxcands"])
    freq_thresh = 5.0 * pitch_std

    lo = jnp.maximum(spec_pitch_t - 2.0 * pitch_std, p["f0_min"])
    hi = jnp.minimum(spec_pitch_t + 2.0 * pitch_std, p["f0_max"])

    pw_half = int(math.floor(p["nccf_pwidth"] / 2.0))
    lag_min_f = jnp.floor(fs / hi).astype(jnp.int32) - pw_half  # [F]
    lag_max_f = jnp.floor(fs / lo).astype(jnp.int32) + pw_half

    # static global bounds
    glag_min = int(math.floor(fs / p["f0_max"])) - pw_half  # smallest possible
    glag_max = int(math.floor(fs / p["f0_min"])) + pw_half

    frames = frame_strided(filtered, tda_nframes, tda_frame_length, frame_jump)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    data_len = tda_frame_length
    # cumulative sums enable per-frame dynamic window length N = data_len - lag_max
    # numerator(k, N) = sum_{t<N} x[t] x[t+k]
    # denom(k, N) = (sum_{t<N} x[t+k]^2) * (sum_{t<N} x[t]^2)
    ks = np.arange(glag_min, glag_max)  # lag values
    K = len(ks)
    t_idx = np.arange(data_len - glag_min)  # max window length across lags

    x = frames  # [F, L]
    sq = x**2
    cs_sq = jnp.cumsum(sq, axis=-1)  # prefix sums of x^2

    # fully vectorized over lags: prod[f, k, t] = x[f, t] * x[f, t+k]
    # (masked for t >= L-k), one cumsum, then per-frame gathers at the
    # dynamic window length N = L - lag_max(frame).
    N_f = data_len - lag_max_f  # [F] dynamic
    Ns = jnp.clip(N_f, 1, None)
    ks_j = jnp.asarray(ks)  # [K]
    t_j = jnp.arange(data_len)  # [L]
    # numerator(k, N_f) = sum_{t < N_f} x[t] x[t+k]: a cross-correlation of
    # the N_f-masked signal against the full frame. One FFT per frame
    # replaces the [F, K, L] product+cumsum monster (which dominated the
    # whole anonymization device profile at ~40 ms/batch per track).
    mask = (t_j[None, :] < Ns[:, None]).astype(x.dtype)
    xm = x * mask
    nfft_corr = 1 << int(np.ceil(np.log2(data_len + glag_max + 1)))
    # num[k] = sum_{t<N} x[t] x[t+k]; sum_sq_shift[k] = sum_{t<N} x[t+k]^2 —
    # both are banded linear correlations (vs x and vs x^2), evaluated as
    # MXU matmuls instead of the 6 XLA FFT custom calls they used to be
    # (each rfft/irfft on [64k, 1024] costs ~23 ms on a v5e; see
    # banded_corr_pairs)
    num, sum_sq_shift = banded_corr_pairs(
        [x, xm, mask, sq], [(1, 0), (2, 3)], nfft_corr,
        int(ks[0]), int(ks[-1]) + 1)
    n_idx = jnp.clip(Ns - 1, 0, data_len - 1)  # [F]
    # cs_sq[n_idx] as a one-hot reduction (take_along_axis gathers are slow
    # TPU custom calls: measured ~224 ms for a [64k, 230] dynamic gather)
    p_energy = jnp.sum(cs_sq * (t_j[None, :] == n_idx[:, None]), axis=1,
                       keepdims=True)  # [F, 1]
    denom = sum_sq_shift * p_energy
    phi = num / jnp.sqrt(jnp.maximum(denom, 1e-30))  # [F, K] at lags ks

    # per-frame valid lag range [lag_min_f, lag_max_f) (phi[lag_min:lag_max])
    lag_axis = jnp.asarray(ks)
    in_range = (lag_axis[None, :] >= lag_min_f[:, None]) & (lag_axis[None, :] < lag_max_f[:, None])
    phi_m = jnp.where(in_range, phi, 0.0)

    # cmp_rate (yaapt.py:609-673): candidate peaks in
    # [lag_min+center, lag_max-center]; due to nonzero()[0] only the FIRST
    # peak matters.
    center = pw_half
    d0 = phi_m
    left = jnp.pad(d0, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(d0, ((0, 0), (0, 1)))[:, 1:]
    peak_band = ((lag_axis[None, :] >= lag_min_f[:, None] + center)
                 & (lag_axis[None, :] <= lag_max_f[:, None] - center))
    is_peak = (d0 > left) & (d0 > right) & (d0 > p["nccf_thresh1"]) & peak_band
    any_peak = jnp.any(is_peak, axis=1)
    first_peak = jnp.argmax(is_peak, axis=1)  # index into ks of first peak
    first_lag = first_peak + glag_min  # ks is a contiguous arange
    phi_max = jnp.max(phi_m, axis=1)

    # branch A: phi_max > thresh2 -> candidate = first peak
    # branch B: else -> same single peak but only if centered-argmax holds.
    # The centered check reads phi_m windows at the (dynamic) first_peak
    # column with index clipping; per-row take_along_axis gathers are slow
    # TPU custom calls, so compute sliding-window maxes once (edge padding
    # reproduces the index-clip semantics exactly: clipped indices re-read
    # the edge element) and select rows with a one-hot masked sum.
    F_rows = phi_m.shape[0]
    fp_oh = jnp.arange(K)[None, :] == first_peak[:, None]  # [F, K]
    d_peak = jnp.sum(jnp.where(fp_oh, phi_m, 0.0), axis=1)
    pad_l = jnp.concatenate(
        [jnp.broadcast_to(phi_m[:, :1], (F_rows, center)), phi_m], axis=1)
    lmax = jax.lax.reduce_window(pad_l, -jnp.inf, jax.lax.max,
                                 (1, center), (1, 1), "VALID")[:, :K]
    pad_r = jnp.concatenate(
        [phi_m, jnp.broadcast_to(phi_m[:, -1:], (F_rows, center))], axis=1)
    rmax = jax.lax.reduce_window(pad_r, -jnp.inf, jax.lax.max,
                                 (1, center), (1, 1), "VALID")[:, 1 : K + 1]
    left_max = jnp.sum(jnp.where(fp_oh, lmax, 0.0), axis=1)
    right_max = jnp.sum(jnp.where(fp_oh, rmax, 0.0), axis=1)
    centered = (d_peak > left_max) & (d_peak >= right_max)

    useA = any_peak & (phi_max > p["nccf_thresh2"])
    useB = any_peak & (~(phi_max > p["nccf_thresh2"])) & centered
    pitch0 = jnp.where(useA | useB, fs / (first_lag.astype(jnp.float32) + 1.0), 0.0)
    merit0 = jnp.where(useA | useB, d_peak, 0.0)
    # normalization: merit /= max(merit) if > 1 (single candidate: cap at 1)
    merit0 = jnp.where(merit0 > 1.0, 1.0, merit0)

    time_pitch = jnp.zeros((maxcands, tda_nframes))
    time_merit = jnp.zeros((maxcands, tda_nframes))
    time_pitch = time_pitch.at[0].set(pitch0)
    time_merit = time_merit.at[0].set(merit0)

    diff = jnp.abs(time_pitch - spec_pitch_t[None, :])
    match1 = diff < freq_thresh
    match = (1.0 - diff / freq_thresh) * match1
    time_merit = (1.0 + merit_boost) * time_merit * match
    # pad to full length (yaapt.py:917-928)
    pad = n_frames_total - tda_nframes
    if pad > 0:
        time_pitch = jnp.pad(time_pitch, ((0, 0), (0, pad)))
        time_merit = jnp.pad(time_merit, ((0, 0), (0, pad)))
    return time_pitch, time_merit


# ---------------------------------------------------------------------------
# refine + final dynamic (yaapt.py:321-370, 732-784)
# ---------------------------------------------------------------------------


def refine(tp1, tm1, tp2, tm2, spec_pitch, energy, vuv, p: Dict[str, float]):
    n_frames = tp1.shape[1]
    time_pitch = jnp.concatenate([tp1, tp2], axis=0)
    time_merit = jnp.concatenate([tm1, tm2], axis=0)
    maxcands = time_pitch.shape[0]

    idx = jnp.argsort(-time_merit, axis=0, stable=True)
    time_merit = jnp.flip(jnp.sort(time_merit, axis=0), axis=0)
    # pitch reordered by the merit sort without take_along_axis (per-column
    # dynamic gathers are slow TPU custom calls; maxcands is 6, so the
    # one-hot select is 36 fused elementwise ops per frame)
    idx_oh = idx[:, None, :] == jnp.arange(maxcands)[None, :, None]
    time_pitch = jnp.sum(jnp.where(idx_oh, time_pitch[None, :, :], 0.0), axis=1)

    best_pitch = medfilt(time_pitch[0], int(p["median_value"])) * vuv

    idx1 = energy <= p["nlfer_thresh2"]
    idx2 = (energy > p["nlfer_thresh2"]) & (time_pitch[0] > 0)
    idx3 = (energy > p["nlfer_thresh2"]) & (time_pitch[0] <= 0)
    merit_mat = (time_pitch[1 : maxcands - 1] == 0) & idx2[None, :]
    merit_mat = jnp.concatenate(
        [jnp.zeros((1, n_frames), bool), merit_mat, jnp.zeros((1, n_frames), bool)], axis=0)

    time_pitch = jnp.where(idx1[None, :], 0.0, time_pitch)
    time_merit = jnp.where(idx1[None, :], p["merit_pivot"], time_merit)

    time_pitch = time_pitch.at[maxcands - 1].set(
        jnp.where(idx2, 0.0, time_pitch[maxcands - 1]))
    time_merit = time_merit.at[maxcands - 1].set(
        jnp.where(idx2, 1.0 - time_merit[0], time_merit[maxcands - 1]))
    time_merit = jnp.where(merit_mat, 0.0, time_merit)

    time_pitch = time_pitch.at[0].set(jnp.where(idx3, spec_pitch, time_pitch[0]))
    time_merit = time_merit.at[0].set(
        jnp.where(idx3, jnp.minimum(1.0, energy / 2.0), time_merit[0]))
    rows = jnp.arange(maxcands)[:, None]
    rest = (rows >= 1) & idx3[None, :]
    time_pitch = jnp.where(rest, 0.0, time_pitch)
    time_merit = jnp.where(rest, 1.0 - time_merit[0][None, :], time_merit)

    time_pitch = time_pitch.at[maxcands - 2].set(best_pitch)
    nzf = best_pitch > 0.0
    time_merit = time_merit.at[maxcands - 2].set(
        jnp.where(nzf, time_merit[0], 1.0 - jnp.minimum(1.0, energy / 2.0)))

    time_pitch = time_pitch.at[maxcands - 3].set(spec_pitch)
    time_merit = time_merit.at[maxcands - 3].set(energy / 5.0)
    return time_pitch, time_merit


def dynamic_final(ref_pitch, ref_merit, energy, p: Dict[str, float]):
    num_cands, n_frames = ref_pitch.shape
    best_pitch = ref_pitch[num_cands - 2]
    mean_pitch = masked_mean(best_pitch, best_pitch > 0)

    local = 1.0 - ref_merit
    r1 = jnp.zeros((num_cands, num_cands, n_frames))
    r2 = jnp.zeros((num_cands, num_cands, n_frames))
    r1 = r1.at[:, :, 1:].set(jnp.tile(ref_pitch[:, 1:][None, :, :], (num_cands, 1, 1)))
    r2 = r2.at[:, :, 1:].set(jnp.tile(ref_pitch[:, :-1][:, None, :], (1, num_cands, 1)))
    i1 = (r1 > 0) & (r2 > 0)
    i2 = ((r1 == 0) & (r2 > 0)) | ((r1 > 0) & (r2 == 0))
    i3 = (r1 == 0) & (r2 == 0)
    frame0 = jnp.arange(n_frames) == 0
    i1 = i1 & ~frame0[None, None, :]
    i2 = i2 & ~frame0[None, None, :]
    i3 = i3 & ~frame0[None, None, :]

    mat1 = jnp.abs(r1 - r2) / mean_pitch
    ben2 = jnp.concatenate([jnp.zeros(1), jnp.minimum(1.0, jnp.abs(energy[:-1] - energy[1:]))])
    ben2 = jnp.broadcast_to(ben2, (num_cands, num_cands, n_frames))

    trans = jnp.ones((num_cands, num_cands, n_frames))
    trans = jnp.where(i1, p["dp_w1"] * mat1, trans)
    trans = jnp.where(i2, p["dp_w2"] * (1.0 - ben2), trans)
    trans = jnp.where(i3, p["dp_w3"], trans)
    trans = trans / p["dp_w4"]
    # reference trans tensor is [prev?, next?, T] but path1 treats axis0 as
    # current and axis1 as previous (see yaapt.py:553-556); the tensor built
    # in dynamic() uses ref_mat1 = pitch at t (tiled over axis0) and ref_mat2
    # = pitch at t-1 (tiled over axis1), so axis0 indexes t-1 candidates,
    # axis1 indexes t candidates; path1's usage transposes this implicitly.
    # Follow the reference composition verbatim: aux = PCOST + trans[:, :, I]
    # broadcasts PCOST over axis1 (columns). To reuse viterbi_path (which
    # wants trans[next, prev, t]) pass the transpose.
    path = viterbi_path(local, jnp.transpose(trans, (1, 0, 2)))
    path_oh = jnp.arange(num_cands)[:, None] == path[None, :]
    return jnp.sum(jnp.where(path_oh, ref_pitch, 0.0), axis=0)


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------


def _merged_params(opts: Optional[Dict[str, float]]) -> Dict[str, float]:
    p = dict(DEFAULTS)
    if opts:
        if "frame_lengtht" in opts and "tda_frame_length" not in opts:
            opts = dict(opts)
            opts["tda_frame_length"] = opts.pop("frame_lengtht")
        p.update(opts)
    return p


def yaapt_single(x: jnp.ndarray, p: Dict[str, float]) -> jnp.ndarray:
    """One utterance [T] -> f0 per frame (0 = unvoiced)."""
    fs = p["sr"]
    to_pad = int(p["frame_length"] / 1000 * int(fs)) // 2
    x = jnp.pad(x, (to_pad, to_pad))
    size = x.shape[-1]

    signal_f = bandpass(x, fs, p["bp_low"], p["bp_high"])
    nonlin_f = bandpass(x**2, fs, p["bp_low"], p["bp_high"])

    nfft = int(p["fft_length"])
    frame_size = int(math.floor(p["frame_length"] * fs / 1000))
    frame_jump = int(math.floor(p["frame_space"] * fs / 1000))

    energy, vuv, n_frames = nlfer(signal_f, frame_size, frame_jump, nfft, p)
    spec_pitch, pitch_std = spec_track(nonlin_f, energy, vuv, n_frames,
                                       frame_size, frame_jump, nfft, p)
    tp1, tm1 = time_track(signal_f, spec_pitch, pitch_std, energy, vuv,
                          n_frames, frame_jump, size, p)
    tp2, tm2 = time_track(nonlin_f, spec_pitch, pitch_std, energy, vuv,
                          n_frames, frame_jump, size, p)
    ref_pitch, ref_merit = refine(tp1, tm1, tp2, tm2, spec_pitch, energy, vuv, p)
    final_pitch = dynamic_final(ref_pitch, ref_merit, energy, p)
    return final_pitch


def yaapt_batch(x: jnp.ndarray, p: Dict[str, float]) -> jnp.ndarray:
    """[B, T] -> [B, n_frames]; same math as vmap(yaapt_single) but with the
    two independent same-shape passes merged into double-width calls:
    bandpass(x) ++ bandpass(x^2) as one [2B, T] matmul set, and the two
    time_track passes (signal / nonlinear) as ONE [2B]-vmapped call, halving
    the scan-step count of the n_frames-sequential DPs.
    Measured (v5e, B=128 x 10 s, chained hard-sync, 2026-08-20): 69.9 ms vs
    68.8 ms unmerged — NEUTRAL; the [128]-wide scan steps were already
    bandwidth-dense, so [256]-wide steps cost proportionally. Kept for the
    smaller program count; outputs are bit-identical (the merge only
    re-groups vmap/batch axes). A DEFAULT-precision arm of the same A/B
    (bf16 single-pass MXU) measured 51.5 ms but corrupted the track (20.7%
    of frames differ, 0.96% voicing flips, voiced rel err p99 0.87 — octave
    flips), so MXU_PRECISION stays HIGH."""
    B = x.shape[0]
    fs = p["sr"]
    to_pad = int(p["frame_length"] / 1000 * int(fs)) // 2
    x = jnp.pad(x, ((0, 0), (to_pad, to_pad)))
    size = x.shape[-1]

    both = jnp.concatenate([x, x**2], axis=0)  # [2B, T]
    filt = bandpass(both, fs, p["bp_low"], p["bp_high"])
    signal_f, nonlin_f = filt[:B], filt[B:]

    nfft = int(p["fft_length"])
    frame_size = int(math.floor(p["frame_length"] * fs / 1000))
    frame_jump = int(math.floor(p["frame_space"] * fs / 1000))

    energy, vuv, n_frames = jax.vmap(
        lambda s: nlfer(s, frame_size, frame_jump, nfft, p),
        out_axes=(0, 0, None))(signal_f)
    spec_pitch, pitch_std = jax.vmap(
        lambda nl, e, v: spec_track(nl, e, v, n_frames, frame_size,
                                    frame_jump, nfft, p))(nonlin_f, energy, vuv)

    tile = lambda a: jnp.concatenate([a, a], axis=0)
    tp, tm = jax.vmap(
        lambda f, sp, ps, e, v: time_track(f, sp, ps, e, v, n_frames,
                                           frame_jump, size, p))(
        filt, tile(spec_pitch), tile(pitch_std), tile(energy), tile(vuv))
    tp1, tm1, tp2, tm2 = tp[:B], tm[:B], tp[B:], tm[B:]

    ref_pitch, ref_merit = jax.vmap(
        lambda *a: refine(*a, p))(tp1, tm1, tp2, tm2, spec_pitch, energy, vuv)
    return jax.vmap(lambda rp, rm, e: dynamic_final(rp, rm, e, p))(
        ref_pitch, ref_merit, energy)


@functools.partial(jax.jit, static_argnames=("opts_tuple",))
def _yaapt_jit(x: jnp.ndarray, opts_tuple) -> jnp.ndarray:
    p = dict(opts_tuple)
    if x.ndim == 1:
        return yaapt_batch(x[None], p)[0]
    return yaapt_batch(x, p)


def yaapt(x, opts: Optional[Dict[str, float]] = None) -> jnp.ndarray:
    """[B, T] (or [T]) audio -> [B, n_frames] F0 (Hz; 0 where unvoiced).

    Matches the reference entry (hifigan/yaapt.py:946-951) but runs the batch
    as one fused XLA computation instead of a python loop of single-threaded
    CPU trackers.
    """
    p = _merged_params(opts)
    return _yaapt_jit(jnp.asarray(x, dtype=jnp.float32), tuple(sorted(p.items())))
