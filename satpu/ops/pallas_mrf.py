"""Fused HiFi-GAN MRF (multi-receptive-field) stage as a Pallas TPU kernel.

Serving-path replacement for the generator's ResBlock groups
(reference satools/satools/hifigan/nn.py:93-187 ResBlock1 and
archi.py:62-71, the ``sum(resblocks(x)) / num_kernels`` loop).

Why: a device trace of the B=128 x 10 s anonymize dispatch shows the five
MRF stages cost ~168 ms of the 277 ms device time, at 10-20% of peak — each
of the 18 convolutions per stage round-trips its [B, T, C] activation
(655 MB at bf16) through HBM, and the C<=256 channel widths underfill the
MXU no matter how XLA tiles them. This kernel computes an entire resblock
group per (batch row, time block) with the input fetched ONCE (plus two
HALO-sized edge blocks) and ONE output write; every intermediate lives in
VMEM, the 126 weight taps stay resident across the whole grid, and each tap
is a [T_blk, C] x [C, C] MXU matmul.

Semantics (golden-tested against the XLA module path in
tests/test_pallas_mrf.py): for each kernel size k_r with dilations d_i,

    x_r = x0
    for i in range(3):
        t = conv_{k_r, d_i}(leaky_relu(x_r)); t = conv_{k_r, 1}(leaky_relu(t))
        x_r = x_r + t
    out = sum_r(x_r) / num_kernels

Every convolution 'same'-zero-pads ITS OWN input at the sequence edges
(torch Conv1d semantics), so each conv output is re-masked to zero outside
[0, T). Block halos are assembled from two extra pipelined edge blocks with
edge-clamped index maps; the clamped duplicates at the sequence ends land
only on masked rows. Shifted taps use zero-fill static slices (Mosaic has
no bf16 rotate); the fill lands only in the halo, inside the mask.

Mosaic notes baked in below: no bf16 cmpf/select (leaky-relu compares in
f32, masks are multiplicative), VMEM limit raised to 100 MB like the FB den
kernel (the 16 MB default OOMs on the 256-channel stage's weights).

Forward-only: the serving/eval path flips ``CoreHifiGanConfig.fused_mrf``;
training keeps the XLA module path (which autodiffs normally).
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1
# halo per side: cumulative 'same' padding of the deepest resblock chain
# (k=11: 3 units x (d=5 pad 25 + d=1 pad 5) = 90), rounded up so the edge
# blocks tile cleanly (t_blk is a multiple of HALO)
HALO = 128
# v5e VMEM is far larger than Mosaic's 16 MB default scoped limit; the FB
# den kernel (chain/pallas_fb.py) ships at 110 MB on this chip
_VMEM_LIMIT = int(100e6)


def _exec_platform() -> str:
    dev = jax.config.jax_default_device
    if dev is not None:
        if isinstance(dev, str):
            return dev.split(":")[0]  # "tpu:0" -> "tpu"
        return dev.platform
    return jax.default_backend()


def serving_fused_mrf_default() -> bool:
    """Whether SERVING entry points (anonymize pipeline, bench) should flip
    ``CoreHifiGanConfig.fused_mrf``. The kernel is forward-only, so the model
    itself can never auto-enable it (training shares CoreHifiGan); instead the
    inference callers ask here. Read at model-BUILD time, before jit tracing.

    Default OFF everywhere: a hard-synced A/B on a v5e chip (2026-08-20,
    both arms cold-compiled, flagship pipeline) measured the XLA module path
    at 2137 a-s/s @ B=32 / ~4557 @ B=128 vs this kernel's 1028 @ B=32 /
    1067 @ B=128 — the kernel's throughput is batch-insensitive (its grid
    serializes and never fills the chip), a 2-4x LOSS vs letting XLA tile
    the resblock convolutions. SATPU_PALLAS_MRF=1 force-enables it
    (tests / future re-measurement); any other non-empty value is an error
    so a typo'd opt-in/out can't be silently ignored."""
    import os

    flag = os.environ.get("SATPU_PALLAS_MRF", "").strip().lower()
    if flag in ("", "0", "off", "false"):
        return False
    if flag in ("1", "on", "true"):
        return True
    raise ValueError(
        f"SATPU_PALLAS_MRF={flag!r} not recognized; use 1/on/true or 0/off/false")


def _leaky(x):
    # compare in f32: Mosaic has no bf16 cmpf ("Target does not support this
    # comparison"); two VPU casts are cheap
    x32 = x.astype(jnp.float32)
    return jnp.where(x32 > 0, x32, LRELU_SLOPE * x32).astype(x.dtype)


def _stage_vmem_bytes(C: int, kernel_sizes: Sequence[int], n_units: int,
                      t_pad: int) -> int:
    taps = sum(2 * n_units * k for k in kernel_sizes)
    w = taps * C * C * 2                     # bf16 weights
    bufs = 8 * t_pad * max(C, 128) * 4       # working set (lane-padded)
    return w + bufs


def _mrf_kernel(*refs, n_units: int, kernel_sizes: Tuple[int, ...],
                dilations: Tuple[Tuple[int, ...], ...], t_blk: int,
                inv_n: float, T_total: int):
    """refs = (x_prev, x_cur, x_next), then per-resblock (w1, b1, w2, b2)
    for each kernel size, then out_ref.

    x_prev/x_next: [1, HALO, C]; x_cur: [1, t_blk, C].
    w1/w2: [n_units, k, C, C] bf16 (tap-major, [k][in][out]); b1/b2:
    [n_units, C] f32.
    """
    x_prev, x_cur, x_next = refs[0], refs[1], refs[2]
    out_ref = refs[3 + 4 * len(kernel_sizes)]
    t = pl.program_id(0)
    t_pad = t_blk + 2 * HALO

    # sequence-position mask: rows of the assembled buffer outside [0, T)
    # (leading/trailing zero pad, edge-clamped halo duplicates, tail
    # rounding) must read as zero for every intermediate
    g = (jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
         + (t * t_blk - HALO))
    validf = jnp.logical_and(g >= 0, g < T_total).astype(jnp.float32)

    x0 = jnp.concatenate([x_prev[0], x_cur[0], x_next[0]], axis=0)
    x0 = (x0.astype(jnp.float32) * validf).astype(x0.dtype)

    def shift(x, delta):
        # static zero-fill shift: shifted[t] = x[t + delta] (0 past the
        # buffer). Mosaic has no bf16 rotate ("Rotate with non-32-bit
        # data"); the fill only lands in the halo (|delta| <= HALO), which
        # the valid-mask re-zeroes anyway.
        z = jnp.zeros((abs(delta), x.shape[1]), x.dtype)
        if delta > 0:
            return jnp.concatenate([x[delta:], z], axis=0)
        return jnp.concatenate([z, x[:delta]], axis=0)

    def conv(x, w_ref, b_ref, unit, k, d):
        # 'same' conv over time as k shifted [t_pad, C] x [C, C] matmuls
        acc = None
        for j in range(k):
            delta = (j - (k - 1) // 2) * d
            xs = shift(x, delta) if delta else x
            p = jnp.dot(xs, w_ref[unit, j], preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        return ((acc + b_ref[unit][None, :]) * validf).astype(x.dtype)

    acc = None
    for r, k in enumerate(kernel_sizes):
        w1, b1, w2, b2 = refs[3 + 4 * r:3 + 4 * r + 4]
        x = x0
        for i in range(n_units):
            xt = conv(_leaky(x), w1, b1, i, k, dilations[r][i])
            xt = conv(_leaky(xt), w2, b2, i, k, 1)
            x = x + xt
        acc = x if acc is None else acc + x
    out = acc[HALO:HALO + t_blk, :]
    if inv_n != 1.0:
        out = (out.astype(jnp.float32) * inv_n).astype(out.dtype)
    out_ref[0] = out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_t_blk(T: int) -> int:
    """Tile/HALO-aligned time block <= ~4k minimizing tail padding."""
    n_t = max(1, -(-T // 4096))
    return _round_up(-(-T // n_t), HALO)


@functools.partial(jax.jit, static_argnames=("kernel_sizes", "dilations",
                                             "scale_by", "interpret"))
def mrf_group(x: jnp.ndarray, weights, kernel_sizes: Tuple[int, ...],
              dilations: Tuple[Tuple[int, ...], ...],
              scale_by: float = 1.0, interpret: bool = False) -> jnp.ndarray:
    """Run one (sub)group of resblocks fused: returns
    ``sum_r resblock_r(x) * scale_by``.

    x: [B, T, C] bf16 (the serving compute dtype). weights: per resblock r a
    tuple (W1 [n_units, k, C, C], B1 [n_units, C], W2, B2) with W in
    tap-major [k][C_in][C_out] layout (bf16), biases f32.
    """
    B, T, C = x.shape
    n_units = len(dilations[0])

    t_blk = _pick_t_blk(T)
    t_round = _round_up(T, t_blk)
    n_t = t_round // t_blk
    xp = jnp.pad(x, ((0, 0), (0, t_round - T), (0, 0)))

    R = t_blk // HALO          # halo blocks per time block
    M = t_round // HALO        # total halo-block rows

    in_specs = [
        pl.BlockSpec((1, HALO, C),
                     lambda t, b: (b, jnp.maximum(t * R - 1, 0), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t_blk, C), lambda t, b: (b, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, HALO, C),
                     lambda t, b: (b, jnp.minimum((t + 1) * R, M - 1), 0),
                     memory_space=pltpu.VMEM),
    ]
    flat = []
    for (w1, b1, w2, b2) in weights:
        for a in (w1.astype(jnp.bfloat16), b1.astype(jnp.float32),
                  w2.astype(jnp.bfloat16), b2.astype(jnp.float32)):
            flat.append(a)
            in_specs.append(pl.BlockSpec(
                a.shape, lambda *_, s=len(a.shape): (0,) * s,
                memory_space=pltpu.VMEM))

    kern = functools.partial(
        _mrf_kernel, n_units=n_units, kernel_sizes=tuple(kernel_sizes),
        dilations=tuple(tuple(d) for d in dilations), t_blk=t_blk,
        inv_n=float(scale_by), T_total=T)
    out = pl.pallas_call(
        kern,
        grid=(n_t, B),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t_blk, C), lambda t, b: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_round, C), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, xp, xp, *flat)
    return out[:, :T, :]


def mrf_stage(x: jnp.ndarray, weights, kernel_sizes: Sequence[int],
              dilations: Sequence[Sequence[int]]) -> jnp.ndarray:
    """Full MRF stage: mean over resblocks, auto-split when the stage's
    weights + working set would overflow VMEM.

    Splitting runs one pallas_call per resblock and lets XLA do the average;
    the fused 3-resblock call is used whenever it fits.
    """
    B, T, C = x.shape
    n = len(kernel_sizes)
    n_units = len(dilations[0])
    interpret = _exec_platform() != "tpu"
    if _stage_vmem_bytes(C, kernel_sizes, n_units,
                         _pick_t_blk(T) + 2 * HALO) < 64 << 20:
        return mrf_group(x, tuple(weights), tuple(kernel_sizes),
                         tuple(tuple(d) for d in dilations),
                         scale_by=1.0 / n, interpret=interpret)
    parts = [mrf_group(x, (weights[r],), (kernel_sizes[r],),
                       (tuple(dilations[r]),), interpret=interpret)
             for r in range(n)]
    acc = parts[0]
    for p in parts[1:]:
        acc = acc + p
    return acc / n
