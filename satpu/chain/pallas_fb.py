"""Pallas TPU kernel for the destination-factored LF-MMI denominator
forward-backward (reference semantics: kaldi chain ComputeChainObjfAndDeriv,
csrc/chain.cc:70-163; the factored recursion is satpu.chain.objf.den_forward's
``use_factored`` branch).

Why a kernel: the den recursion is a T-step scan whose only large operand is
the loop-invariant [S, S] cross-transition matrix A (~10 MB f32 at the
full-scale 1601-state graph). XLA re-fetches A from HBM every scan step in
both the forward and the autodiff backward scan (~2 GB of redundant HBM
traffic per train step) and adds per-step loop overhead for what is otherwise
a handful of [B, S] VPU ops and one MXU matmul. Here the whole recursion runs
as ONE pallas_call per direction with:

- A resident in VMEM across all grid steps (constant block index -> the
  Pallas pipeline fetches it once),
- the per-step emission slices (ll_fwd/ll_self) streamed through
  double-buffered (1, B_TILE, S_pad) blocks,
- the backward pass implemented as the exact mechanical VJP of the forward
  recursion (same max-shift, leak and clamping semantics as the XLA path, so
  gradients match autodiff to float tolerance), recomputing the forward
  internals from the stored per-step alphas instead of saving them all.

The grid is (B_tiles, T): for each batch tile the T steps run sequentially
(the alpha carry lives in VMEM scratch, reset at t == 0), so arbitrary batch
sizes stream through a fixed VMEM footprint.

Numerics: matmuls run at HIGH precision (bf16x3, the XLA factored path's
_HI) on padded f32 blocks. Padding
states carry alpha0 = NEG_INF, A rows/cols = 0, log_self/log_init/final =
NEG_INF, which keeps them absorbing in the log-semiring (their exp-weights
are exactly 0 in every matmul term).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_VMEM_LIMIT = int(110e6)


def _split_bf16(x):
    """f32 -> (hi, lo) bf16 split with x ~= hi + lo exactly as bf16x3 does."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm3(x, A_hi, A_lo, dims):
    """bf16x3 matmul (the XLA factored path's _HI = Precision.HIGH): Mosaic
    has no HIGH lowering, so run the 3 bf16 passes explicitly — hi*hi +
    hi*lo + lo*hi with f32 accumulation. A is pre-split OUTSIDE the kernel
    (two resident bf16 matrices = the same VMEM as one f32)."""
    x_hi, x_lo = _split_bf16(x)
    out = jax.lax.dot_general(x_hi, A_hi, dims,
                              preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(x_hi, A_lo, dims,
                                    preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(x_lo, A_hi, dims,
                                    preferred_element_type=jnp.float32)
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _guard_exp(x, y):
    """exp(x - y) with 0 where y is (clamped) -inf: avoids exp(-inf + inf)."""
    safe = y > NEG_INF / 2
    return jnp.where(safe, jnp.exp(x - jnp.where(safe, y, 0.0)), 0.0)


def _leak_fwd(alpha, log_init_row, log_leak):
    """Leaky-HMM transition in log space (objf.den_forward.leak).

    Returns (leaked, lse) where lse = logsumexp(alpha) is reused by the VJP.
    log_leak is a static python float; -inf disables the leak statically.
    """
    m0 = jnp.max(alpha, axis=-1, keepdims=True)
    m0 = jnp.where(m0 > NEG_INF / 2, m0, 0.0)
    lse = jnp.log(jnp.sum(jnp.exp(alpha - m0), axis=-1, keepdims=True)) + m0
    if log_leak < NEG_INF / 2:  # leaky_hmm_coefficient == 0
        return alpha, lse
    leaked = jnp.logaddexp(alpha, log_leak + log_init_row + lse)
    return leaked, lse


def _step_core(alpha, A_hi, A_lo, log_self_row, llf_t, lls_t, log_init_row,
               log_leak):
    """One forward recursion step; returns internals needed by the VJP."""
    leaked, lse = _leak_fwd(alpha, log_init_row, log_leak)
    m = jnp.max(leaked, axis=-1, keepdims=True)
    m = jnp.where(m > NEG_INF / 2, m, 0.0)
    e = jnp.exp(leaked - m)  # leaked <= m, so this is in [0, 1]
    sums = _mm3(e, A_hi, A_lo, (((1,), (0,)), ((), ())))
    cross = jnp.log(jnp.maximum(sums, 1e-30)) + m + llf_t
    selfp = leaked + log_self_row + lls_t
    newa = jnp.maximum(jnp.logaddexp(cross, selfp), NEG_INF)
    return newa, (leaked, lse, m, e, sums, cross, selfp)


def _fwd_kernel(log_leak, alpha0_ref, llf_ref, lls_ref, A_hi_ref, A_lo_ref,
                vec_ref, out_ref, carry_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry_ref[:] = alpha0_ref[:]

    alpha = carry_ref[:]
    log_init_row = vec_ref[0:1, :]
    log_self_row = vec_ref[1:2, :]
    newa, _ = _step_core(alpha, A_hi_ref[:], A_lo_ref[:], log_self_row,
                         llf_ref[0], lls_ref[0], log_init_row, log_leak)
    carry_ref[:] = newa
    out_ref[0] = newa


def _bwd_kernel(log_leak, g_final_ref, alpha_t_ref, alpha_n_ref, llf_ref,
                lls_ref, A_hi_ref, A_lo_ref, vec_ref, dllf_ref, dlls_ref,
                g_carry_ref):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        g_carry_ref[:] = g_final_ref[:]

    g_next = g_carry_ref[:]          # dL/d alpha_{rt+1}, rt = T-1-t
    alpha = alpha_t_ref[0]           # alpha_rt (pre-leak)
    newa = alpha_n_ref[0]            # alpha_{rt+1}
    log_init_row = vec_ref[0:1, :]
    log_self_row = vec_ref[1:2, :]
    A_hi, A_lo = A_hi_ref[:], A_lo_ref[:]
    _, (leaked, lse, m, e, sums, cross, selfp) = _step_core(
        alpha, A_hi, A_lo, log_self_row, llf_ref[0], lls_ref[0],
        log_init_row, log_leak)

    # logaddexp(cross, selfp) branch weights; the maximum(lae, NEG_INF) clamp
    # passes gradient wherever it is inactive, i.e. lae > NEG_INF <=> newa >
    # NEG_INF (newa = max(lae, NEG_INF) >= NEG_INF always) — the same
    # subgradient jnp.maximum gives the XLA path's autodiff, including
    # pathologically negative lae in (-inf, NEG_INF)
    live = newa > NEG_INF
    w_cross = jnp.where(live, g_next * _guard_exp(cross, newa), 0.0)
    w_self = jnp.where(live, g_next * _guard_exp(selfp, newa), 0.0)
    dllf_ref[0] = w_cross
    dlls_ref[0] = w_self

    # cross = log(max(sums, tiny)) + m + llf   (m is stop_gradient'ed)
    d_sums = jnp.where(sums > 1e-30, w_cross / jnp.maximum(sums, 1e-30), 0.0)
    # sums = e @ A  =>  d_e[b, i] = sum_j d_sums[b, j] * A[i, j]
    d_e = _mm3(d_sums, A_hi, A_lo, (((1,), (1,)), ((), ())))
    g_leaked = e * d_e + w_self

    # leak VJP: leaked = logaddexp(alpha, k + lse), lse = logsumexp(alpha)
    g_alpha = g_leaked * _guard_exp(alpha, leaked)
    if log_leak > NEG_INF / 2:
        k = log_leak + log_init_row
        d_lse = jnp.sum(g_leaked * _guard_exp(k + lse, leaked), axis=-1,
                        keepdims=True)
        g_alpha = g_alpha + d_lse * _guard_exp(alpha, lse)
    g_carry_ref[:] = g_alpha


def _pick_b_tile(B: int) -> int:
    """Largest power-of-two tile <= 64 dividing B: bigger tiles fill more MXU
    rows per recursion matmul (M=B_tile of the 128-row systolic array), while
    64 keeps the double-buffered streamed blocks well inside VMEM next to the
    resident [S, S] matrix."""
    for cand in (64, 32, 16, 8):
        if B % cand == 0:
            return cand
    return 0  # caller pads the batch


def _final_value(alpha_T, final_logprob, log_init, log_leak):
    leaked, _ = _leak_fwd(alpha_T, log_init[None, :], log_leak)
    return jax.nn.logsumexp(
        jnp.maximum(leaked + final_logprob[None, :], NEG_INF), axis=-1)


def den_logprob_pallas(llf, lls, alpha0, A, log_self, log_init,
                       final_logprob, leaky_hmm_coefficient: float,
                       interpret: bool = False) -> jnp.ndarray:
    """Differentiable batched den log-prob via the Pallas FB kernels.

    llf/lls: [B, T, S_pad] per-state emission scores (cross / self-loop
    arcs). alpha0: [B, S_pad] start log-probs. A: [S_pad, S_pad] prob-domain
    cross-transition matrix. log_self/log_init/final_logprob: [S_pad].
    S_pad and B must be multiples of 128 and 8. Gradients flow to llf/lls
    only (the graph tensors are trace-time constants).
    """
    log_leak = (float(np.log(leaky_hmm_coefficient))
                if leaky_hmm_coefficient > 0 else 2 * NEG_INF)
    return _den_scan(llf, lls, alpha0, A, log_self, log_init, final_logprob,
                     log_leak, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _den_scan(llf, lls, alpha0, A, log_self, log_init, final_logprob,
              log_leak, interpret):
    out, _ = _den_scan_fwd(llf, lls, alpha0, A, log_self, log_init,
                           final_logprob, log_leak, interpret)
    return out


def _den_scan_fwd(llf, lls, alpha0, A, log_self, log_init, final_logprob,
                  log_leak, interpret):
    B, T, S_pad = llf.shape
    b_tile = _pick_b_tile(B)
    assert b_tile, f"batch {B} not a multiple of 8 (pad before calling)"
    nb = B // b_tile

    llf_t = jnp.moveaxis(llf, 1, 0)
    lls_t = jnp.moveaxis(lls, 1, 0)
    vec = jnp.stack([log_init, log_self])
    A_hi, A_lo = _split_bf16(A)

    blk = (1, b_tile, S_pad)
    t_blk = pl.BlockSpec(blk, lambda b, t: (t, b, 0), memory_space=pltpu.VMEM)
    a_blk = pl.BlockSpec((S_pad, S_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM)
    v_blk = pl.BlockSpec((2, S_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM)
    b_blk = pl.BlockSpec((b_tile, S_pad), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM)

    alphas = pl.pallas_call(
        functools.partial(_fwd_kernel, log_leak),
        grid=(nb, T),
        in_specs=[b_blk, t_blk, t_blk, a_blk, a_blk, v_blk],
        out_specs=t_blk,
        out_shape=jax.ShapeDtypeStruct((T, B, S_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((b_tile, S_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(alpha0, llf_t, lls_t, A_hi, A_lo, vec)

    value = _final_value(alphas[-1], final_logprob, log_init, log_leak)
    return value, (llf_t, lls_t, alphas, alpha0, A, vec, log_init,
                   final_logprob)


def _den_scan_bwd(log_leak, interpret, res, g_value):
    llf_t, lls_t, alphas, alpha0, A, vec, log_init, final_logprob = res
    T, B, S_pad = llf_t.shape
    b_tile = _pick_b_tile(B)
    nb = B // b_tile

    # gradient of the final leak + logsumexp wrt alpha_T (plain XLA, 1 step)
    _, pullback = jax.vjp(
        lambda aT: _final_value(aT, final_logprob, log_init, log_leak),
        alphas[-1])
    (g_alpha_T,) = pullback(g_value)

    # alphas_ext[t] = alpha_t (pre-leak), t = 0..T
    alphas_ext = jnp.concatenate([alpha0[None], alphas], axis=0)
    A_hi, A_lo = _split_bf16(A)

    blk = (1, b_tile, S_pad)
    rev = pl.BlockSpec(blk, lambda b, t: (T - 1 - t, b, 0),
                       memory_space=pltpu.VMEM)
    rev_n = pl.BlockSpec(blk, lambda b, t: (T - t, b, 0),
                         memory_space=pltpu.VMEM)
    a_blk = pl.BlockSpec((S_pad, S_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM)
    v_blk = pl.BlockSpec((2, S_pad), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM)
    b_blk = pl.BlockSpec((b_tile, S_pad), lambda b, t: (b, 0),
                         memory_space=pltpu.VMEM)

    dllf_t, dlls_t = pl.pallas_call(
        functools.partial(_bwd_kernel, log_leak),
        grid=(nb, T),
        in_specs=[b_blk, rev, rev_n, rev, rev, a_blk, a_blk, v_blk],
        out_specs=(rev, rev),
        out_shape=(jax.ShapeDtypeStruct((T, B, S_pad), jnp.float32),
                   jax.ShapeDtypeStruct((T, B, S_pad), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((b_tile, S_pad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(g_alpha_T, alphas_ext, alphas_ext, llf_t, lls_t, A_hi, A_lo, vec)

    dllf = jnp.moveaxis(dllf_t, 0, 1)
    dlls = jnp.moveaxis(dlls_t, 0, 1)
    zeros = [jnp.zeros_like(x) for x in
             (alpha0, A, vec[0] * 0, log_init, final_logprob)]
    # non-diff cotangents for (alpha0, A, log_self, log_init, final_logprob)
    return (dllf, dlls, zeros[0], zeros[1], zeros[2], zeros[3], zeros[4])


_den_scan.defvjp(_den_scan_fwd, _den_scan_bwd)
