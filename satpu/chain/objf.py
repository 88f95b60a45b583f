"""LF-MMI ("chain") objective in pure JAX.

Replaces the reference's Kaldi CUDA binding ``ComputeChainObjfAndDeriv``
(csrc/chain.cc:70-163 wrapped by chain/objf.py:19-134) with a log-semiring
forward recursion over flattened FST arc tables:

  alpha_{t+1}[dst] = logsumexp_{arcs into dst}(alpha_t[src] + w + ll_t[pdf])

- numerator: per-utterance supervision FSTs, padded/batched (arc tables from
  satpu.chain.fst.pad_graph_arrays),
- denominator: one shared graph, batched over utterances, with optional
  leaky-HMM smoothing (kaldi's leaky_hmm_coefficient; initial probs estimated
  by a power iteration like kaldi's DenominatorGraph),
- objf = num_logprob - den_logprob; the derivative wrt the network output
  (num_post - den_post) comes from JAX autodiff of the recursion, which is
  exactly the beta recursion. The xent-regularizer derivative uses numerator
  posteriors, like the reference (chain/objf.py:107-123).

TPU mapping (the round-3 device profile): XLA lowers per-arc gathers and
segment reductions to scalar-core serialized gather/scatter (~100M elem/s),
which made the den recursion ~350 ms/step at full scale. The recursion is
therefore formulated MXU-first:

- the per-arc emission gather ``ll_t[pdf[e]]`` for ALL frames is one big
  one-hot matmul outside the scan ([B*T, P] @ [P, E]),
- inside the scan, the src gather is ``alpha @ G_src`` (one-hot [S, E]) and
  the per-destination logsumexp is ``exp(scores - m) @ G_dst`` (one-hot
  [E, S]) with a stop-gradient per-frame max shift — Kaldi's own
  probability-domain-with-rescaling semantics (chain-denominator.cc), where
  mass more than ~87 nats below the frame max flushes to zero.

One-hot matmuls are exact gathers/segment-sums (each column has a single 1;
zeros contribute exactly 0 in any precision); HIGH matmul precision (bf16x3,
~2^-21 relative) carries the f32 values through the MXU. Measured at full
scale (B=16 x 3 s, 13-layer TDNNF-1024, 3280 pdfs, 1601-state/12808-arc den
graph, v5e): 470 ms/step with the gather/scatter formulation -> 30 ms/step
(35 with f32 one-hots, 51.5 at HIGHEST precision; the bf16 one-hot storage
halves the scan's HBM traffic and the 10-step objf trajectory is
bit-identical to the f32-matrix run).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fst import NEG_INF as FST_NEG_INF, Fst, GraphArrays, fst_to_arrays

NEG_INF = -1e30


_HI = jax.lax.Precision.HIGH  # bf16x3: ~f32-exact for one-hot gathers at half the pass count of HIGHEST


def _one_hot_f32(idx, depth: int, axis_first: bool):
    """[E] indices -> one-hot f32 [depth, E] (axis_first) or [E, depth].

    Works for traced jnp indices and plain numpy (numpy builds a host
    constant, which for the big shared den graph keeps the matrices out of
    the traced graph-construction path)."""
    if isinstance(idx, np.ndarray):
        E = len(idx)
        if axis_first:
            out = np.zeros((depth, E), np.float32)
            out[idx, np.arange(E)] = 1.0
        else:
            out = np.zeros((E, depth), np.float32)
            out[np.arange(E), idx] = 1.0
        return out
    oh = jax.nn.one_hot(idx, depth, dtype=jnp.float32)  # [E, depth]
    return oh.T if axis_first else oh


def _matmul_logsumexp_step(alpha, arc_score_t, G_src, G_dst):
    """One forward step: alpha [..., S] -> [..., S].

    arc_score_t [..., E] = w + ll gather, precomputed. Gathers and the
    per-destination sum run as one-hot matmuls on the MXU; the per-frame max
    shift (stop-gradient) is Kaldi's probability-domain rescale."""
    src_alpha = jnp.matmul(alpha, G_src.astype(jnp.bfloat16),
                           precision=_HI).astype(jnp.float32)  # [..., E]
    scores = src_alpha + arc_score_t
    m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
    m = jnp.where(m > NEG_INF / 2, m, 0.0)
    sums = jnp.matmul(jnp.exp(scores - m), G_dst.astype(jnp.bfloat16),
                      precision=_HI).astype(jnp.float32)  # [..., S]
    # floor must be a NORMAL f32 (denormals flush to zero -> log(0) = -inf),
    # and the result clamped: a -inf alpha would turn the next step's
    # one-hot matmul into -inf * 0 = NaN
    return jnp.maximum(jnp.log(jnp.maximum(sums, 1e-30)) + m, NEG_INF)


def fst_forward(loglikes: jnp.ndarray, arc_src, arc_dst, arc_pdf, arc_logprob,
                start_logprob, final_logprob,
                num_frames: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Log-probability of one FST over T frames. loglikes: [T, P].

    If ``num_frames`` is given (padded batching), frames >= num_frames are
    identity steps (the alpha vector is carried through unchanged).
    """
    S = start_logprob.shape[0]
    P = loglikes.shape[-1]
    T = loglikes.shape[0]
    G_src = _one_hot_f32(arc_src, S, axis_first=True)  # [S, E]
    G_dst = _one_hot_f32(arc_dst, S, axis_first=False)  # [E, S]
    G_pdf = _one_hot_f32(arc_pdf, P, axis_first=True)  # [P, E]
    # all frames' per-arc emission scores in one matmul (outside the scan)
    arc_scores = jnp.matmul(loglikes, G_pdf, precision=_HI) + arc_logprob[None, :]

    def step(alpha, inp):
        t, sc_t = inp
        new_alpha = _matmul_logsumexp_step(alpha, sc_t, G_src, G_dst)
        if num_frames is not None:
            new_alpha = jnp.where(t < num_frames, new_alpha, alpha)
        return new_alpha, None

    alpha0 = jnp.maximum(start_logprob, NEG_INF)
    alphaT, _ = jax.lax.scan(step, alpha0, (jnp.arange(T), arc_scores))
    total = jax.nn.logsumexp(jnp.maximum(alphaT + final_logprob, NEG_INF))
    return total


class DenFactored(NamedTuple):
    """Destination-factored form of a den graph (see _try_factor_den).

    Chain den graphs (phone-LM bigram through the chain topology,
    prep.make_den_fst / kaldi chain-make-den-fst) have every non-self-loop
    arc into a state carry that STATE's forward pdf, and every self-loop its
    state's self-loop pdf — so the forward step collapses to one dense
    [S, S] cross-transition matmul plus a diagonal self-loop term, with the
    per-frame emission gathers hoisted out of the scan as per-STATE one-hot
    matmuls. This replaces the per-ARC one-hot matrices ([S, E] + [E, S],
    ~82 MB read per scan step at full scale — the reason the chain step was
    HBM-bound at 16.7% MFU) with a 10 MB [S, S] matrix."""

    A_fwd: np.ndarray     # [S, S] f32: sum of exp(w) over non-self arcs src->dst
    log_self: np.ndarray  # [S] f32: log self-loop prob (NEG_INF if none)
    pdf_fwd: np.ndarray   # [S] int32: pdf of arcs entering the state (0 if none)
    pdf_self: np.ndarray  # [S] int32: pdf of the state's self-loop (0 if none)


class DenominatorGraph(NamedTuple):
    """Shared denominator HMM as flat arrays + leaky-HMM initial probs."""

    arc_src: np.ndarray
    arc_dst: np.ndarray
    arc_pdf: np.ndarray
    arc_logprob: np.ndarray
    start_logprob: np.ndarray
    final_logprob: np.ndarray
    initial_probs: np.ndarray  # [S] for leaky HMM
    num_pdfs: int
    factored: Optional[DenFactored] = None

    @classmethod
    def from_fst(cls, fst: Fst, num_pdfs: int, power_iters: int = 100) -> "DenominatorGraph":
        g = fst_to_arrays(fst)
        # kaldi estimates HMM initial probs by running the transition matrix
        # ~100 steps from the start distribution (chain/chain-den-graph.cc)
        S = g.num_states
        probs = np.exp(np.maximum(g.start_logprob, -60.0))
        probs /= probs.sum()
        trans = np.exp(g.arc_logprob)
        for _ in range(power_iters):
            nxt = np.zeros(S)
            np.add.at(nxt, g.arc_dst, probs[g.arc_src] * trans)
            s = nxt.sum()
            if s <= 0:
                break
            probs = nxt / s
        return cls(g.arc_src, g.arc_dst, g.arc_pdf, g.arc_logprob,
                   g.start_logprob, g.final_logprob, probs.astype(np.float32),
                   num_pdfs, factored=_try_factor_den(g))


def _try_factor_den(g: GraphArrays, max_dense: int = 32_000_000) -> Optional[DenFactored]:
    """Destination-factored den form, or None when the graph doesn't have the
    chain-topology property (pdf a function of (dst, is_self_loop)) or the
    dense [S, S] matrix would be too large."""
    S = g.num_states
    if S * S > max_dense or len(g.arc_src) == 0 or np.any(g.arc_pdf < 0):
        return None
    # 1. forward pdf per state from arcs src != dst (must be consistent)
    is_loop = g.arc_src == g.arc_dst
    pdf_fwd = np.full(S, -1, np.int64)
    dst, pdf = g.arc_dst[~is_loop], g.arc_pdf[~is_loop]
    pdf_fwd[dst] = pdf
    if np.any(pdf_fwd[dst] != pdf):
        return None
    # 2. loop arcs (src == dst) carrying the state's forward pdf are phone-LM
    #    self-transitions (repeated phone) — they belong on A_fwd's diagonal,
    #    since their emission is ll_fwd[dst] like any other incoming arc.
    #    The rest are topology self-loops: at most one per state.
    lm_loop = is_loop & (g.arc_pdf == pdf_fwd[g.arc_dst])
    topo_self = is_loop & ~lm_loop
    pdf_self = np.full(S, -1, np.int64)
    dst, pdf = g.arc_dst[topo_self], g.arc_pdf[topo_self]
    pdf_self[dst] = pdf
    if np.any(pdf_self[dst] != pdf):
        return None
    if np.any(np.bincount(g.arc_dst[topo_self], minlength=S) > 1):
        return None
    cross = ~is_loop | lm_loop
    A_fwd = np.zeros((S, S), np.float32)
    np.add.at(A_fwd, (g.arc_src[cross], g.arc_dst[cross]),
              np.exp(g.arc_logprob[cross]))
    log_self = np.full(S, NEG_INF, np.float32)
    log_self[g.arc_dst[topo_self]] = g.arc_logprob[topo_self]
    return DenFactored(A_fwd, log_self,
                       np.maximum(pdf_fwd, 0).astype(np.int32),
                       np.maximum(pdf_self, 0).astype(np.int32))


def _exec_platform() -> str:
    """Platform computation actually runs on: the configured default device
    wins over the backend ranking (tests route to CPU via jax_default_device
    while the axon TPU plugin still registers backend 'tpu')."""
    dev = jax.config.jax_default_device
    if dev is not None:
        # jax accepts both Device objects and platform strings here
        return dev if isinstance(dev, str) else dev.platform
    return jax.default_backend()


def _pallas_den_enabled(num_states: int) -> bool:
    """Route the factored den recursion through the Pallas FB kernels.

    DEFAULT ON when executing on TPU (SATPU_PALLAS_FB=0 opts out;
    SATPU_PALLAS_FB=1 forces it on elsewhere, where it runs the Pallas
    interpreter — slow, tests only). NOTE: the flag is read at TRACE time
    inside jitted callers (chain_objf_and_grad), so it must be set before
    the first compilation — toggling it afterwards has no effect on already
    jit-cached programs. Clean hard-synced A/B on an uncontended v5e
    (2026-08-19, 1601-state den, T=99): den fwd+grad 11.06 -> 7.30 ms at
    B=64 (1.52x) and 3.38 -> 2.98 ms at B=16 (1.13x) vs the XLA factored
    scan, values+grads matching to 1e-5 rel.
    The padded [S, S] matrix must fit VMEM alongside the streamed blocks."""
    import os

    flag = os.environ.get("SATPU_PALLAS_FB", "").strip().lower()
    if flag in ("0", "off", "false"):
        return False
    if flag not in ("1", "on", "true") and _exec_platform() != "tpu":
        return False
    s_pad = max(128, -(-num_states // 128) * 128)
    if s_pad > 1792:  # ~12.8 MB f32: A must stay VMEM-resident
        return False
    return True


def _den_forward_pallas(loglikes: jnp.ndarray, den: DenominatorGraph,
                        leaky_hmm_coefficient: float) -> jnp.ndarray:
    """Factored den recursion via the Pallas TPU FB kernels (pallas_fb.py).

    Builds the padded graph constants host-side at trace time and hoists the
    per-state emission matmuls (same math as the XLA factored branch), then
    runs the T-step recursion as one kernel per direction with the [S, S]
    matrix VMEM-resident."""
    from .pallas_fb import den_logprob_pallas

    interpret = _exec_platform() != "tpu"
    f = den.factored
    S = den.start_logprob.shape[0]
    P = loglikes.shape[-1]
    B, T = loglikes.shape[0], loglikes.shape[1]
    S_pad = max(128, -(-S // 128) * 128)
    sp = (0, S_pad - S)

    # graph tensors may be numpy (trace-time constants) OR tracers (den
    # crossing a nested-jit boundary becomes arguments), so build everything
    # with jnp ops
    G_fwd = jnp.pad(jnp.asarray(_one_hot_f32(f.pdf_fwd, P, axis_first=True),
                                jnp.float32), ((0, 0), sp))   # [P, S_pad]
    G_self = jnp.pad(jnp.asarray(_one_hot_f32(f.pdf_self, P, axis_first=True),
                                 jnp.float32), ((0, 0), sp))
    ll_fwd = jnp.matmul(loglikes, G_fwd, precision=_HI)       # [B, T, S_pad]
    ll_self = jnp.matmul(loglikes, G_self, precision=_HI)

    A = jnp.pad(jnp.asarray(f.A_fwd, jnp.float32), (sp, sp))
    log_self = jnp.pad(jnp.asarray(f.log_self, jnp.float32), sp,
                       constant_values=NEG_INF)
    log_init = jnp.pad(
        jnp.log(jnp.maximum(jnp.asarray(den.initial_probs, jnp.float32),
                            1e-20)), sp, constant_values=NEG_INF)
    final = jnp.pad(
        jnp.maximum(jnp.asarray(den.final_logprob, jnp.float32), NEG_INF),
        sp, constant_values=NEG_INF)
    start = jnp.pad(
        jnp.maximum(jnp.asarray(den.start_logprob, jnp.float32), NEG_INF),
        sp, constant_values=NEG_INF)

    B_pad = -(-B // 8) * 8
    if B_pad != B:
        pad = [(0, B_pad - B), (0, 0), (0, 0)]
        ll_fwd = jnp.pad(ll_fwd, pad)
        ll_self = jnp.pad(ll_self, pad)
    alpha0 = jnp.broadcast_to(start, (B_pad, S_pad))

    value = den_logprob_pallas(
        ll_fwd, ll_self, alpha0, jnp.asarray(A), jnp.asarray(log_self),
        jnp.asarray(log_init), jnp.asarray(final), leaky_hmm_coefficient,
        interpret=interpret)
    return value[:B]


def den_forward(loglikes: jnp.ndarray, den: DenominatorGraph,
                leaky_hmm_coefficient: float = 1e-5,
                use_factored: Optional[bool] = None) -> jnp.ndarray:
    """Batched denominator log-prob. loglikes: [B, T, P] -> [B].

    The one-hot gather/scatter matrices for the shared graph are built with
    numpy at trace time (den.* are host arrays), so they land in the program
    as constants instead of scalar-core gathers. When the graph carries a
    destination-factored form (DenFactored; true for chain-topology den
    graphs) the per-arc one-hot recursion is replaced by one dense [S, S]
    cross-transition matmul plus a diagonal self-loop term — measured 2x on
    the full-scale chain train step (HBM traffic per scan step drops from
    the ~82 MB of [S, E]/[E, S] one-hot matrices to the 10 MB [S, S])."""
    S = den.start_logprob.shape[0]
    P = loglikes.shape[-1]
    init = jnp.asarray(den.initial_probs)
    log_init = jnp.log(jnp.maximum(init, 1e-20))

    def leak(alpha):
        if leaky_hmm_coefficient <= 0:
            return alpha
        tot = jax.nn.logsumexp(alpha, axis=-1, keepdims=True)
        leaked = jnp.log(leaky_hmm_coefficient) + log_init[None, :] + tot
        return jnp.logaddexp(alpha, leaked)

    B = loglikes.shape[0]
    alpha0 = jnp.broadcast_to(jnp.maximum(den.start_logprob, NEG_INF), (B, S))

    if use_factored is None:
        use_factored = den.factored is not None
    if use_factored and _pallas_den_enabled(S):
        return _den_forward_pallas(loglikes, den, leaky_hmm_coefficient)
    if use_factored:
        f = den.factored
        # per-STATE emission scores for all frames, one one-hot matmul each
        G_fwd = _one_hot_f32(f.pdf_fwd, P, axis_first=True)   # [P, S]
        G_self = _one_hot_f32(f.pdf_self, P, axis_first=True)
        ll_fwd = jnp.matmul(loglikes, G_fwd, precision=_HI)   # [B, T, S]
        ll_self = jnp.matmul(loglikes, G_self, precision=_HI)
        A = jnp.asarray(f.A_fwd)
        log_self = jnp.asarray(f.log_self)

        def step(alpha, inp):
            llf_t, lls_t = inp
            alpha = leak(alpha)
            m = jax.lax.stop_gradient(jnp.max(alpha, axis=-1, keepdims=True))
            m = jnp.where(m > NEG_INF / 2, m, 0.0)
            sums = jnp.matmul(jnp.exp(alpha - m), A, precision=_HI)
            cross = jnp.log(jnp.maximum(sums, 1e-30)) + m + llf_t
            selfp = alpha + log_self[None, :] + lls_t
            return jnp.maximum(jnp.logaddexp(cross, selfp), NEG_INF), None

        alphaT, _ = jax.lax.scan(
            step, alpha0, (jnp.moveaxis(ll_fwd, 1, 0), jnp.moveaxis(ll_self, 1, 0)))
        alphaT = leak(alphaT)
        return jax.nn.logsumexp(
            jnp.maximum(alphaT + den.final_logprob[None, :], NEG_INF), axis=-1)

    G_src = _one_hot_f32(den.arc_src, S, axis_first=True)
    G_dst = _one_hot_f32(den.arc_dst, S, axis_first=False)
    G_pdf = _one_hot_f32(den.arc_pdf, P, axis_first=True)
    arc_w = jnp.asarray(den.arc_logprob)

    # [B, T, E] per-arc emission scores in one MXU matmul, outside the scan
    arc_scores = jnp.matmul(loglikes, G_pdf, precision=_HI) + arc_w[None, None, :]

    def step(alpha, sc_t):
        alpha = leak(alpha)
        new_alpha = _matmul_logsumexp_step(alpha, sc_t, G_src, G_dst)
        return new_alpha, None

    alphaT, _ = jax.lax.scan(step, alpha0, jnp.moveaxis(arc_scores, 1, 0))
    alphaT = leak(alphaT)
    return jax.nn.logsumexp(jnp.maximum(alphaT + den.final_logprob[None, :], NEG_INF),
                            axis=-1)


def num_forward(loglikes: jnp.ndarray, num_graphs: Dict[str, jnp.ndarray],
                num_frames: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched numerator log-prob over per-utterance padded graphs: [B]."""

    def one(ll, src, dst, pdf, w, start, final, nf):
        return fst_forward(ll, src, dst, pdf, w, start, final, num_frames=nf)

    nf = num_frames if num_frames is not None else jnp.full(
        (loglikes.shape[0],), loglikes.shape[1], jnp.int32)
    return jax.vmap(one)(loglikes, num_graphs["arc_src"], num_graphs["arc_dst"],
                         num_graphs["arc_pdf"], num_graphs["arc_logprob"],
                         num_graphs["start_logprob"], num_graphs["final_logprob"], nf)


@functools.partial(jax.jit, static_argnames=("leaky_hmm_coefficient", "l2_regularize",
                                             "xent_regularize"))
def chain_objf_and_grad(chain_out: jnp.ndarray, xent_out: Optional[jnp.ndarray],
                        num_graphs: Dict[str, jnp.ndarray], den: DenominatorGraph,
                        num_frames: Optional[jnp.ndarray] = None,
                        leaky_hmm_coefficient: float = 1e-5,
                        l2_regularize: float = 1e-4,
                        xent_regularize: float = 0.025):
    """Training objective (to MINIMIZE) + diagnostics, autodiff-ready.

    Mirrors KaldiChainObjfFunction + the loss composition in
    train_lfmmi_one_iter (chain/objf.py:325-378): objf = (num - den) summed,
    normalized by total frames; minus xent_regularize * xent objf (numerator
    posteriors as soft targets); plus l2 on the chain output.
    """
    B, T, P = chain_out.shape
    tot_frames = (jnp.sum(num_frames) if num_frames is not None else B * T).astype(jnp.float32)

    num_ll = num_forward(chain_out, num_graphs, num_frames)
    den_ll = den_forward(chain_out, den, leaky_hmm_coefficient)
    objf = jnp.sum(num_ll - den_ll)

    loss = -objf / tot_frames
    metrics = {"chain_objf": objf / tot_frames,
               "num_logprob": jnp.sum(num_ll) / tot_frames,
               "den_logprob": jnp.sum(den_ll) / tot_frames}

    if l2_regularize > 0:
        l2 = jnp.sum(chain_out**2) / tot_frames
        loss = loss + 0.5 * l2_regularize * l2
        metrics["l2"] = l2

    if xent_out is not None and xent_regularize > 0:
        # numerator posteriors = d num_logprob / d loglikes (soft targets)
        posts = jax.grad(
            lambda ll: jnp.sum(num_forward(ll, num_graphs, num_frames)))(
                jax.lax.stop_gradient(chain_out))
        xent_objf = jnp.sum(posts * xent_out) / tot_frames
        loss = loss - xent_regularize * xent_objf
        metrics["xent_objf"] = xent_objf

    return loss, metrics


def compute_chain_objf(chain_out, num_graphs, den, num_frames=None,
                       leaky_hmm_coefficient: float = 1e-5):
    """Diagnostic objf (no regularizers), like the reference's
    compute_chain_objf (chain/objf.py:396-468)."""
    num_ll = num_forward(chain_out, num_graphs, num_frames)
    den_ll = den_forward(chain_out, den, leaky_hmm_coefficient)
    tot = (jnp.sum(num_frames) if num_frames is not None
           else chain_out.shape[0] * chain_out.shape[1])
    return jnp.sum(num_ll - den_ll) / tot
