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

The scan body is dense segment-reduce work that XLA maps well to TPU; a
Pallas kernel for the arc gather/scatter is a later optimization lever.
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fst import NEG_INF as FST_NEG_INF, Fst, GraphArrays, fst_to_arrays

NEG_INF = -1e30


def _seg_logsumexp(scores: jnp.ndarray, dst: jnp.ndarray, num_states: int) -> jnp.ndarray:
    """Log-sum-exp of ``scores`` grouped by destination state."""
    m = jax.ops.segment_max(scores, dst, num_segments=num_states)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    sums = jax.ops.segment_sum(jnp.exp(scores - m_safe[dst]), dst,
                               num_segments=num_states)
    out = jnp.log(jnp.maximum(sums, 1e-38)) + m_safe
    return jnp.where(jnp.isfinite(m), out, NEG_INF)


def fst_forward(loglikes: jnp.ndarray, arc_src, arc_dst, arc_pdf, arc_logprob,
                start_logprob, final_logprob,
                num_frames: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Log-probability of one FST over T frames. loglikes: [T, P].

    If ``num_frames`` is given (padded batching), frames >= num_frames are
    identity steps (the alpha vector is carried through unchanged).
    """
    S = start_logprob.shape[0]
    T = loglikes.shape[0]

    def step(alpha, inp):
        t, ll_t = inp
        scores = alpha[arc_src] + arc_logprob + ll_t[arc_pdf]
        new_alpha = _seg_logsumexp(scores, arc_dst, S)
        if num_frames is not None:
            new_alpha = jnp.where(t < num_frames, new_alpha, alpha)
        return new_alpha, None

    alpha0 = jnp.maximum(start_logprob, NEG_INF)
    alphaT, _ = jax.lax.scan(step, alpha0, (jnp.arange(T), loglikes))
    total = jax.nn.logsumexp(jnp.maximum(alphaT + final_logprob, NEG_INF))
    return total


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
                   num_pdfs)


def den_forward(loglikes: jnp.ndarray, den: DenominatorGraph,
                leaky_hmm_coefficient: float = 1e-5) -> jnp.ndarray:
    """Batched denominator log-prob. loglikes: [B, T, P] -> [B]."""
    S = den.start_logprob.shape[0]
    arc_src = jnp.asarray(den.arc_src)
    arc_dst = jnp.asarray(den.arc_dst)
    arc_pdf = jnp.asarray(den.arc_pdf)
    arc_w = jnp.asarray(den.arc_logprob)
    init = jnp.asarray(den.initial_probs)
    log_init = jnp.log(jnp.maximum(init, 1e-20))

    def leak(alpha):
        if leaky_hmm_coefficient <= 0:
            return alpha
        tot = jax.nn.logsumexp(alpha, axis=-1, keepdims=True)
        leaked = jnp.log(leaky_hmm_coefficient) + log_init[None, :] + tot
        return jnp.logaddexp(alpha, leaked)

    def step(alpha, ll_t):
        alpha = leak(alpha)
        scores = alpha[:, arc_src] + arc_w[None, :] + jnp.take_along_axis(
            ll_t, jnp.broadcast_to(arc_pdf[None, :], (ll_t.shape[0], arc_pdf.shape[0])),
            axis=1)
        new_alpha = jax.vmap(lambda s: _seg_logsumexp(s, arc_dst, S))(scores)
        return new_alpha, None

    B = loglikes.shape[0]
    alpha0 = jnp.broadcast_to(jnp.maximum(den.start_logprob, NEG_INF), (B, S))
    alphaT, _ = jax.lax.scan(step, alpha0, jnp.moveaxis(loglikes, 1, 0))
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
