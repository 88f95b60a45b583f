"""Online Natural Gradient preconditioning (NG-SGD).

Rebuild of Kaldi's ``OnlineNaturalGradient`` used by the reference through
csrc/nnet3.cc precondition_directions + chain/objf.py:147-228
(OnlineNaturalGradient autograd Function): the low-rank online Fisher
estimate from Povey, Zhang & Khudanpur, "Parallel training of DNNs with
natural gradient and parameter averaging" (ICLR 2015 workshop).

State per preconditioner: an R-rank eigenbasis W [R, D] with eigenvalues d
[R], remainder eigenvalue rho, and a step count. ``precondition_directions``
multiplies row vectors X [N, D] by (F + beta I)^-1 (Woodbury) with the
trace-preserving rescale gamma, and updates the subspace with an
eta-weighted SVD merge (eta = N / num_samples_history), the paper's update.

Defaults follow Kaldi/the reference: alpha=4.0, num_samples_history=2000,
update_period=4 (chain/nn.py:24-35 NGState).

Like the reference, the bias column is appended to the input rows (the
backward pass preconditions [X; 1] and the grad-output rows separately and
rescales the weight/bias gradients; chain/objf.py:181-228).
"""
from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class NGState(NamedTuple):
    W: jnp.ndarray  # [R, D] orthonormal basis
    d: jnp.ndarray  # [R] eigenvalues
    rho: jnp.ndarray  # scalar remainder eigenvalue
    t: jnp.ndarray  # int32 step count
    alpha: float = 4.0
    num_samples_history: float = 2000.0
    update_period: int = 4


def ng_init(dim: int, rank: int = None, alpha: float = 4.0,
            num_samples_history: float = 2000.0, update_period: int = 4) -> NGState:
    """Kaldi default rank: min(40, dim // 2) (nnet3 default 40/80 heuristics)."""
    if rank is None:
        rank = max(1, min(40, dim // 2))
    key = jax.random.PRNGKey(0)
    W = jnp.linalg.qr(jax.random.normal(key, (dim, rank)))[0].T  # [R, D]
    return NGState(W=W, d=jnp.ones((rank,)) * 0.1, rho=jnp.asarray(0.1),
                   t=jnp.zeros((), jnp.int32), alpha=alpha,
                   num_samples_history=num_samples_history,
                   update_period=update_period)


def _precondition(X: jnp.ndarray, state: NGState) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """X [N, D] -> (X_hat, gamma). X_hat = gamma * X (F + beta I)^-1."""
    W, d, rho = state.W, state.d, state.rho
    D = X.shape[1]
    R = W.shape[0]
    tr_F = jnp.sum(d) + rho * (D - R)
    beta = state.alpha * tr_F / D + 1e-20
    inv_rest = 1.0 / (rho + beta)
    proj = X @ W.T  # [N, R]
    scale_diff = (1.0 / (d + beta)) - inv_rest  # [R]
    X_hat = X * inv_rest + (proj * scale_diff[None, :]) @ W
    num = jnp.sum(X * X)
    den = jnp.sum(X_hat * X_hat)
    gamma = jnp.sqrt(jnp.maximum(num, 1e-20) / jnp.maximum(den, 1e-20))
    return X_hat * gamma, gamma


def _update_subspace(X: jnp.ndarray, state: NGState) -> NGState:
    """eta-weighted merge of the minibatch covariance into (W, d, rho).

    Kaldi-style Krylov restriction (the paper's update, Povey et al. 2015 /
    kaldi natural-gradient-online.cc): instead of eigendecomposing a gram of
    stacked sample rows, project the updated Fisher estimate

        F = (1-eta) (W^T diag(d) W + rho (I - W^T W)) + (eta/n) X^T X

    onto the 2R-dimensional subspace span(W^T, (X^T X) W^T), where the
    projected matrix is exactly

        M = (1-eta) blockdiag(diag(d), rho I) + (eta/n) (X B^T)^T (X B^T)

    for an orthonormal basis B = [W; Q]. ALL N minibatch rows enter through
    X^T X (no subsampling), the eigh is a fixed [2R, 2R] (80x80 at Kaldi's
    default rank 40), and every heavy op is an MXU matmul — the earlier
    stacked-row gram eigh cost ~20 ms/step amortized over the 26
    preconditioners of a 13-layer TDNNF (hard-synced, v5e).
    """
    W, d, rho = state.W, state.d, state.rho
    N, D = X.shape
    R = W.shape[0]
    eta = jnp.clip(N / state.num_samples_history, 1e-3, 0.9)

    # Basis construction runs at HIGHEST matmul precision: on TPU the default
    # single-pass bf16 degrades W's row orthonormality to ~0.5-1% while
    # _precondition's Woodbury form assumes orthonormal W; the shapes are
    # small fixed [R,D]/[R,R], so full precision is effectively free.
    hi = jax.lax.Precision.HIGHEST
    P = jnp.matmul(X, W.T, precision=hi)        # [N, R]
    J = jnp.matmul(P.T, X, precision=hi) / N    # [R, D] = W (X^T X)/N
    # orthonormal complement of rowspan(J) against W
    J_perp = J - jnp.matmul(jnp.matmul(J, W.T, precision=hi), W, precision=hi)
    Gp = jnp.matmul(J_perp, J_perp.T, precision=hi)  # [R, R]
    e, Ug = jnp.linalg.eigh(Gp)
    eps = jnp.maximum(jnp.max(e), 1e-20) * 1e-8
    inv_sqrt = jnp.where(e > eps, 1.0 / jnp.sqrt(jnp.maximum(e, eps)), 0.0)
    Q = jnp.matmul((Ug * inv_sqrt[None, :]).T, J_perp,
                   precision=hi)                # [R, D] orthonormal-or-zero rows
    B = jnp.concatenate([W, Q], axis=0)         # [2R, D]

    C = jnp.matmul(X, B.T, precision=hi)        # [N, 2R]
    M = (eta / N) * jnp.matmul(C.T, C, precision=hi)
    M = M + (1.0 - eta) * jnp.diag(jnp.concatenate([d, jnp.full((R,), rho)]))

    lam, U = jnp.linalg.eigh(M)                 # ascending
    idx = jnp.argsort(-lam)[:R]
    d_new = jnp.maximum(lam[idx], 1e-10)
    W_new = jnp.matmul(U[:, idx].T, B, precision=hi)  # [R, D] orthonormal rows

    tr_F = (1.0 - eta) * (jnp.sum(d) + rho * (D - R)) + eta * jnp.sum(X * X) / N
    rho_new = jnp.maximum((tr_F - jnp.sum(d_new)) / jnp.maximum(D - R, 1), 1e-10)
    return state._replace(W=W_new, d=d_new, rho=rho_new)


def precondition_directions(state: NGState, X: jnp.ndarray) -> Tuple[NGState, jnp.ndarray, jnp.ndarray]:
    """Kaldi PreconditionDirections: returns (new_state, X_hat, scale).

    The subspace update runs every ``update_period`` calls (NGState default 4,
    chain/nn.py:28); preconditioning always applies.
    """
    X_hat, gamma = _precondition(X, state)
    do_update = (state.t % state.update_period) == 0

    def upd(s):
        return _update_subspace(X, s)

    new_state = jax.lax.cond(do_update, upd, lambda s: s, state)
    new_state = new_state._replace(t=state.t + 1)
    return new_state, X_hat, gamma


def ng_precondition_grad(state_in: NGState, state_out: NGState,
                         inputs: jnp.ndarray, grad_output: jnp.ndarray,
                         compute_dtype: str = "float32"):
    """The reference backward composition (chain/objf.py:181-228):

    inputs [N, D_in] (WITHOUT bias column; it is appended here),
    grad_output [N, D_out]. Returns
    (new_state_in, new_state_out, grad_weight [D_out, D_in], grad_bias [D_out]).
    compute_dtype="bfloat16" runs the big [N]-contracted grad_weight matmul
    as bf16 MXU with f32 accumulation; the Fisher-basis updates inside
    precondition_directions stay f32/HIGHEST (precision-sensitive).
    """
    N = inputs.shape[0]
    X = jnp.concatenate([inputs, jnp.ones((N, 1), inputs.dtype)], axis=1)
    state_in, X_hat, in_scale = precondition_directions(state_in, X)
    state_out, G_hat, out_scale = precondition_directions(state_out, grad_output)
    # X_hat/G_hat already carry gamma (= in_scale / out_scale) folded in; the
    # reference multiplies grad_output AND the final grads by
    # in_scale*out_scale on top of the preconditioned matrices
    # (chain/objf.py:221-227), i.e. an effective (in_scale*out_scale)^2 on the
    # raw product — mirrored here for training parity.
    scale = in_scale * out_scale
    grad_weight = _mm(G_hat.T, X_hat[:, :-1], compute_dtype) * scale
    grad_bias = (G_hat.T @ X_hat[:, -1]) * scale
    return state_in, state_out, grad_weight, grad_bias


# ---------------------------------------------------------------------------
# NG-SGD inside the training graph: a custom_vjp affine whose backward
# preconditions the weight/bias gradients AND emits the updated preconditioner
# states as the cotangent of the state inputs. The train step differentiates
# the loss w.r.t. (params, ng_states); the "gradient" of the ng_states slot IS
# the new state — a pure-functional rendering of the reference's stateful
# autograd.Function (chain/objf.py:147-228) that stays jit/SPMD-friendly.
# ---------------------------------------------------------------------------


def ng_init_arrays(dim: int, rank: int = None) -> Dict[str, jnp.ndarray]:
    """Arrays-only NGState (float32 throughout, ``t`` included so the whole
    dict can ride a gradient pytree)."""
    s = ng_init(dim, rank=rank)
    return {"W": s.W.astype(jnp.float32), "d": s.d.astype(jnp.float32),
            "rho": jnp.asarray(s.rho, jnp.float32),
            "t": jnp.zeros((), jnp.float32)}


def _state_from_arrays(a: Dict[str, jnp.ndarray], hyper) -> NGState:
    alpha, nsh, period = hyper[:3]
    return NGState(W=a["W"], d=a["d"], rho=a["rho"],
                   t=a["t"].astype(jnp.int32), alpha=alpha,
                   num_samples_history=nsh, update_period=period)


def _arrays_from_state(s: NGState) -> Dict[str, jnp.ndarray]:
    return {"W": s.W, "d": s.d, "rho": jnp.asarray(s.rho, jnp.float32),
            "t": s.t.astype(jnp.float32)}


def _mm(a, b, compute_dtype: str):
    """a @ b; bf16 MXU inputs with f32 accumulation when requested."""
    if compute_dtype == "bfloat16":
        return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return a @ b


def _hyper_dtype(hyper) -> str:
    return hyper[3] if len(hyper) > 3 else "float32"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def nat_affine(x2d, weight, bias, in_state, out_state, hyper=(4.0, 2000.0, 4)):
    """y = x2d @ weight.T + bias with NG-SGD-preconditioned weight gradients.

    x2d [N, D_in]; weight [D_out, D_in] (torch layout); bias [1, D_out];
    in_state/out_state: ng_init_arrays dicts (in_state dim = D_in + 1).
    The cotangents returned for in_state/out_state are the UPDATED states.
    hyper is static: (alpha, num_samples_history, update_period[, dtype]) —
    the optional 4th element "bfloat16" runs the three big matmuls (forward,
    grad_x, grad_weight) as bf16 MXU with f32 accumulation.
    """
    return _mm(x2d, weight.T, _hyper_dtype(hyper)) + bias[0]


def _nat_affine_fwd(x2d, weight, bias, in_state, out_state, hyper):
    y = _mm(x2d, weight.T, _hyper_dtype(hyper)) + bias[0]
    return y, (x2d, weight, in_state, out_state)


def _nat_affine_bwd(hyper, res, g):
    x2d, weight, in_arrays, out_arrays = res
    dt = _hyper_dtype(hyper)
    grad_x = _mm(g, weight, dt)  # from the RAW grad, before preconditioning (objf.py:205-208)
    s_in = _state_from_arrays(in_arrays, hyper)
    s_out = _state_from_arrays(out_arrays, hyper)
    s_in2, s_out2, grad_w, grad_b = ng_precondition_grad(s_in, s_out, x2d, g,
                                                         compute_dtype=dt)
    return (grad_x, grad_w, grad_b[None, :],
            _arrays_from_state(s_in2), _arrays_from_state(s_out2))


nat_affine.defvjp(_nat_affine_fwd, _nat_affine_bwd)
