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

from typing import NamedTuple, Tuple

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
    """eta-weighted merge of the minibatch covariance into (W, d, rho)."""
    W, d, rho = state.W, state.d, state.rho
    N, D = X.shape
    R = W.shape[0]
    eta = jnp.clip(N / state.num_samples_history, 1e-3, 0.9)
    # stacked matrix whose gram equals (1-eta) W^T diag(d) W + eta X^T X / N
    top = jnp.sqrt((1.0 - eta)) * (jnp.sqrt(d)[:, None] * W)
    bottom = jnp.sqrt(eta / N) * X
    Y = jnp.concatenate([top, bottom], axis=0)  # [R+N, D]
    # top-R right singular vectors via the (R+N)x(R+N) gram (cheap when N+R << D)
    G = Y @ Y.T
    evals, evecs = jnp.linalg.eigh(G)
    idx = jnp.argsort(-evals)[:R]
    lam = jnp.maximum(evals[idx], 1e-10)
    U = evecs[:, idx]  # [R+N, R]
    W_new = (U.T @ Y) / jnp.sqrt(lam)[:, None]  # orthonormal rows
    # add the residual (1-eta) * rho outside the old subspace (approximate:
    # fold into the new eigenvalues + remainder)
    d_new = lam + (1.0 - eta) * rho
    tr_T = (1.0 - eta) * (jnp.sum(d) + rho * (D - R)) + eta * jnp.sum(X * X) / N
    rho_new = jnp.maximum((tr_T - jnp.sum(d_new)) / jnp.maximum(D - R, 1), 1e-10)
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
                         inputs: jnp.ndarray, grad_output: jnp.ndarray):
    """The reference backward composition (chain/objf.py:181-228):

    inputs [N, D_in] (WITHOUT bias column; it is appended here),
    grad_output [N, D_out]. Returns
    (new_state_in, new_state_out, grad_weight [D_out, D_in], grad_bias [D_out]).
    """
    N = inputs.shape[0]
    X = jnp.concatenate([inputs, jnp.ones((N, 1), inputs.dtype)], axis=1)
    state_in, X_hat, in_scale = precondition_directions(state_in, X)
    state_out, G_hat, out_scale = precondition_directions(state_out, grad_output)
    scale = in_scale * out_scale / (in_scale * out_scale)  # scales already folded
    grad_weight = G_hat.T @ X_hat[:, :-1]
    grad_bias = G_hat.T @ X_hat[:, -1]
    return state_in, state_out, grad_weight, grad_bias
