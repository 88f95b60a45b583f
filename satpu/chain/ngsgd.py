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

Like the reference, the bias column is appended to the input rows ([X; 1]
and the grad-output rows are preconditioned separately and the weight/bias
gradients rescaled; chain/objf.py:181-228). Unlike the reference (which
preconditions inside each layer's backward), the TPU design splits the work:
the backward emits matmul-only statistics and ONE batched per-step phase
(``precondition_gradients``) preconditions every layer and batches all
subspace-update eighs — see the block comment above nat_affine.
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


def _power_update(W, d, rho, J, n, N, eta, Rt=None):
    """One power-iteration step of the online Fisher eigenbasis, from the
    projected statistic J = W Ahat (Ahat = Z^T Z / N) alone.

    This is the update of Kaldi's OnlineNaturalGradient (Povey, Zhang &
    Khudanpur 2015; natural-gradient-online.cc): with the updated Fisher
    F' = (1-eta)(W^T diag(d) W + rho (I - W^T W)) + eta Ahat, note that
    W F' = (1-eta) diag(d) W + eta J exactly (the rho remainder vanishes
    against orthonormal-row W), so one subspace-iteration step is

        Y = eta J + (1-eta) diag(d) W            [R, D]
        Z = Y Y^T = eta^2 K + eta(1-eta)(D Rt + Rt D) + (1-eta)^2 D^2 [R, R]
        W' = diag(lam^-1/2) U^T Y  with  (lam, U) = eigh(Z)

    where K = J J^T and Rt = J W^T — everything an [R, R] quantity, ONE
    R x R eigh, no Krylov expansion. d' = sqrt(lam) (exact when W has
    converged to the eigenbasis, Kaldi's choice), and rho' preserves the
    total trace via tr(Ahat) = n/N. Degenerate directions (lam ~ 0) get
    zeroed rows, matching the Krylov variant's behavior.
    All matmuls at HIGHEST precision: on TPU the default single-pass bf16
    degrades W's row orthonormality to ~0.5-1% while _precondition's
    Woodbury form assumes orthonormal W; the shapes are small fixed
    [R,D]/[R,R], so full precision is effectively free.
    """
    R, D = W.shape
    if Rt is None:
        Rt = jnp.matmul(J, W.T, precision=_HI)         # [R, R]
    K = jnp.matmul(J, J.T, precision=_HI)              # [R, R]
    Dg = d
    Z = (eta ** 2 * K
         + (eta * (1.0 - eta)) * (Dg[:, None] * Rt + Rt * Dg[None, :])
         + jnp.diag(((1.0 - eta) * Dg) ** 2))
    Z = 0.5 * (Z + Z.T)
    lam, U = jnp.linalg.eigh(Z)                        # ascending
    idx = jnp.argsort(-lam)[:R]
    lam = lam[idx]
    U = U[:, idx]
    eps = jnp.maximum(jnp.max(lam), 1e-20) * 1e-10
    inv_sqrt = jnp.where(lam > eps, 1.0 / jnp.sqrt(jnp.maximum(lam, eps)), 0.0)
    Y = eta * J + (1.0 - eta) * Dg[:, None] * W        # [R, D]
    W_new = inv_sqrt[:, None] * jnp.matmul(U.T, Y, precision=_HI)
    d_new = jnp.maximum(jnp.sqrt(jnp.maximum(lam, 0.0)), 1e-10)

    tr_F = (1.0 - eta) * (jnp.sum(d) + rho * (D - R)) + eta * n / N
    rho_new = jnp.maximum((tr_F - jnp.sum(d_new)) / jnp.maximum(D - R, 1),
                          1e-10)
    return W_new, d_new, rho_new


def _update_subspace(X: jnp.ndarray, state: NGState) -> NGState:
    """eta-weighted merge of the minibatch covariance into (W, d, rho):
    the power-iteration update (see _power_update) computed from X directly.
    ALL N minibatch rows enter through J = W (X^T X)/N (no subsampling)."""
    W, d, rho = state.W, state.d, state.rho
    N, D = X.shape
    eta = jnp.clip(N / state.num_samples_history, 1e-3, 0.9)
    P = jnp.matmul(X, W.T, precision=_HI)       # [N, R]
    J = jnp.matmul(P.T, X, precision=_HI) / N   # [R, D] = W (X^T X)/N
    n = jnp.sum(X * X)
    W_new, d_new, rho_new = _power_update(W, d, rho, J, n, N, eta)
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
# NG-SGD inside the training graph: a custom_vjp affine whose backward emits
# RAW weight/bias gradients plus compact per-side Fisher statistics as the
# cotangent of the state inputs. The train step differentiates the loss
# w.r.t. (params, ng_states), then runs ONE batched phase
# (precondition_gradients) that preconditions every layer's gradient and
# performs all subspace updates vmapped across same-shape preconditioners —
# a pure-functional rendering of the reference's stateful autograd.Function
# (chain/objf.py:147-228) that stays jit/SPMD-friendly.
#
# Why split backward/batched: doing the Woodbury apply + eigh updates inline
# per layer (the round-1..3 design) cost +47% over Adam at the full 13-layer
# TDNNF scale — ~76 preconditioners x ~7 tiny sequential kernels every step,
# plus 152 sequential 40/80-dim eighs every update step. The backward now
# computes only MXU matmul statistics; the batched phase turns the tiny-op
# latency chain into a handful of vmapped kernels and the eighs into a few
# batched decompositions.
#
# The statistics are sufficient exactly:
# - apply side: X_hat = gamma * X S with S = inv_rest*I + W^T diag(delta) W,
#   so grad = (gamma_in*gamma_out)^2 * S_out (G^T [X;1]) S_in needs only the
#   raw gradient G^T [X;1] (plain autodiff) + per-side (J = W Z^T Z / N,
#   n = sum Z^2): gamma's column norms are c = N diag(J W^T).
# - update side: the power-iteration update (see _power_update) is a pure
#   function of (W, d, rho, J, n, N) — one batched R x R eigh per group.
# ---------------------------------------------------------------------------

# (alpha, num_samples_history, update_period) — Kaldi/reference defaults
# (chain/nn.py:24-35 NGState); the optional 4th element is the matmul
# compute dtype ("bfloat16" runs forward/grad matmuls on the MXU in bf16).
NG_HYPER = (4.0, 2000.0, 4)


def ng_init_arrays(dim: int, rank: int = None) -> Dict[str, jnp.ndarray]:
    """Arrays-only NGState (float32 throughout, ``t`` included so the whole
    dict can ride a gradient pytree).

    ``nrows`` is a statistics-carrier slot: its PRIMAL value is never read —
    it exists so the custom_vjp cotangent (which must match the primal
    structure) has room to carry the minibatch row count N out of the
    backward pass (J rides the "W" slot, n = sum Z^2 the "rho" slot)."""
    s = ng_init(dim, rank=rank)
    return {"W": s.W.astype(jnp.float32), "d": s.d.astype(jnp.float32),
            "rho": jnp.asarray(s.rho, jnp.float32),
            "t": jnp.zeros((), jnp.float32),
            "nrows": jnp.zeros((), jnp.float32)}


def _state_from_arrays(a: Dict[str, jnp.ndarray], hyper) -> NGState:
    alpha, nsh, period = hyper[:3]
    return NGState(W=a["W"], d=a["d"], rho=a["rho"],
                   t=a["t"].astype(jnp.int32), alpha=alpha,
                   num_samples_history=nsh, update_period=period)


def _arrays_from_state(s: NGState) -> Dict[str, jnp.ndarray]:
    return {"W": s.W, "d": s.d, "rho": jnp.asarray(s.rho, jnp.float32),
            "t": s.t.astype(jnp.float32),
            "nrows": jnp.zeros((), jnp.float32)}


def _mm(a, b, compute_dtype: str):
    """a @ b; bf16 MXU inputs with f32 accumulation when requested."""
    if compute_dtype == "bfloat16":
        return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return a @ b


def _hyper_dtype(hyper) -> str:
    return hyper[3] if len(hyper) > 3 else "float32"


_HI = jax.lax.Precision.HIGHEST


def _side_stats(Z: jnp.ndarray, arrays: Dict[str, jnp.ndarray],
                hyper) -> Dict[str, jnp.ndarray]:
    """Per-side Fisher statistics for one minibatch, cotangent-shaped.

    Z [N, D] (f32). Returns a dict with the same structure as
    ng_init_arrays(D): "W" carries J = W (Z^T Z)/N, "rho" carries
    n = sum Z^2, "nrows" carries N, "t" carries t+1 ("d" is an unused zero
    carrier — the gamma column norms are recovered in the batched phase as
    c = N diag(J W^T), exact since P^T P = N J W^T).

    This is deliberately the MINIMUM per-layer work — two MXU matmuls and
    one reduction on the backward critical path. Everything else (gamma
    factors, Woodbury apply, the power-iteration eigh) happens once per
    step, batched across layers, in precondition_gradients. J is computed
    unconditionally even though only every ``update_period``-th step
    consumes it: it is pure MXU matmul, whereas gating it behind a
    per-layer lax.cond costs more in control-flow overhead than it saves
    (measured on v5e, r4). P/J run at default f32 matmul precision (bf16_3x
    passes, ~1e-6 rel error — fine for the downstream R x R eigh, whose own
    math stays HIGHEST); single-pass bf16 would degrade the basis
    orthonormality ~0.5-1% and is NOT safe here.
    """
    W, t = arrays["W"], arrays["t"]
    N = Z.shape[0]
    Zf = Z.astype(jnp.float32)
    P = jnp.matmul(Zf, W.T)                           # [N, R]
    n = jnp.sum(Zf * Zf)
    J = jnp.matmul(P.T, Zf) / N                       # [R, D] = W Ahat
    return {"W": J, "d": jnp.zeros_like(arrays["d"]), "rho": n,
            "t": t + 1.0, "nrows": jnp.full((), float(N), jnp.float32)}


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def nat_affine(x2d, weight, bias, in_state, out_state, hyper=NG_HYPER):
    """y = x2d @ weight.T + bias whose backward emits NG-SGD statistics.

    x2d [N, D_in]; weight [D_out, D_in] (torch layout); bias [1, D_out];
    in_state/out_state: ng_init_arrays dicts (in_state dim = D_in + 1).
    The weight/bias cotangents are the RAW gradients; the cotangents returned
    for in_state/out_state are the per-side STATISTICS (see _side_stats).
    The caller must feed (raw grads, states, statistics) through
    ``precondition_gradients`` to obtain the preconditioned gradients and
    advanced states — the chain trainer does this once per step, batched
    across all layers. hyper is static: (alpha, num_samples_history,
    update_period[, dtype]) — the optional 4th element "bfloat16" runs the
    three big matmuls (forward, grad_x, grad_weight) as bf16 MXU with f32
    accumulation.
    """
    return _mm(x2d, weight.T, _hyper_dtype(hyper)) + bias[0]


def _nat_affine_fwd(x2d, weight, bias, in_state, out_state, hyper):
    y = _mm(x2d, weight.T, _hyper_dtype(hyper)) + bias[0]
    return y, (x2d, weight, in_state, out_state)


def _nat_affine_bwd(hyper, res, g):
    x2d, weight, in_arrays, out_arrays = res
    dt = _hyper_dtype(hyper)
    grad_x = _mm(g, weight, dt)  # from the RAW grad, before preconditioning (objf.py:205-208)
    grad_w = _mm(g.T, x2d, dt).astype(weight.dtype)    # raw [D_out, D_in]
    grad_b = jnp.sum(g, axis=0).astype(weight.dtype)   # raw [D_out]
    N = x2d.shape[0]
    Z_in = jnp.concatenate([x2d.astype(jnp.float32),
                            jnp.ones((N, 1), jnp.float32)], axis=1)
    stats_in = _side_stats(Z_in, in_arrays, hyper)
    stats_out = _side_stats(g, out_arrays, hyper)
    return grad_x, grad_w, grad_b[None, :], stats_in, stats_out


nat_affine.defvjp(_nat_affine_fwd, _nat_affine_bwd)


# ---------------------------------------------------------------------------
# Batched preconditioning + subspace update (the per-step phase)
# ---------------------------------------------------------------------------


def _gamma_factors(W, d, rho, c, n, alpha):
    """Woodbury factors + trace-preserving rescale for one side, from stats.

    Returns (inv_rest, delta [R], gamma): X_hat = gamma * X S with
    S = inv_rest*I + W^T diag(delta) W, and gamma chosen so
    ||X_hat|| = ||X|| (matching _precondition exactly: c = colnorms of XW^T,
    n = sum X^2 give den = inv^2 n + sum((2 inv delta + delta^2) c))."""
    R, D = W.shape
    tr_F = jnp.sum(d) + rho * (D - R)
    beta = alpha * tr_F / D + 1e-20
    inv_rest = 1.0 / (rho + beta)
    delta = (1.0 / (d + beta)) - inv_rest
    den = inv_rest ** 2 * n + jnp.sum((2.0 * inv_rest * delta + delta ** 2) * c)
    gamma = jnp.sqrt(jnp.maximum(n, 1e-20) / jnp.maximum(den, 1e-20))
    return inv_rest, delta, gamma


def _side_factors(s, x, alpha):
    """Per-side (vmapped) Woodbury apply factors from the stashed stats:
    recovers c = N diag(J W^T) (exact: P^T P = N J W^T) so the backward pass
    never pays a per-layer column-norm reduction. Returns
    (inv_rest, delta, gamma, Rt) — Rt = J W^T is reused by the update."""
    W, d, rho = s["W"], s["d"], s["rho"]
    J, n, N = x["W"], x["rho"], x["nrows"]
    Rt = jnp.matmul(J, W.T, precision=_HI)             # [R, R]
    c = N * jnp.diagonal(Rt)
    inv_rest, delta, gamma = _gamma_factors(W, d, rho, c, n, alpha)
    return inv_rest, delta, gamma, Rt


def _iter_ng_layers(ng_state):
    """Yield (path, node) for every {"in": state, "out": state} layer entry."""
    out = []

    def rec(node, path):
        keys = set(node.keys()) if hasattr(node, "keys") else None
        if keys is not None and "in" in keys and hasattr(node["in"], "keys") \
                and "W" in node["in"]:
            out.append((path, node))
            return
        if keys is not None:
            for k in node.keys():
                rec(node[k], path + (k,))

    rec(ng_state, ())
    return out


def _tree_get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _tree_set(tree, path, value):
    """Functional set: returns a copy of nested-dict ``tree`` with
    ``tree[path] = value``."""
    if not path:
        return value
    node = dict(tree)
    node[path[0]] = _tree_set(tree[path[0]], path[1:], value)
    return node


# --- stacked state storage -------------------------------------------------
# The train state stores preconditioner states STACKED by shape group:
# {"<path1>|<path2>|...": {"in": {"W": [L, R, D], ...}, "out": {...}}}
# (layer paths joined with "/" inside, "|" between — plain string keys, so
# the structure round-trips through msgpack checkpoints). One 13-layer TDNNF
# holds 456 per-layer state arrays; as separate jit arguments each costs a
# ~120 us host-staging DMA per step on the tunneled runtime (~9 ms/step,
# measured r4) — stacked, the whole state is ~24 buffers.

_PATH_SEP, _GROUP_SEP = "/", "|"


def stack_ng_state(per_layer):
    """Per-layer ng_state tree -> stacked group layout (see above)."""
    layers = _iter_ng_layers(per_layer)
    groups: Dict[Tuple, list] = {}
    for path, node in layers:
        key = (node["in"]["W"].shape, node["out"]["W"].shape)
        groups.setdefault(key, []).append((path, node))
    out = {}
    for members in groups.values():
        gkey = _GROUP_SEP.join(_PATH_SEP.join(p) for p, _ in members)
        out[gkey] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[n for _, n in members])
    return out


def _group_paths(gkey: str):
    return [tuple(p.split(_PATH_SEP)) for p in gkey.split(_GROUP_SEP)]


def unstack_ng_state(groups):
    """Stacked group layout -> per-layer tree (device slices; cheap in jit)."""
    per_layer: Dict = {}
    for gkey, stacked in groups.items():
        for i, path in enumerate(_group_paths(gkey)):
            node = jax.tree_util.tree_map(lambda x: x[i], stacked)
            cur = per_layer
            for k in path[:-1]:
                cur = cur.setdefault(k, {})
            cur[path[-1]] = node
    return per_layer


def is_stacked_ng_state(ng_state) -> bool:
    for v in ng_state.values():
        return (hasattr(v, "keys") and "in" in v
                and getattr(v["in"]["W"], "ndim", 0) == 3)
    return False


def precondition_gradients(grads, ng_state, ng_stats, hyper=NG_HYPER):
    """The per-step batched NG-SGD phase.

    grads: params pytree holding RAW weight/bias gradients (nested dicts; the
    nat_affine layer paths mirror ng_state's). ng_state: the current
    preconditioner states — either the stacked group layout (what the chain
    trainer stores, see stack_ng_state) or a per-layer tree
    ({"<layer>": {"in": ..., "out": ...}} nested under module paths), which
    is stacked on the fly. ng_stats: the cotangent of the PER-LAYER ng_state
    argument from the backward pass (per-side statistics, see _side_stats).

    Returns (preconditioned grads, advanced ng_state in the SAME layout as
    the input). Work is grouped by preconditioner shape and vmapped, so the
    2x~40 per-layer eighs of a 13-layer TDNNF become a handful of batched
    decompositions; the subspace update runs under ONE lax.cond — valid
    because every state's ``t`` advances in lockstep (all initialized at 0
    by init_chain_state and stepped together here)."""
    alpha = float(hyper[0])
    period = int(hyper[2])
    if not ng_state:
        return grads, ng_state
    stacked_in = is_stacked_ng_state(ng_state)
    if stacked_in:
        group_items = [(gkey, _group_paths(gkey), st)
                       for gkey, st in ng_state.items()]
    else:
        layers = _iter_ng_layers(ng_state)
        if not layers:
            return grads, ng_state
        groups: Dict[Tuple, list] = {}
        for path, node in layers:
            key = (node["in"]["W"].shape, node["out"]["W"].shape)
            groups.setdefault(key, []).append((path, node))
        group_items = []
        for members in groups.values():
            gkey = _GROUP_SEP.join(_PATH_SEP.join(p) for p, _ in members)
            st = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *[n for _, n in members])
            group_items.append((gkey, [p for p, _ in members], st))

    # lockstep update predicate from the first group's t
    t0 = group_items[0][2]["in"]["t"][0].astype(jnp.int32)
    do_update = (t0 % period) == 0

    new_grads = grads
    new_state: Dict = {} if stacked_in else ng_state
    for gkey, paths, st in group_items:
        stk = lambda fn: jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *[fn(p) for p in paths])
        g_full = stk(lambda p: jnp.concatenate(
            [_tree_get(grads, p)["weight"].astype(jnp.float32),
             _tree_get(grads, p)["bias"].astype(jnp.float32).T], axis=1))
        sx = stk(lambda p: _tree_get(ng_stats, p))      # statistics, stacked

        def apply_one(g_full, st, sx):
            inv_i, del_i, gam_i, _ = _side_factors(st["in"], sx["in"], alpha)
            inv_o, del_o, gam_o, _ = _side_factors(st["out"], sx["out"],
                                                   alpha)
            Wi, Wo = st["in"]["W"], st["out"]["W"]
            # M0 S_in (right), then S_out (left); the reference applies
            # gamma inside each hat AND an extra in_scale*out_scale on the
            # product (chain/objf.py:221-227) => (gam_i*gam_o)^2 total.
            M1 = inv_i * g_full + jnp.matmul(
                jnp.matmul(g_full, Wi.T, precision=_HI) * del_i[None, :], Wi,
                precision=_HI)
            M2 = inv_o * M1 + jnp.matmul(
                Wo.T, del_o[:, None] * jnp.matmul(Wo, M1, precision=_HI),
                precision=_HI)
            return M2 * (gam_i * gam_o) ** 2

        def update_one(st, sx):
            def upd_side(s, x):
                N = x["nrows"]
                eta = jnp.clip(N / float(hyper[1]), 1e-3, 0.9)
                W_new, d_new, rho_new = _power_update(
                    s["W"], s["d"], s["rho"], x["W"], x["rho"], N, eta)
                return {"W": W_new, "d": d_new, "rho": rho_new,
                        "t": s["t"] + 1.0,
                        "nrows": jnp.zeros_like(s["nrows"])}
            return {"in": upd_side(st["in"], sx["in"]),
                    "out": upd_side(st["out"], sx["out"])}

        def tick_one(st, sx):
            adv = lambda s: dict(s, t=s["t"] + 1.0)
            return {"in": adv(st["in"]), "out": adv(st["out"])}

        g_pre = jax.vmap(apply_one)(g_full, st, sx)
        st_new = jax.lax.cond(do_update,
                              lambda a: jax.vmap(update_one)(*a),
                              lambda a: jax.vmap(tick_one)(*a), (st, sx))

        for i, path in enumerate(paths):
            gsub = dict(_tree_get(new_grads, path))
            gsub["weight"] = g_pre[i, :, :-1].astype(gsub["weight"].dtype)
            gsub["bias"] = g_pre[i, :, -1][None, :].astype(gsub["bias"].dtype)
            new_grads = _tree_set(new_grads, path, gsub)
        if stacked_in:
            new_state[gkey] = st_new
        else:
            for i, path in enumerate(paths):
                new_state = _tree_set(
                    new_state, path,
                    jax.tree_util.tree_map(lambda s: s[i], st_new))
    return new_grads, new_state
