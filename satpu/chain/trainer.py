"""LF-MMI training step + iteration driver (reference chain/model.py
ChainE2EModel.train + chain/objf.py train_lfmmi_one_iter, TPU-native).

The reference runs N single-GPU jobs per iteration and averages parameters
(chain/model.py:216-235, SURVEY.md §2.9); here one jitted data-parallel step
over the mesh replaces both the job fan-out and the merge (gradient psum ==
the same effective update, without the straggler/merge machinery).

Optimizer: Adam with weight decay (chain/model.py:475-477) + grad-value clip
5.0 (chain/objf.py:375-378) + the OrthonormalLinear constraint applied as a
pure parameter update every ``orthonormal_interval`` steps (Kaldi applies it
every 4th minibatch on average).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import torchlayers
from ..models.tdnnf import constrain_orthonormal, find_orthonormal_constraints
from .objf import DenominatorGraph, chain_objf_and_grad


@dataclasses.dataclass(frozen=True)
class ChainTrainOpts:
    lr: float = 0.01
    weight_decay: float = 0.001
    grad_clip_value: float = 5.0
    l2_regularize: float = 1e-4
    leaky_hmm_coefficient: float = 1e-5
    xent_regularize: float = 0.025
    orthonormal_interval: int = 4
    # "bfloat16" = mixed-precision net forward/backward: TDNNF matmuls via
    # TDNNFNetConfig.compute_dtype + nat_affine's bf16 hyper, torchlayers
    # (wav2vec2 front) via autocast; the LF-MMI forward-backward and the
    # optimizer stay f32 (the FB scans already stream bf16 one-hot matrices)
    compute_dtype: str = "float32"


@flax.struct.dataclass
class ChainTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    vq_stats: Any
    opt_state: Any
    # NG-SGD preconditioner states, one (in, out) pair per NaturalAffineTransform
    # (empty dict when cfg.natural_gradient is off)
    ng_state: Any = flax.struct.field(default_factory=dict)


def make_chain_optimizer(opts: ChainTrainOpts, grad_acc_steps: int = 1):
    opt = optax.chain(
        optax.clip(opts.grad_clip_value),  # clip_grad_value_(5.0)
        optax.inject_hyperparams(optax.adamw)(learning_rate=opts.lr,
                                              weight_decay=opts.weight_decay),
    )
    if grad_acc_steps > 1:
        # gradient accumulation (reference chain/objf.py:375-378 steps the
        # optimizer every grad_acc_steps minibatches)
        opt = optax.MultiSteps(opt, every_k_schedule=grad_acc_steps)
    return opt


def init_chain_state(model, rng, example_wav, optimizer) -> ChainTrainState:
    variables = model.init(rng, example_wav, train=False)
    # NG preconditioner states are STORED stacked by shape group: the
    # per-layer layout is ~456 small arrays on a 13-layer TDNNF, which cost
    # a host-staging DMA each per step as jit arguments (~9 ms/step on the
    # tunneled runtime); stacked they are ~24 buffers. The train step slices
    # per-layer views on device (ngsgd.unstack_ng_state).
    from .ngsgd import stack_ng_state

    ng = variables.get("ng_state", {})
    return ChainTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        vq_stats=variables.get("vq_stats", {}),
        opt_state=optimizer.init(variables["params"]),
        ng_state=stack_ng_state(ng) if ng else {},
    )


def make_chain_train_step(model, den: DenominatorGraph, optimizer,
                          opts: ChainTrainOpts = ChainTrainOpts(),
                          lr_schedule: Optional[Callable] = None,
                          preprocessor_schedule: Optional[Callable] = None,
                          freeze_filter: Optional[Callable] = None):
    """(state, wav [B,T], num_graphs, num_frames, rng) -> (state, metrics).

    num_graphs: padded per-utterance numerator FST arrays (jnp), batch-major.
    Data-parallel under a mesh: shard wav + num_graphs on batch, replicate
    state; XLA inserts the grad all-reduce.

    ``preprocessor_schedule(step) -> mult`` scales the updates of every param
    under a 'preprocessor' subtree — the reference's layered-LR + freeze
    schedule for the wav2vec2 front (tuning/tdnnf_wav2vec2_vq.py:189-220:
    lr/20 early, lr/5 mid-run, frozen for the last 10%). Scaling the UPDATE
    (not the grad) matches per-group LR semantics under Adam.

    ``freeze_filter(path_keys) -> bool`` (path_keys = tuple of str param-tree
    keys) zeroes the update of every matching param — the JAX analog of the
    reference's ``requires_grad = False`` freeze
    (tuning/tdnnf_spkadv.py:265-281).
    """

    def train_step(state: ChainTrainState, wav, num_graphs, num_frames, rng,
                   **model_kwargs):
        use_ng = bool(state.ng_state)
        # per-layer views of the stacked preconditioner states (device
        # slices inside the jit; the stacked array stays one buffer)
        from .ngsgd import unstack_ng_state
        ng_per_layer = unstack_ng_state(state.ng_state) if use_ng else {}

        def loss_fn(params, ng_state):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if state.vq_stats:
                variables["vq_stats"] = state.vq_stats
            if use_ng:
                variables["ng_state"] = ng_state
            mutable = ["batch_stats", "aux_loss", "aux_metric"] + (
                ["vq_stats"] if state.vq_stats else [])
            cast = (jnp.bfloat16 if opts.compute_dtype == "bfloat16" else None)
            with torchlayers.autocast(cast):
                (chain_out, xent_out), new_vars = model.apply(
                    variables, wav, train=True, mutable=mutable,
                    rngs={"dropout": rng}, **model_kwargs)
            chain_out = chain_out.astype(jnp.float32)
            xent_out = xent_out.astype(jnp.float32)
            loss, metrics = chain_objf_and_grad(
                chain_out, xent_out, num_graphs, den, num_frames=num_frames,
                leaky_hmm_coefficient=opts.leaky_hmm_coefficient,
                l2_regularize=opts.l2_regularize,
                xent_regularize=opts.xent_regularize)
            # auxiliary losses sown by submodules (VQ commitment, adversarial
            # speaker CE — the reference's additional_obj hook,
            # chain/objf.py:332-360)
            metrics = dict(metrics)
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                    new_vars.get("aux_loss", {}))[0]:
                name = getattr(path[-2] if len(path) > 1 else path[-1], "key", "aux")
                val = jnp.sum(leaf)
                loss = loss + val
                metrics[str(name)] = val
            for path, leaf in jax.tree_util.tree_flatten_with_path(
                    new_vars.get("aux_metric", {}))[0]:
                name = getattr(path[-2] if len(path) > 1 else path[-1], "key", "aux")
                metrics[str(name)] = jnp.mean(leaf)
            return loss, (metrics, new_vars)

        # nat_affine's custom_vjp emits RAW param grads plus per-side Fisher
        # statistics as the cotangent of the ng_state inputs; ONE batched
        # phase then preconditions every layer's gradient and advances all
        # preconditioner states (vmapped across same-shape layers, eighs
        # batched — see ngsgd.precondition_gradients).
        (loss, (metrics, new_vars)), (grads, ng_stats) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, ng_per_layer)
        new_ng = state.ng_state
        if use_ng:
            from .ngsgd import NG_HYPER, precondition_gradients
            grads, new_ng = precondition_gradients(
                grads, state.ng_state, ng_stats,
                hyper=NG_HYPER + (opts.compute_dtype,))
        opt_state = state.opt_state
        if lr_schedule is not None:
            opt_state = with_injected_lr(opt_state, lr_schedule(state.step))
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        if preprocessor_schedule is not None:
            mult = preprocessor_schedule(state.step)

            def scale_preproc(path, u):
                in_preproc = any(getattr(p, "key", None) == "preprocessor"
                                 for p in path)
                return u * mult if in_preproc else u

            updates = jax.tree_util.tree_map_with_path(scale_preproc, updates)
        if freeze_filter is not None:
            def zero_frozen(path, u):
                keys = tuple(str(getattr(p, "key", p)) for p in path)
                return jnp.zeros_like(u) if freeze_filter(keys) else u

            updates = jax.tree_util.tree_map_with_path(zero_frozen, updates)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params,
            batch_stats=new_vars.get("batch_stats", state.batch_stats),
            vq_stats=new_vars.get("vq_stats", state.vq_stats),
            opt_state=opt_state,
            ng_state=new_ng if use_ng else state.ng_state)
        metrics = dict(metrics)
        metrics["loss"] = loss
        if lr_schedule is not None:
            metrics["lr"] = inject_hparams(opt_state)["learning_rate"]
        return new_state, metrics

    return train_step


def with_injected_lr(opt_state, lr):
    """Return ``opt_state`` with learning_rate replaced in the (possibly
    MultiSteps-wrapped) InjectHyperparamsState, wherever it lives."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state._replace(
            hyperparams={**opt_state.hyperparams, "learning_rate": lr})
    if hasattr(opt_state, "inner_opt_state"):
        return opt_state._replace(
            inner_opt_state=with_injected_lr(opt_state.inner_opt_state, lr))
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(with_injected_lr(s, lr) for s in opt_state)
    return opt_state


def inject_hparams(opt_state) -> Dict[str, Any]:
    """The hyperparams dict of a make_chain_optimizer state (searches through
    MultiSteps wrapping)."""
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    if hasattr(opt_state, "inner_opt_state"):
        return inject_hparams(opt_state.inner_opt_state)
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        for s in opt_state:
            try:
                return inject_hparams(s)
            except ValueError:
                continue
    raise ValueError("no InjectHyperparamsState found")


def make_chain_valid_step(model, den: DenominatorGraph,
                          opts: ChainTrainOpts = ChainTrainOpts()):
    """Jittable diagnostics step: (params, batch_stats, vq_stats, wav,
    num_graphs, num_frames) -> metrics (chain objf on held-out egs, the
    reference's validate mode, chain/model.py:176-213)."""

    def valid_step(params, batch_stats, vq_stats, wav, num_graphs, num_frames):
        variables = {"params": params, "batch_stats": batch_stats}
        if vq_stats:
            variables["vq_stats"] = vq_stats
        chain_out, xent_out = model.apply(variables, wav, train=False)
        loss, metrics = chain_objf_and_grad(
            chain_out, xent_out, num_graphs, den, num_frames=num_frames,
            leaky_hmm_coefficient=opts.leaky_hmm_coefficient,
            l2_regularize=opts.l2_regularize,
            xent_regularize=opts.xent_regularize)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return metrics

    return valid_step


def apply_orthonormal_constraint(params, scale: float = -1.0):
    """Re-orthonormalize all linearB/inner_nat weights (pure update), the
    side-effect OrthonormalLinear applies pre-forward in the reference
    (chain/nn.py:178-185)."""
    constraints = find_orthonormal_constraints(params, scale)
    from ..models.tdnnf import constrain_orthonormal_tree

    return constrain_orthonormal_tree(params, constraints)


def merge_models(param_trees) -> Any:
    """Parameter averaging of per-job models (chain/model.py:216-235), kept
    for compatibility with job-style training; pjit DP makes it unnecessary."""
    n = len(param_trees)
    return jax.tree_util.tree_map(lambda *xs: sum(xs) / n, *param_trees)
