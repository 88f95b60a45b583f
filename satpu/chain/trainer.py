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


@flax.struct.dataclass
class ChainTrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    vq_stats: Any
    opt_state: Any


def make_chain_optimizer(opts: ChainTrainOpts):
    return optax.chain(
        optax.clip(opts.grad_clip_value),  # clip_grad_value_(5.0)
        optax.inject_hyperparams(optax.adamw)(learning_rate=opts.lr,
                                              weight_decay=opts.weight_decay),
    )


def init_chain_state(model, rng, example_wav, optimizer) -> ChainTrainState:
    variables = model.init(rng, example_wav, train=False)
    return ChainTrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        vq_stats=variables.get("vq_stats", {}),
        opt_state=optimizer.init(variables["params"]),
    )


def make_chain_train_step(model, den: DenominatorGraph, optimizer,
                          opts: ChainTrainOpts = ChainTrainOpts(),
                          lr_schedule: Optional[Callable] = None):
    """(state, wav [B,T], num_graphs, num_frames, rng) -> (state, metrics).

    num_graphs: padded per-utterance numerator FST arrays (jnp), batch-major.
    Data-parallel under a mesh: shard wav + num_graphs on batch, replicate
    state; XLA inserts the grad all-reduce.
    """

    def train_step(state: ChainTrainState, wav, num_graphs, num_frames, rng):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            if state.vq_stats:
                variables["vq_stats"] = state.vq_stats
            mutable = ["batch_stats"] + (["vq_stats"] if state.vq_stats else [])
            (chain_out, xent_out), new_vars = model.apply(
                variables, wav, train=True, mutable=mutable,
                rngs={"dropout": rng})
            loss, metrics = chain_objf_and_grad(
                chain_out, xent_out, num_graphs, den, num_frames=num_frames,
                leaky_hmm_coefficient=opts.leaky_hmm_coefficient,
                l2_regularize=opts.l2_regularize,
                xent_regularize=opts.xent_regularize)
            return loss, (metrics, new_vars)

        (loss, (metrics, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if lr_schedule is not None:
            state.opt_state[1].hyperparams["learning_rate"] = lr_schedule(state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params,
            batch_stats=new_vars.get("batch_stats", state.batch_stats),
            vq_stats=new_vars.get("vq_stats", state.vq_stats),
            opt_state=opt_state)
        metrics = dict(metrics)
        metrics["loss"] = loss
        return new_state, metrics

    return train_step


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
