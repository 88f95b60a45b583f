"""Self-describing checkpoints.

The reference stores, inside every checkpoint, everything needed to rebuild
the model from one file + the repo: the tuning-file path, its build args, and
the state dict (chain/model.py:442-460, infer_helper.py:10-59). We keep the
same philosophy TPU-natively: a single msgpack file holding

- ``meta``: JSON dict with ``model_id`` (registry name of the builder),
  ``build_params`` (kwargs for the builder), ``build_args`` (CLI-style args
  the tuning config was created with), and arbitrary trainer state scalars;
- ``params``: the flax param pytree (and optional extra collections such as
  batch_stats / vq_stats / optimizer state).

``satpu.infer_helper.load_model`` reads ``meta.model_id`` and reconstructs
the model through the model registry.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    """Plain nested dicts/lists of numpy arrays: optax namedtuple states are
    tuple subclasses msgpack refuses under strict_types, so containers are
    normalized (restore_like pours them back by leaf order)."""
    if isinstance(tree, dict):
        return {k: _to_numpy(v) for k, v in tree.items()}
    if hasattr(tree, "items"):  # FrozenDict / Mappings
        return {k: _to_numpy(v) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        return [_to_numpy(v) for v in tree]
    if tree is None:
        return None
    return np.asarray(tree)


def save_checkpoint(path: str, meta: Dict[str, Any], state: Dict[str, Any]) -> None:
    """Serialize {meta, state} to ``path`` (atomic rename)."""
    payload = {
        "meta_json": json.dumps(meta),
        "state": _to_numpy(state),
    }
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str):
    """Returns (meta: dict, state: pytree of np arrays)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(payload["meta_json"])
    return meta, payload["state"]


def restore_like(template, loaded):
    """Pour a loaded (dicts/lists-of-arrays) pytree back into the structure of
    ``template`` — optax namedtuple states round-trip through msgpack as
    lists, so restore by leaf order. Leaf counts must match."""
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = jax.tree_util.tree_leaves(loaded)
    if len(leaves) != len(new_leaves):
        raise ValueError(
            f"checkpoint structure mismatch: template has {len(leaves)} leaves, "
            f"loaded state has {len(new_leaves)}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def flatten_tree(tree, prefix: str = "") -> Dict[str, Any]:
    """Nested dicts -> {"a.b.c": leaf} (torch state_dict-style keys)."""
    out: Dict[str, Any] = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}."))
    else:
        out[prefix[:-1]] = tree
    return out


def match_params(template, loaded):
    """Shape-aware partial init (reference utils/torch_utils.py:23-50
    ``match_state_dict``, used for ``init_weight_model`` warm starts at
    chain/model.py:129-154): take from ``loaded`` every leaf whose path exists
    in ``template`` with the same shape, keep the template value elsewhere.

    Returns ``(merged, matched_keys, unmatched_keys)`` where unmatched_keys are
    the loaded paths that found no home (missing in template or wrong shape).
    """
    flat_loaded = flatten_tree(loaded)
    matched, unmatched = [], set(flat_loaded)

    def merge(tmpl, path=""):
        if isinstance(tmpl, dict) or hasattr(tmpl, "items"):
            return {k: merge(v, f"{path}{k}.") for k, v in tmpl.items()}
        key = path[:-1]
        cand = flat_loaded.get(key)
        if cand is not None and np.shape(cand) == np.shape(tmpl):
            matched.append(key)
            unmatched.discard(key)
            return np.asarray(cand)
        return tmpl

    merged = merge(template)
    return merged, matched, sorted(unmatched)


def latest_checkpoint(exp_dir: str, prefix: str = "", suffix: str = ".ckpt") -> Optional[str]:
    """Find the checkpoint with the highest integer tag, e.g. ``g_100.ckpt``."""
    best, best_it = None, -1
    if not os.path.isdir(exp_dir):
        return None
    for name in os.listdir(exp_dir):
        if not (name.startswith(prefix) and name.endswith(suffix)):
            continue
        tag = name[len(prefix) : len(name) - len(suffix)].strip("_.")
        if tag.isdigit() and int(tag) > best_it:
            best_it = int(tag)
            best = os.path.join(exp_dir, name)
    return best


def checkpoint_gc(exp_dir: str, prefix: str, suffix: str = ".ckpt", keep_last: int = 10,
                  keep_every: int = 0, protected=()) -> None:
    """Sliding-window GC like the reference trainers (asr train.py:410-413)."""
    entries = []
    if not os.path.isdir(exp_dir):
        return
    for name in os.listdir(exp_dir):
        if name.startswith(prefix) and name.endswith(suffix):
            tag = name[len(prefix) : len(name) - len(suffix)].strip("_.")
            if tag.isdigit():
                entries.append((int(tag), name))
    entries.sort()
    protected = {os.path.basename(os.path.realpath(p)) for p in protected if p}
    for it, name in entries[:-keep_last] if keep_last else entries:
        if keep_every and it % keep_every == 0:
            continue
        if name in protected:
            continue
        os.remove(os.path.join(exp_dir, name))
