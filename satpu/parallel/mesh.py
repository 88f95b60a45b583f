"""Device mesh + sharding utilities (the TPU-native replacement for the
reference's NCCL DDP / kaldi job-averaging distribution, SURVEY.md §2.9).

All satpu training steps are written against a ``jax.sharding.Mesh`` with a
``data`` axis (data parallel over ICI) and an optional ``model`` axis held in
reserve for tensor-parallel layers. On a single chip the mesh is (1, 1) and
everything degenerates to plain jit.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"mesh {n_data}x{n_model} needs more than {len(devices)} devices"
    )
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharded over the data axis, everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of arrays with the leading dim sharded over ``data``."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_batch_to_devices(batch_size: int, n_data: int) -> int:
    """Smallest multiple of n_data >= batch_size (static-shape friendly)."""
    return ((batch_size + n_data - 1) // n_data) * n_data


def local_data_mesh(batch_size: int,
                    devices: Optional[Sequence] = None) -> Optional[Mesh]:
    """1-D data mesh over all local devices, or None on a single device.

    The training CLIs call this so a multi-chip host (TPU pod slice) trains
    data-parallel out of the box — the mesh replacement for the reference's
    torchrun-per-GPU DDP launch. Raises when the minibatch doesn't divide
    the device count (a silent single-chip fallback would be the real bug).
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) < 2:
        return None
    if batch_size % len(devices):
        raise ValueError(
            f"minibatch size {batch_size} must be divisible by the local "
            f"device count {len(devices)} for data-parallel training "
            f"(pad to {pad_batch_to_devices(batch_size, len(devices))})")
    return make_mesh(n_data=len(devices), devices=devices)
