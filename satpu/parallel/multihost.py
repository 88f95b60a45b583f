"""Multi-host (pod / DCN) initialization and per-host data sharding.

The reference goes multi-node through kaldi run.pl/ssh.pl shell fan-out
(SURVEY.md §2.9, asr train.py:270-276); the TPU-native story is one SPMD
program over all hosts: ``jax.distributed.initialize`` connects the
processes, the global mesh spans every chip, and each host feeds its slice
of the batch (``host_local_batch`` + ``global_batch_from_host_local``,
built on jax.make_array_from_process_local_data).

Single-process runs degenerate to no-ops, so drivers call these
unconditionally.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed from args or env (SATPU_COORDINATOR,
    SATPU_NUM_PROCESSES, SATPU_PROCESS_ID; TPU pods auto-detect when all are
    absent). Returns the process count. Safe to call in single-process runs:
    with no coordinator configured it does nothing."""
    coord = coordinator_address or os.environ.get("SATPU_COORDINATOR", "")
    nproc = num_processes or int(os.environ.get("SATPU_NUM_PROCESSES", "0"))
    pid = process_id if process_id is not None else int(
        os.environ.get("SATPU_PROCESS_ID", "-1"))
    if coord and nproc > 0 and pid >= 0:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=nproc, process_id=pid)
        logging.info("jax.distributed: process %d/%d via %s",
                     jax.process_index(), jax.process_count(), coord)
    return jax.process_count()


def host_shard_list(items: Sequence, process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> list:
    """Deterministic per-host slice of a work list (utterances, batches):
    host k takes items[k::P]. Identity in single-process runs."""
    p = process_index if process_index is not None else jax.process_index()
    n = process_count if process_count is not None else jax.process_count()
    return list(items)[p::n] if n > 1 else list(items)


def host_local_batch_size(global_batch: int,
                          process_count: Optional[int] = None) -> int:
    n = process_count if process_count is not None else jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} hosts")
    return global_batch // n


def replicate_global(mesh, tree):
    """Fully-replicated global arrays from identical host-local values
    (parameters / optimizer state in a multi-host data-parallel step). Works
    in single- and multi-process runs."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import replicate

    if jax.process_count() == 1:
        return replicate(mesh, tree)
    sh = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, tree)


def global_batch_from_host_local(mesh, batch):
    """Assemble the globally-sharded batch from each host's local slice.

    batch: pytree of np arrays with the HOST-LOCAL leading dim
    (global_batch / process_count). Under a single process this is just
    ``shard_batch``. The returned arrays are jax.Arrays addressable-shard-only
    on each host, exactly what a pjit'ed data-parallel step consumes.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import DATA_AXIS, shard_batch

    if jax.process_count() == 1:
        return shard_batch(mesh, batch)
    sh = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)
