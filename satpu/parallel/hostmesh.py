"""Virtual host-platform mesh configuration (CI / single-host testing).

Multi-chip sharding logic is validated on XLA's host (CPU) platform with
``--xla_force_host_platform_device_count=N`` virtual devices. Two XLA:CPU
runtime behaviors need pinning for that to be reliable:

1. **Collective-ordering deadlock** (round-3 verdict #1): with the
   concurrency-optimized HLO scheduler (the default), the per-partition
   thunk executors can reach two *independent* all-reduces of one program in
   different orders on different partition threads. XLA:CPU's in-process
   collective rendezvous blocks the partition thread until all participants
   join, so partitions parked at different collectives deadlock permanently
   ("Expected 8 threads to join the rendezvous, but only 2 of them
   arrived" ... at two different op_ids of the same run_id). The chain
   train step hits this almost every run: its 38 all-reduces include one
   with no data dependencies (the tot_frames sum) racing the BN-stats
   chain. ``--xla_cpu_enable_concurrency_optimized_scheduler=false``
   yields a schedule the executors follow in lockstep — measured 5/5 green
   on the previously 5/5-deadlocking ``train_asr`` mesh CLI, so the
   rendezvous timeout can sit at a fail-fast 120 s instead of masking
   hangs at 900 s.

2. **Rendezvous timeout**: virtual devices are threads on (possibly) one
   core; a little scheduler-starvation headroom is still wanted under suite
   load, but with the deadlock fixed 120 s is plenty (the default is 40 s).

Real TPU meshes are unaffected: TPU collectives are sequenced by the
hardware/runtime and none of these flags apply to them.
"""
from __future__ import annotations

import os

# flags every virtual-CPU-mesh process needs (see module docstring)
CPU_MESH_SCHEDULER_FLAG = "--xla_cpu_enable_concurrency_optimized_scheduler=false"
CPU_MESH_TIMEOUT_FLAGS = ("--xla_cpu_collective_timeout_seconds=120"
                          " --xla_cpu_collective_call_terminate_timeout_seconds=120")
# N virtual devices already oversubscribe the host cores; per-op Eigen
# fork-join on a shared contended pool only adds sync overhead on top
# (measured on the 8-device GAN train step, 1-core host: steady-state step
# 265 s -> 207 s with single-threaded Eigen)
CPU_MESH_EIGEN_FLAG = "--xla_cpu_multi_thread_eigen=false"


def cpu_mesh_xla_flags(n_devices: int, extra: str = "") -> str:
    """The canonical XLA_FLAGS value for an n-device virtual CPU mesh."""
    flags = (f"--xla_force_host_platform_device_count={n_devices} "
             f"{CPU_MESH_SCHEDULER_FLAG} {CPU_MESH_TIMEOUT_FLAGS} "
             f"{CPU_MESH_EIGEN_FLAG}")
    return f"{flags} {extra}".strip()


def ensure_cpu_mesh_flags() -> None:
    """Patch os.environ['XLA_FLAGS'] with the virtual-mesh pins when the
    process already requests host-platform devices.

    Call before the first JAX backend initialization (the training CLIs do,
    at startup). No-op when the process is not using a virtual CPU mesh, so
    real-TPU runs never see these flags.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        return
    if "xla_cpu_enable_concurrency_optimized_scheduler" not in flags:
        flags = f"{flags} {CPU_MESH_SCHEDULER_FLAG}"
    if "xla_cpu_collective_timeout_seconds" not in flags:
        flags = f"{flags} {CPU_MESH_TIMEOUT_FLAGS}"
    if "xla_cpu_multi_thread_eigen" not in flags:
        flags = f"{flags} {CPU_MESH_EIGEN_FLAG}"
    os.environ["XLA_FLAGS"] = flags.strip()
