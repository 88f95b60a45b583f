"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated on
XLA's host platform with 8 virtual devices, which exercises the same mesh /
NamedSharding / collective code paths.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in flags:
    # 8 virtual devices are threads on (possibly) one core: the default 40 s
    # collective-rendezvous termination timeout can fire from pure scheduler
    # starvation under suite load
    flags += (" --xla_cpu_collective_timeout_seconds=900"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The axon TPU plugin ignores JAX_PLATFORMS=cpu, so route test computation to
# the (always present) CPU backend explicitly: exact fp32 matmuls for golden
# comparisons and an 8-virtual-device mesh for sharding tests.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Persistent compilation cache: the suite's wall time is dominated by XLA CPU
# compiles on this 1-core host (round-1 weak #8); warm runs skip them.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("SATPU_TEST_JAX_CACHE", "/tmp/satpu_test_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def cpu_devices():
    return jax.devices("cpu")


def mesh_cli_env():
    """Subprocess env for CLI tests that run on the virtual 8-device CPU mesh.

    The 8 virtual devices are threads on (possibly) one core: the default
    40 s collective-rendezvous termination timeout can fire from pure
    scheduler starvation under load (observed: F0818 rendezvous.cc crashes
    on the 1-core CI host, including one thread starving past 300 s while
    the pytest parent compiled concurrently). The timeout only matters when
    a thread is genuinely stuck, so make it generous: 900 s. Subprocess
    timeouts in callers should sit above it (>= 1100 s).
    """
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip the axon plugin in subprocesses
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8"
        " --xla_cpu_collective_timeout_seconds=900"
        " --xla_cpu_collective_call_terminate_timeout_seconds=900")
    env["SATPU_JAX_CACHE"] = env.get("SATPU_TEST_JAX_CACHE",
                                     "/tmp/satpu_test_jax_cache")
    return env

import importlib
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def reference_module(name, path=None):
    """Load a single module file from the read-only torch reference for golden
    tests, WITHOUT importing the satools package __init__ (which drags in the
    TorchScript YAAPT that does not compile under this torch build).

    Stubs out torchaudio (only used in __main__ blocks of the files we load).
    """
    import importlib.util
    import types

    if name in sys.modules:
        return sys.modules[name]
    installed_stub = False
    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        ta.functional = types.ModuleType("torchaudio.functional")
        ta.load = None
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.functional"] = ta.functional
        installed_stub = True
    if path is None:
        rel = name.replace("ref_", "").replace(".", "/") + ".py"
        path = os.path.join("/root/reference/satools/satools", rel)
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        if installed_stub:
            # leaving the stub installed breaks later imports that probe
            # torchaudio (e.g. transformers in test_wav2vec2)
            sys.modules.pop("torchaudio", None)
            sys.modules.pop("torchaudio.functional", None)
    return mod
