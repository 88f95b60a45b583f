"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding logic is validated on
XLA's host platform with 8 virtual devices, which exercises the same mesh /
NamedSharding / collective code paths.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["XLA_FLAGS"] = flags
# pins the CPU-mesh scheduler (collective-ordering deadlock fix) and the
# 120 s fail-fast collective timeouts — see satpu/parallel/hostmesh.py
from satpu.parallel.hostmesh import ensure_cpu_mesh_flags

ensure_cpu_mesh_flags()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# The axon TPU plugin ignores JAX_PLATFORMS=cpu, so route test computation to
# the (always present) CPU backend explicitly: exact fp32 matmuls for golden
# comparisons and an 8-virtual-device mesh for sharding tests.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_default_device", jax.devices("cpu")[0])

# Persistent compilation cache: the suite's wall time is dominated by XLA CPU
# compiles on this 1-core host (round-1 weak #8); warm runs skip them. The
# root is namespaced per process configuration (jaxlib/XLA_FLAGS/platform),
# like satpu.utils.config.enable_compilation_cache: XLA:CPU AOT executables
# embed codegen details the jax cache key does not cover, so differently-
# flagged processes must not share entries. (The cpu_aot_loader feature-
# mismatch spam appears even on valid same-config reloads; it is noise.)
import hashlib

import jaxlib

_cache_fp = hashlib.sha1(":".join([
    jaxlib.__version__, os.environ.get("XLA_FLAGS", ""),
    os.environ.get("JAX_PLATFORMS", "")]).encode()).hexdigest()[:10]
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.environ.get("SATPU_TEST_JAX_CACHE",
                                "/tmp/satpu_test_jax_cache"), _cache_fp))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def cpu_devices():
    return jax.devices("cpu")


def mesh_cli_env():
    """Subprocess env for CLI tests that run on the virtual 8-device CPU mesh.

    Uses the canonical virtual-mesh XLA flags (satpu/parallel/hostmesh.py):
    the non-concurrency HLO scheduler (collective-ordering deadlock fix) and
    fail-fast 120 s collective timeouts. Subprocess timeouts in callers
    should cover compile time on a cold cache (>= 600 s on this 1-core
    host), not the collective timeout.
    """
    from satpu.parallel.hostmesh import cpu_mesh_xla_flags

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip the axon plugin in subprocesses
    env["XLA_FLAGS"] = cpu_mesh_xla_flags(8)
    env["SATPU_JAX_CACHE"] = env.get("SATPU_TEST_JAX_CACHE",
                                     "/tmp/satpu_test_jax_cache")
    return env

import importlib

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
