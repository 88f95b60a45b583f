"""Worker process for the real 2-process jax.distributed test.

Launched by tests/test_multiprocess.py with
``PALLAS_AXON_POOL_IPS='' JAX_PLATFORMS=cpu`` (no axon plugin) and 4 virtual
CPU devices per process: two processes form one 8-device global mesh over
gloo collectives — the CPU stand-in for a 2-host TPU pod over DCN
(the reference's ssh.pl multi-node path, asr train.py:270-276).

argv: <process_id> <coordinator_port> <out_json>
"""
import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
out_path = sys.argv[3]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from satpu.parallel.hostmesh import cpu_mesh_xla_flags  # noqa: E402

# canonical virtual-mesh flags: non-concurrency scheduler (collective-
# ordering deadlock fix) + fail-fast 120 s collective timeouts
os.environ["XLA_FLAGS"] = cpu_mesh_xla_flags(
    4, extra=os.environ.get("XLA_FLAGS", ""))

import jax  # noqa: E402

# persistent compile cache: without it each worker recompiles the GAN step
# (~minutes on a 1-core host), which is what the 480 s timeout guards.
# Namespaced per process config like conftest (both workers share one).
import hashlib  # noqa: E402

import jaxlib  # noqa: E402

_fp = hashlib.sha1(":".join([
    jaxlib.__version__, os.environ.get("XLA_FLAGS", ""),
    os.environ.get("JAX_PLATFORMS", "")]).encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.environ.get("SATPU_TEST_JAX_CACHE",
                                              "/tmp/satpu_test_jax_cache"), _fp))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402

from satpu.parallel import DATA_AXIS, make_mesh  # noqa: E402
from satpu.parallel.multihost import (  # noqa: E402
    global_batch_from_host_local, host_local_batch_size, init_distributed,
    replicate_global)


def main():
    nproc = init_distributed(f"127.0.0.1:{port}", 2, pid)
    assert nproc == 2, f"expected 2 processes, got {nproc}"
    assert len(jax.devices()) == 8, jax.devices()
    assert len(jax.local_devices()) == 4

    from satpu.hifigan.trainer import GanHparams, init_gan_state, make_gan_train_step
    from satpu.models.anonymizer import AnonymizationNet, AnonymizerConfig
    from satpu.models.asrbn import TDNNFNetConfig

    cfg = AnonymizerConfig(
        asrbn=TDNNFNetConfig(output_dim=8, hidden_dim=16, bottleneck_dim=8,
                             prefinal_bottleneck_dim=8),
        num_speakers=4, bn_dim=8,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32)
    model = AnonymizationNet(cfg)
    rng = jax.random.PRNGKey(0)

    B_global, T_bn = 8, 16
    seg = T_bn * 16
    B_local = host_local_batch_size(B_global)
    assert B_local == 4

    # every process derives the same global batch, then keeps its slice
    gen = np.random.default_rng(0)
    f0 = np.abs(gen.standard_normal((B_global, T_bn))).astype(np.float32) * 100
    bn = gen.standard_normal((B_global, cfg.bn_dim, T_bn)).astype(np.float32)
    spk = np.eye(cfg.num_speakers, dtype=np.float32)[np.arange(B_global) % 4]
    audio = gen.standard_normal((B_global, seg)).astype(np.float32) * 0.1
    lo, hi = pid * B_local, (pid + 1) * B_local
    local = {"f0": f0[lo:hi], "bn": bn[lo:hi], "spk": spk[lo:hi],
             "audio": audio[lo:hi]}

    variables = model.init(rng, f0[:1], bn[:1], spk[:1],
                           method=model.forward_decoder)
    # shrunk discriminators: this worker validates 2-process gloo mesh
    # formation + a collective train step, not loss semantics; see
    # test_gan_training.py's mesh test for the rationale
    h = GanHparams(segment_size=seg, n_fft=64, num_mels=8, hop_size=16,
                   win_size=64, mpd_periods=(2,), msd_scales=1,
                   disc_channel_scale=1 / 16)
    state, mpd, msd = init_gan_state(model, dict(variables), rng, h)
    step = make_gan_train_step(model, mpd, msd, h)

    mesh = make_mesh(n_data=8)
    batch = global_batch_from_host_local(mesh, local)
    state = replicate_global(mesh, state)

    # Compile is process-local and can take minutes on a loaded 1-core host;
    # gloo's collective rendezvous times out at 30 s. AOT-compile first, then
    # rendezvous at a coordination-service barrier (long timeout) so both
    # workers enter the collective execution together.
    compiled = jax.jit(step).lower(state, batch).compile()
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier("mp_gan_compiled", 600_000)
    new_state, metrics = compiled(state, batch)
    result = {"process": pid,
              "loss_gen_all": float(metrics["loss_gen_all"]),
              "loss_disc_all": float(metrics["loss_disc_all"]),
              "step": int(new_state.step)}
    with open(out_path, "w") as f:
        json.dump(result, f)
    print("worker", pid, "ok", result, flush=True)
    # Explicit rendezvoused shutdown right after the (collective) step: the
    # implicit atexit shutdown barrier can time out when one worker's exit
    # path is slower on a loaded 1-core CI host. Shutdown cleanliness is not
    # what this test asserts, so a barrier timeout here must not fail it.
    try:
        jax.distributed.shutdown()
    except Exception as e:  # pragma: no cover - timing dependent
        print("worker", pid, "shutdown barrier skipped:", e, flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
