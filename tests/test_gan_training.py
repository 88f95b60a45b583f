"""HiFi-GAN training-step tests: loss parity of composition, step execution,
and data-parallel sharding over an 8-device CPU mesh."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import conftest as helpers


def _tiny_setup():
    import jax

    from satpu.models.anonymizer import AnonymizationNet, AnonymizerConfig
    from satpu.models.asrbn import TDNNFNetConfig
    from satpu.hifigan.trainer import GanHparams, init_gan_state, make_gan_train_step

    cfg = AnonymizerConfig(
        asrbn=TDNNFNetConfig(output_dim=8, hidden_dim=16, bottleneck_dim=8,
                             prefinal_bottleneck_dim=8),
        num_speakers=4, bn_dim=8,
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
    )
    model = AnonymizationNet(cfg)
    rng = jax.random.PRNGKey(0)
    B, T_bn = 2, 16
    seg = T_bn * 16  # total upsample 4*4
    f0 = np.abs(np.random.default_rng(0).standard_normal((B, T_bn))).astype(np.float32) * 100
    bn = np.random.default_rng(1).standard_normal((B, cfg.bn_dim, T_bn)).astype(np.float32)
    spk = np.eye(cfg.num_speakers, dtype=np.float32)[[0, 1]]
    variables = model.init(rng, f0, bn, spk, method=model.forward_decoder)
    h = GanHparams(segment_size=seg, n_fft=64, num_mels=8, hop_size=16, win_size=64,
                   fmax=8000.0)
    state, mpd, msd = init_gan_state(model, dict(variables), rng, h)
    step = make_gan_train_step(model, mpd, msd, h)
    batch = {
        "bn": bn, "f0": f0, "spk": spk,
        "audio": np.random.default_rng(2).standard_normal((B, seg)).astype(np.float32) * 0.1,
    }
    return model, state, step, batch


def test_gan_train_step_runs_and_learns():
    import jax

    model, state, step, batch = _tiny_setup()
    jstep = jax.jit(step)
    metrics_hist = []
    for i in range(3):
        state, metrics = jstep(state, batch)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    assert state.step == 3
    for m in metrics_hist:
        assert np.isfinite(m["loss_gen_all"]) and np.isfinite(m["loss_disc_all"])
    # params actually changed
    leaf0 = jax.tree_util.tree_leaves(state.params_g)[0]
    assert np.isfinite(np.asarray(leaf0)).all()


def test_gan_train_step_data_parallel_mesh():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from satpu.parallel import DATA_AXIS, make_mesh

    model, state, step, batch = _tiny_setup()
    devices = conftest_cpu_devices()
    mesh = make_mesh(n_data=8, devices=devices)
    repl = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P(DATA_AXIS))

    # pad batch to 8 items
    batch8 = {k: np.repeat(v, 4, axis=0) for k, v in batch.items()}
    batch8 = jax.tree_util.tree_map(lambda x: jax.device_put(x, data_sh), batch8)
    state = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)

    jstep = jax.jit(step, out_shardings=(None, None))
    new_state, metrics = jstep(state, batch8)
    assert np.isfinite(float(metrics["loss_gen_all"]))
    assert int(new_state.step) == int(state.step) + 1


def conftest_cpu_devices():
    import conftest

    return conftest.cpu_devices()


def test_multihost_helpers_single_process():
    """multi-host utilities degenerate correctly in single-process runs and
    the assembled global batch drives a sharded step (SURVEY.md §5.8)."""
    import jax
    import numpy as np

    from satpu.parallel import make_mesh
    from satpu.parallel.multihost import (global_batch_from_host_local,
                                          host_local_batch_size,
                                          host_shard_list, init_distributed)

    assert init_distributed() == 1  # no coordinator configured: no-op
    assert host_shard_list([1, 2, 3]) == [1, 2, 3]
    assert host_shard_list(list(range(10)), process_index=1, process_count=4) == [1, 5, 9]
    assert host_local_batch_size(16, process_count=4) == 4
    mesh = make_mesh(n_data=8, devices=jax.devices("cpu")[:8])
    batch = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    g = global_batch_from_host_local(mesh, batch)
    assert g["x"].shape == (16, 1)
    total = jax.jit(lambda b: b["x"].sum())(g)
    np.testing.assert_allclose(float(total), np.arange(16).sum())


def test_gan_bf16_policy_tracks_f32():
    """The explicit bf16 training policy (GanHparams.compute_dtype) must stay
    finite and track the f32 trajectory on the tiny config — the convergence
    smoke behind the 2x serving-throughput training policy."""
    import dataclasses

    import jax
    import numpy as np

    from satpu.models.anonymizer import AnonymizationNet, AnonymizerConfig
    from satpu.models.asrbn import TDNNFNetConfig
    from satpu.hifigan.trainer import GanHparams, init_gan_state, make_gan_train_step

    def run(compute_dtype, steps=6):
        cfg = AnonymizerConfig(
            asrbn=TDNNFNetConfig(output_dim=8, hidden_dim=16, bottleneck_dim=8,
                                 prefinal_bottleneck_dim=8),
            num_speakers=4, bn_dim=8,
            upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
            upsample_initial_channel=32, compute_dtype=compute_dtype)
        model = AnonymizationNet(cfg)
        rng = jax.random.PRNGKey(0)
        B, T_bn = 2, 16
        seg = T_bn * 16
        f0 = np.abs(np.random.default_rng(0).standard_normal((B, T_bn))).astype(np.float32) * 100
        bn = np.random.default_rng(1).standard_normal((B, cfg.bn_dim, T_bn)).astype(np.float32)
        spk = np.eye(cfg.num_speakers, dtype=np.float32)[[0, 1]]
        # init in f32 so both runs share the same parameters
        init_cfg = dataclasses.replace(cfg, compute_dtype="float32")
        variables = AnonymizationNet(init_cfg).init(
            rng, f0, bn, spk, method=AnonymizationNet(init_cfg).forward_decoder)
        h = GanHparams(segment_size=seg, n_fft=64, num_mels=8, hop_size=16,
                       win_size=64, fmax=8000.0, compute_dtype=compute_dtype)
        state, mpd, msd = init_gan_state(model, dict(variables), rng, h)
        step = jax.jit(make_gan_train_step(model, mpd, msd, h))
        batch = {"bn": bn, "f0": f0, "spk": spk,
                 "audio": np.random.default_rng(2).standard_normal((B, seg)).astype(np.float32) * 0.1}
        hist = []
        for _ in range(steps):
            state, metrics = step(state, batch)
            hist.append({k: float(v) for k, v in metrics.items()})
        return hist

    f32 = run("float32")
    bf16 = run("bfloat16")
    for a, b in zip(f32, bf16):
        assert np.isfinite(b["loss_gen_all"]) and np.isfinite(b["loss_disc_all"])
        # same order of magnitude and direction (bf16 rounding shifts values)
        assert abs(b["loss_gen_all"] - a["loss_gen_all"]) / max(abs(a["loss_gen_all"]), 1.0) < 0.15
        assert abs(b["loss_disc_all"] - a["loss_disc_all"]) / max(abs(a["loss_disc_all"]), 1.0) < 0.25
    # both trajectories actually train (D loss moves down from its start)
    assert bf16[-1]["loss_disc_all"] < bf16[0]["loss_disc_all"]
