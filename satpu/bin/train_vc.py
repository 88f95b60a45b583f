"""HiFi-GAN (voice conversion) training driver — the reference's
egs/vc/libritts/local/train.py + HifiGanModel trainer loop
(satools/satools/hifigan/model.py:296-539) as one config-driven CLI.

Stages: feature-cache warmup (fake_epoch) -> epoch loop of jitted GAN steps
(data-parallel over the mesh) -> periodic validation (mel error) +
checkpoints (g_/d_/trainer_ triplet, g_best symlink, sliding GC).

Usage:
  python -m satpu.bin.train_vc --config egs/vc/libritts/configs/hifigan.ini
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys
import time

import numpy as np

from ..utils import config as cfg
from ..utils import checkpoint as ckpt


@dataclasses.dataclass
class TrainVcOpts(cfg.Opts):
    train_set: str = ""
    dev_set: str = ""
    dirname: str = "exp/hifigan"
    asrbn_checkpoint: str = ""  # frozen BN extractor (satpu checkpoint)
    minibatch_size: int = 8
    segment_size: int = 16640
    # "float32" | "bfloat16": explicit mixed-precision training policy for
    # the G/D conv stacks (the reference trains under autocast)
    compute_dtype: str = "float32"
    lr: float = 0.0002
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999
    training_epochs: int = 1500
    checkpoint_interval: int = 1000
    init_weight_model: str = ""
    fake_epoch: bool = False
    num_speakers: int = 0  # 0 = infer from utt2spk
    f0_transformation: str = ""
    f0_norm: str = "utt"  # utt | speaker (hifigan_clean's SpeakerCMVN)
    # generator architecture (reference tuning/hifigan.py knobs); comma lists
    upsample_rates: str = "5,4,4,2,2"
    upsample_kernel_sizes: str = "11,8,8,4,4"
    upsample_initial_channel: int = 512
    bn_dim: int = 256


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="satpu %(levelname)s: %(message)s")
    cfg.enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="")
    args, rest = parser.parse_known_args(argv)
    opts = TrainVcOpts()
    if args.config:
        ini = cfg.load_ini(args.config)
        for sec in ("var", "exp", "hifigan", "train"):
            if sec in ini and sec != "var":
                opts.load_from_config(ini[sec])
    opts.load_from_args(rest)

    import jax

    from ..parallel import multihost

    nproc = multihost.init_distributed()

    from .. import infer_helper
    from ..hifigan.dataset import HifiGanDataset
    from ..hifigan.trainer import (GanHparams, init_gan_state, make_gan_eval_step,
                                   make_gan_sample_step,
                                   make_gan_train_step, restore_gan_state)
    from ..models.anonymizer import AnonymizationNet, AnonymizerConfig
    from ..models.asrbn import TDNNFNetConfig
    from ..utils import kaldi_data
    from ..utils.metrics import MetricsWriter, profile_steps

    os.makedirs(opts.dirname, exist_ok=True)

    utt2spk = kaldi_data.read_keyed_text(os.path.join(opts.train_set, "utt2spk"))
    speakers = sorted(set(utt2spk.values()))
    num_speakers = opts.num_speakers or len(speakers)

    # frozen BN extractor
    if opts.asrbn_checkpoint:
        bn_model, bn_vars, bn_meta = infer_helper.load_model(opts.asrbn_checkpoint)
        asrbn_cfg = bn_model.cfg
    else:
        # smoke-test fallback: a randomly initialized extractor (real recipes
        # always point at a trained ASR-BN checkpoint, tuning/hifigan.py:27-28)
        from ..models.asrbn import TDNNFNet

        logging.warning("no --asrbn-checkpoint: using a randomly initialized "
                        "BN extractor (smoke-test only)")
        asrbn_cfg = TDNNFNetConfig()
        bn_model = TDNNFNet(asrbn_cfg)
        bn_vars = jax.jit(
            lambda k, w: bn_model.init(k, w, method=bn_model.extract_bn))(
                jax.random.PRNGKey(1), np.zeros((1, 32000), np.float32))

    @jax.jit
    def bn_fn_j(wav, lengths):
        import jax.numpy as jnp

        bn = bn_model.apply(bn_vars, wav, lengths=lengths,
                            method=bn_model.extract_bn)
        return jnp.transpose(bn, (0, 2, 1))

    def bn_fn(wav, lengths):
        # two-arg form: HifiGanDataset bucket-pads the audio and crops the
        # output, so this compiles once per bucket, not once per length
        return np.asarray(bn_fn_j(wav, lengths))[0]

    anon_cfg = AnonymizerConfig(
        asrbn=asrbn_cfg, num_speakers=num_speakers,
        f0_transformation=opts.f0_transformation,
        f0_norm="none" if opts.f0_norm == "speaker" else opts.f0_norm,
        upsample_rates=tuple(int(x) for x in opts.upsample_rates.split(",")),
        upsample_kernel_sizes=tuple(int(x) for x in opts.upsample_kernel_sizes.split(",")),
        upsample_initial_channel=opts.upsample_initial_channel,
        bn_dim=opts.bn_dim, compute_dtype=opts.compute_dtype)
    model = AnonymizationNet(anon_cfg)

    f0_j = jax.jit(model.get_f0)

    def f0_fn(wav, lengths):
        # YAAPT runs on the bucket-padded audio; the dataset crops to the true
        # frame count (same train/infer consistency as the anonymize pipeline,
        # which also feeds bucket-padded audio to get_f0)
        return np.asarray(f0_j(wav))[0]

    # cache signature ties cached BN features to the extractor identity so a
    # different --asrbn-checkpoint never reads another model's stale features
    bn_sig = f"{opts.asrbn_checkpoint}|{asrbn_cfg}"
    ds = HifiGanDataset(opts.train_set, speakers=speakers, bn_fn=bn_fn, f0_fn=f0_fn,
                        segment_size=opts.segment_size, cache_signature=bn_sig)
    f0_cmvn = None
    if opts.f0_norm == "speaker":
        # per-speaker F0 statistics over the (cache-filling) stats pass, then
        # host-side normalization in the dataset (hifigan_clean.py:37)
        from ..ops.cmvn import SpeakerCMVN

        f0_cmvn = SpeakerCMVN(keep_zeros=True)
        logging.info("f0_norm=speaker: accumulating per-speaker F0 stats")
        for i in range(len(ds)):
            _, _, f0_i, _ = ds.features(i)
            f0_cmvn.accumulate(f0_i, ds.utts[i].spk)
        ds.f0_norm_fn = lambda f0, spk: f0_cmvn(f0, spk)
    if opts.fake_epoch and f0_cmvn is None:
        logging.info("fake_epoch: warming feature caches over %d utts", len(ds))
        ds.fake_epoch(progress_cb=lambda d, t: d % 100 == 0 and logging.info("%d/%d", d, t))

    h = GanHparams(lr=opts.lr, adam_b1=opts.adam_b1, adam_b2=opts.adam_b2,
                   lr_decay=opts.lr_decay, segment_size=opts.segment_size,
                   compute_dtype=opts.compute_dtype)
    rng = jax.random.PRNGKey(0)
    T_bn = opts.segment_size // 320
    init_batch = {
        "bn": np.zeros((1, anon_cfg.bn_dim, T_bn), np.float32),
        "f0": np.zeros((1, T_bn), np.float32),
        "spk": np.zeros((1, num_speakers), np.float32),
    }
    variables = jax.jit(
        lambda r, f, b, s: model.init(r, f, b, s, method=model.forward_decoder))(
            rng, init_batch["f0"], init_batch["bn"], init_batch["spk"])
    if opts.init_weight_model:
        _, ivars, _ = infer_helper.load_model(opts.init_weight_model)
        variables = ivars
    state, mpd, msd = init_gan_state(model, dict(variables), rng, h)
    step_fn = jax.jit(make_gan_train_step(model, mpd, msd, h))
    eval_fn = jax.jit(make_gan_eval_step(model, h))
    sample_fn = jax.jit(make_gan_sample_step(model, h))

    # multi-host DP: each host feeds minibatch_size/nproc utterances; the
    # jitted step consumes the globally-assembled batch over the full mesh
    local_bs = (multihost.host_local_batch_size(opts.minibatch_size, nproc)
                if nproc > 1 else opts.minibatch_size)
    mesh = None
    if nproc > 1 or len(jax.devices()) > 1:
        # multi-host DP (nproc > 1) or single-host multi-chip DP: one global
        # 1-D mesh; global_batch_from_host_local degenerates to shard_batch
        # in the single-process case (the reference's torchrun DDP launch,
        # hifigan/model.py:231-264)
        from ..parallel import make_mesh

        n_dev = len(jax.devices())
        if opts.minibatch_size % n_dev:
            raise ValueError(
                f"minibatch_size {opts.minibatch_size} must be divisible by "
                f"the global device count {n_dev} for data-parallel training")
        mesh = make_mesh(n_data=n_dev)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec())), state)
        logging.info("data-parallel mesh over %d devices", n_dev)

    dev_ds = None
    if opts.dev_set:
        dev_ds = HifiGanDataset(opts.dev_set, speakers=speakers, bn_fn=bn_fn,
                                f0_fn=f0_fn, segment_size=opts.segment_size,
                                cache_signature=bn_sig,
                                f0_norm_fn=(lambda f0, spk: f0_cmvn(f0, spk))
                                if f0_cmvn is not None else None)
        if f0_cmvn is not None:
            f0_cmvn.pass_through = True  # unseen dev speakers pass through

    # resume: restore the full g_/d_/trainer_ triplet (reference
    # vc train.py:117-125, hifigan/model.py:266-281)
    last = ckpt.latest_checkpoint(opts.dirname, "trainer_")
    start_epoch, steps, best_val = 0, 0, float("inf")
    if last:
        meta, trainer_state = ckpt.load_checkpoint(last)
        start_epoch = meta.get("epoch", 0)
        steps = meta.get("steps", 0)
        best_val = meta.get("best_val") or float("inf")
        g_path = os.path.join(opts.dirname, f"g_{steps}.ckpt")
        d_path = os.path.join(opts.dirname, f"d_{steps}.ckpt")
        _, g_state = ckpt.load_checkpoint(g_path)
        _, d_state = ckpt.load_checkpoint(d_path)
        state = restore_gan_state(state, g_state["variables"], d_state,
                                  trainer_state, start_epoch, steps)
        logging.info("resuming from %s (epoch %d, step %d, best_val %.4f)",
                     last, start_epoch, steps, best_val)

    metrics_log = MetricsWriter(opts.dirname)
    metrics_log.attach_log_handler()
    try:

        def validate_and_save(epoch, steps, best_val):
            val_err = None
            if dev_ds is not None:
                errs = [float(eval_fn(state.params_g, state.frozen_g, b))
                        for b in dev_ds.batches(opts.minibatch_size, shuffle=False)]
                if errs:
                    val_err = sum(errs) / len(errs)
                    metrics_log.write(steps, "val_mel_error", val_err, epoch=epoch)
                    logging.info("validation mel error: %.4f (best %.4f)", val_err,
                                 best_val)
                    # tensorboard audio + spectrogram samples from the first dev
                    # batch (reference hifigan/model.py:481-502)
                    if metrics_log.tb is not None:
                        b0 = next(dev_ds.batches(opts.minibatch_size, shuffle=False))
                        y_gen, mel_gen, mel_real = sample_fn(state.params_g,
                                                             state.frozen_g, b0)
                        metrics_log.audio(steps, "dev/y_gen", np.asarray(y_gen[0]),
                                          h.sampling_rate)
                        metrics_log.audio(steps, "dev/y_real",
                                          np.asarray(b0["audio"][0]), h.sampling_rate)
                        metrics_log.image(steps, "dev/mel_gen", np.asarray(mel_gen[0]))
                        metrics_log.image(steps, "dev/mel_real", np.asarray(mel_real[0]))
            _save(opts, model, anon_cfg, state, epoch, steps, speakers, best_val,
                  f0_cmvn)
            if val_err is not None and val_err < best_val:
                best_val = val_err
                best = os.path.join(opts.dirname, "g_best.ckpt")
                if os.path.lexists(best):
                    os.remove(best)
                os.symlink(f"g_{steps}.ckpt", best)
            return best_val

        for epoch in range(start_epoch, opts.training_epochs):
            with profile_steps(opts.dirname):
                for batch in ds.batches(local_bs, epoch=epoch,
                                        process_index=jax.process_index(),
                                        process_count=nproc):
                    t0 = time.time()
                    if mesh is not None:
                        batch = multihost.global_batch_from_host_local(mesh, batch)
                    state, metrics = step_fn(state, batch)
                    steps += 1
                    if steps % 50 == 0:
                        logging.info(
                            "Epoch %d Steps %d Gen Loss %.3f Mel err %.3f s/b %.3f",
                            epoch + 1, steps, float(metrics["loss_gen_all"]),
                            float(metrics["mel_spec_error"]), time.time() - t0)
                        metrics_log.write(steps, {k: float(v) for k, v in metrics.items()},
                                          epoch=epoch)
                    if steps % opts.checkpoint_interval == 0:
                        best_val = validate_and_save(epoch, steps, best_val)
            state = state.replace(epoch=state.epoch + 1)
            best_val = validate_and_save(epoch + 1, steps, best_val)
        logging.info("training done at %d steps", steps)
        return 0
    finally:
        metrics_log.close()


def _save(opts, model, anon_cfg, state, epoch, steps, speakers, best_val,
          f0_cmvn=None):
    from ..hifigan.trainer import merge_generator_params
    from .. import infer_helper

    g_path = os.path.join(opts.dirname, f"g_{steps}.ckpt")
    variables = merge_generator_params(state.params_g, state.frozen_g)
    extra = {"speakers": speakers, "epoch": epoch, "steps": steps}
    if f0_cmvn is not None:
        extra["f0_speaker_stats"] = f0_cmvn.to_meta()
    infer_helper.save_model(
        g_path, "anonymizer_tdnnf_hifigan",
        {"asrbn": dataclasses.asdict(anon_cfg.asrbn),
         "num_speakers": anon_cfg.num_speakers, "f0_norm": anon_cfg.f0_norm},
        variables, extra_meta=extra)
    ckpt.save_checkpoint(os.path.join(opts.dirname, f"d_{steps}.ckpt"),
                         {"epoch": epoch, "steps": steps},
                         {"mpd": state.params_mpd, "msd": state.params_msd,
                          "spectral": state.spectral_msd})
    ckpt.save_checkpoint(os.path.join(opts.dirname, f"trainer_{steps}.ckpt"),
                         {"epoch": epoch, "steps": steps,
                          "best_val": None if best_val == float("inf") else best_val},
                         {"opt_g": state.opt_g, "opt_d": state.opt_d})
    best = os.path.join(opts.dirname, "g_best.ckpt")
    for prefix in ("g_", "d_", "trainer_"):
        ckpt.checkpoint_gc(opts.dirname, prefix, keep_last=10,
                           keep_every=10 * opts.checkpoint_interval,
                           protected=(best,))


if __name__ == "__main__":
    sys.exit(main())
