"""ASV (x-vector) training driver — the reference's
egs/asv/voxceleb/local/train.py + SidekitModel loop (sidekit/model.py:325-493).

Epoch loop of jitted data-parallel steps over SideSampler-balanced batches,
validation EER each epoch, TrainingMonitor early stopping, best.ckpt symlink.

Usage:
  python -m satpu.bin.train_asv --config egs/asv/voxceleb/configs/ecapa.ini
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import sys

import numpy as np

from ..utils import checkpoint as ckpt
from ..utils import config as cfg


@dataclasses.dataclass
class TrainAsvOpts(cfg.Opts):
    train_set: str = ""
    dirname: str = "exp/asv"
    arch: str = "ecapa"  # ecapa | resnet
    channels: int = 512
    embedding_size: int = 192
    duration: float = 3.0
    examples_per_speaker: int = 2
    samples_per_speaker: int = 100
    minibatch_size: int = 128
    lr: float = 1e-3
    weight_decay: float = 2e-5
    # ArcMargin head decays 10x harder, as in the reference recipes
    # (tuning/ecapa_tdnn.py:59)
    head_weight_decay: float = 2e-4
    # "one_cycle" (the reference recipe's OneCycleLR, configs/ecapa_tdnn:35),
    # "exponential" (per-epoch gamma decay, the fine-tune recipe's
    # ExponentialLR, configs/ecapa_tdnn_fine_tune:35), or "constant"
    lr_schedule: str = "one_cycle"
    lr_gamma: float = 0.2  # "exponential" per-epoch factor
    # inline lenient JSON or a .json path (reference configs/tdnnf_bn:40-56):
    # {"pipeline": ["add_reverb", "add_noise", "phone_filtering", "codec"],
    #  "aug_number": 1, "add_noise": {"noise_db_csv": "data/musan.csv"},
    #  "add_reverb": {"rir_db_csv": "data/reverb.csv"}}
    augmentation: str = ""
    epochs: int = 100
    patience: int = 10
    fine_tune: bool = False  # raises ArcMargin m to 0.4, disables specaug
    # "bfloat16" = AMP-analog trunk autocast (reference sidekit/objf.py:57)
    compute_dtype: str = "float32"
    # warm start (fine-tune seed): shape-matching params transferred from this
    # checkpoint (reference sidekit/model.py:152-156 via match_state_dict)
    init_weight_model: str = ""
    seed: int = 1234


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="satpu %(levelname)s: %(message)s")
    cfg.enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="")
    args, rest = parser.parse_known_args(argv)
    opts = TrainAsvOpts()
    if args.config:
        ini = cfg.load_ini(args.config)
        for sec, kv in ini.items():
            if sec != "var":
                opts.load_from_config(kv)
    opts.load_from_args(rest)

    import jax

    from .. import infer_helper
    from ..sidekit.dataset import SideSampler, SideSet
    from ..sidekit.trainer import (TrainingMonitor, init_asv_state,
                                   make_asv_optimizer, make_asv_train_step,
                                   validation_eer)
    from ..sidekit.xvector import XVectorConfig, build_xvector

    os.makedirs(opts.dirname, exist_ok=True)
    from ..ops.augment import load_augmentation

    aug, noise_db, rir_db = load_augmentation(opts.augmentation)
    if aug:
        logging.info("augmentation: %s (x%d)", aug.get("pipeline"),
                     aug.get("aug_number", 1))
    side = SideSet.from_data_dir(opts.train_set, duration=opts.duration,
                                 random_shift=not opts.fine_tune,
                                 transform_pipeline=aug, noise_db=noise_db,
                                 rir_db=rir_db)
    speakers = side.speakers
    logging.info("%d chunks over %d speakers", len(side), len(speakers))

    xcfg = XVectorConfig(num_speakers=len(speakers), arch=opts.arch,
                         channels=opts.channels, embedding_size=opts.embedding_size,
                         spec_augment=not opts.fine_tune)
    model = build_xvector(xcfg)
    optimizer = make_asv_optimizer(lr=opts.lr, weight_decay=opts.weight_decay,
                                   head_weight_decay=opts.head_weight_decay)
    dur = int(opts.duration * 16000)
    state = init_asv_state(model, jax.random.PRNGKey(opts.seed),
                           np.zeros((2, dur), np.float32), optimizer)
    arc_m = 0.4 if opts.fine_tune else None
    lr_schedule = None
    steps_per_epoch = max(
        (len(speakers) * opts.samples_per_speaker) // opts.minibatch_size, 1)
    if opts.lr_schedule == "one_cycle":
        # the reference recipe's OneCycleLR (configs/ecapa_tdnn:35, max_lr=lr)
        from ..utils.schedules import one_cycle

        lr_schedule = one_cycle(opts.lr, steps_per_epoch * opts.epochs,
                                div_factor=4.0)
    elif opts.lr_schedule == "exponential":
        # fine-tune recipe's per-epoch ExponentialLR
        # (configs/ecapa_tdnn_fine_tune:35, gamma=0.2)
        import jax.numpy as jnp

        lr_schedule = (lambda step:
                       opts.lr * opts.lr_gamma ** (step // steps_per_epoch)
                       .astype(jnp.float32))
    step = jax.jit(make_asv_train_step(model, optimizer, arc_m=arc_m,
                                       lr_schedule=lr_schedule,
                                       compute_dtype=opts.compute_dtype))

    if opts.init_weight_model:
        import jax.numpy as jnp

        _, wstate = ckpt.load_checkpoint(opts.init_weight_model)
        loaded = wstate.get("variables", wstate)
        merged, matched, unmatched = ckpt.match_params(
            state.params, loaded.get("params", {}))
        bs = loaded.get("batch_stats")
        state = dataclasses.replace(
            state, params=merged,
            batch_stats=ckpt.match_params(state.batch_stats, bs)[0]
            if bs else state.batch_stats)
        logging.info("init_weight_model %s: %d params transferred, %d skipped",
                     opts.init_weight_model, len(matched), len(unmatched))

    from ..utils.metrics import MetricsWriter

    metrics_log = MetricsWriter(opts.dirname)
    metrics_log.attach_log_handler()
    try:

        monitor = TrainingMonitor(patience=opts.patience)

        # ---- resume (sidekit/model.py:267-303: {epoch}.pt + trainer_{epoch}.pt) ----
        start_epoch = 0
        last_trainer = ckpt.latest_checkpoint(opts.dirname, "trainer_")
        if last_trainer:
            import jax.numpy as jnp

            meta, tstate = ckpt.load_checkpoint(last_trainer)
            start_epoch = meta.get("epoch", -1) + 1
            monitor.load_state_dict(meta["monitor"])
            mmeta, mstate = ckpt.load_checkpoint(
                os.path.join(opts.dirname, f"{meta['epoch']}.ckpt"))
            variables = mstate.get("variables", mstate)
            state = dataclasses.replace(
                state,
                step=jnp.asarray(meta.get("step", 0), jnp.int32),
                params=variables["params"],
                batch_stats=variables.get("batch_stats", state.batch_stats),
                opt_state=ckpt.restore_like(state.opt_state, tstate["opt_state"]))
            logging.info("resuming from %s (epoch %d, best EER %.2f%% @ %d)",
                         last_trainer, start_epoch, monitor.best_eer * 100,
                         monitor.best_epoch)
        # local multi-chip data parallelism: replicate state, shard batches
        # (the reference's torchrun DDP launch, sidekit/model.py:248-252)
        from ..parallel import local_data_mesh, replicate, shard_batch

        mesh = local_data_mesh(opts.minibatch_size)
        if mesh is not None:
            state = replicate(mesh, state)
            logging.info("data-parallel mesh over %d devices",
                         mesh.devices.size)

        sampler = SideSampler(side.chunk_speakers, len(speakers),
                              opts.examples_per_speaker, opts.samples_per_speaker,
                              opts.minibatch_size, seed=opts.seed)
        epoch_key = jax.random.PRNGKey(opts.seed + 1)
        for epoch in range(start_epoch, opts.epochs):
            sampler.set_epoch(epoch)
            losses = []
            step_key = jax.random.fold_in(epoch_key, epoch)
            for wav, spk in side.batches(sampler, opts.minibatch_size):
                # fresh key per batch: one key per epoch made every SpecAugment
                # mask identical across the epoch's steps (round-1 weak #10)
                step_key, sub = jax.random.split(step_key)
                if mesh is not None:
                    wav, spk = shard_batch(mesh, (wav, spk))
                state, metrics = step(state, wav, spk, sub)
                losses.append(float(metrics["loss"]))
            # quick validation on a slice of chunks
            val_idx = list(range(0, len(side), max(len(side) // 64, 1)))[:64]
            wavs = [side[i][0] for i in val_idx]
            labels = np.asarray([side[i][1] for i in val_idx])
            from ..sidekit.trainer import extract_xvectors

            emb = extract_xvectors(model, {"params": state.params,
                                           "batch_stats": state.batch_stats}, wavs)
            eer = validation_eer(emb, labels)
            is_best = monitor.update(epoch, eer)
            metrics_log.write(int(state.step),
                              {"loss": float(np.mean(losses)) if losses else float("nan"),
                               "val_eer": eer}, epoch=epoch)
            logging.info("epoch %d loss %.3f val-EER %.2f%%%s", epoch,
                         float(np.mean(losses)) if losses else float("nan"),
                         eer * 100, " (best)" if is_best else "")
            path = os.path.join(opts.dirname, f"{epoch}.ckpt")
            infer_helper.save_model(path, "asv_xvector",
                                    dataclasses.asdict(xcfg) | {},
                                    {"params": state.params, "batch_stats": state.batch_stats},
                                    extra_meta={"speakers": speakers, "epoch": epoch})
            ckpt.save_checkpoint(
                os.path.join(opts.dirname, f"trainer_{epoch}.ckpt"),
                {"epoch": epoch, "step": int(state.step),
                 "monitor": monitor.state_dict()},
                {"opt_state": state.opt_state})
            if is_best:
                best = os.path.join(opts.dirname, "best.ckpt")
                if os.path.islink(best) or os.path.exists(best):
                    os.remove(best)
                os.symlink(os.path.basename(path), best)
            ckpt.checkpoint_gc(opts.dirname, "", keep_last=10,
                               protected=[os.path.join(opts.dirname, "best.ckpt")])
            ckpt.checkpoint_gc(opts.dirname, "trainer_", keep_last=2)
            if monitor.should_stop:
                logging.info("early stop at epoch %d (best %.2f%% @ %d)", epoch,
                             monitor.best_eer * 100, monitor.best_epoch)
                break
        return 0
    finally:
        metrics_log.close()


if __name__ == "__main__":
    sys.exit(main())
