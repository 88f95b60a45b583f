"""LF-MMI (chain) ASR training driver — the reference's
egs/asr/librispeech/local/chain/train.py iteration flow collapsed into one
mesh-parallel process (no run.pl job fan-out / merge averaging; see
satpu.chain.trainer docstring).

Capabilities mirrored from the reference driver:
- exponential LR decay actually applied through the optimizer
  (script_utils.py:32-82 semantics)
- NG-SGD preconditioning on every NaturalAffineTransform
  (chain/objf.py:147-228) — on by default like the reference
- resume from the latest trainer checkpoint (params + optimizer + NG states;
  asr train.py:195-206)
- periodic valid-set diagnostics (asr train.py:307-315)
- final_combination: best-objf moving-average of the last checkpoints
  (chain/model.py:347-434)

Inputs are kaldi-prepared artifacts (wav.scp, fst_train.scp per-utt numerator
FSTs, utt2len, den.fst, num_pdfs) — or artifacts produced by
``satpu.chain.prep`` from a plain data dir.

Usage:
  python -m satpu.bin.train_asr --config egs/asr/librispeech/configs/tdnnf.ini
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import math
import os
import sys

import numpy as np

from ..utils import checkpoint as ckpt
from ..utils import config as cfg


@dataclasses.dataclass
class TrainAsrOpts(cfg.Opts):
    dirname: str = "exp/chain"
    train_set: str = ""  # data dir containing wav.scp/utt2len
    valid_set: str = ""  # optional held-out data dir (wav.scp/utt2len)
    fst_scp: str = ""  # numerator fsts
    valid_fst_scp: str = ""
    den_fst: str = ""
    normalization_fst: str = ""
    trans_mdl: str = ""  # kaldi 0.trans_mdl for transition-id-labeled graphs
    num_pdfs: int = 0
    # tdnnf | tdnnf_vq | tdnnf_dp | tdnnf_spkadv | tdnnf_wav2vec2[_vq]
    model: str = "tdnnf"
    wav2vec2_size: str = "large"  # large | base (for tdnnf_wav2vec2*)
    adversarial: bool = True  # for tdnnf_spkadv: gradient reversal on/off
    # tdnnf_spkadv train_asi phase (reference configs/tdnnf_bn_spkadv_train_asi
    # + tuning/tdnnf_spkadv.py:265-281): freeze the encoder below the prefinal
    # layers; the prefinal/chain/xent heads and the asi branch keep training
    freeze_encoder: bool = False
    hidden_dim: int = 1024
    bottleneck_dim: int = 128
    prefinal_bottleneck_dim: int = 256
    codebook_size: int = 0
    dp_epsilon: float = 0.0
    minibatch_size: int = 16
    num_epochs: int = 5
    lr_initial: float = 0.001
    lr_final: float = 0.0001
    natural_gradient: bool = True
    grad_acc_steps: int = 1
    xent_regularize: float = 0.025
    l2_regularize: float = 1e-4
    leaky_hmm_coefficient: float = 1e-5
    checkpoint_interval: int = 100
    diagnostics_interval: int = 50
    final_combination_n: int = 5
    train_stage: str = "0"
    # warm start: checkpoint whose shape-matching params seed the new model
    # (reference chain/model.py:129-154 via match_state_dict)
    init_weight_model: str = ""
    # "bfloat16" = mixed-precision net matmuls (LF-MMI FB + optimizer stay
    # f32), the chain analog of the reference's wav2vec2 autocast
    # (tuning/tdnnf_wav2vec2_vq.py:295)
    compute_dtype: str = "float32"
    # inline lenient JSON or a .json path (reference configs/tdnnf_bn:40-56):
    # {"pipeline": ["add_reverb", "add_noise", "phone_filtering", "codec"],
    #  "aug_number": 1, "add_noise": {"noise_db_csv": "data/musan.csv"},
    #  "add_reverb": {"rir_db_csv": "data/reverb.csv"}}
    augmentation: str = ""


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="satpu %(levelname)s: %(message)s")
    cfg.enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default="")
    args, rest = parser.parse_known_args(argv)
    opts = TrainAsrOpts()
    if args.config:
        ini = cfg.load_ini(args.config)
        for sec, kv in ini.items():
            if sec != "var":
                opts.load_from_config(kv)
    opts.load_from_args(rest)

    import jax
    import jax.numpy as jnp

    from .. import infer_helper
    from ..chain.dataset import BucketBatchSampler, EgsDataset
    from ..chain.fst import Fst
    from ..chain.objf import DenominatorGraph
    from ..chain.trainer import (ChainTrainOpts, apply_orthonormal_constraint,
                                 init_chain_state, make_chain_optimizer,
                                 make_chain_train_step, make_chain_valid_step,
                                 merge_models)
    from ..models.asrbn import TDNNFNet, TDNNFNetConfig
    from ..utils.checkpoint import restore_like
    from ..utils.metrics import MetricsWriter, profile_steps

    os.makedirs(opts.dirname, exist_ok=True)
    den = DenominatorGraph.from_fst(Fst.read(opts.den_fst), num_pdfs=opts.num_pdfs)
    norm_fst = opts.normalization_fst or None
    from ..ops.augment import load_augmentation

    aug, noise_db, rir_db = load_augmentation(opts.augmentation)
    if aug:
        logging.info("augmentation: %s (x%d)", aug.get("pipeline"),
                     aug.get("aug_number", 1))
    ds = EgsDataset(os.path.join(opts.train_set, "wav.scp"), opts.fst_scp,
                    os.path.join(opts.train_set, "utt2len"),
                    normalization_fst=norm_fst,
                    transform_pipeline=aug, noise_db=noise_db, rir_db=rir_db,
                    trans_mdl=opts.trans_mdl or None)
    removed = ds.filter_min_path()
    logging.info("egs: %d utts (%d removed by min-path check)", len(ds), removed)

    valid_ds = None
    if opts.valid_set and opts.valid_fst_scp:
        valid_ds = EgsDataset(os.path.join(opts.valid_set, "wav.scp"),
                              opts.valid_fst_scp,
                              os.path.join(opts.valid_set, "utt2len"),
                              normalization_fst=norm_fst,
                              trans_mdl=opts.trans_mdl or None)
        valid_ds.filter_min_path()

    bottleneck = ("vq" if opts.model == "tdnnf_vq" else
                  "dp" if opts.model == "tdnnf_dp" else "none")
    mcfg = TDNNFNetConfig(output_dim=opts.num_pdfs, bottleneck=bottleneck,
                          hidden_dim=opts.hidden_dim, bottleneck_dim=opts.bottleneck_dim,
                          prefinal_bottleneck_dim=opts.prefinal_bottleneck_dim,
                          codebook_size=opts.codebook_size, epsilon=opts.dp_epsilon,
                          natural_gradient=opts.natural_gradient,
                          compute_dtype=opts.compute_dtype)
    spk_index = None
    model_id, extra_params = "asrbn_tdnnf", {}
    preprocessor_schedule = None
    if opts.model.startswith("tdnnf_wav2vec2"):
        # B5 path (tuning/tdnnf_wav2vec2_vq.py): wav2vec2 front with layered
        # LR (lr/20 early, lr/5 mid, frozen last 10%)
        import dataclasses as _dc

        from ..models.asrbn import Wav2Vec2TDNNFNet, wav2vec2_tdnnf_config
        from ..models.wav2vec2 import Wav2Vec2Config

        w2v2 = (Wav2Vec2Config.large() if opts.wav2vec2_size == "large"
                else Wav2Vec2Config.base())
        # variant suffix selects the BN-layer transform: _vq (tuning/
        # tdnnf_wav2vec2_vq.py), _dp (tuning/tdnnf_wav2vec2_dp.py: Laplace
        # noise b=1/epsilon at the bottleneck), else plain
        if opts.model.endswith("_vq"):
            bottleneck = "vq"
        elif opts.model.endswith("_dp"):
            bottleneck = "dp"
        else:
            bottleneck = "none"
        mcfg = _dc.replace(
            wav2vec2_tdnnf_config(
                output_dim=opts.num_pdfs,
                bottleneck=bottleneck,
                codebook_size=opts.codebook_size,
                epsilon=opts.dp_epsilon),
            hidden_dim=opts.hidden_dim, bottleneck_dim=opts.bottleneck_dim,
            prefinal_bottleneck_dim=opts.prefinal_bottleneck_dim,
            natural_gradient=opts.natural_gradient,
            compute_dtype=opts.compute_dtype)
        model = Wav2Vec2TDNNFNet(mcfg, w2v2)
        model_id = "asrbn_tdnnf_wav2vec2"
        extra_params = {"wav2vec2": _dc.asdict(w2v2)}
    elif opts.model == "tdnnf_spkadv":
        # speaker-adversarial branch (tuning/tdnnf_spkadv.py:33-140)
        from ..models.spkadv import SpkAdvTDNNFNet
        from ..utils import kaldi_data

        utt2spk = kaldi_data.read_keyed_text(
            os.path.join(opts.train_set, "utt2spk"))
        speakers = sorted(set(utt2spk.values()))
        spk_index = {u: speakers.index(s) for u, s in utt2spk.items()}
        model = SpkAdvTDNNFNet(mcfg, num_speakers=len(speakers),
                               adversarial=opts.adversarial)
        model_id = "asrbn_tdnnf_spkadv"
        extra_params = {"num_speakers": len(speakers),
                        "adversarial": opts.adversarial}
    else:
        model = TDNNFNet(mcfg)

    topts = ChainTrainOpts(lr=opts.lr_initial, xent_regularize=opts.xent_regularize,
                           l2_regularize=opts.l2_regularize,
                           leaky_hmm_coefficient=opts.leaky_hmm_coefficient,
                           compute_dtype=opts.compute_dtype)
    optimizer = make_chain_optimizer(topts, grad_acc_steps=opts.grad_acc_steps)
    state = init_chain_state(model, jax.random.PRNGKey(0),
                             np.zeros((2, 32000), np.float32), optimizer)
    if opts.init_weight_model:
        # shape-aware partial transfer (chain/model.py:132-148)
        _, wstate = ckpt.load_checkpoint(opts.init_weight_model)
        loaded = wstate.get("variables", wstate).get("params", {})
        merged, matched, unmatched = ckpt.match_params(state.params, loaded)
        state = state.replace(params=merged)
        logging.info("init_weight_model %s: %d params transferred, %d skipped%s",
                     opts.init_weight_model, len(matched), len(unmatched),
                     f" ({', '.join(unmatched[:5])}...)" if unmatched else "")
    # local multi-chip data parallelism: replicate state, shard batches on
    # the batch dim (collapses the reference's per-GPU job fan-out +
    # merge-averaging, egs/asr/librispeech/local/chain/train.py:324-408)
    from ..parallel import (local_data_mesh, pad_batch_to_devices, replicate,
                            shard_batch)

    mesh = local_data_mesh(opts.minibatch_size)

    sampler = BucketBatchSampler(ds, opts.minibatch_size)
    steps_per_epoch = max(len(sampler), 1)
    total_steps = steps_per_epoch * opts.num_epochs

    # exponential decay lr_initial -> lr_final over the run, traceable
    # (script_utils.py get_learning_rate "exponential" with num_jobs=1)
    log_ratio = math.log(opts.lr_final / opts.lr_initial)

    def lr_at(step):
        frac = jnp.minimum(step / float(total_steps), 1.0)
        return opts.lr_initial * jnp.exp(frac * log_ratio)

    if opts.model.startswith("tdnnf_wav2vec2"):
        def preprocessor_schedule(step):
            frac = step / float(total_steps)
            return jnp.where(frac < 0.1, 1.0 / 20.0,
                             jnp.where(frac < 0.9, 1.0 / 5.0, 0.0))

    freeze_filter = None
    if opts.freeze_encoder and opts.model != "tdnnf_spkadv":
        raise ValueError(
            "freeze_encoder is the spkadv train_asi phase (reference "
            "tdnnf_bn_spkadv_train_asi) and requires model = tdnnf_spkadv; "
            "for the wav2vec2 front use its built-in freeze schedule")
    if opts.freeze_encoder:
        # reference tuning/tdnnf_spkadv.py:265-281: everything below the
        # prefinal layers frozen; prefinal_chain/prefinal_xent/chain_output/
        # xent_output (and the asi branch) keep training
        _TRAINABLE_HEADS = {"prefinal_chain", "prefinal_xent",
                            "chain_output", "xent_output"}

        def freeze_filter(keys):
            return ("acoustic" in keys
                    and not any(k in _TRAINABLE_HEADS for k in keys))

        logging.info("freeze_encoder: acoustic trunk updates zeroed "
                     "(prefinal/output heads + asi branch keep training)")

    step_fn = jax.jit(make_chain_train_step(
        model, den, optimizer, topts, lr_schedule=lr_at,
        preprocessor_schedule=preprocessor_schedule,
        freeze_filter=freeze_filter))
    valid_fn = jax.jit(make_chain_valid_step(model, den, topts))
    metrics_log = MetricsWriter(opts.dirname)
    metrics_log.attach_log_handler()
    try:

        # ---- resume ----
        steps, start_epoch = 0, 0
        last = ckpt.latest_checkpoint(opts.dirname, "trainer_")
        if last:
            meta, tstate = ckpt.load_checkpoint(last)
            steps = meta.get("steps", 0)
            start_epoch = meta.get("epoch", 0)
            mpath = os.path.join(opts.dirname, f"{steps}.ckpt")
            _, mstate = ckpt.load_checkpoint(mpath)
            variables = mstate["variables"]
            state = state.replace(
                step=jnp.asarray(steps, jnp.int32),
                params=variables["params"],
                batch_stats=variables.get("batch_stats", state.batch_stats),
                vq_stats=variables.get("vq_stats", state.vq_stats),
                opt_state=restore_like(state.opt_state, tstate["opt_state"]),
                ng_state=(restore_like(state.ng_state, tstate["ng_state"])
                          if tstate.get("ng_state") else state.ng_state))
            logging.info("resuming from %s (epoch %d, step %d)", last, start_epoch, steps)

        if mesh is not None:
            state = replicate(mesh, state)
            logging.info("data-parallel mesh over %d devices", mesh.devices.size)

        def run_diagnostics(epoch, steps, metrics):
            logging.info("epoch %d step %d objf %.4f (num %.3f den %.3f) lr %.5f",
                         epoch, steps, float(metrics["chain_objf"]),
                         float(metrics["num_logprob"]), float(metrics["den_logprob"]),
                         float(metrics.get("lr", lr_at(steps))))
            scal = {k: float(v) for k, v in metrics.items()}
            if valid_ds is not None:
                v = compute_valid_objf(valid_fn, state, valid_ds, opts.minibatch_size)
                if v is not None:
                    scal["valid_objf"] = v
                    logging.info("  valid objf %.4f", v)
            metrics_log.write(steps, scal, epoch=epoch)

        for epoch in range(start_epoch, opts.num_epochs):
            sampler.set_epoch(epoch)
            with profile_steps(opts.dirname):
                for batch_idx in sampler:
                    wavs, graphs, frames, _ = ds.load_batch(batch_idx)
                    kw = {}
                    if spk_index is not None:
                        wavs_utts = [spk_index.get(u, 0) for u in _]
                        kw["spk_target"] = np.asarray(wavs_utts, np.int32)
                    if mesh is not None:
                        # DDP-style repeat-padding: exact-length tail buckets
                        # may be smaller than minibatch_size; pad to a
                        # multiple of the device count by repeating entries
                        B, n = len(frames), mesh.devices.size
                        if B % n:
                            sel = np.arange(pad_batch_to_devices(B, n)) % B
                            wavs = wavs[sel]
                            frames = np.asarray(frames)[sel]
                            graphs = {k: np.asarray(v)[sel]
                                      for k, v in graphs.items()}
                            if "spk_target" in kw:
                                kw["spk_target"] = kw["spk_target"][sel]
                        wavs, graphs, frames, kw = shard_batch(
                            mesh, (wavs, graphs, np.asarray(frames), kw))
                    graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
                    if "spk_target" in kw:
                        kw["spk_target"] = jnp.asarray(kw["spk_target"])
                    state, metrics = step_fn(state, wavs, graphs, jnp.asarray(frames),
                                             jax.random.PRNGKey(steps), **kw)
                    steps += 1
                    if steps % 4 == 0:
                        constrained = apply_orthonormal_constraint(state.params)
                        if freeze_filter is not None:
                            # frozen params must not drift under the
                            # orthonormality nudge either
                            constrained = jax.tree_util.tree_map_with_path(
                                lambda path, new, old: old if freeze_filter(
                                    tuple(str(getattr(p, "key", p))
                                          for p in path)) else new,
                                constrained, state.params)
                        state = state.replace(params=constrained)
                    if steps % opts.diagnostics_interval == 0:
                        run_diagnostics(epoch, steps, metrics)
                    if steps % opts.checkpoint_interval == 0:
                        _save(opts, mcfg, state, steps, epoch, model_id=model_id, extra_params=extra_params)
            _save(opts, mcfg, state, steps, epoch + 1, model_id=model_id, extra_params=extra_params)

        # ---- final combination (chain/model.py:347-434): average the last n
        # checkpoints for n = 1..N, pick the best valid objf ----
        state = final_combination(opts, mcfg, model, state, valid_fn, valid_ds,
                                  merge_models)
        _save(opts, mcfg, state, steps, opts.num_epochs, final=True, model_id=model_id, extra_params=extra_params)
        return 0
    finally:
        metrics_log.close()


def compute_valid_objf(valid_fn, state, valid_ds, minibatch_size, max_batches=8):
    from ..chain.dataset import BucketBatchSampler
    import jax.numpy as jnp

    sampler = BucketBatchSampler(valid_ds, minibatch_size)
    vals, weights = [], []
    for bi, batch_idx in enumerate(sampler):
        if bi >= max_batches:
            break
        wavs, graphs, frames, _ = valid_ds.load_batch(batch_idx)
        graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
        m = valid_fn(state.params, state.batch_stats, state.vq_stats, wavs,
                     graphs, jnp.asarray(frames))
        vals.append(float(m["chain_objf"]))
        weights.append(len(batch_idx))
    if not vals:
        return None
    return sum(v * w for v, w in zip(vals, weights)) / sum(weights)


def final_combination(opts, mcfg, model, state, valid_fn, valid_ds, merge_models):
    if valid_ds is None or opts.final_combination_n <= 1:
        return state
    import logging

    cands = []
    for name in sorted(os.listdir(opts.dirname)):
        base = name[: -len(".ckpt")] if name.endswith(".ckpt") else ""
        if base.isdigit():
            cands.append((int(base), os.path.join(opts.dirname, name)))
    cands = [p for _, p in sorted(cands)[-opts.final_combination_n:]]
    if len(cands) < 2:
        return state
    trees = []
    for p in cands:
        _, mstate = ckpt.load_checkpoint(p)
        trees.append(mstate["variables"]["params"])
    best_v, best_params = None, state.params
    for n in range(1, len(trees) + 1):
        avg = merge_models(trees[-n:])
        cand_state = state.replace(params=avg)
        v = compute_valid_objf(valid_fn, cand_state, valid_ds, opts.minibatch_size)
        logging.info("final_combination: last %d ckpts -> valid objf %s", n, v)
        if v is not None and (best_v is None or v > best_v):
            best_v, best_params = v, avg
    return state.replace(params=best_params)


def _save(opts, mcfg, state, steps, epoch, final=False, model_id="asrbn_tdnnf",
          extra_params=None):
    from .. import infer_helper

    name = "final.ckpt" if final else f"{steps}.ckpt"
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if state.vq_stats:
        variables["vq_stats"] = state.vq_stats
    build_params = dict(dataclasses.asdict(mcfg), **(extra_params or {}))
    infer_helper.save_model(os.path.join(opts.dirname, name), model_id,
                            build_params, variables,
                            extra_meta={"steps": steps})
    if not final:
        ckpt.save_checkpoint(
            os.path.join(opts.dirname, f"trainer_{steps}.ckpt"),
            {"steps": steps, "epoch": epoch},
            {"opt_state": state.opt_state,
             "ng_state": state.ng_state if state.ng_state else {}})
    for prefix in ("", "trainer_"):
        ckpt.checkpoint_gc(opts.dirname, prefix, keep_last=10)


if __name__ == "__main__":
    sys.exit(main())
