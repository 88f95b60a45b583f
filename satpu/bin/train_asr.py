"""LF-MMI (chain) ASR training driver — the reference's
egs/asr/librispeech/local/chain/train.py iteration flow collapsed into one
mesh-parallel process (no run.pl job fan-out / merge averaging; see
satpu.chain.trainer docstring).

Stages (mirroring the reference's --stage gates):
  4: init model
  6: training iterations with exponential LR + periodic diagnostics +
     orthonormal-constraint application
  8: final model save

Inputs are kaldi-prepared artifacts: wav.scp, fst_train.scp (per-utt
numerator FSTs), utt2len, den.fst (+ optional normalization.fst), num_pdfs.

Usage:
  python -m satpu.bin.train_asr --config egs/asr/librispeech/configs/tdnnf.ini
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
from ..utils.schedules import get_learning_rate


@dataclasses.dataclass
class TrainAsrOpts(cfg.Opts):
    dirname: str = "exp/chain"
    train_set: str = ""  # data dir containing wav.scp/utt2len
    fst_scp: str = ""  # numerator fsts
    den_fst: str = ""
    num_pdfs: int = 0
    model: str = "tdnnf"  # tdnnf | tdnnf_vq | tdnnf_dp
    hidden_dim: int = 1024
    bottleneck_dim: int = 128
    prefinal_bottleneck_dim: int = 256
    codebook_size: int = 0
    dp_epsilon: float = 0.0
    minibatch_size: int = 16
    num_epochs: int = 5
    lr_initial: float = 0.001
    lr_final: float = 0.0001
    grad_acc_steps: int = 1
    xent_regularize: float = 0.025
    l2_regularize: float = 1e-4
    leaky_hmm_coefficient: float = 1e-5
    checkpoint_interval: int = 100
    diagnostics_interval: int = 50
    train_stage: str = "0"


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="satpu %(levelname)s: %(message)s")
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

    from .. import infer_helper
    from ..chain.dataset import BucketBatchSampler, EgsDataset
    from ..chain.fst import Fst
    from ..chain.objf import DenominatorGraph
    from ..chain.trainer import (ChainTrainOpts, apply_orthonormal_constraint,
                                 init_chain_state, make_chain_optimizer,
                                 make_chain_train_step)
    from ..models.asrbn import TDNNFNet, TDNNFNetConfig

    os.makedirs(opts.dirname, exist_ok=True)
    den = DenominatorGraph.from_fst(Fst.read(opts.den_fst), num_pdfs=opts.num_pdfs)
    ds = EgsDataset(os.path.join(opts.train_set, "wav.scp"), opts.fst_scp,
                    os.path.join(opts.train_set, "utt2len"))
    removed = ds.filter_min_path()
    logging.info("egs: %d utts (%d removed by min-path check)", len(ds), removed)

    bottleneck = ("vq" if opts.model == "tdnnf_vq" else
                  "dp" if opts.model == "tdnnf_dp" else "none")
    mcfg = TDNNFNetConfig(output_dim=opts.num_pdfs, bottleneck=bottleneck,
                          hidden_dim=opts.hidden_dim, bottleneck_dim=opts.bottleneck_dim,
                          prefinal_bottleneck_dim=opts.prefinal_bottleneck_dim,
                          codebook_size=opts.codebook_size, epsilon=opts.dp_epsilon)
    model = TDNNFNet(mcfg)

    topts = ChainTrainOpts(lr=opts.lr_initial, xent_regularize=opts.xent_regularize,
                           l2_regularize=opts.l2_regularize,
                           leaky_hmm_coefficient=opts.leaky_hmm_coefficient)
    optimizer = make_chain_optimizer(topts)
    state = init_chain_state(model, jax.random.PRNGKey(0),
                             np.zeros((2, 32000), np.float32), optimizer)
    sampler = BucketBatchSampler(ds, opts.minibatch_size)
    steps_per_epoch = len(sampler)
    total_steps = steps_per_epoch * opts.num_epochs

    def lr_at(step):
        return get_learning_rate(
            int(step), 1, total_steps, int(step), total_steps,
            opts.lr_initial, opts.lr_final, "exponential")

    step_fn = jax.jit(make_chain_train_step(model, den, optimizer, topts))
    steps = 0
    import jax.numpy as jnp

    for epoch in range(opts.num_epochs):
        sampler.set_epoch(epoch)
        for batch_idx in sampler:
            wavs, graphs, frames, _ = ds.load_batch(batch_idx)
            graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
            state, metrics = step_fn(state, wavs, graphs, jnp.asarray(frames),
                                     jax.random.PRNGKey(steps))
            steps += 1
            if steps % 4 == 0:
                state = state.replace(
                    params=apply_orthonormal_constraint(state.params))
            if steps % opts.diagnostics_interval == 0:
                logging.info("epoch %d step %d objf %.4f (num %.3f den %.3f) lr %.5f",
                             epoch, steps, float(metrics["chain_objf"]),
                             float(metrics["num_logprob"]),
                             float(metrics["den_logprob"]), lr_at(steps))
            if steps % opts.checkpoint_interval == 0:
                _save(opts, mcfg, state, steps)
    _save(opts, mcfg, state, steps, final=True)
    return 0


def _save(opts, mcfg, state, steps, final=False):
    from .. import infer_helper

    name = "final.ckpt" if final else f"{steps}.ckpt"
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if state.vq_stats:
        variables["vq_stats"] = state.vq_stats
    infer_helper.save_model(os.path.join(opts.dirname, name), "asrbn_tdnnf",
                            dataclasses.asdict(mcfg), variables,
                            extra_meta={"steps": steps})
    ckpt.checkpoint_gc(opts.dirname, "", keep_last=10)


if __name__ == "__main__":
    sys.exit(main())
