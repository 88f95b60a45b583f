#!/usr/bin/env python3
"""FLOP + MFU accounting for the four hot workloads (round-1 verdict #5).

Lowers each step function at its recorded bench shape and reads XLA's
``cost_analysis`` FLOP estimate, then reports model FLOP utilization against
the v5e peak. Times come from the hard-synced measurements recorded in
README.md ("recorded"), or are re-measured on the current device with
``BENCH_MFU_TIME=1`` (hard-synced via device-to-host fetch — on this runtime
``block_until_ready`` can return early).

Workloads & shapes (matching README's numbers):
- serving  : convert+f0, B=128 x 10 s, bf16 policy          (recorded 4849.6 a-s/s)
- chain    : LF-MMI train step, B=16 x 3 s, 3200 pdfs, destination-factored
             1601-state chain-topology den graph, Adam      (recorded 14.13 ms)
- gan      : fused D+G step, B=32 x 1.04 s segments         (recorded 395 ms)
- gan_tpu  : shipped hifigan_tpu.ini recipe, B=128 bf16     (recorded 555.9 ms)
- asv      : ECAPA-512 ArcMargin step, B=128 x 3 s          (recorded 33.6 ms f32)

v5e peak: 197 TFLOP/s bf16, ~98.5 TFLOP/s fp32 (per chip). cost_analysis
counts algebraic FLOPs of the lowered HLO (fused elementwise included), so
MFU here is the standard "model flops / peak" accounting.

Usage: python bench_mfu.py [workload ...]   (default: all; writes BENCH_MFU.json)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

PEAK_BF16 = 197e12
PEAK_F32 = 98.5e12

RECORDED = {  # hard-synced v5e measurements (README.md), refreshed 2026-08-21
    # bench.py after the round-5 conv-splice TDNNF (BN 35 -> 15.8 ms)
    "serving": {"audio_sec_per_sec": 4849.61},
    # f32, Adam, conv-splice TDNNF (was 15.2 ms; B=64 measures 39.35 ms f32
    # / 36.97 ms under the bf16 policy)
    "chain": {"sec_per_step": 0.01413},
    "gan": {"sec_per_step": 0.395},
    # hifigan_tpu.ini recipe: B=128, bf16 policy, donated steady-state
    # (each step consumes the previous state buffers, the trainer's form)
    "gan_tpu": {"sec_per_step": 0.5559},
    # f32 33.6 ms after the STFT-as-DFT-matmul frontend rewrite; the bf16
    # autocast policy (train_asv --compute-dtype bfloat16) measures 25.0 ms
    # at the same shape
    "asv": {"sec_per_step": 0.0336},
}


def _flops(jitted, *args, **kw):
    lowered = jitted.lower(*args, **kw)
    cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    if not cost or "flops" not in cost:  # pre-compile analysis unavailable
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
    return float(cost["flops"])


def _sync(x):
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    float(np.asarray(leaf).ravel()[0])


def _measure(fn, args, iters=5):
    fn(*args)  # warm
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def serving():
    import jax

    from satpu.models.anonymizer import AnonymizationNet, AnonymizerConfig
    from satpu.models.asrbn import TDNNFNetConfig

    cfg = AnonymizerConfig(
        asrbn=TDNNFNetConfig(output_dim=3280, bottleneck="vq", codebook_size=48),
        num_speakers=247, compute_dtype="bfloat16")
    model = AnonymizationNet(cfg)
    B, T = 128, 160000
    wav = np.zeros((B, T), np.float32)
    tid = np.zeros((B,), np.int32)
    n_f0 = len(range(280, T + 560 - 280, 320))
    f0 = np.zeros((B, n_f0), np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), wav[:1], f0[:1], tid[:1],
                               method=model.convert))
        variables = jax.tree_util.tree_map(
            lambda s: np.zeros(s.shape, s.dtype), variables)
    f0_fn = jax.jit(model.get_f0)
    convert_fn = jax.jit(lambda w, f, t: model.apply(variables, w, f, t,
                                                     method=model.convert))
    fl = _flops(f0_fn, wav) + _flops(convert_fn, wav, f0, tid)
    audio = B * T / 16000
    return {"flops_per_dispatch": fl, "audio_sec": audio,
            "flops_per_audio_sec": fl / audio, "peak": PEAK_BF16}


def _synthetic_den(n_phones=160, succ_per_phone=9, seed=0):
    """Realistic chain-topology den graph at the old benchmark scale (1601
    states / ~16k arcs): a pruned random bigram over n_phones expanded
    through prep.make_den_fst. Carries the destination-factored form
    (DenFactored) like real den graphs, so the bench exercises the
    production den path; the tree has a leaf per SEEN biphone
    (num_pdfs = 2 * (n_phones + n_phones * succ_per_phone) = 3200)."""
    from satpu.chain.objf import DenominatorGraph
    from satpu.chain.prep import BiphoneTree, make_den_fst

    rng = np.random.default_rng(seed)
    P = n_phones
    phones = [f"p{i}" for i in range(1, P + 1)]
    trans = np.zeros((P + 1, P + 1))
    trans[0, 1:] = 1.0 / P
    seqs = []
    for p in range(1, P + 1):
        succ = rng.choice(np.arange(1, P + 1), succ_per_phone, replace=False)
        trans[p, succ] = rng.uniform(0.5, 1.5, succ_per_phone)
        seqs.extend([[p, r] for r in succ])
    trans[1:] /= trans[1:].sum(axis=1, keepdims=True)
    final = np.full(P + 1, 0.05)
    tree = BiphoneTree.build(seqs, phones, biphone=True)
    den_fst = make_den_fst(trans, final, tree)
    return DenominatorGraph.from_fst(den_fst, num_pdfs=tree.num_pdfs)


def chain():
    import jax
    import jax.numpy as jnp

    from satpu.chain.fst import (fst_to_arrays, linear_fst_from_pdf_sequence,
                                 pad_graph_arrays)
    from satpu.chain.trainer import (ChainTrainOpts, init_chain_state,
                                     make_chain_optimizer, make_chain_train_step)
    from satpu.models.asrbn import TDNNFNet, TDNNFNetConfig, output_num_frames

    den = _synthetic_den()
    cfg = TDNNFNetConfig(output_dim=den.num_pdfs)
    model = TDNNFNet(cfg)
    opts = ChainTrainOpts(lr=0.001)
    optimizer = make_chain_optimizer(opts)
    B, T = 16, 48000
    wav = np.zeros((B, T), np.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        state = init_chain_state(model, jax.random.PRNGKey(0), wav[:2],
                                 optimizer)
    n_out = output_num_frames(T)
    rng = np.random.default_rng(0)
    seqs = [rng.integers(0, den.num_pdfs, n_out // 4).tolist() for _ in range(B)]
    graphs = pad_graph_arrays([fst_to_arrays(linear_fst_from_pdf_sequence(q))
                               for q in seqs])
    graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
    num_frames = jnp.full((B,), n_out, jnp.int32)
    step = jax.jit(make_chain_train_step(model, den, optimizer, opts))
    fl = _flops(step, state, wav, graphs, num_frames, jax.random.PRNGKey(0))
    return {"flops_per_step": fl, "audio_sec": B * T / 16000,
            "flops_per_audio_sec": fl / (B * T / 16000), "peak": PEAK_F32}


def gan(B=32, compute_dtype="float32"):
    import jax

    from satpu.hifigan.trainer import (GanHparams, init_gan_state,
                                       make_gan_train_step)
    from satpu.models.anonymizer import AnonymizationNet, AnonymizerConfig
    from satpu.models.asrbn import TDNNFNetConfig

    cfg = AnonymizerConfig(asrbn=TDNNFNetConfig(output_dim=3280),
                           num_speakers=247)
    model = AnonymizationNet(cfg)
    h = GanHparams(compute_dtype=compute_dtype)
    seg = h.segment_size  # 16640 samples
    t_bn = seg // 320
    f0 = np.zeros((B, t_bn), np.float32)
    bn = np.zeros((B, cfg.bn_dim, t_bn), np.float32)
    spk = np.zeros((B, cfg.num_speakers), np.float32)
    rng = jax.random.PRNGKey(0)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(rng, f0[:1], bn[:1], spk[:1],
                               method=model.forward_decoder)
        state, mpd, msd = init_gan_state(model, dict(variables), rng, h)
    step = jax.jit(make_gan_train_step(model, mpd, msd, h))
    batch = {"bn": bn, "f0": f0, "spk": spk,
             "audio": np.zeros((B, seg), np.float32)}
    fl = _flops(step, state, batch)
    peak = PEAK_BF16 if compute_dtype == "bfloat16" else PEAK_F32
    return {"flops_per_step": fl, "audio_sec": B * seg / 16000,
            "flops_per_audio_sec": fl / (B * seg / 16000), "peak": peak}


def gan_tpu():
    """The shipped TPU recipe (hifigan_tpu.ini): B=128, bf16 policy."""
    return gan(B=128, compute_dtype="bfloat16")


def asv():
    import jax

    from satpu.sidekit.trainer import (init_asv_state, make_asv_optimizer,
                                       make_asv_train_step)
    from satpu.sidekit.xvector import XVectorConfig, build_xvector

    cfg = XVectorConfig(num_speakers=1211, channels=512, embedding_size=192)
    model = build_xvector(cfg)
    optimizer = make_asv_optimizer(lr=1e-3)
    B, T = 128, 48000
    wav = np.zeros((B, T), np.float32)
    tgt = np.zeros((B,), np.int32)
    with jax.default_device(jax.devices("cpu")[0]):
        state = init_asv_state(model, jax.random.PRNGKey(0), wav[:2], optimizer)
    step = jax.jit(make_asv_train_step(model, optimizer))
    fl = _flops(step, state, wav, tgt, jax.random.PRNGKey(0))
    return {"flops_per_step": fl, "audio_sec": B * T / 16000,
            "flops_per_audio_sec": fl / (B * T / 16000), "peak": PEAK_F32}


def main():
    names = sys.argv[1:] or ["serving", "chain", "gan", "gan_tpu", "asv"]
    out = {}
    if os.path.exists("BENCH_MFU.json"):  # merge: partial runs keep other rows
        with open("BENCH_MFU.json") as f:
            out = json.load(f)
        # rows for renamed/removed workloads, or computed against RECORDED
        # values that have since changed, must not persist silently
        out = {k: v for k, v in out.items()
               if k in RECORDED and v.get("recorded") == RECORDED[k]}
    for name in names:
        res = globals()[name]()
        rec = RECORDED[name]
        res["recorded"] = rec  # stamp the denominator this row was computed at
        if "audio_sec_per_sec" in rec:
            flops_per_sec = res["flops_per_audio_sec"] * rec["audio_sec_per_sec"]
        else:
            flops_per_sec = res.get("flops_per_step", 0) / rec["sec_per_step"]
        res["tflops_per_sec_at_recorded_time"] = round(flops_per_sec / 1e12, 2)
        res["mfu_at_recorded_time"] = round(flops_per_sec / res["peak"], 4)
        for k in ("flops_per_dispatch", "flops_per_step", "flops_per_audio_sec"):
            if k in res:
                res[k] = float(f"{res[k]:.4g}")
        out[name] = res
        print(name, json.dumps(res))
    with open("BENCH_MFU.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
