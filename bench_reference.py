#!/usr/bin/env python3
"""Measure the REFERENCE torch anonymization pipeline on this host's CPU.

Round-1 verdict: bench.py's ``vs_baseline`` denominator (60 audio-sec/sec per
reference GPU) was an assumption. This script replaces it with measurements of
the actual in-repo reference code (the same modules the golden tests exec from
/root/reference), timed per audio-second on one CPU core:

- ``yaapt``: the reference TorchScript YAAPT (de-scripted — this torch build
  cannot compile it — numerically identical, and torch.set_num_threads(1)
  matches the reference's own setting, yaapt.py:27). In the reference serving
  pipeline F0 runs on CPU in DataLoader workers (bin/pipeline.py:35-41), so
  per-core YAAPT throughput is the hard ceiling of a reference GPU slot.
- ``bn`` / ``hifigan``: the full-scale torch nets (TDNNF-VQ48 output 3280,
  CoreHifiGan 512ch, 247 speakers) on CPU — CPU floor for the GPU-side work.

Derived denominator (documented in README + used by bench.py):

    ref_gpu_slot_rtf = min(W * yaapt_rtf_per_core, gpu_convert_rtf)

with W = DataLoader workers per GPU slot. The reference default data_loader_nj=5
workers (bin/anonymize:30) gives 5 * yaapt_rtf; gpu_convert_rtf is not measurable here
(no GPU) — published GPU HiFi-GAN V1 numbers are O(500-2000) a-s/s, far above
the F0 ceiling, so the F0 ceiling binds. The committed BENCH_REF.json carries
the measured numbers; bench.py uses them when present.

Usage: python bench_reference.py [--audio-secs 8] (writes BENCH_REF.json)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def speech_like(rng, t, sr=16000):
    tt = np.arange(t) / sr
    f0 = 120.0 + 25.0 * np.sin(2 * np.pi * 0.6 * tt)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = sum(a * np.sin(h * phase) for h, a in [(1, 1.0), (2, 0.6), (3, 0.35)])
    sig *= 0.3 + 0.2 * np.sin(2 * np.pi * 1.1 * tt)
    sig += 0.01 * rng.standard_normal(t)
    return (0.5 * sig / np.max(np.abs(sig))).astype(np.float32)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio-secs", type=float, default=8.0,
                    help="seconds of audio per timed component run")
    ap.add_argument("--out", default="BENCH_REF.json")
    args = ap.parse_args()

    import torch

    torch.set_num_threads(1)  # reference yaapt.py:27; per-core measurement
    import conftest as helpers  # tests/conftest.py reference loaders
    from test_yaapt import _ref_yaapt
    from test_asrbn_net import _build_reference_net
    from test_hifigan import _ref_hifigan

    sr = 16000
    T = int(args.audio_secs * sr)
    rng = np.random.default_rng(0)
    wav = torch.from_numpy(speech_like(rng, T)[None, :])

    results = {"host": "cpu-1core", "audio_secs": args.audio_secs,
               "torch_threads": 1}

    # ---- YAAPT (the reference serving bottleneck) ----
    ry = _ref_yaapt()
    opts = {"frame_length": 35.0, "frame_space": 20.0,
            "nccf_thresh1": 0.25, "tda_frame_length": 25.0}
    ry.yaapt(wav, opts)  # warm
    dt = min(_timed(lambda: ry.yaapt(wav, opts)) for _ in range(3))
    results["yaapt_rtf_per_core"] = round(args.audio_secs / dt, 3)
    results["yaapt_sec_per_audio_sec"] = round(dt / args.audio_secs, 4)

    # ---- BN extractor (full scale: TDNNF VQ48, output 3280) ----
    tnet = _build_reference_net(output_dim=3280, vq=48)
    with torch.no_grad():
        bn = tnet.extract_bn(wav)  # warm
        dt = min(_timed(lambda: tnet.extract_bn(wav)) for _ in range(3))
    results["bn_rtf_per_core"] = round(args.audio_secs / dt, 3)

    # ---- HiFi-GAN generator (512 ch, 247 spk one-hot conditioning) ----
    _, archi = _ref_hifigan()
    torch.manual_seed(0)
    gen = archi.CoreHifiGan(imput_dim=256 + 1 + 247,
                            upsample_rates=[5, 4, 4, 2, 2],
                            upsample_kernel_sizes=[11, 8, 8, 4, 4],
                            upsample_initial_channel=512)
    gen.eval()
    x = torch.randn(1, 256 + 1 + 247, bn.shape[2])
    with torch.no_grad():
        gen(x)  # warm
        dt = min(_timed(lambda: gen(x)) for _ in range(3))
    results["hifigan_rtf_per_core"] = round(args.audio_secs / dt, 3)

    total = (1.0 / results["yaapt_rtf_per_core"]
             + 1.0 / results["bn_rtf_per_core"]
             + 1.0 / results["hifigan_rtf_per_core"])
    results["convert_rtf_per_core"] = round(1.0 / total, 3)
    # reference GPU-slot ceiling: data_loader_nj=5 CPU F0 workers feed one
    # GPU slot (bin/anonymize:30 default, capped 18 at bin/pipeline.py:166;
    # YAAPT is single-thread per utterance, yaapt.py:27)
    results["ref_gpu_slot_rtf_f0_bound"] = round(
        5 * results["yaapt_rtf_per_core"], 2)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
