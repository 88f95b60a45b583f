"""Tests for the HiFi-GAN data pipeline: sample_interval parity vs reference,
feature cache hit/miss, batch assembly."""
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import conftest as helpers


def test_sample_interval_matches_reference(rng):
    """Same RNG draws -> same intervals as the reference implementation."""
    import random

    import torch

    # reference sample_interval (standalone part of hifigan/dataset.py)
    src = open("/root/reference/satools/satools/hifigan/dataset.py").read()
    start = src.index("def sample_interval")
    end = src.index("mel_basis = {}")
    ns = {"np": np, "numpy": np, "torch": torch, "random": random}
    exec(compile(src[start:end], "ref_sample_interval.py", "exec"), ns)
    ref_sample_interval = ns["sample_interval"]

    from satpu.hifigan.dataset import sample_interval

    T = 48000
    audio = rng.standard_normal(T).astype(np.float32)
    bn = rng.standard_normal((8, T // 320)).astype(np.float32)
    f0 = rng.standard_normal(T // 320).astype(np.float32)
    seg = 16640

    random.seed(7)
    ref_seqs, ref_iv = ref_sample_interval(
        [torch.from_numpy(audio.copy()), torch.from_numpy(bn.copy()),
         torch.from_numpy(f0.copy())], seg)
    import random as _r

    myrng = _r.Random()
    myrng.seed(7)
    out_seqs, out_iv = sample_interval([audio, bn, f0], seg, rng=myrng)
    assert out_iv == [tuple(x) for x in ref_iv]
    for a, b in zip(out_seqs, ref_seqs):
        np.testing.assert_array_equal(a, b.numpy())


def test_feature_cache(tmp_path):
    from satpu.utils.feature_cache import FeatureCache

    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return np.full((3, 4), calls["n"], np.float32)

    c = FeatureCache(str(tmp_path), "get_bn", "w0")
    v1 = c.get_or_compute("utt1", compute)
    v2 = c.get_or_compute("utt1", compute)
    assert calls["n"] == 1
    np.testing.assert_array_equal(v1, v2)
    # new instance reads the persisted cache
    c2 = FeatureCache(str(tmp_path), "get_bn", "w1")
    # different worker shard: still a miss -> recompute
    c2.get_or_compute("utt2", compute)
    assert calls["n"] == 2
    merged = FeatureCache.merge_shards(str(tmp_path), "get_bn")
    assert os.path.exists(merged)
    from satpu.utils import scp_io

    r = scp_io.FileReader(merged)
    assert "utt1" in r and "utt2" in r


def test_hifigan_dataset_batches(tmp_path):
    from satpu.hifigan.dataset import HifiGanDataset
    from satpu.utils import kaldi_data

    d = str(tmp_path / "data")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    wav_scp, utt2spk = {}, {}
    for i in range(4):
        T = 24000
        x = (rng.standard_normal(T) * 0.2).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        kaldi_data.write_wav(p, x, 16000)
        wav_scp[f"utt{i}"] = p
        utt2spk[f"utt{i}"] = f"spk{i % 2}"
    kaldi_data.write_keyed_text(wav_scp, os.path.join(d, "wav.scp"))
    kaldi_data.write_keyed_text(utt2spk, os.path.join(d, "utt2spk"))

    def bn_fn(w):
        return np.zeros((8, w.shape[1] // 320), np.float32)

    def f0_fn(w):
        return np.zeros((w.shape[1] // 320,), np.float32)

    ds = HifiGanDataset(d, bn_fn=bn_fn, f0_fn=f0_fn, segment_size=6400,
                        cache_dir=str(tmp_path / "cache"))
    assert len(ds) == 4
    batches = list(ds.batches(2))
    assert len(batches) == 2
    b = batches[0]
    assert b["audio"].shape == (2, 6400)
    assert b["bn"].shape[0] == 2 and b["bn"].shape[1] == 8
    assert b["bn"].shape[2] == 6400 // 320
    assert b["spk"].shape == (2, 2)
    # cache populated
    ds.fake_epoch()
    assert os.path.exists(str(tmp_path / "cache" / "get_bn.w0.scp"))
