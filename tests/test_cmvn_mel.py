"""Golden tests for CMVN (vs reference satools/cmvn.py) and shape/sanity tests
for the HiFi-GAN mel spectrogram."""
import numpy as np
import pytest

import conftest as helpers


def _ref_cmvn():
    import sys
    import types

    if "kaldiio" not in sys.modules:
        sys.modules["kaldiio"] = types.ModuleType("kaldiio")
    return helpers.reference_module("ref_cmvn", path="/root/reference/satools/satools/cmvn.py")


def test_utt_cmvn_matches_reference(rng):
    import torch

    from satpu.ops import utt_cmvn

    ref_mod = _ref_cmvn()
    x = rng.standard_normal((3, 50, 80)).astype(np.float32)
    for var_norm in [False, True]:
        ref = ref_mod.UttCMVN(var_norm=var_norm)(torch.from_numpy(x.copy())).numpy()
        out = np.asarray(utt_cmvn(x, var_norm=var_norm))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_utt_cmvn_keep_zeros_matches_reference(rng):
    import torch

    from satpu.ops import utt_cmvn_keep_zeros

    ref_mod = _ref_cmvn()
    # single utterance: reference computes global masked stats == our per-utt
    f0 = rng.uniform(80, 300, size=(1, 120)).astype(np.float32)
    f0[0, 10:40] = 0.0  # unvoiced region
    ref = ref_mod.UttCMVN(var_norm=True, keep_zeros=True)(torch.from_numpy(f0.copy())).numpy()
    out = np.asarray(utt_cmvn_keep_zeros(f0, var_norm=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    assert np.all(out[0, 10:40] == 0.0)


def test_utt_cmvn_masked_lengths(rng):
    from satpu.ops import utt_cmvn

    x = rng.standard_normal((2, 60, 10)).astype(np.float32)
    lengths = np.array([60, 40])
    out = np.asarray(utt_cmvn(x, var_norm=True, lengths=lengths))
    solo = np.asarray(utt_cmvn(x[1:2, :40], var_norm=True))
    np.testing.assert_allclose(out[1, :40], solo[0], rtol=1e-4, atol=1e-5)
    assert np.allclose(out[1, 40:], 0.0)


def test_mel_spectrogram_shapes_and_librosa_basis(rng):
    from satpu.ops import librosa_mel_basis, mel_spectrogram

    basis = librosa_mel_basis(16000, 1024, 80, 0.0, 8000.0)
    assert basis.shape == (80, 513)
    assert basis.max() > 0
    # each interior filter overlaps its neighbours
    assert np.all(basis.sum(axis=1) > 0)

    y = rng.standard_normal((2, 16640)).astype(np.float32) * 0.1
    mel = np.asarray(mel_spectrogram(y, 1024, 80, 16000, 256, 1024, 0.0, 8000.0))
    assert mel.shape == (2, 80, 16640 // 256)
    assert np.isfinite(mel).all()
    # batch independence
    solo = np.asarray(mel_spectrogram(y[1:2], 1024, 80, 16000, 256, 1024, 0.0, 8000.0))
    np.testing.assert_allclose(mel[1], solo[0], rtol=1e-4, atol=1e-5)


def test_mel_spectrogram_matches_torch_stft(rng):
    """Cross-check the STFT against torch.stft with the same padding."""
    import torch

    from satpu.ops.mel import stft_magnitude

    y = rng.standard_normal((1, 8192)).astype(np.float32) * 0.3
    n_fft, hop, win = 1024, 256, 1024
    ours = np.asarray(stft_magnitude(y, n_fft, hop, win))

    ty = torch.from_numpy(y.copy())
    pad = (n_fft - hop) // 2
    ty = torch.nn.functional.pad(ty.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(ty, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win, periodic=True), center=False,
                      return_complex=True)
    ref = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def test_kaldi_stats_cmvn_class():
    """CMVN from kaldi (2, dim+1) stats: per-speaker routing + generic-spk
    fallback + reverse round-trip (reference cmvn.py:9-130)."""
    import numpy as np

    from satpu.ops.cmvn import CMVN

    rng = np.random.default_rng(0)
    dim = 5
    stats = {}
    feats = {}
    for spk in ("A", "B"):
        x = rng.standard_normal((100, dim)) * (2.0 if spk == "A" else 0.5) + 3.0
        st = np.zeros((2, dim + 1))
        st[0, :-1] = x.sum(0)
        st[0, -1] = len(x)
        st[1, :-1] = (x**2).sum(0)
        stats[spk] = st
        feats[spk] = x
    utt2spk = {"u1": "A", "u2": "B"}
    c = CMVN(stats, norm_means=True, norm_vars=True, utt2spk=utt2spk)
    y = c(feats["A"], "u1")
    np.testing.assert_allclose(y.mean(0), 0.0, atol=1e-6)
    np.testing.assert_allclose(y.std(0), 1.0, atol=1e-2)
    # reverse undoes forward
    back = CMVN(stats, norm_means=True, norm_vars=True, utt2spk=utt2spk,
                reverse=True)(y, "u1")
    np.testing.assert_allclose(back, feats["A"], atol=1e-5)
    # unseen utt falls back to generic-spk (no crash, finite output)
    c2 = CMVN(stats, norm_means=True, norm_vars=True)
    z = c2(feats["B"], "unknown-utt")
    assert np.isfinite(z).all()


def test_ece_curve():
    import numpy as np

    from satpu.sidekit.scoring import ece

    rng = np.random.default_rng(1)
    tar = rng.standard_normal(500) + 2.0   # well-separated LLRs
    non = rng.standard_normal(500) - 2.0
    plo = np.linspace(-3, 3, 7)
    e = ece(tar, non, plo)
    assert e.shape == (7,)
    assert np.all(e > 0)
    # a recognizer with informative LLRs beats the trivial one everywhere:
    # trivial ECE (LLR=0) at prior p is entropy-like and larger
    e0 = ece(np.zeros(500), np.zeros(500), plo)
    assert np.all(e < e0)
