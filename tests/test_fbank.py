"""Golden tests: satpu.ops.fbank vs the reference TorchScript fbank
(satools/satools/kaldifeature.py) on identical inputs."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import conftest as helpers


def _ref_fbank(x_np, **kw):
    import torch

    kaldifeature = helpers.reference_module("ref_kaldifeature")
    with torch.no_grad():
        out = kaldifeature.fbank(torch.from_numpy(x_np.copy()), **kw)
    return out.numpy()


@pytest.mark.parametrize("snip_edges", [True, False])
@pytest.mark.parametrize("n_mels", [23, 80])
def test_fbank_matches_reference(rng, snip_edges, n_mels):
    from satpu.ops import fbank

    x = (rng.standard_normal((2, 16000)) * 8000).astype(np.float32)
    ref = _ref_fbank(x, num_mel_bins=n_mels, snip_edges=snip_edges)
    out = np.asarray(fbank(x, num_mel_bins=n_mels, snip_edges=snip_edges))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-2)
    assert np.mean(np.abs(out - ref)) < 3e-3


def test_fbank_frame_count_and_batch_consistency(rng):
    from satpu.ops import fbank, num_frames

    for T in [8000, 16000, 16640, 32000]:
        x = (rng.standard_normal((3, T)) * 1000).astype(np.float32)
        out = np.asarray(fbank(x, num_mel_bins=80, snip_edges=False))
        assert out.shape == (3, num_frames(T), 80)
        # batch items are independent
        single = np.asarray(fbank(x[1:2], num_mel_bins=80, snip_edges=False))
        np.testing.assert_allclose(out[1], single[0], rtol=1e-5, atol=1e-5)


def test_fbank_energy_and_windows(rng):
    from satpu.ops import fbank

    x = (rng.standard_normal((1, 12000)) * 5000).astype(np.float32)
    for kw in [
        dict(use_energy=True),
        dict(use_energy=True, htk_compat=True),
        dict(window_type="hamming"),
        dict(window_type="hanning"),
        dict(use_power=False),
        dict(vtln_warp=1.1),
    ]:
        ref = _ref_fbank(x, num_mel_bins=30, snip_edges=False, **kw)
        out = np.asarray(fbank(x, num_mel_bins=30, snip_edges=False, **kw))
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-2, err_msg=str(kw))
