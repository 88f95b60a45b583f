"""Golden tests for the ASV stack: trunk/pooling/loss vs reference torch
modules with converted weights, plus scoring metrics vs reference metric.py."""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import conftest as helpers


def _ref_sidekit():
    """Load reference sidekit nn/archi/pooling/loss standalone."""
    if "ref_sidekit.archi" in sys.modules:
        m = sys.modules
        return (m["ref_sidekit.nn"], m["ref_sidekit.archi"], m["ref_sidekit.pooling"],
                m["ref_sidekit.loss"])
    pkg = types.ModuleType("ref_sidekit")
    pkg.__path__ = []
    sys.modules["ref_sidekit"] = pkg
    nn_mod = helpers.reference_module(
        "ref_sidekit.nn", path="/root/reference/satools/satools/sidekit/nn.py")
    src = open("/root/reference/satools/satools/sidekit/archi.py").read()
    src = src.replace("from . import nn as sann", "import ref_sidekit.nn as sann")
    archi = types.ModuleType("ref_sidekit.archi")
    exec(compile(src, "ref_sidekit_archi.py", "exec"), archi.__dict__)
    sys.modules["ref_sidekit.archi"] = archi
    pooling = helpers.reference_module(
        "ref_sidekit.pooling", path="/root/reference/satools/satools/sidekit/pooling.py")
    loss = helpers.reference_module(
        "ref_sidekit.loss", path="/root/reference/satools/satools/sidekit/loss.py")
    return nn_mod, archi, pooling, loss


def _ref_metric():
    return helpers.reference_module(
        "ref_metric", path="/root/reference/satools/satools/sidekit/scoring/metric.py")


def test_ecapa_trunk_matches_reference(rng):
    import torch

    from satpu.models.convert import convert_sidekit
    from satpu.sidekit.archi import PreEcapaTDNN

    _, archi, _, _ = _ref_sidekit()
    torch.manual_seed(0)
    tnet = archi.PreEcapaTDNN(in_feature=20, channels=64)
    tnet.eval()
    x = rng.standard_normal((2, 20, 30)).astype(np.float32)  # [B, F, T]
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.copy())).numpy()  # [B, 3C, T]

    jnet = PreEcapaTDNN(in_feature=20, channels=64)
    sd = {f"sequence_network.{k}": v for k, v in tnet.state_dict().items()}
    variables = convert_sidekit(sd, arch="ecapa")
    v = {"params": variables["params"]["sequence_network"],
         "batch_stats": variables["batch_stats"]["sequence_network"]}
    out = np.asarray(jnet.apply(v, np.transpose(x, (0, 2, 1)), train=False))
    np.testing.assert_allclose(np.transpose(out, (0, 2, 1)), ref, rtol=1e-3, atol=1e-4)


def test_resnet_block_matches_reference(rng):
    import torch

    from satpu.models.convert import convert_sidekit
    from satpu.sidekit.nn import ResNetBasicBlock

    nn_mod, _, _, _ = _ref_sidekit()
    torch.manual_seed(1)
    tb = nn_mod.ResNetBasicBlock(8, 16, stride=2)
    tb.eval()
    x = rng.standard_normal((2, 8, 12, 10)).astype(np.float32)  # NCHW
    with torch.no_grad():
        ref = tb(torch.from_numpy(x.copy())).numpy()
    jb = ResNetBasicBlock(8, 16, (2, 2))
    variables = convert_sidekit(dict(tb.state_dict()), arch="resnet")
    out = np.asarray(jb.apply(variables, np.transpose(x, (0, 2, 3, 1)), train=False))
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref, rtol=1e-3, atol=1e-4)


def test_attentive_stats_pool_matches_reference(rng):
    import torch

    from satpu.models.convert import convert_sidekit
    from satpu.sidekit.pooling import AttentiveStatsPool

    _, _, pooling, _ = _ref_sidekit()
    torch.manual_seed(2)
    tp = pooling.AttentiveStatsPool(24, 8)
    tp.eval()
    x = rng.standard_normal((3, 24, 15)).astype(np.float32)
    with torch.no_grad():
        ref = tp(torch.from_numpy(x.copy())).numpy()
    jp = AttentiveStatsPool(24, 8)
    out = np.asarray(jp.apply(convert_sidekit(dict(tp.state_dict())),
                              np.transpose(x, (0, 2, 1))))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_arcmargin_matches_reference(rng):
    import torch

    from satpu.sidekit.loss import ArcMarginProduct

    _, _, _, loss_mod = _ref_sidekit()
    torch.manual_seed(3)
    tl = loss_mod.ArcMarginProduct(16, 10, s=30, m=0.2)
    x = rng.standard_normal((6, 16)).astype(np.float32)
    tgt = rng.integers(0, 10, 6)
    with torch.no_grad():
        ref_loss, ref_logits = tl(torch.from_numpy(x.copy()), torch.from_numpy(tgt))
    jl = ArcMarginProduct(16, 10, s=30, m=0.2)
    variables = {"params": {"weight": tl.weight.detach().numpy()}}
    out_loss, out_logits = jl.apply(variables, x, tgt)
    np.testing.assert_allclose(float(out_loss), float(ref_loss), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_logits), ref_logits.numpy(), rtol=1e-4, atol=1e-4)
    # extraction mode
    nan_loss, cos_logits = jl.apply(variables, x, None)
    assert np.isnan(float(nan_loss))


def test_mel_frontend_shapes_and_stft(rng):
    import torch

    from satpu.sidekit.preprocessor import mel_spec_frontend, torch_stft_mag2

    x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    out = np.asarray(mel_spec_frontend(x))
    assert out.shape == (2, 16000 // 160 + 1, 80)
    # instance norm: per (b, mel) zero mean/unit var over time
    assert np.abs(out.mean(axis=1)).max() < 1e-4
    assert np.abs(out.std(axis=1) - 1).max() < 1e-2

    # stft parity vs torch (center=True, reflect, hann periodic 400 in 1024 fft)
    mag2 = np.asarray(torch_stft_mag2(x, 1024, 160, 400))
    t = torch.stft(torch.from_numpy(x.copy()), 1024, hop_length=160, win_length=400,
                   window=torch.hann_window(400, periodic=True), center=True,
                   pad_mode="reflect", return_complex=True)
    ref = (t.real**2 + t.imag**2).numpy()
    np.testing.assert_allclose(mag2, ref, rtol=1e-3, atol=1e-3)


def test_scoring_metrics_match_reference(rng):
    ref = _ref_metric()
    from satpu.sidekit import scoring

    tar = rng.standard_normal(300) * 0.6 + 1.0
    non = rng.standard_normal(1000) * 0.6 - 1.0

    # pavx
    y = rng.standard_normal(50)
    g_ref, w_ref, h_ref = ref.pavx(y.copy())
    g, w, h = scoring.pavx(y)
    np.testing.assert_allclose(g, g_ref, atol=1e-10)
    np.testing.assert_array_equal(w, w_ref)

    # optimal_llr + ROCCH EER + cllr/min_cllr
    t_ref, n_ref, eer_ref = ref.optimal_llr(tar, non, compute_eer=True)
    t_o, n_o, eer_o = scoring.optimal_llr(tar, non, compute_eer=True)
    np.testing.assert_allclose(t_o, t_ref, atol=1e-8)
    np.testing.assert_allclose(eer_o, eer_ref, atol=1e-10)
    np.testing.assert_allclose(scoring.cllr(tar, non), ref.cllr(tar, non), atol=1e-10)
    cmin_ref, eer2_ref = ref.min_cllr(tar, non, compute_eer=True)
    cmin, eer2 = scoring.min_cllr(tar, non, compute_eer=True)
    np.testing.assert_allclose(cmin, cmin_ref, atol=1e-10)

    # linkability
    d_ref = ref.linkability(tar, non)[0]
    d = scoring.linkability(tar, non)[0]
    np.testing.assert_allclose(d, d_ref, atol=1e-10)

    # eer sanity: bootstrap CI brackets the point estimate
    eer, lo, hi = scoring.eer_ci_bootstrap(tar, non, n_boot=50)
    assert lo <= eer <= hi
    assert abs(eer - eer_ref) < 0.02


def test_asnorm_matches_reference(rng):
    import torch

    # load reference scoring __init__ with feerci stub
    sys.modules.setdefault("feerci", types.ModuleType("feerci"))
    sys.modules["feerci"].feerci = lambda *a, **k: (0, 0, 0, [])
    sys.modules.setdefault("ref_metric_pkg", _ref_metric())
    src = open("/root/reference/satools/satools/sidekit/scoring/__init__.py").read()
    src = src.replace("from .metric import *", "")
    mod = types.ModuleType("ref_scoring")
    exec(compile(src, "ref_scoring.py", "exec"), mod.__dict__)

    from satpu.sidekit import scoring

    enr = rng.standard_normal((20, 16)).astype(np.float32)
    tst = rng.standard_normal((20, 16)).astype(np.float32)
    coh = rng.standard_normal((300, 16)).astype(np.float32)
    s = np.sum(enr * tst, axis=1)
    ref_out = mod.asnorm(torch.from_numpy(s.copy()), torch.from_numpy(enr),
                         torch.from_numpy(tst), torch.from_numpy(coh)).numpy()
    out = scoring.asnorm(s, enr, tst, coh)
    np.testing.assert_allclose(out, ref_out, rtol=1e-4, atol=1e-5)


def test_dece_and_ece_plot_match_reference(tmp_path, rng):
    """dece/int_ece golden vs reference metric.py:789-811 (the vectorized
    current formula), and the ece_plot figure writes (metric.py:815-847)."""
    from satpu.sidekit import scoring

    m = _ref_metric()
    tar = rng.standard_normal(400) * 1.5 + 1.0
    non = rng.standard_normal(600) * 1.2 - 1.0
    # include the special cases: exact zero and near-zero LLRs
    tar[0] = 0.0
    tar[1] = 1e-9
    ref = float(m.dece(tar, non))
    got = float(scoring.dece(tar, non))
    assert abs(ref - got) < 1e-12, (ref, got)
    assert abs(float(m.int_ece(tar)) - float(scoring.int_ece(tar))) < 1e-12

    assert scoring.category_tag_evidence(0.5) == "A"
    assert scoring.category_tag_evidence(3.0) == "C"
    assert scoring.category_tag_evidence(10.0) == "F"

    out = scoring.ece_plot(tar, non, str(tmp_path / "ece.png"))
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 1000
    assert os.path.exists(str(tmp_path / "ece.pdf"))
