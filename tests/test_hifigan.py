"""Golden tests: satpu HiFi-GAN generator/discriminators vs the reference
torch modules (satools/satools/hifigan/{archi,nn}.py) with converted weights."""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import conftest as helpers


def _ref_hifigan():
    """Load reference hifigan nn.py + archi.py standalone."""
    if "ref_hifigan.archi" in sys.modules:
        return sys.modules["ref_hifigan.nn"], sys.modules["ref_hifigan.archi"]
    pkg = types.ModuleType("ref_hifigan")
    pkg.__path__ = []
    sys.modules["ref_hifigan"] = pkg
    # hifigan/nn.py does `from .. import utils` but only uses it inside
    # fix_weight_norm_deepcopy, so a stub suffices
    utils_stub = types.ModuleType("utils")
    utils_stub.torch = types.SimpleNamespace(fix_weight_norm_deepcopy=lambda *_: None)
    parent = types.ModuleType("ref_parent")
    parent.utils = utils_stub
    sys.modules["ref_parent"] = parent
    src = open("/root/reference/satools/satools/hifigan/nn.py").read()
    src = src.replace("from .. import utils", "from ref_parent import utils")
    nn_mod = types.ModuleType("ref_hifigan.nn")
    nn_mod.__dict__["__name__"] = "ref_hifigan.nn"
    exec(compile(src, "ref_hifigan_nn.py", "exec"), nn_mod.__dict__)
    sys.modules["ref_hifigan.nn"] = nn_mod

    src = open("/root/reference/satools/satools/hifigan/archi.py").read()
    src = src.replace("from . import nn as sann", "import ref_hifigan.nn as sann")
    archi = types.ModuleType("ref_hifigan.archi")
    archi.__dict__["__name__"] = "ref_hifigan.archi"
    exec(compile(src, "ref_hifigan_archi.py", "exec"), archi.__dict__)
    sys.modules["ref_hifigan.archi"] = archi
    return nn_mod, archi


def test_wn_conv1d_matches_torch(rng):
    import torch

    from satpu.models.convert import convert_hifigan
    from satpu.models.hifigan import WNConv1d

    tconv = torch.nn.utils.weight_norm(torch.nn.Conv1d(8, 16, 5, 2, padding=2, dilation=1))
    tconv.eval()
    x = rng.standard_normal((2, 8, 40)).astype(np.float32)  # [B, C, T]
    with torch.no_grad():
        ref = tconv(torch.from_numpy(x.copy())).numpy()
    jconv = WNConv1d(8, 16, 5, stride=2, padding=2)
    variables = convert_hifigan(tconv.state_dict())
    out = np.asarray(jconv.apply(variables, np.transpose(x, (0, 2, 1))))
    np.testing.assert_allclose(np.transpose(out, (0, 2, 1)), ref, rtol=1e-4, atol=1e-5)


def test_wn_conv_transpose1d_matches_torch(rng):
    import torch

    from satpu.models.convert import convert_hifigan
    from satpu.models.hifigan import WNConvTranspose1d

    for (cin, cout, k, u) in [(16, 8, 11, 5), (8, 4, 8, 4), (8, 4, 4, 2)]:
        tconv = torch.nn.utils.weight_norm(
            torch.nn.ConvTranspose1d(cin, cout, k, u, padding=(k - u) // 2))
        tconv.eval()
        x = rng.standard_normal((2, cin, 20)).astype(np.float32)
        with torch.no_grad():
            ref = tconv(torch.from_numpy(x.copy())).numpy()
        jconv = WNConvTranspose1d(cin, cout, k, u, padding=(k - u) // 2)
        variables = convert_hifigan(tconv.state_dict())
        out = np.asarray(jconv.apply(variables, np.transpose(x, (0, 2, 1))))
        assert out.shape[1] == ref.shape[2], (out.shape, ref.shape)
        np.testing.assert_allclose(np.transpose(out, (0, 2, 1)), ref, rtol=1e-4, atol=1e-5,
                                   err_msg=f"k={k} u={u}")


def test_core_hifigan_matches_reference(rng):
    import torch

    from satpu.models.convert import convert_hifigan
    from satpu.models.hifigan import CoreHifiGan, CoreHifiGanConfig

    _, archi = _ref_hifigan()
    torch.manual_seed(0)
    input_dim = 32
    tgen = archi.CoreHifiGan(imput_dim=input_dim, upsample_rates=[5, 4, 4, 2, 2],
                             upsample_kernel_sizes=[11, 8, 8, 4, 4],
                             upsample_initial_channel=64)
    tgen.eval()
    x = rng.standard_normal((1, input_dim, 23)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tgen(torch.from_numpy(x.copy()))
    ref = ref.numpy()

    cfg = CoreHifiGanConfig(input_dim=input_dim, upsample_initial_channel=64)
    jgen = CoreHifiGan(cfg)
    variables = convert_hifigan(tgen.state_dict())
    out = np.asarray(jgen.apply(variables, np.transpose(x, (0, 2, 1))))
    out = np.transpose(out, (0, 2, 1))  # [B, 1, T]
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_discriminators_match_reference(rng):
    import torch

    from satpu.models.convert import convert_hifigan
    from satpu.models.hifigan import (MultiPeriodDiscriminator,
                                      MultiScaleDiscriminator,
                                      discriminator_loss, feature_loss,
                                      generator_loss)

    nn_mod, _ = _ref_hifigan()
    torch.manual_seed(1)
    tmpd = nn_mod.MultiPeriodDiscriminator()
    tmsd = nn_mod.MultiScaleDiscriminator()
    tmpd.eval()
    tmsd.eval()

    y = rng.standard_normal((1, 1, 4000)).astype(np.float32) * 0.3
    y_hat = rng.standard_normal((1, 1, 4000)).astype(np.float32) * 0.3
    ty, tyh = torch.from_numpy(y.copy()), torch.from_numpy(y_hat.copy())
    with torch.no_grad():
        r_mpd = tmpd(ty, tyh)
        r_msd = tmsd(ty, tyh)

    jy, jyh = np.transpose(y, (0, 2, 1)), np.transpose(y_hat, (0, 2, 1))
    jmpd = MultiPeriodDiscriminator()
    out_mpd = jmpd.apply(convert_hifigan(tmpd.state_dict()), jy, jyh)
    jmsd = MultiScaleDiscriminator()
    out_msd = jmsd.apply(convert_hifigan(tmsd.state_dict()), jy, jyh)

    for ref_outs, j_outs, tag in [(r_mpd, out_mpd, "mpd"), (r_msd, out_msd, "msd")]:
        for i, (tr, jr) in enumerate(zip(ref_outs[0], j_outs[0])):
            np.testing.assert_allclose(np.asarray(jr), tr.numpy(), rtol=1e-3, atol=1e-4,
                                       err_msg=f"{tag} real out {i}")
        for i, (tg, jg) in enumerate(zip(ref_outs[1], j_outs[1])):
            np.testing.assert_allclose(np.asarray(jg), tg.numpy(), rtol=1e-3, atol=1e-4,
                                       err_msg=f"{tag} gen out {i}")
        # losses
        tl, _, _ = nn_mod.discriminator_loss(ref_outs[0], ref_outs[1])
        jl, _, _ = discriminator_loss(j_outs[0], j_outs[1])
        np.testing.assert_allclose(float(jl), float(tl), rtol=1e-3, atol=1e-4)
        tfl = nn_mod.feature_loss(ref_outs[2], ref_outs[3])
        # flax fmaps are NHWC vs torch NCHW; |a-b| mean is layout invariant
        jfl = feature_loss(j_outs[2], j_outs[3])
        np.testing.assert_allclose(float(jfl), float(tfl), rtol=1e-3, atol=1e-3)
        tgl, _ = nn_mod.generator_loss(ref_outs[1])
        jgl, _ = generator_loss(j_outs[1])
        np.testing.assert_allclose(float(jgl), float(tgl), rtol=1e-3, atol=1e-4)


def test_f0_transformations(rng):
    import torch

    from satpu.models.hifigan import mean_reverv_f0, quantize_f0

    nn_mod, _ = _ref_hifigan()
    f0 = rng.uniform(0, 1, size=(2, 1, 50)).astype(np.float32)
    f0[0, 0, 5:15] = 0.0
    ref = nn_mod.quantize_f0(torch.from_numpy(f0.copy()), "quant_16").numpy().reshape(2, 1, 50)
    out = np.asarray(quantize_f0(f0, 16))
    np.testing.assert_allclose(out, ref, atol=1e-6)
