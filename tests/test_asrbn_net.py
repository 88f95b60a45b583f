"""Full-stack golden test: satpu TDNNFNet vs the reference tuning/tdnnf.py Net
(audio in -> chain/xent out and extract_bn), using converted weights."""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import conftest as helpers


def _build_reference_net(output_dim=128, vq=0):
    """Exec the actual reference tuning file against a minimal satools stub."""
    import importlib.util

    import torch

    if "satools" not in sys.modules:
        satools = types.ModuleType("satools")
        satools.kaldifeat = None  # set below (alias of kaldifeature, see reference __init__)
        kaldifeature = helpers.reference_module("ref_kaldifeature")
        sys.modules["kaldiio"] = types.ModuleType("kaldiio")
        cmvn = helpers.reference_module("ref_cmvn", path="/root/reference/satools/satools/cmvn.py")
        # chain nn with objf stub (see test_tdnnf)
        from test_tdnnf import _ref_chain_nn

        nn_mod = _ref_chain_nn()
        chain = types.ModuleType("satools.chain")

        class ChainE2EModel:
            @staticmethod
            def get_padding(kernel_sizes, subsampling_factors):
                pad = 0
                g = 1
                for k, s in zip(kernel_sizes, subsampling_factors):
                    pad += (k - 1) * g
                    g *= s
                return int(pad)

        chain.ChainE2EModel = ChainE2EModel
        satools.kaldifeature = kaldifeature
        satools.kaldifeat = kaldifeature
        satools.cmvn = cmvn
        satools.nn = nn_mod
        satools.chain = chain
        sys.modules["satools"] = satools
        sys.modules["satools.nn"] = nn_mod
        sys.modules["satools.chain"] = chain
        sys.modules["satools.cmvn"] = cmvn
        sys.modules["satools.kaldifeature"] = kaldifeature

    path = ("/root/reference/egs/asr/librispeech/local/chain/tuning/tdnnf_vq.py" if vq
            else "/root/reference/egs/asr/librispeech/local/chain/tuning/tdnnf.py")
    spec = importlib.util.spec_from_file_location("ref_tuning_tdnnf", path)
    mod = importlib.util.module_from_spec(spec)
    mod.__name__ = "ref_tuning_tdnnf"
    # tuning files read module-level `args`
    saved_argv = sys.argv
    sys.argv = [path]
    try:
        src = open(path).read()
        src = src.split('if __name__ == "__main__":')[0]
        ns = {"__name__": "ref_tuning_tdnnf", "__file__": path}
        exec(compile(src, path, "exec"), ns)
        args = types.SimpleNamespace(codebook_size=vq, freeze_encoder="False")
        Net = ns["build"](args)
        torch.manual_seed(0)
        net = Net(output_dim=output_dim)
        net.eval()
        return net
    finally:
        sys.argv = saved_argv


@pytest.mark.parametrize("vq", [0, 48])
def test_tdnnfnet_matches_reference(vq):
    import torch

    from satpu.models.asrbn import TDNNFNet, TDNNFNetConfig
    from satpu.models.convert import convert_asrbn

    tnet = _build_reference_net(output_dim=128, vq=vq)
    sd = tnet.state_dict()

    cfg = TDNNFNetConfig(output_dim=128, bottleneck="vq" if vq else "none",
                         codebook_size=vq)
    jnet = TDNNFNet(cfg)
    variables = convert_asrbn(sd)

    rng = np.random.default_rng(7)
    wav = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        ref_chain, ref_xent = tnet(torch.from_numpy(wav.copy()))
        ref_bn = tnet.extract_bn(torch.from_numpy(wav.copy()))

    out_chain, out_xent = jnet.apply(variables, wav, train=False)
    out_bn = jnet.apply(variables, wav, train=False, method=jnet.extract_bn)

    assert np.asarray(out_chain).shape == tuple(ref_chain.shape)
    assert np.asarray(out_chain).shape[1] == 66  # validate_model invariant (tdnnf.py:136-146)
    np.testing.assert_allclose(np.asarray(out_chain), ref_chain.numpy(), rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_xent), ref_xent.numpy(), rtol=1e-3, atol=5e-3)
    assert np.asarray(out_bn).shape == tuple(ref_bn.shape)
    np.testing.assert_allclose(np.asarray(out_bn), ref_bn.numpy(), rtol=1e-3, atol=5e-3)


def test_extract_bn_subsampling_sweep():
    """Mirror the reference's --mode test sweep (tuning/tdnnf.py:215-226)."""
    from satpu.models.asrbn import TDNNFNet, TDNNFNetConfig
    import jax

    cfg = TDNNFNetConfig(output_dim=64)
    net = TDNNFNet(cfg)
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 8000), np.float32))
    for T in [8000, 16000, 16640, 32000]:
        wav = np.zeros((1, T), np.float32)
        bn = net.apply(variables, wav, train=False, method=net.extract_bn)
        ratio = T / bn.shape[1]
        # stage-1 subsampling is x2 -> 320 samples/frame
        assert abs(ratio - 320) < 20, f"T={T}: ratio {ratio}"
        assert bn.shape[2] == cfg.prefinal_bottleneck_dim
