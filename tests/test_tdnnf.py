"""Golden tests: satpu TDNNF stack vs the reference chain/nn.py torch modules
with identical (converted) weights."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import conftest as helpers


def _ref_chain_nn():
    """Load reference chain/nn.py with a minimal objf stub (eval path only)."""
    import sys
    import types

    if "ref_chain.nn" in sys.modules:
        return sys.modules["ref_chain.nn"]
    import torch

    pkg = types.ModuleType("ref_chain")
    pkg.__path__ = []
    sys.modules["ref_chain"] = pkg
    objf = types.ModuleType("ref_chain.objf")

    def OnlineNaturalGradient_apply(x, weight, bias):
        out = x.matmul(weight.t())
        if bias is not None:
            out = out + bias
        return out

    objf.OnlineNaturalGradient_apply = OnlineNaturalGradient_apply
    objf.OnlineNaturalGradient = object
    sys.modules["ref_chain.objf"] = objf
    return helpers.reference_module(
        "ref_chain.nn", path="/root/reference/satools/satools/chain/nn.py")


def _flax_params_from_torch_tdnnfbn(layer):
    from satpu.models.convert import convert_asrbn  # noqa: F401  (paths built by hand here)

    sd = {k: v for k, v in layer.state_dict().items()}

    def np_(k):
        return sd[k].numpy()

    params = {
        "tdnn": {
            "linearB": {"inner_nat": {
                "weight": np_("tdnn.linearB.inner_nat.weight"),
                "bias": np_("tdnn.linearB.inner_nat.bias"),
            }},
            "linearA": {
                "weight": np_("tdnn.linearA.weight"),
                "bias": np_("tdnn.linearA.bias")[None, :],
            },
        }
    }
    batch_stats = {"bn": {
        "mean": np_("bn.running_mean"),
        "var": np_("bn.running_var"),
    }}
    return {"params": params, "batch_stats": batch_stats}


@pytest.mark.parametrize("context_len,subsampling", [(1, 1), (3, 1), (3, 2), (1, 1.5), (3, 3)])
def test_tdnnf_batchnorm_matches_reference(rng, context_len, subsampling):
    import torch

    from satpu.models.tdnnf import TDNNFBatchNorm

    ref_nn = _ref_chain_nn()
    feat_dim, out_dim, bottleneck = 64, 64, 32
    tlayer = ref_nn.TDNNFBatchNorm(
        feat_dim, out_dim, bottleneck, context_len=context_len,
        subsampling_factor=subsampling, orthonormal_constraint=-1.0)
    tlayer.eval()

    x = rng.standard_normal((2, 30, feat_dim)).astype(np.float32)
    with torch.no_grad():
        ref = tlayer(torch.from_numpy(x.copy())).numpy()

    jlayer = TDNNFBatchNorm(feat_dim, out_dim, bottleneck, context_len=context_len,
                            subsampling_factor=subsampling, orthonormal_constraint=-1.0)
    variables = _flax_params_from_torch_tdnnfbn(tlayer)
    out = np.asarray(jlayer.apply(variables, x, train=False))
    assert out.shape == ref.shape, f"{out.shape} vs {ref.shape}"
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_tdnnf_bypass_subsample_1_5(rng):
    """The fractional 1.5-subsampling path incl. bypass padding."""
    import torch

    from satpu.models.tdnnf import TDNNFBatchNorm

    ref_nn = _ref_chain_nn()
    dim = 32
    tlayer = ref_nn.TDNNFBatchNorm(dim, dim, 16, context_len=1, subsampling_factor=1.5,
                                   orthonormal_constraint=-1.0, bypass_scale=0.66)
    tlayer.eval()
    x = rng.standard_normal((1, 45, dim)).astype(np.float32)
    with torch.no_grad():
        ref = tlayer(torch.from_numpy(x.copy())).numpy()
    jlayer = TDNNFBatchNorm(dim, dim, 16, context_len=1, subsampling_factor=1.5,
                            orthonormal_constraint=-1.0, bypass_scale=0.66)
    out = np.asarray(jlayer.apply(_flax_params_from_torch_tdnnfbn(tlayer), x, train=False))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_vq_ema_matches_reference_eval(rng):
    import torch

    from satpu.models.tdnnf import VectorQuantizerEMA

    ref_nn = _ref_chain_nn()
    K, D = 48, 16
    tvq = ref_nn.VectorQuantizerEMA(K, D, commitment_cost=0.25, decay=0.99)
    tvq.eval()
    x = rng.standard_normal((2, 20, D)).astype(np.float32)
    with torch.no_grad():
        vq_loss, quantized, perplexity, _, _, idx = tvq(torch.from_numpy(x.copy()))

    jvq = VectorQuantizerEMA(K, D, commitment_cost=0.25, decay=0.99)
    variables = {"vq_stats": {
        "embedding": tvq._embedding.weight.detach().numpy(),
        "ema_cluster_size": tvq._ema_cluster_size.numpy(),
        "ema_w": tvq._ema_w.detach().numpy(),
    }}
    jl, jq, jp, jidx = jvq.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(jq), quantized.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(jl), float(vq_loss), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(jp), float(perplexity), rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(jidx).reshape(-1), idx.numpy().reshape(-1))


def test_vq_ema_training_update_matches_reference(rng):
    import torch

    from satpu.models.tdnnf import VectorQuantizerEMA

    ref_nn = _ref_chain_nn()
    K, D = 24, 8
    tvq = ref_nn.VectorQuantizerEMA(K, D, commitment_cost=0.25, decay=0.9)
    tvq.train()
    x = rng.standard_normal((1, 40, D)).astype(np.float32)

    variables = {"vq_stats": {
        "embedding": tvq._embedding.weight.detach().numpy().copy(),
        "ema_cluster_size": tvq._ema_cluster_size.numpy().copy(),
        "ema_w": tvq._ema_w.detach().numpy().copy(),
    }}
    with torch.no_grad():
        tvq(torch.from_numpy(x.copy()))

    jvq = VectorQuantizerEMA(K, D, commitment_cost=0.25, decay=0.9)
    _, new_vars = jvq.apply(variables, x, train=True, mutable=["vq_stats"])
    np.testing.assert_allclose(
        np.asarray(new_vars["vq_stats"]["embedding"]),
        tvq._embedding.weight.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_vars["vq_stats"]["ema_cluster_size"]),
        tvq._ema_cluster_size.numpy(), rtol=1e-4, atol=1e-6)


def test_constrain_orthonormal_matches_reference(rng):
    import torch

    from satpu.models.tdnnf import constrain_orthonormal

    ref_nn = _ref_chain_nn()
    for scale in [-1.0, 1.0]:  # 0.0 is never used (reference would produce inf too)
        M = rng.standard_normal((32, 96)).astype(np.float32)
        tM = torch.from_numpy(M.copy())
        ref_nn.constrain_orthonormal(tM, scale)
        out = np.asarray(constrain_orthonormal(M, scale))
        np.testing.assert_allclose(out, tM.numpy(), rtol=1e-3, atol=1e-4, err_msg=f"scale={scale}")


@pytest.mark.parametrize("context_len,subsampling", [(3, 1), (3, 3), (2, 1)])
def test_conv_splice_matches_materialized_splice(rng, context_len, subsampling):
    """The NG-off affine consumes raw frames through one VALID conv
    (NaturalAffineTransform(splice=)); it must equal the materialized
    splice_frames + matmul form in values AND parameter gradients (the
    round-5 rewrite that took the B=64 chain step 47.7 -> 39.4 ms)."""
    import jax
    import jax.numpy as jnp

    from satpu.models.tdnnf import TDNNF, splice_frames

    B, T, D = 3, 40, 24
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    m = TDNNF(D, D, 8, context_len=context_len,
              subsampling_factor=subsampling, natural_gradient=False)
    v = m.init(jax.random.PRNGKey(1), x)

    def conv_form(params):
        return jnp.sum(m.apply({"params": params}, x) ** 2)

    def spliced_form(params):
        w = params["linearB"]["inner_nat"]["weight"]
        bB = params["linearB"]["inner_nat"]["bias"]
        wA = params["linearA"]["weight"]
        bA = params["linearA"]["bias"]
        sp = splice_frames(x, context_len, subsampling)
        h = sp @ w.T + bB[0]
        y = h @ wA.T + bA[0]
        y = m.apply(v, y, x, method=m._bypass)
        return jnp.sum(y ** 2)

    y1, g1 = jax.value_and_grad(conv_form)(v["params"])
    y2, g2 = jax.value_and_grad(spliced_form)(v["params"])
    np.testing.assert_allclose(float(y1), float(y2), rtol=1e-5)
    for path, a in jax.tree_util.tree_flatten_with_path(g1)[0]:
        b = g2
        for k in path:
            b = b[k.key]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=str(path))
