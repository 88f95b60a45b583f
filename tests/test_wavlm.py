"""Golden test: satpu WavLM vs HuggingFace WavLMModel (tiny config), and the
WavLmFrontEnd weighted-sum behavior (sidekit/preprocessor.py:79-163)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _hf_wavlm(stable_layer_norm=True, extractor="group"):
    import torch
    from transformers import WavLMConfig as HFConfig
    from transformers import WavLMModel as HFModel

    cfg = HFConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=[16, 16, 16], conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=32, max_bucket_distance=50,
        do_stable_layer_norm=stable_layer_norm, feat_extract_norm=extractor,
        conv_bias=(extractor == "layer"),
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False,
    )
    torch.manual_seed(0)
    return HFModel(cfg).eval()


def _satpu_cfg(stable=True, extractor="group"):
    from satpu.models.wavlm import WavLMConfig

    return WavLMConfig(hidden_size=32, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=64,
                       conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2),
                       conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
                       num_conv_pos_embedding_groups=4, num_buckets=32,
                       max_bucket_distance=50, do_stable_layer_norm=stable,
                       feat_extract_norm=extractor,
                       conv_bias=(extractor == "layer"))


# ("layer", True) is the wavlm-large extractor mode (WavLMConfig.large())
@pytest.mark.parametrize("stable,extractor",
                         [(True, "group"), (False, "group"), (True, "layer")])
def test_wavlm_matches_hf(stable, extractor, rng):
    import torch

    from satpu.models.wavlm import WavLMModel, convert_wavlm

    hf = _hf_wavlm(stable, extractor)
    x = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(torch.from_numpy(x)).last_hidden_state.numpy()
    model = WavLMModel(_satpu_cfg(stable, extractor))
    variables = convert_wavlm(hf.state_dict())
    out = np.asarray(model.apply(variables, x))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_wavlm_frontend_shapes(rng):
    import jax

    from satpu.models.wavlm import WavLmFrontEnd

    fe = WavLmFrontEnd(_satpu_cfg(True))
    x = rng.standard_normal((2, 4000)).astype(np.float32) * 0.1
    v = jax.jit(fe.init)(jax.random.PRNGKey(0), x)
    out = np.asarray(fe.apply(v, x))
    assert out.shape[0] == 2 and out.shape[2] == 32
    # instance norm: zero mean over frames
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)
    # feature_weight participates: perturbing it changes the output
    v2 = jax.tree_util.tree_map(lambda a: a, v)
    import jax.numpy as jnp

    v2 = {"params": dict(v["params"])}
    fw = np.zeros_like(np.asarray(v["params"]["feature_weight"]))
    fw[0] = 5.0
    v2["params"]["feature_weight"] = jnp.asarray(fw)
    out2 = np.asarray(fe.apply(v2, x))
    assert np.abs(out2 - out).max() > 1e-3
