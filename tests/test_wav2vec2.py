"""Golden test: satpu wav2vec2 vs HuggingFace Wav2Vec2Model (torch CPU) with
converted random weights, for both base (post-norm) and large (pre-norm)
style configs (tiny dimensions)."""
import numpy as np
import pytest


def _hf_model(stable_layer_norm):
    import torch
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    cfg = HFConfig(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2],
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=stable_layer_norm,
        feat_extract_norm="group",
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False,
    )
    torch.manual_seed(0)
    model = HFModel(cfg)
    model.eval()
    return model


@pytest.mark.parametrize("stable", [True, False])
def test_wav2vec2_matches_hf(rng, stable):
    import torch

    from satpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model, convert_wav2vec2

    hf = _hf_model(stable)
    x = (rng.standard_normal((2, 2000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.copy())).last_hidden_state.numpy()

    cfg = Wav2Vec2Config(
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=stable)
    model = Wav2Vec2Model(cfg)
    variables = convert_wav2vec2(hf.state_dict())
    out = np.asarray(model.apply(variables, x))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_wav2vec2_tdnnf_net_shapes(rng):
    import jax

    from satpu.models.asrbn import Wav2Vec2TDNNFNet, wav2vec2_tdnnf_config
    from satpu.models.wav2vec2 import Wav2Vec2Config

    w2v2 = Wav2Vec2Config(
        conv_dim=(16,) * 7, conv_kernel=(10, 3, 3, 3, 3, 2, 2),
        conv_stride=(5, 2, 2, 2, 2, 2, 2), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4)
    cfg = wav2vec2_tdnnf_config(output_dim=16, bottleneck="vq", codebook_size=8)
    cfg = cfg.__class__(**{**cfg.__dict__, "hidden_dim": 32, "bottleneck_dim": 16,
                           "prefinal_bottleneck_dim": 16})
    model = Wav2Vec2TDNNFNet(cfg, w2v2)
    wav = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), wav)
    chain_out, xent_out = model.apply(variables, wav, train=False)
    # validate_model invariant: 2 s -> 66 output frames (tdnnf_wav2vec2_vq.py:269-278)
    assert chain_out.shape[1] == 66, chain_out.shape
    bn = model.apply(variables, wav, train=False, method=model.extract_bn)
    assert bn.shape[2] == 16
    assert abs(bn.shape[1] - 100) <= 2  # ~/320 at stage-1 rate
