"""Golden test: satpu wav2vec2 vs HuggingFace Wav2Vec2Model (torch CPU) with
converted random weights, for both base (post-norm) and large (pre-norm)
style configs (tiny dimensions)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow


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
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=stable,
        feat_extract_norm="group", conv_bias=False)
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


def test_fairseq_name_conversion_roundtrip():
    """fairseq-named state dict -> HF names -> flax params matches converting
    the HF-named dict directly (the voxpopuli import path,
    utils/import_fairseq_model.py:37-113)."""
    import torch

    from satpu.models.wav2vec2 import convert_fairseq_wav2vec2, convert_wav2vec2

    model = _hf_model(stable_layer_norm=True)
    hf_sd = model.state_dict()

    # inverse-rename the HF dict into raw fairseq naming
    fs_sd = {}
    for k, v in hf_sd.items():
        nk = k
        if k.startswith("feature_extractor.conv_layers."):
            parts = k.split(".")
            i, sub = parts[2], ".".join(parts[3:])
            if sub.startswith("conv."):
                nk = f"feature_extractor.conv_layers.{i}.0.{sub.split('.')[-1]}"
            elif sub.startswith("layer_norm."):
                nk = f"feature_extractor.conv_layers.{i}.2.1.{sub.split('.')[-1]}"
        elif k.startswith("feature_projection.layer_norm."):
            nk = "layer_norm." + k.split(".")[-1]
        elif k.startswith("feature_projection.projection."):
            nk = "post_extract_proj." + k.split(".")[-1]
        elif k.startswith("encoder.pos_conv_embed.conv."):
            tail = k[len("encoder.pos_conv_embed.conv."):]
            tail = tail.replace("parametrizations.weight.original0", "weight_g")
            tail = tail.replace("parametrizations.weight.original1", "weight_v")
            nk = "encoder.pos_conv.0." + tail
        elif k.startswith("encoder.layers."):
            parts = k.split(".")
            i, sub = parts[2], ".".join(parts[3:])
            sub = (sub.replace("attention.", "self_attn.")
                      .replace("feed_forward.intermediate_dense.", "fc1.")
                      .replace("feed_forward.output_dense.", "fc2."))
            if sub.startswith("layer_norm."):
                sub = "self_attn_layer_norm." + sub.split(".")[-1]
            nk = f"encoder.layers.{i}.{sub}"
        fs_sd[nk] = v

    import jax

    ref = convert_wav2vec2(hf_sd)
    got = convert_fairseq_wav2vec2(fs_sd)
    ref_leaves = jax.tree_util.tree_leaves_with_path(ref)
    got_flat = dict(jax.tree_util.tree_leaves_with_path(got))
    assert len(ref_leaves) == len(got_flat)
    for path, leaf in ref_leaves:
        np.testing.assert_allclose(np.asarray(got_flat[path]), np.asarray(leaf),
                                   err_msg=str(path))


def test_wav2vec2_layered_lr_freeze(rng):
    """preprocessor_schedule=0 freezes the wav2vec2 front while the TDNNF
    stack still updates (tuning/tdnnf_wav2vec2_vq.py:189-220)."""
    import jax
    import jax.numpy as jnp

    from satpu.chain.fst import (Fst, fst_to_arrays, linear_fst_from_pdf_sequence,
                                 pad_graph_arrays)
    from satpu.chain.objf import DenominatorGraph
    from satpu.chain.trainer import (ChainTrainOpts, init_chain_state,
                                     make_chain_optimizer, make_chain_train_step)
    from satpu.models.asrbn import Wav2Vec2TDNNFNet, wav2vec2_tdnnf_config
    from satpu.models.wav2vec2 import Wav2Vec2Config

    num_pdfs = 8
    den = DenominatorGraph.from_fst(Fst.from_text(
        "\n".join(f"0 0 {p + 1} {p + 1} 2.0" for p in range(num_pdfs)) + "\n0 0.0"),
        num_pdfs=num_pdfs)
    import dataclasses as dc

    mcfg = dc.replace(wav2vec2_tdnnf_config(output_dim=num_pdfs),
                      hidden_dim=16, bottleneck_dim=8, prefinal_bottleneck_dim=8)
    w2v2 = Wav2Vec2Config(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4,
                          intermediate_size=64, conv_dim=(16, 16, 16),
                          conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
                          num_conv_pos_embeddings=16,
                          num_conv_pos_embedding_groups=4)
    model = Wav2Vec2TDNNFNet(mcfg, w2v2)
    topts = ChainTrainOpts(lr=0.01)
    opt = make_chain_optimizer(topts)
    state = init_chain_state(model, jax.random.PRNGKey(0),
                             np.zeros((2, 16000), np.float32), opt)
    step = jax.jit(make_chain_train_step(
        model, den, opt, topts, preprocessor_schedule=lambda s: jnp.asarray(0.0)))
    wav = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    graphs = pad_graph_arrays([
        fst_to_arrays(linear_fst_from_pdf_sequence([1, 2])),
        fst_to_arrays(linear_fst_from_pdf_sequence([3, 4]))])
    graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
    n_out = model.apply({"params": state.params, "batch_stats": state.batch_stats}, wav)[0].shape[1]
    frames = jnp.asarray([n_out, n_out], jnp.int32)
    new_state, metrics = step(state, wav, graphs, frames, jax.random.PRNGKey(1))
    d_pre = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                                   new_state.params["preprocessor"],
                                   state.params["preprocessor"])
    d_rest = {k: v for k, v in new_state.params.items() if k != "preprocessor"}
    d_rest = jax.tree_util.tree_map(
        lambda a, b: np.abs(np.asarray(a - b)).max(), d_rest,
        {k: v for k, v in state.params.items() if k != "preprocessor"})
    assert max(jax.tree_util.tree_leaves(d_pre)) == 0.0, "preprocessor not frozen"
    assert max(jax.tree_util.tree_leaves(d_rest)) > 0.0, "tdnnf did not update"


def test_wav2vec2_large_fullscale_conversion(rng):
    """Full-scale (wav2vec2-LARGE architecture: 24 layers, 1024 hidden,
    stable layer-norm, 7-conv frontend — the B5 front's exact shape) HF
    checkpoint conversion + forward golden. Round-1 verdict missing #7: the
    key map had only ever been pushed through tiny synthetic configs; this
    exercises every layer of the released-checkpoint shape (weights random —
    the real released file needs network — but key coverage, shapes and
    numerics of the full 24-layer conversion are what the converter can get
    wrong)."""
    import torch
    from transformers import Wav2Vec2Config as HFConfig
    from transformers import Wav2Vec2Model as HFModel

    from satpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Model, convert_wav2vec2

    hf_cfg = HFConfig(
        vocab_size=32, hidden_size=1024, num_hidden_layers=24,
        num_attention_heads=16, intermediate_size=4096,
        conv_dim=[512] * 7, conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2],
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, apply_spec_augment=False)
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()

    x = (rng.standard_normal((1, 8000)) * 0.1).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(x.copy())).last_hidden_state.numpy()

    variables = convert_wav2vec2(hf.state_dict())
    model = Wav2Vec2Model(Wav2Vec2Config.large())
    out = np.asarray(model.apply(variables, x))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-4)
