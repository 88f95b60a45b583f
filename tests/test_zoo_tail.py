"""Model-zoo tail: CircleProto, ChannelWiseCorrPooling, AdaptivePCMN,
SpeakerCMVN, MfccFrontEnd, m2o anonymizer, speaker-adversarial chain net
(VERDICT round-1 item 9)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_circle_proto(rng):
    import jax
    import jax.numpy as jnp

    from satpu.sidekit.loss import CircleProto

    B, D, S = 8, 16, 5  # 4 speaker pairs
    mod = CircleProto(emb_dim=D, speaker_count=S)
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)
    t = jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3])
    v = mod.init(jax.random.PRNGKey(0), x, t)
    loss, logits = mod.apply(v, x, t)
    assert np.isfinite(float(loss)) and float(loss) > 0
    assert logits.shape == (B, S)
    nan_loss, infer_logits = mod.apply(v, x)
    assert np.isnan(float(nan_loss)) and infer_logits.shape == (B, S)
    # loss decreases when embeddings move toward their prototypes
    w = np.asarray(v["params"]["weight"])
    x_good = jnp.asarray(np.concatenate([w[[0, 0, 1, 1, 2, 2, 3, 3]]]), jnp.float32)
    loss_good, _ = mod.apply(v, x_good + 0.01, t)
    assert float(loss_good) < float(loss)


def test_channelwise_corr_pooling(rng):
    import jax

    from satpu.sidekit.pooling import ChannelWiseCorrPooling

    B, T, F, C = 2, 12, 10, 32
    mod = ChannelWiseCorrPooling(in_channels=C, out_channels=8, in_freqs=F)
    x = np.asarray(rng.standard_normal((B, T, F, C)), np.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    groups = F // 2
    assert out.shape == (B, groups * 8 * 7 // 2)
    assert np.isfinite(np.asarray(out)).all()


def test_adaptive_pcmn(rng):
    import jax

    from satpu.ops.cmvn import AdaptivePCMN

    B, T, D = 2, 40, 12
    pcmn = AdaptivePCMN(D, left_context=-5, right_context=5)
    params = pcmn.init(jax.random.PRNGKey(0))
    x = np.asarray(rng.standard_normal((B, T, D)), np.float32)
    y = np.asarray(pcmn.apply(params, x))
    assert y.shape == x.shape and np.isfinite(y).all()
    # with zero alpha/mu weights and zero beta weights, beta == 1 -> identity
    zero = {k: np.zeros_like(np.asarray(v)) for k, v in params.items()}
    np.testing.assert_allclose(np.asarray(pcmn.apply(zero, x)), x, atol=1e-6)


def test_speaker_cmvn():
    from satpu.ops.cmvn import SpeakerCMVN

    cm = SpeakerCMVN(keep_zeros=True)
    rng = np.random.default_rng(0)
    f = rng.standard_normal((50, 4)).astype(np.float32) * 3 + 1
    f[10:20] = 0.0  # unvoiced
    cm.accumulate(f, "spkA")
    out = cm(f, "spkA")
    nz = out[f != 0]
    assert abs(nz.mean()) < 0.1 and abs(nz.std() - 1.0) < 0.1
    assert (out[f == 0] == 0).all()
    # round-trip through metadata
    cm2 = SpeakerCMVN.from_meta(cm.to_meta())
    np.testing.assert_allclose(cm2(f, "spkA"), out)
    with pytest.raises(KeyError):
        cm(f, "unknown")


def test_mfcc_frontend(rng):
    from satpu.sidekit.preprocessor import _dct2_matrix, mfcc_frontend

    # orthonormal DCT basis
    d = _dct2_matrix(80, 100)
    np.testing.assert_allclose(d @ d.T, np.eye(80), atol=1e-5)
    x = np.asarray(rng.standard_normal((2, 16000)), np.float32) * 0.1
    out = np.asarray(mfcc_frontend(x))
    assert out.shape[0] == 2 and out.shape[2] == 80
    # InstanceNorm CMVN: zero mean / unit var over time per coeff
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)


def test_spkadv_training_step(rng):
    import jax
    import jax.numpy as jnp

    from satpu.chain.fst import (Fst, fst_to_arrays, linear_fst_from_pdf_sequence,
                                 pad_graph_arrays)
    from satpu.chain.objf import DenominatorGraph
    from satpu.chain.trainer import (ChainTrainOpts, init_chain_state,
                                     make_chain_optimizer, make_chain_train_step)
    from satpu.models.asrbn import TDNNFNetConfig
    from satpu.models.spkadv import SpkAdvTDNNFNet

    num_pdfs = 8
    den_text = "\n".join(f"0 0 {p + 1} {p + 1} 2.0" for p in range(num_pdfs)) + "\n0 0.0"
    den = DenominatorGraph.from_fst(Fst.from_text(den_text), num_pdfs=num_pdfs)
    cfg = TDNNFNetConfig(output_dim=num_pdfs, hidden_dim=16, bottleneck_dim=8,
                         prefinal_bottleneck_dim=8)
    model = SpkAdvTDNNFNet(cfg, num_speakers=3)
    topts = ChainTrainOpts(lr=0.01)
    opt = make_chain_optimizer(topts)
    state = init_chain_state(model, jax.random.PRNGKey(0),
                             np.zeros((2, 8000), np.float32), opt)
    step = jax.jit(make_chain_train_step(model, den, opt, topts))
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    graphs = pad_graph_arrays([
        fst_to_arrays(linear_fst_from_pdf_sequence([1, 2])),
        fst_to_arrays(linear_fst_from_pdf_sequence([3, 4]))])
    graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
    frames = jnp.asarray([16, 16], jnp.int32)
    new_state, metrics = step(state, wav, graphs, frames, jax.random.PRNGKey(1),
                              spk_target=jnp.asarray([0, 1], jnp.int32))
    assert "spkadv_loss" in metrics and np.isfinite(float(metrics["spkadv_loss"]))
    assert "spkadv_accuracy" in metrics
    # adversarial branch actually moved the acoustic params
    moved = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                                   new_state.params, state.params)
    assert sum(x > 0 for x in jax.tree_util.tree_leaves(moved)) > 10


def test_spkadv_freeze_encoder_train_asi(rng):
    """train_asi phase (reference configs/tdnnf_bn_spkadv_train_asi +
    tuning/tdnnf_spkadv.py:265-281): frozen encoder trunk, trainable
    prefinal/output heads + asi branch, no gradient reversal."""
    import jax
    import jax.numpy as jnp

    from satpu.chain.fst import (Fst, fst_to_arrays, linear_fst_from_pdf_sequence,
                                 pad_graph_arrays)
    from satpu.chain.objf import DenominatorGraph
    from satpu.chain.trainer import (ChainTrainOpts, init_chain_state,
                                     make_chain_optimizer, make_chain_train_step)
    from satpu.models.asrbn import TDNNFNetConfig
    from satpu.models.spkadv import SpkAdvTDNNFNet

    num_pdfs = 8
    den_text = "\n".join(f"0 0 {p + 1} {p + 1} 2.0" for p in range(num_pdfs)) + "\n0 0.0"
    den = DenominatorGraph.from_fst(Fst.from_text(den_text), num_pdfs=num_pdfs)
    cfg = TDNNFNetConfig(output_dim=num_pdfs, hidden_dim=16, bottleneck_dim=8,
                         prefinal_bottleneck_dim=8)
    model = SpkAdvTDNNFNet(cfg, num_speakers=3, adversarial=False)
    topts = ChainTrainOpts(lr=0.01)
    opt = make_chain_optimizer(topts)
    state = init_chain_state(model, jax.random.PRNGKey(0),
                             np.zeros((2, 8000), np.float32), opt)

    heads = {"prefinal_chain", "prefinal_xent", "chain_output", "xent_output"}

    def freeze_filter(keys):
        return "acoustic" in keys and not any(k in heads for k in keys)

    step = jax.jit(make_chain_train_step(model, den, opt, topts,
                                         freeze_filter=freeze_filter))
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    graphs = pad_graph_arrays([
        fst_to_arrays(linear_fst_from_pdf_sequence([1, 2])),
        fst_to_arrays(linear_fst_from_pdf_sequence([3, 4]))])
    graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
    frames = jnp.asarray([16, 16], jnp.int32)
    new_state, _ = step(state, wav, graphs, frames, jax.random.PRNGKey(1),
                        spk_target=jnp.asarray([0, 1], jnp.int32))
    flat_new = jax.tree_util.tree_flatten_with_path(new_state.params)[0]
    flat_old = dict(jax.tree_util.tree_flatten_with_path(state.params)[0])
    frozen_moved, head_moved, asi_moved = [], [], []
    for path, leaf in flat_new:
        keys = tuple(str(getattr(p, "key", p)) for p in path)
        delta = float(np.abs(np.asarray(leaf - flat_old[path])).max())
        if "acoustic" in keys:
            (head_moved if any(k in heads for k in keys)
             else frozen_moved).append(delta)
        else:
            asi_moved.append(delta)
    assert max(frozen_moved) == 0.0  # encoder trunk bit-frozen
    assert max(head_moved) > 0.0     # prefinal/output heads train
    assert max(asi_moved) > 0.0      # asi classifier trains


def test_m2o_anonymizer():
    import jax

    from satpu.models.anonymizer import AnonymizationNet, AnonymizerConfig
    from satpu.models.asrbn import TDNNFNetConfig

    cfg = AnonymizerConfig(
        asrbn=TDNNFNetConfig(output_dim=16, hidden_dim=16, bottleneck_dim=8,
                             prefinal_bottleneck_dim=8),
        num_speakers=0, bn_dim=8, upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8), upsample_initial_channel=32)
    m = AnonymizationNet(cfg)
    wav = np.zeros((1, 16000), np.float32)
    f0 = np.zeros((1, 50), np.float32)
    v = jax.jit(lambda: m.init(jax.random.PRNGKey(0), wav, f0,
                               np.zeros((1,), np.int32), method=m.convert))()
    out = m.apply(v, wav, f0, np.zeros((1,), np.int32), method=m.convert)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()
    # no speaker one-hot params anywhere: input dim = bn + 1
    pre_v = v["params"]["hifigan"]["conv_pre"]["weight_v"]
    assert pre_v.shape[1] == cfg.bn_dim + 1


def test_xvector_frontend_variants(rng):
    """MFCC / WavLM frontends plug into both ASV trunks
    (reference preprocessor.py alternatives)."""
    import jax

    from satpu.models.wavlm import WavLMConfig
    from satpu.sidekit.xvector import XVectorConfig, build_xvector

    wl = WavLMConfig(hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
                     intermediate_size=64, conv_dim=(16, 16, 16),
                     conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
                     num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
                     num_buckets=32, max_bucket_distance=50)
    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    for cfg in (XVectorConfig(num_speakers=4, frontend="mfcc", channels=32,
                              embedding_size=16),
                XVectorConfig(num_speakers=4, frontend="wavlm", wavlm=wl,
                              channels=32, embedding_size=16),
                XVectorConfig(num_speakers=4, frontend="mfcc", arch="resnet")):
        m = build_xvector(cfg)
        v = jax.jit(lambda k, w, m=m: m.init(k, w))(jax.random.PRNGKey(0), wav)
        (loss, logits), xv = m.apply(v, wav)
        assert logits.shape == (2, 4) and np.isfinite(np.asarray(xv)).all()


def test_gru_pooling(rng):
    import jax

    from satpu.sidekit.pooling import GruPooling

    B, T, C = 2, 20, 16
    mod = GruPooling(input_size=C, gru_node=24, nb_gru_layer=2)
    x = np.asarray(rng.standard_normal((B, T, C)), np.float32)
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    assert out.shape == (B, 24)
    assert np.isfinite(np.asarray(out)).all()
    # last-timestep summary actually depends on the whole sequence
    x2 = x.copy()
    x2[:, 0, :] += 1.0
    out2 = mod.apply(v, x2)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-6


def test_wav2vec2_dp_variant_builds_and_noises():
    """tdnnf_wav2vec2_dp (reference tuning/tdnnf_wav2vec2_dp.py:92-94):
    wav2vec2 front + Laplace-noise bottleneck — buildable via the registry and
    actually noising the BN features (round-1 missing #6)."""
    import jax
    import numpy as np

    from satpu import infer_helper
    from satpu.models.asrbn import Wav2Vec2TDNNFNet, wav2vec2_tdnnf_config
    from satpu.models.wav2vec2 import Wav2Vec2Config

    w2v2 = Wav2Vec2Config(conv_dim=(16, 16), conv_kernel=(10, 4),
                          conv_stride=(5, 4), hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          intermediate_size=64, num_conv_pos_embeddings=16,
                          num_conv_pos_embedding_groups=4)
    cfg = wav2vec2_tdnnf_config(output_dim=16, bottleneck="dp", epsilon=1.0)
    import dataclasses

    cfg = dataclasses.replace(cfg, hidden_dim=32, bottleneck_dim=16,
                              prefinal_bottleneck_dim=16, p_dropout=0.0)
    net = Wav2Vec2TDNNFNet(cfg, w2v2)
    wav = np.random.default_rng(0).standard_normal((1, 8000)).astype(np.float32) * 0.1
    variables = net.init(jax.random.PRNGKey(0), wav)
    bn1 = net.apply(variables, wav, method=net.extract_bn,
                    rngs={"noise": jax.random.PRNGKey(1)})
    bn2 = net.apply(variables, wav, method=net.extract_bn,
                    rngs={"noise": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(bn1)).all()
    # the Laplace noise actually perturbs the bottleneck, rng-dependent
    assert np.max(np.abs(np.asarray(bn1) - np.asarray(bn2))) > 1e-3

    # and it round-trips through the model registry (train_asr save path)
    model = infer_helper.build_model(
        "asrbn_tdnnf_wav2vec2", output_dim=16, bottleneck="dp", epsilon=1.0,
        hidden_dim=32, bottleneck_dim=16, prefinal_bottleneck_dim=16,
        kernel_size_list=[3, 3, 3], subsampling_factor_list=[1, 1, 1],
        kernel_size_list_after=[1, 3, 3, 3],
        subsampling_factor_list_after=[1.5, 1, 1, 1],
        wav2vec2=dataclasses.asdict(w2v2))
    assert model.cfg.bottleneck == "dp" and model.cfg.epsilon == 1.0
