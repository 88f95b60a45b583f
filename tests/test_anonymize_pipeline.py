"""End-to-end anonymize pipeline test with a tiny model + synthetic data dir."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _tiny_anon_checkpoint(tmp_path):
    import jax

    from satpu import infer_helper
    from satpu.models.anonymizer import AnonymizationNet, AnonymizerConfig
    from satpu.models.asrbn import TDNNFNetConfig

    # VQ bottleneck like the flagship B5/B6 models: the checkpoint-loaded
    # codebook is a plain numpy array, which the VQ lookup must lift to jnp
    # before indexing with a traced batch (round-3 serving regression)
    asrbn = dict(output_dim=16, hidden_dim=16, bottleneck_dim=8,
                 prefinal_bottleneck_dim=8, bottleneck="vq", codebook_size=8)
    cfg = AnonymizerConfig(asrbn=TDNNFNetConfig(**asrbn), num_speakers=3, bn_dim=8)
    model = AnonymizationNet(cfg)
    wav = np.zeros((1, 16000), np.float32)
    f0 = np.zeros((1, 51), np.float32)
    variables = model.init(jax.random.PRNGKey(0), wav, f0, np.zeros((1,), np.int32),
                           method=model.convert)
    path = str(tmp_path / "anon.ckpt")
    infer_helper.save_model(
        path, "anonymizer_tdnnf_hifigan",
        {"asrbn": asrbn, "num_speakers": 3, "bn_dim": 8},
        variables, extra_meta={"speakers": ["spkA", "spkB", "spkC"]})
    return path


def _make_data_dir(tmp_path, n_utts=5):
    from satpu.utils import kaldi_data

    d = str(tmp_path / "data")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    wav_scp, utt2spk = {}, {}
    for i in range(n_utts):
        T = 8000 + 3000 * i
        x = (np.sin(np.linspace(0, 200 + 40 * i, T)) * 0.3).astype(np.float32)
        p = str(tmp_path / f"u{i}.wav")
        kaldi_data.write_wav(p, x, 16000)
        wav_scp[f"utt{i}"] = p
        utt2spk[f"utt{i}"] = f"src{i % 2}"
    kaldi_data.write_keyed_text(wav_scp, os.path.join(d, "wav.scp"))
    kaldi_data.write_keyed_text(utt2spk, os.path.join(d, "utt2spk"))
    return d


def test_select_targets_algorithms():
    import random

    from satpu.bin.pipeline import select_targets

    utids = [f"u{i}" for i in range(6)]
    utt2spk = {u: f"s{i % 3}" for i, u in enumerate(utids)}
    targets = ["a", "b", "c", "d"]
    rng = random.Random(0)

    out = select_targets(utids, "constant", targets, utt2spk, {}, "b", rng)
    assert out == ["b"] * 6
    # 'none' resynthesizes each utterance as its own source speaker
    # (reference bin/pipeline.py:113-114)
    assert select_targets(utids, "none", targets, utt2spk, {}, rng=rng) == [
        utt2spk[u] for u in utids]
    state = {}
    out = select_targets(utids, "random_per_spk", targets, utt2spk, state, rng=rng)
    by_spk = {}
    for u, t in zip(utids, out):
        by_spk.setdefault(utt2spk[u], set()).add(t)
    assert all(len(v) == 1 for v in by_spk.values())
    state = {}
    out = select_targets(utids, "random_per_spk_uniq", targets, utt2spk, state, rng=rng)
    spk_targets = {utt2spk[u]: t for u, t in zip(utids, out)}
    assert len(set(spk_targets.values())) == len(spk_targets)
    with pytest.raises(ValueError):
        select_targets(utids, "bogus", targets, utt2spk, {})


def test_pipeline_end_to_end(tmp_path):
    from satpu import infer_helper
    from satpu.bin.pipeline import process_data
    from satpu.utils import kaldi_data

    ckpt = _tiny_anon_checkpoint(tmp_path)
    data_dir = _make_data_dir(tmp_path)
    model, variables, meta = infer_helper.load_model(ckpt)
    out_dir = process_data(
        model, variables, meta["speakers"], data_dir,
        str(tmp_path / "wavs"), target_selection_algorithm="random_per_utt",
        batch_size=2, buckets=(8000, 16000, 24000))
    scp = kaldi_data.read_wav_scp(os.path.join(out_dir, "wav.scp"))
    assert len(scp) == 5
    for utt, p in scp.items():
        wav, rate = kaldi_data.load_wav_from_scp(p)
        assert rate == 16000
        assert wav.shape[1] > 4000
        assert np.isfinite(wav).all()
    # utt2spk copied over
    assert os.path.exists(os.path.join(out_dir, "utt2spk"))


def test_pipeline_serve_mesh_matches_single_device(tmp_path):
    """serve_mesh=True (batch sharded over the 8-device CPU mesh) must write
    the same waveforms as the single-device path — pure data parallelism,
    no collectives, same per-utterance graph."""
    import jax

    from satpu import infer_helper
    from satpu.bin.pipeline import process_data
    from satpu.utils import kaldi_data

    cpus = jax.devices("cpu")
    assert len(cpus) == 8  # conftest's virtual CPU mesh
    ckpt = _tiny_anon_checkpoint(tmp_path)
    data_dir = _make_data_dir(tmp_path)
    model, variables, meta = infer_helper.load_model(ckpt)
    kwargs = dict(target_selection_algorithm="constant",
                  target_constant_spkid=meta["speakers"][1],
                  batch_size=8, buckets=(8000, 16000, 24000),
                  devices=cpus)
    out1 = process_data(model, variables, meta["speakers"], data_dir,
                        str(tmp_path / "wavs_single"),
                        new_datadir_suffix="_anon_single", **kwargs)
    out2 = process_data(model, variables, meta["speakers"], data_dir,
                        str(tmp_path / "wavs_mesh"),
                        new_datadir_suffix="_anon_mesh", serve_mesh=True,
                        **kwargs)
    scp1 = kaldi_data.read_wav_scp(os.path.join(out1, "wav.scp"))
    scp2 = kaldi_data.read_wav_scp(os.path.join(out2, "wav.scp"))
    assert scp1.keys() == scp2.keys()
    for utt in scp1:
        w1, _ = kaldi_data.load_wav_from_scp(scp1[utt])
        w2, _ = kaldi_data.load_wav_from_scp(scp2[utt])
        # GSPMD partitions the conv-splice TDNNF with a different
        # accumulation order than the single-device program; observed
        # divergence is ~3e-5 absolute on <0.1% of samples
        np.testing.assert_allclose(w1, w2, atol=1e-4)

    # indivisible batch is a clear error, not silent wrong shapes
    with pytest.raises(ValueError, match="divisible"):
        process_data(model, variables, meta["speakers"], data_dir,
                     str(tmp_path / "wavs_bad"), serve_mesh=True,
                     new_datadir_suffix="_anon_bad", devices=cpus,
                     target_selection_algorithm="constant",
                     target_constant_spkid=meta["speakers"][1],
                     batch_size=6, buckets=(8000,))


def test_bucket_for_overflow_rounds_up():
    from satpu.bin.pipeline import bucket_for

    assert bucket_for(100, (200, 400)) == 200
    assert bucket_for(401, (200, 400)) == 800  # multiple of the largest
    assert bucket_for(1201, (200, 400)) == 1600


def test_pipeline_sharded_merge(tmp_path):
    from satpu import infer_helper
    from satpu.bin.pipeline import process_data
    from satpu.utils import kaldi_data

    ckpt = _tiny_anon_checkpoint(tmp_path)
    data_dir = _make_data_dir(tmp_path)
    model, variables, meta = infer_helper.load_model(ckpt)
    for shard in range(2):
        out_dir = process_data(
            model, variables, meta["speakers"], data_dir,
            str(tmp_path / "wavs_sh"), target_selection_algorithm="constant",
            target_constant_spkid=meta["speakers"][0], batch_size=2,
            buckets=(8000, 16000, 24000), num_shards=2, shard=shard,
            new_datadir_suffix="_anon_sh")
    scp = kaldi_data.read_wav_scp(os.path.join(out_dir, "wav.scp"))
    assert len(scp) == 5  # merged across both shards


def test_pipeline_speaker_f0_norm(tmp_path):
    """hifigan_clean flow: checkpoint-carried per-speaker F0 stats normalize
    host-side when the model skips in-graph normalization."""
    import jax

    from satpu import infer_helper
    from satpu.bin.pipeline import process_data
    from satpu.models.anonymizer import AnonymizationNet, AnonymizerConfig
    from satpu.models.asrbn import TDNNFNetConfig
    from satpu.ops.cmvn import SpeakerCMVN
    from satpu.utils import kaldi_data

    asrbn = dict(output_dim=16, hidden_dim=16, bottleneck_dim=8,
                 prefinal_bottleneck_dim=8)
    cfg = AnonymizerConfig(asrbn=TDNNFNetConfig(**asrbn), num_speakers=3,
                           bn_dim=8, f0_norm="none")
    model = AnonymizationNet(cfg)
    wav = np.zeros((1, 16000), np.float32)
    f0 = np.zeros((1, 50), np.float32)
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), wav, f0, np.zeros((1,), np.int32),
        method=model.convert))()
    cm = SpeakerCMVN(keep_zeros=True)
    cm.accumulate(np.abs(np.random.default_rng(0).standard_normal(100)) * 100 + 50,
                  "src0")
    ckpt = str(tmp_path / "anon_spk.ckpt")
    infer_helper.save_model(ckpt, "anonymizer_tdnnf_hifigan",
                            {"asrbn": asrbn, "num_speakers": 3, "bn_dim": 8,
                             "f0_norm": "none"}, variables,
                            extra_meta={"speakers": ["spkA", "spkB", "spkC"],
                                        "f0_speaker_stats": cm.to_meta()})
    data_dir = _make_data_dir(tmp_path)
    model2, v2, meta = infer_helper.load_model(ckpt)
    assert model2.cfg.f0_norm == "none"
    out_dir = process_data(model2, v2, meta["speakers"], data_dir,
                           str(tmp_path / "wavs_f0"),
                           f0_speaker_stats=meta["f0_speaker_stats"],
                           target_selection_algorithm="random_per_utt",
                           batch_size=2, buckets=(8000, 16000, 24000),
                           new_datadir_suffix="_anon_f0")
    scp = kaldi_data.read_wav_scp(os.path.join(out_dir, "wav.scp"))
    assert len(scp) == 5
