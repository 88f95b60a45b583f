"""Tests for the M0 substrate: config, ark/scp IO, wav IO."""
import os

import numpy as np

from satpu.utils import config as cfg
from satpu.utils import checkpoint as ckpt
from satpu.utils import kaldi_data, scp_io


def test_ini_interpolation(tmp_path, monkeypatch):
    p = tmp_path / "conf.ini"
    p.write_text(
        "[var]\n"
        "basedir = /myproject\n"
        "vq = 48\n"
        "[exp]\n"
        "dir = ${:basedir}/exp  # inline comment\n"
        "codebook = ${:vq}\n"
        "plain = hello\n"
    )
    out = cfg.load_ini(str(p))
    assert out["exp"]["dir"] == "/myproject/exp"
    assert out["exp"]["codebook"] == "48"
    assert out["exp"]["plain"] == "hello"
    monkeypatch.setenv("vq", "128")
    out = cfg.load_ini(str(p))
    assert out["exp"]["codebook"] == "128"


def test_ini_var_in_var(tmp_path, monkeypatch):
    """[var] entries may reference other vars (reference vartoml semantics;
    e.g. configs/tdnnf_bn_vq: dirname = bn_tdnnf_100h_vq_${:vq} via exp var)."""
    p = tmp_path / "conf.ini"
    p.write_text(
        "[var]\n"
        "vq = 48\n"
        "exp = exp/run_vq${:vq}\n"
        "[train]\n"
        "dirname = ${:exp}\n"
    )
    out = cfg.load_ini(str(p))
    assert out["train"]["dirname"] == "exp/run_vq48"
    monkeypatch.setenv("vq", "64")
    out = cfg.load_ini(str(p))
    assert out["train"]["dirname"] == "exp/run_vq64"
    # reference cycles raise instead of looping
    p.write_text("[var]\na = ${:b}\nb = ${:a}\n[s]\nk = ${:a}\n")
    import pytest
    with pytest.raises(ValueError):
        cfg.load_ini(str(p))


def test_opts_dataclass():
    import dataclasses

    @dataclasses.dataclass
    class MyOpts(cfg.Opts):
        lr: float = 0.001
        num_workers: int = 4
        use_thing: bool = False
        name: str = "x"

    o = MyOpts().load_from_config({"lr": "0.01", "use_thing": "true", "name": "y"})
    assert o.lr == 0.01 and o.use_thing is True and o.name == "y"
    o2 = MyOpts().load_from_args(["--lr", "0.5", "--use-thing", "yes"])
    assert o2.lr == 0.5 and o2.use_thing is True and o2.num_workers == 4


def test_ark_scp_roundtrip(tmp_path):
    ark = str(tmp_path / "feats.ark")
    scp = str(tmp_path / "feats.scp")
    mats = {
        "utt1": np.random.randn(17, 80).astype(np.float32),
        "utt2": np.random.randn(5,).astype(np.float32),
        "utt3": np.random.randn(2, 3, 4).astype(np.float32),  # NPY record
        "utt4": np.random.randn(4, 4).astype(np.float64),
    }
    with scp_io.FileWriter(ark, scp) as w:
        for k, v in mats.items():
            w[k] = v
    r = scp_io.FileReader(scp)
    assert set(r.keys()) == set(mats.keys())
    for k, v in mats.items():
        np.testing.assert_array_almost_equal(r[k], v, decimal=6)
    # ark streaming
    seen = dict(scp_io.read_ark(ark))
    assert set(seen) == set(mats)
    # append mode
    with scp_io.FileWriter(ark, scp, append=True) as w:
        w["utt5"] = np.ones((2, 2), np.float32)
    r2 = scp_io.FileReader(scp)
    assert "utt5" in r2 and "utt1" in r2


def test_wav_roundtrip(tmp_path):
    x = (np.sin(np.linspace(0, 100, 8000)) * 0.5).astype(np.float32)
    p = str(tmp_path / "a.wav")
    kaldi_data.write_wav(p, x, 16000)
    y, rate = kaldi_data.load_wav_from_scp(p)
    assert rate == 16000 and y.shape == (1, 8000)
    np.testing.assert_allclose(y[0], x, atol=1.0 / 32768)
    # piped command form
    y2, _ = kaldi_data.load_wav_from_scp(f"cat {p} |")
    np.testing.assert_array_equal(y, y2)
    # offset reads
    y3, _ = kaldi_data.load_wav_from_scp(p, frame_offset=100, num_frames=50)
    np.testing.assert_array_equal(y3, y[:, 100:150])


def test_checkpoint_roundtrip(tmp_path):
    state = {"params": {"w": np.random.randn(3, 3).astype(np.float32), "b": np.zeros(3)}}
    meta = {"model_id": "test_model", "build_params": {"dim": 3}, "step": 7}
    p = str(tmp_path / "m.ckpt")
    ckpt.save_checkpoint(p, meta, state)
    meta2, state2 = ckpt.load_checkpoint(p)
    assert meta2 == meta
    np.testing.assert_array_equal(state2["params"]["w"], state["params"]["w"])


def test_match_params_partial_init():
    # reference utils/torch_utils.py:23-50 semantics: transfer on key+shape
    # match, keep template elsewhere; report what was skipped
    template = {
        "layer1": {"kernel": np.zeros((4, 4)), "bias": np.zeros(4)},
        "head": {"kernel": np.zeros((4, 10))},
    }
    loaded = {
        "layer1": {"kernel": np.ones((4, 4)), "bias": np.ones(4)},
        "head": {"kernel": np.ones((4, 7))},      # wrong shape: skipped
        "extra": {"kernel": np.ones((2, 2))},     # no home: skipped
    }
    merged, matched, unmatched = ckpt.match_params(template, loaded)
    assert sorted(matched) == ["layer1.bias", "layer1.kernel"]
    assert unmatched == ["extra.kernel", "head.kernel"]
    np.testing.assert_array_equal(merged["layer1"]["kernel"], 1.0)
    np.testing.assert_array_equal(merged["head"]["kernel"], 0.0)


def test_latest_checkpoint_and_gc(tmp_path):
    d = str(tmp_path)
    for i in [1, 5, 10, 20, 30]:
        open(os.path.join(d, f"g_{i}.ckpt"), "w").close()
    assert ckpt.latest_checkpoint(d, "g_") == os.path.join(d, "g_30.ckpt")
    ckpt.checkpoint_gc(d, "g_", keep_last=2, keep_every=10)
    left = sorted(os.listdir(d))
    assert left == ["g_10.ckpt", "g_20.ckpt", "g_30.ckpt"]


def test_split_dict():
    d = {f"u{i}": i for i in range(10)}
    shards = cfg.split_dict(d, 3)
    assert len(shards) == 3
    assert sum(len(s) for s in shards) == 10
    merged = {}
    for s in shards:
        merged.update(s)
    assert merged == d


def test_run_with_retry_caps():
    import pytest

    from satpu.utils.jobs import run_with_retry

    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise ValueError("boom")
        return "ok"

    assert run_with_retry(flaky, max_retries=5, backoff=0) == "ok"
    assert len(calls) == 3
    with pytest.raises(RuntimeError):
        run_with_retry(lambda: (_ for _ in ()).throw(ValueError("x")),
                       max_retries=2, backoff=0)


def test_run_parallel_failfast(tmp_path):
    import sys
    import time

    from satpu.utils.jobs import run_parallel_failfast

    import subprocess

    # interpreter startup can be many seconds on a loaded CI host; measure it
    # and bound the fail-fast latency relative to that, with the sleep long
    # enough that un-killed siblings would blow the bound regardless
    t0 = time.time()
    subprocess.run([sys.executable, "-c", "pass"], check=True)
    startup = time.time() - t0

    sleep_s = max(60.0, startup * 10)
    slow = [sys.executable, "-c", f"import time; time.sleep({sleep_s})"]
    fail = [sys.executable, "-c", "import sys; sys.exit(3)"]
    t0 = time.time()
    rcs = run_parallel_failfast([slow, fail, slow])
    assert time.time() - t0 < sleep_s * 0.8, "siblings were not killed promptly"
    assert 3 in rcs
    assert all(rc is not None for rc in rcs)
    assert any(rc < 0 for rc in rcs), "siblings should report the kill signal"


def test_metrics_writer_tensorboard_mirror(tmp_path):
    """Scalars/audio/image land both in metrics.jsonl and in a real TB event
    file readable by tensorboard's own loader (reference mirrors everything
    into SummaryWriter; satpu mirrors MetricsWriter into <dir>/tb)."""
    import json

    pytest_tb = __import__("pytest").importorskip("tensorboard")
    from satpu.utils.metrics import MetricsWriter

    d = str(tmp_path / "exp")
    w = MetricsWriter(d)
    assert w.tb is not None
    w.write(1, {"loss": 0.5, "lr": 1e-3})
    w.write(2, "loss", 0.25)
    w.audio(2, "dev/sample", np.sin(np.linspace(0, 100, 1600)).astype(np.float32), 16000)
    w.image(2, "dev/mel", np.random.rand(80, 100).astype(np.float32))
    w.close()

    lines = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2

    from tensorboard.backend.event_processing.event_accumulator import \
        EventAccumulator

    acc = EventAccumulator(os.path.join(d, "tb"),
                           size_guidance={"scalars": 0, "audio": 0, "images": 0})
    acc.Reload()
    assert "loss" in acc.Tags()["scalars"] and "lr" in acc.Tags()["scalars"]
    scal = acc.Scalars("loss")
    assert [s.step for s in scal] == [1, 2]
    assert scal[1].value == 0.25
    assert "dev/sample" in acc.Tags()["audio"]
    assert "dev/mel" in acc.Tags()["images"]
    # the audio payload is a decodable RIFF wav
    au = acc.Audio("dev/sample")[0]
    assert au.encoded_audio_string[:4] == b"RIFF"
    assert au.sample_rate == 16000


def test_feature_cache_signature_isolation(tmp_path):
    """Different extractor signatures use different cache files — swapping
    the BN extractor must never serve another model's stale features."""
    from satpu.utils.feature_cache import FeatureCache

    d = str(tmp_path / "cache")
    a = FeatureCache(d, "get_bn", signature="model_a")
    a.put("utt1", np.full((4, 2), 1.0, np.float32))
    b = FeatureCache(d, "get_bn", signature="model_b")
    assert b.get("utt1") is None
    got = b.get_or_compute("utt1", lambda: np.full((8, 2), 2.0, np.float32))
    assert got.shape == (8, 2)
    # original cache untouched
    np.testing.assert_array_equal(
        FeatureCache(d, "get_bn", signature="model_a").get("utt1"),
        np.full((4, 2), 1.0, np.float32))
    # unsignatured caches keep the legacy file name
    c = FeatureCache(d, "get_bn")
    assert c.get("utt1") is None


def test_preprocess_audio_dir(tmp_path):
    """preprocess_audio (reference egs/vc/libritts/local/preprocess.py):
    24 kHz -> 16 kHz resample, silence trim, pad to the 1280-sample hop LCM."""
    from satpu.bin.preprocess_audio import preprocess_dir, trim_silence
    from satpu.utils import kaldi_data

    d = str(tmp_path / "raw")
    os.makedirs(d)
    sr = 24000
    t = np.arange(sr * 2) / sr
    tone = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    sig = np.concatenate([np.zeros(sr // 2, np.float32), tone,
                          np.zeros(sr // 2, np.float32)])
    p = str(tmp_path / "a.wav")
    kaldi_data.write_wav(p, sig, sr)
    kaldi_data.write_keyed_text({"utt0": p}, os.path.join(d, "wav.scp"))
    kaldi_data.write_keyed_text({"utt0": "spk0"}, os.path.join(d, "utt2spk"))

    out = preprocess_dir(d, str(tmp_path / "proc"), sample_rate=16000,
                         trim=True, pad=True)
    scp = kaldi_data.read_wav_scp(os.path.join(out, "wav.scp"))
    wav, rate = kaldi_data.load_wav_from_scp(scp["utt0"])
    assert rate == 16000
    assert wav.shape[1] % 1280 == 0
    # the second of leading+trailing silence is mostly gone (pad adds < 1280)
    assert wav.shape[1] < int(2.4 * 16000)
    assert wav.shape[1] >= int(1.9 * 16000)
    # trim keeps a pure tone intact
    x = np.sin(np.linspace(0, 100, 8000)).astype(np.float32)
    assert len(trim_silence(x, 20.0)) >= 8000 - 2048


def test_diff_checkpoints(tmp_path):
    """diff_checkpoints (reference shutil/diff_models_weights.py): reports
    the tensors that differ between two checkpoints."""
    import io

    from satpu import infer_helper
    from satpu.bin.diff_checkpoints import diff_checkpoints

    va = {"params": {"lin": {"weight": np.ones((3, 3), np.float32),
                             "bias": np.zeros((3,), np.float32)}},
          "batch_stats": {"bn": {"mean": np.zeros((3,), np.float32)}}}
    vb = {"params": {"lin": {"weight": np.ones((3, 3), np.float32) * 2.0,
                             "bias": np.zeros((3,), np.float32)}},
          "batch_stats": {"bn": {"mean": np.ones((3,), np.float32)}}}
    pa, pb = str(tmp_path / "a.ckpt"), str(tmp_path / "b.ckpt")
    infer_helper.save_model(pa, "m", {}, va)
    infer_helper.save_model(pb, "m", {}, vb)
    buf = io.StringIO()
    n = diff_checkpoints(pa, pb, out=buf)
    assert n == 1  # weight differs; bias equal; batch_stats skipped
    text = buf.getvalue()
    assert "lin.weight" in text and "False" in text
    assert "batch_stats" not in text


def test_load_augmentation(tmp_path):
    """Driver `augmentation` option (reference configs/tdnnf_bn:40-56):
    lenient inline JSON or a json file; musan/RIR dbs resolved from the
    prepare_aug csv siblings."""
    import json

    from satpu.ops.augment import load_augmentation

    assert load_augmentation("") == (None, None, None)
    cfg, ndb, rdb = load_augmentation(
        '{"pipeline": ["codec", "add_noise",], "aug_number": 1,}')
    assert cfg["pipeline"] == ["codec", "add_noise"] and ndb is None

    (tmp_path / "musan.json").write_text(json.dumps({"noise": ["/x/a.wav"]}))
    (tmp_path / "reverb.json").write_text(json.dumps(["/x/r.wav"]))
    spec = {"pipeline": ["add_reverb", "add_noise"], "aug_number": 1,
            "add_noise": {"noise_db_csv": str(tmp_path / "musan.csv")},
            "add_reverb": {"rir_db_csv": str(tmp_path / "reverb.csv")}}
    p = tmp_path / "aug.json"
    p.write_text(json.dumps(spec))
    cfg, ndb, rdb = load_augmentation(str(p))
    assert ndb == {"noise": ["/x/a.wav"]}
    assert rdb == ["/x/r.wav"]
