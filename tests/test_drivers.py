"""Smoke tests for the config-driven training/eval drivers on tiny synthetic
data dirs (CPU)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _make_asv_dir(tmp_path, n_spk=3, utts_per_spk=3, T=16000 * 4):
    from satpu.utils import kaldi_data

    d = str(tmp_path / "asv_data")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    wav_scp, utt2spk = {}, {}
    for s in range(n_spk):
        for u in range(utts_per_spk):
            utt = f"spk{s}_u{u}"
            x = (rng.standard_normal(T) * 0.1).astype(np.float32)
            p = str(tmp_path / f"{utt}.wav")
            kaldi_data.write_wav(p, x, 16000)
            wav_scp[utt] = p
            utt2spk[utt] = f"spk{s}"
    kaldi_data.write_keyed_text(wav_scp, os.path.join(d, "wav.scp"))
    kaldi_data.write_keyed_text(utt2spk, os.path.join(d, "utt2spk"))
    return d


def test_train_asv_driver_smoke(tmp_path, monkeypatch):
    from satpu.bin import train_asv

    d = _make_asv_dir(tmp_path)
    exp = str(tmp_path / "exp")
    rc = train_asv.main([
        "--train-set", d, "--dirname", exp, "--arch", "ecapa",
        "--duration", "1.0", "--samples-per-speaker", "2",
        "--examples-per-speaker", "2", "--minibatch-size", "6",
        "--epochs", "1", "--lr", "0.001", "--channels", "32", "--embedding-size", "16",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(exp, "0.ckpt"))
    assert os.path.islink(os.path.join(exp, "best.ckpt"))
    # reload through the registry
    from satpu import infer_helper

    model, variables, meta = infer_helper.load_model(os.path.join(exp, "best.ckpt"))
    assert meta["model_id"] == "asv_xvector"
    assert len(meta["speakers"]) == 3

    # resume: epoch 0's trainer checkpoint restores params/optimizer/monitor
    # and the loop continues at epoch 1 (sidekit/model.py:267-303)
    assert os.path.exists(os.path.join(exp, "trainer_0.ckpt"))
    rc = train_asv.main([
        "--train-set", d, "--dirname", exp, "--arch", "ecapa",
        "--duration", "1.0", "--samples-per-speaker", "2",
        "--examples-per-speaker", "2", "--minibatch-size", "6",
        "--epochs", "2", "--lr", "0.001", "--channels", "32", "--embedding-size", "16",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(exp, "1.ckpt"))

    # warm start into a wider head: shape-matching params transfer
    exp2 = str(tmp_path / "exp_ft")
    rc = train_asv.main([
        "--train-set", d, "--dirname", exp2, "--arch", "ecapa",
        "--duration", "1.0", "--samples-per-speaker", "2",
        "--examples-per-speaker", "2", "--minibatch-size", "6",
        "--epochs", "1", "--lr", "0.0005", "--channels", "32",
        "--embedding-size", "16", "--fine-tune", "true",
        "--init-weight-model", os.path.join(exp, "1.ckpt"),
    ])
    assert rc == 0


def _make_asr_fixture(tmp_path, n_utts=4):
    """Tiny chain training fixture: data dir + numerator fst scp + den.fst."""
    from satpu.chain.fst import Arc, Fst, linear_fst_from_pdf_sequence
    from satpu.utils import kaldi_data

    P = 8
    d = str(tmp_path / "asr_data")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    wav_scp, u2l, fst_lines = {}, {}, []
    ark = str(tmp_path / "fsts.ark")
    with open(ark, "wb") as f:
        for i in range(n_utts):
            T = 16000
            utt = f"utt{i}"
            x = (rng.standard_normal(T) * 0.1).astype(np.float32)
            p = str(tmp_path / f"{utt}.wav")
            kaldi_data.write_wav(p, x, 16000)
            wav_scp[utt] = p
            u2l[utt] = str(T)
            f.write(utt.encode() + b" ")
            off = f.tell()
            linear_fst_from_pdf_sequence([i % P, (i + 1) % P]).write_binary(f)
            fst_lines.append(f"{utt} {ark}:{off}")
    kaldi_data.write_keyed_text(wav_scp, os.path.join(d, "wav.scp"))
    kaldi_data.write_keyed_text(u2l, os.path.join(d, "utt2len"))
    with open(tmp_path / "fst.scp", "w") as f:
        f.write("\n".join(fst_lines) + "\n")
    # bigram den graph
    den = Fst()
    s0 = den.add_state()
    sts = [den.add_state() for _ in range(P)]
    for j in range(P):
        den.add_arc(s0, Arc(j + 1, j + 1, np.log(P), sts[j]))
    for i in range(P):
        for j in range(P):
            den.add_arc(sts[i], Arc(j + 1, j + 1, np.log(P), sts[j]))
        den.set_final(sts[i], 0.0)
    den_path = str(tmp_path / "den.fst")
    den.write(den_path)
    return d, str(tmp_path / "fst.scp"), den_path, P


def test_train_asr_driver_smoke(tmp_path):
    from satpu.bin import train_asr

    d, fst_scp, den_path, P = _make_asr_fixture(tmp_path)
    exp = str(tmp_path / "exp_chain")
    rc = train_asr.main([
        "--train-set", d, "--fst-scp", fst_scp,
        "--den-fst", den_path, "--num-pdfs", str(P), "--dirname", exp,
        "--minibatch-size", "2", "--num-epochs", "1",
        "--checkpoint-interval", "2", "--diagnostics-interval", "1",
        "--model", "tdnnf", "--hidden-dim", "16", "--bottleneck-dim", "8", "--prefinal-bottleneck-dim", "8",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(exp, "final.ckpt"))


def _mesh_cli_env():
    from conftest import mesh_cli_env

    return mesh_cli_env()


def test_train_asv_driver_local_mesh(tmp_path):
    """The train_asv CLI engages single-host multi-chip DP automatically:
    on 8 visible devices it replicates state and shards batches."""
    import subprocess
    import sys

    d = _make_asv_dir(tmp_path)
    exp = str(tmp_path / "exp_mesh")
    r = subprocess.run(
        [sys.executable, "-m", "satpu.bin.train_asv",
         "--train-set", d, "--dirname", exp, "--arch", "ecapa",
         "--duration", "1.0", "--samples-per-speaker", "2",
         "--examples-per-speaker", "2", "--minibatch-size", "8",
         "--epochs", "1", "--channels", "32", "--embedding-size", "16"],
        env=_mesh_cli_env(), cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=1100)
    out = r.stdout.decode()
    assert r.returncode == 0, out[-3000:]
    assert "data-parallel mesh over 8 devices" in out, out[-3000:]
    assert os.path.exists(os.path.join(exp, "0.ckpt"))


def test_train_asr_driver_local_mesh(tmp_path):
    """train_asr on 8 devices: mesh DP incl. DDP-style repeat-padding of
    exact-length tail buckets (minibatch 8, 6 utts -> one padded batch)."""
    import subprocess
    import sys

    d, fst_scp, den_path, P = _make_asr_fixture(tmp_path, n_utts=6)
    exp = str(tmp_path / "exp_chain_mesh")
    r = subprocess.run(
        [sys.executable, "-m", "satpu.bin.train_asr",
         "--train-set", d, "--fst-scp", fst_scp,
         "--den-fst", den_path, "--num-pdfs", str(P), "--dirname", exp,
         "--minibatch-size", "8", "--num-epochs", "1",
         "--checkpoint-interval", "2", "--diagnostics-interval", "1",
         "--model", "tdnnf", "--hidden-dim", "16", "--bottleneck-dim", "8",
         "--prefinal-bottleneck-dim", "8"],
        env=_mesh_cli_env(), cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=1100)
    out = r.stdout.decode()
    assert r.returncode == 0, out[-3000:]
    assert "data-parallel mesh over 8 devices" in out, out[-3000:]
    assert os.path.exists(os.path.join(exp, "final.ckpt"))


def test_anonymize_cli_smoke(tmp_path):
    """The anonymize CLI end-to-end with a tiny checkpoint + config file."""
    from test_anonymize_pipeline import _make_data_dir, _tiny_anon_checkpoint

    from satpu.bin import anonymize

    ckpt = _tiny_anon_checkpoint(tmp_path)
    data_dir = _make_data_dir(tmp_path, n_utts=3)
    cfg_path = str(tmp_path / "anon.ini")
    with open(cfg_path, "w") as f:
        f.write(f"""[anonymize]
checkpoint = {ckpt}
target_selection_algorithm = random_per_utt
batch_size = 2
""")
    rc = anonymize.main(["--config", cfg_path, "--directory", data_dir,
                         "--results-dir", str(tmp_path / "wavs")])
    assert rc == 0
    from satpu.utils import kaldi_data

    out = kaldi_data.read_wav_scp(os.path.join(data_dir + "_anon", "wav.scp"))
    assert len(out) == 3


def test_train_vc_driver_smoke_and_resume(tmp_path):
    """train_vc end-to-end on a tiny set: epoch loop, validation + g_best,
    tensorboard mirror, then resume from the trainer triplet."""
    import dataclasses

    import jax

    from satpu import infer_helper
    from satpu.bin import train_vc
    from satpu.models.asrbn import TDNNFNet, TDNNFNetConfig

    d = _make_asv_dir(tmp_path, n_spk=2, utts_per_spk=2, T=32000)
    cfg_bn = TDNNFNetConfig(output_dim=32, hidden_dim=32, bottleneck_dim=16,
                            prefinal_bottleneck_dim=16)
    m = TDNNFNet(cfg_bn)
    v = jax.jit(lambda k, w: m.init(k, w, method=m.extract_bn))(
        jax.random.PRNGKey(0), np.zeros((1, 16000), np.float32))
    bn_ckpt = str(tmp_path / "asrbn.ckpt")
    infer_helper.save_model(bn_ckpt, "asrbn_tdnnf", dataclasses.asdict(cfg_bn), dict(v))

    exp = str(tmp_path / "vc_exp")
    common = [
        "--train-set", d, "--dev-set", d, "--dirname", exp,
        "--asrbn-checkpoint", bn_ckpt, "--bn-dim", "16",
        "--minibatch-size", "2", "--segment-size", "3200",
        "--checkpoint-interval", "2", "--upsample-initial-channel", "32",
    ]
    rc = train_vc.main(common + ["--training-epochs", "1"])
    assert rc == 0
    assert os.path.islink(os.path.join(exp, "g_best.ckpt"))
    assert os.path.isdir(os.path.join(exp, "tb"))

    # resume: second invocation restores the triplet and continues to epoch 2
    rc = train_vc.main(common + ["--training-epochs", "2"])
    assert rc == 0
