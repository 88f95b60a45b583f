"""The one-command parity runbook, tested offline end-to-end (round-3
verdict #4): prepare_vctk's VPC data prep on a synthetic download, then
satpu.bin.parity chaining import_model (reference-format final.pt) ->
anonymize -> eval_anon -> side-by-side print. On a networked machine the
only remaining untested step is the corpus/checkpoint download."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _vctk_like_download(tmp_path, n_spk=2, utts_per_spk=3):
    """A downloaded-and-unpacked data/vctk_test stand-in: wav.scp/utt2spk/
    text/spk2gender + the VPC side files (enrolls_mic2, trials_*_mic2)."""
    from satpu.utils import kaldi_data

    d = str(tmp_path / "vctk_test")
    os.makedirs(d)
    rng = np.random.default_rng(0)
    wav_scp, utt2spk, text = {}, {}, {}
    genders = {}
    for s in range(n_spk):
        spk = f"p{225 + s}"
        genders[spk] = "f" if s % 2 == 0 else "m"
        for u in range(utts_per_spk):
            utt = f"{spk}_{u:03d}_mic2"
            p = str(tmp_path / f"{utt}.wav")
            kaldi_data.write_wav(
                p, (rng.standard_normal(8000) * 0.1).astype(np.float32), 16000)
            wav_scp[utt] = p
            utt2spk[utt] = spk
            text[utt] = f"please, call stella! utt {u}."
    kaldi_data.write_keyed_text(wav_scp, os.path.join(d, "wav.scp"))
    kaldi_data.write_keyed_text(utt2spk, os.path.join(d, "utt2spk"))
    kaldi_data.write_keyed_text(text, os.path.join(d, "text"))
    kaldi_data.write_keyed_text(genders, os.path.join(d, "spk2gender"))

    utts = sorted(wav_scp)
    f_utts = [u for u in utts if genders[utt2spk[u]] == "f"]
    m_utts = [u for u in utts if genders[utt2spk[u]] == "m"]
    with open(os.path.join(d, "enrolls_mic2"), "w") as f:
        f.write(f_utts[0] + "\n" + m_utts[0] + "\n")
    for name, us, spk in (("trials_f_mic2", f_utts[1:2], "p225"),
                          ("trials_f_common_mic2", f_utts[2:3], "p225"),
                          ("trials_m_mic2", m_utts[1:2], "p226"),
                          ("trials_m_common_mic2", m_utts[2:3], "p226")):
        with open(os.path.join(d, name), "w") as f:
            for u in us:
                f.write(f"{spk} {u} target\n")
    return d


def test_prepare_vctk(tmp_path):
    """data_prep_vpc.sh parity: subset dirs, enrolls/trials files, combined
    _all dirs, and download_data.sh's text normalization."""
    from satpu.bin import prepare_vctk
    from satpu.utils import kaldi_data

    d = _vctk_like_download(tmp_path)
    rc = prepare_vctk.main(["--data", d])
    assert rc == 0

    # text normalized in place: punctuation stripped, uppercased
    text = kaldi_data.read_keyed_text(os.path.join(d, "text"))
    assert all(t == t.upper() and not any(c in t for c in ",!?.")
               for t in text.values())

    enr = f"{d}_enrolls"
    assert len(kaldi_data.read_keyed_text(os.path.join(enr, "wav.scp"))) == 2
    assert os.path.exists(os.path.join(enr, "enrolls"))
    # per-gender + combined trial dirs with concatenated trials files
    for tag, n in (("trials_f", 1), ("trials_f_common", 1),
                   ("trials_f_all", 2), ("trials_m_all", 2),
                   ("trials_all", 4)):
        dd = f"{d}_{tag}"
        assert os.path.isdir(dd), dd
        lines = [l for l in open(os.path.join(dd, "trials")) if l.strip()]
        assert len(lines) == n, (tag, lines)
    # combined dir has the union of the listed trial utts (dedup)
    allscp = kaldi_data.read_keyed_text(
        os.path.join(f"{d}_trials_all", "wav.scp"))
    assert len(allscp) == 4
    # spk2utt regenerated in subsets
    assert os.path.exists(os.path.join(enr, "spk2utt"))


def test_parity_runbook_offline(tmp_path):
    """satpu.bin.parity end-to-end against a synthetic reference-format
    final.pt: import -> anonymize -> eval (ASR decode + ASV trials) ->
    side-by-side table + parity.json."""
    import dataclasses

    import jax

    from satpu import infer_helper, native
    from satpu.bin import parity
    from satpu.utils import kaldi_data

    if not native.available():
        pytest.skip("native decoder unavailable")

    from test_assembled_golden import _make_reference_final_pt
    from test_eval_anon_driver import _make_eval_fixture

    graph_path, words_path, asr_ckpt, data, arpa = _make_eval_fixture(tmp_path)

    # speaker labels + trials over the fixture's 3 utts (ids survive
    # anonymization, so the trials list works on the _anon dir)
    utt2spk = {"u0": "spkA", "u1": "spkA", "u2": "spkB"}
    kaldi_data.write_keyed_text(utt2spk, os.path.join(data, "utt2spk"))
    trials = str(tmp_path / "trials")
    with open(trials, "w") as f:
        f.write("spkA u1 target\nspkB u1 nontarget\n"
                "spkB u2 target\nspkA u2 nontarget\n")

    # tiny ASV checkpoint through the registry
    from satpu.sidekit.xvector import XVectorConfig, build_xvector

    acfg = XVectorConfig(num_speakers=2, channels=32, embedding_size=16,
                         spec_augment=False)
    amodel = build_xvector(acfg)
    avars = amodel.init(jax.random.PRNGKey(0), np.zeros((1, 8000), np.float32))
    asv_ckpt = str(tmp_path / "asv.ckpt")
    infer_helper.save_model(asv_ckpt, "asv_xvector",
                            dataclasses.asdict(acfg), dict(avars),
                            extra_meta={"speakers": ["spkA", "spkB"]})

    pt_path, _, _ = _make_reference_final_pt(tmp_path)
    results = str(tmp_path / "parity_out")
    rc = parity.main([
        "--torch-checkpoint", pt_path,
        "--checkpoint", str(tmp_path / "anon_imported.ckpt"),
        "--data", data, "--results", results,
        "--batch-size", "4", "--baseline", "vctk_clear",
        # everything below is forwarded to eval_anon
        "--asr-checkpoint", asr_ckpt, "--decode-graph", graph_path,
        "--words-txt", words_path, "--rescore-lm", arpa,
        "--asv-checkpoint", asv_ckpt, "--enroll-dir", data,
        "--trials", trials])
    assert rc == 0
    # the anonymized dir was produced and evaluated
    assert os.path.exists(os.path.join(data + "_anon", "wav.scp"))
    par = json.load(open(os.path.join(results, "parity.json")))
    assert par["baseline"] == "vctk_clear"
    assert np.isfinite(par["measured"]["wer"])
    assert np.isfinite(par["measured"]["eer"])
    assert par["reference"]["wer"] == 21.97
