"""eval_anon ASR driver smoke: the full CLI flow — bucketed loglikes ->
native lattice decode -> LM rescoring (both exact composition and N-best
modes) -> WER/CTM — runs end-to-end on a tiny synthetic setup.

(The ASV half of the driver is covered in tests/test_drivers.py; decoded
text quality is meaningless with a random-init net — the assertions are
about the pipeline executing and producing complete artifacts.)
"""
import json
import os
import random

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _write_arpa(path, vocab):
    with open(path, "w") as f:
        f.write("\\data\\\n")
        f.write(f"ngram 1={len(vocab) + 3}\n\n\\1-grams:\n")
        f.write("-99 <s>\n-0.8 </s>\n-2.0 <unk>\n")
        for w in vocab:
            f.write(f"-{1.0 + 0.1 * (hash(w) % 5):.1f} {w}\n")
        f.write("\n\\end\\\n")
    return path


def _make_eval_fixture(tmp_path):
    """Decode graph + tiny ASR ckpt + 3-utt data dir + big ARPA; returns
    (graph_path, words_path, ckpt, data_dir, arpa)."""
    from satpu import infer_helper
    from satpu.chain.prep import (BiphoneTree, Lexicon, estimate_word_bigram,
                                  make_decode_graph, text_to_phones)
    from satpu.models.asrbn import TDNNFNetConfig, TDNNFNet
    from satpu.utils import kaldi_data

    # ---- decode graph over a toy grapheme lexicon ----
    texts = [t.split() for t in ("ab ba", "ba ab", "ab ab ba")]
    lex = Lexicon.grapheme([w for t in texts for w in t])
    phones = lex.phones()
    phone_id = {p: i + 1 for i, p in enumerate(phones)}
    seqs = [[phone_id[p] for p in text_to_phones(t, lex, 0.0, random.Random(0))]
            for t in texts]
    tree = BiphoneTree.build(seqs, phones)
    vocab, init, trans, final = estimate_word_bigram(texts)
    graph, word_table = make_decode_graph(tree, lex, phone_id, vocab, trans,
                                          final)
    graph_path = str(tmp_path / "HCLG.fst")
    graph.write(graph_path)
    words_path = str(tmp_path / "words.txt")
    with open(words_path, "w") as f:
        f.write("<eps> 0\n")
        for wid, w in sorted(word_table.items()):
            f.write(f"{w} {wid}\n")

    # ---- tiny random ASR checkpoint with the graph's pdf count ----
    import jax

    cfg = TDNNFNetConfig(output_dim=tree.num_pdfs, hidden_dim=16,
                         bottleneck_dim=8, prefinal_bottleneck_dim=8,
                         p_dropout=0.0)
    net = TDNNFNet(cfg)
    variables = net.init(jax.random.PRNGKey(0), np.zeros((1, 8000), np.float32))
    ckpt = str(tmp_path / "asr.ckpt")
    import dataclasses

    infer_helper.save_model(ckpt, "asrbn_tdnnf",
                            dataclasses.asdict(cfg), dict(variables))

    # ---- data dir: 3 short utterances + reference text ----
    data = tmp_path / "data"
    os.makedirs(data)
    rng = np.random.default_rng(0)
    wav_scp, ref = {}, {}
    for i, t in enumerate(["ab ba", "ba ab", "ab ab ba"]):
        utt = f"u{i}"
        p = str(data / f"{utt}.wav")
        kaldi_data.write_wav(p, (rng.standard_normal(9000 + 2000 * i) * 0.1
                                 ).astype(np.float32), 16000)
        wav_scp[utt] = p
        ref[utt] = t
    kaldi_data.write_keyed_text(wav_scp, str(data / "wav.scp"))
    kaldi_data.write_keyed_text(ref, str(data / "text"))

    arpa = _write_arpa(str(tmp_path / "big.arpa"), ["ab", "ba"])
    return graph_path, words_path, ckpt, str(data), arpa


@pytest.mark.parametrize("rescore_mode", ["exact", "nbest"])
def test_eval_anon_asr_driver(tmp_path, rescore_mode):
    from satpu import native
    from satpu.bin import eval_anon

    if not native.available():
        pytest.skip("native decoder unavailable")

    graph_path, words_path, ckpt, data, arpa = _make_eval_fixture(tmp_path)
    results = tmp_path / "results"
    rc = eval_anon.main([
        "--data", str(data), "--asr-checkpoint", ckpt,
        "--decode-graph", graph_path, "--words-txt", words_path,
        "--rescore-lm", arpa, "--rescore-mode", rescore_mode,
        "--batch-size", "3", "--write-ctm", "true",
        "--dump-loglikes", str(tmp_path / "ll.ark"),
        "--results", str(results)])
    assert rc == 0
    out = json.load(open(results / "results.json"))
    assert np.isfinite(out["asr"]["wer"])
    assert out["asr"]["words"] == 7
    assert (results / "hyp.ctm").exists()
    assert (tmp_path / "ll.scp").exists()


def test_eval_anon_serve_mesh(tmp_path):
    """eval_anon --serve-mesh shards loglike batches over the 8-device CPU
    mesh (subprocess: the in-process default backend is the single TPU)."""
    import subprocess
    import sys

    from satpu import native

    if not native.available():
        pytest.skip("native decoder unavailable")

    from conftest import mesh_cli_env

    graph_path, words_path, ckpt, data, arpa = _make_eval_fixture(tmp_path)
    env = mesh_cli_env()
    results = tmp_path / "results_mesh"
    r = subprocess.run(
        [sys.executable, "-m", "satpu.bin.eval_anon",
         "--data", data, "--asr-checkpoint", ckpt,
         "--decode-graph", graph_path, "--words-txt", words_path,
         "--rescore-lm", arpa, "--batch-size", "8", "--serve-mesh", "true",
         "--results", str(results)],
        env=env, cwd=os.path.dirname(os.path.dirname(__file__)),
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=1100)
    out = r.stdout.decode()
    assert r.returncode == 0, out[-3000:]
    assert "serve_mesh: loglike batches sharded over 8 devices" in out, out[-2000:]
    res = json.load(open(results / "results.json"))
    assert np.isfinite(res["asr"]["wer"])
