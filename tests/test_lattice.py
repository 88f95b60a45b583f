"""Native lattice decoding + N-best + ARPA rescoring + CTM
(reference csrc/decoder.cc:96-422 suite)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not __import__("satpu.native", fromlist=["available"]).available(),
    reason="native decoder toolchain unavailable")


def _two_word_graph():
    from satpu.chain.fst import Arc, Fst

    # two competing words over 2 frames: word 1 uses pdfs (0,1), word 2 uses
    # (2,3); word 2 carries extra graph cost so acoustics decide vs LM later
    g = Fst()
    s0, s1a, s1b, s2 = (g.add_state() for _ in range(4))
    g.start = s0
    g.add_arc(s0, Arc(1, 1, 0.0, s1a))   # word 1, pdf 0
    g.add_arc(s1a, Arc(2, 0, 0.0, s2))   # pdf 1
    g.add_arc(s0, Arc(3, 2, 1.0, s1b))   # word 2, pdf 2 (+1.0 graph cost)
    g.add_arc(s1b, Arc(4, 0, 0.0, s2))   # pdf 3
    g.set_final(s2, 0.0)
    return g


def test_lattice_nbest_and_best_path():
    from satpu.chain.lattice import best_path, nbest
    from satpu.native import NativeGraph, decode, decode_lattice

    g = _two_word_graph()
    T, P = 2, 4
    ll = np.full((T, P), -5.0, np.float32)
    ll[0, 0] = 0.0   # favors word 1 slightly
    ll[0, 2] = -0.2
    ll[1, 1] = 0.0
    ll[1, 3] = -0.2
    ng = NativeGraph(g)
    lat = decode_lattice(ng, ll, lattice_beam=20.0)
    hyps = nbest(lat, 5)
    assert [h["words"] for h in hyps] == [[1], [2]]
    # costs: word1 = 0, word2 = 1.0 graph + 0.4 acoustic
    np.testing.assert_allclose(hyps[0]["cost"], 0.0, atol=1e-5)
    np.testing.assert_allclose(hyps[1]["cost"], 1.4, atol=1e-5)
    # lattice best path equals the Viterbi decoder's result
    words, align, cost = decode(ng, ll)
    bp = best_path(lat)
    assert bp["words"] == words == [1]
    np.testing.assert_allclose(bp["cost"], cost, atol=1e-5)


def test_lattice_beam_prunes_alternatives():
    from satpu.chain.lattice import nbest
    from satpu.native import NativeGraph, decode_lattice

    g = _two_word_graph()
    ll = np.full((2, 4), -5.0, np.float32)
    ll[0, 0] = 0.0
    ll[1, 1] = 0.0
    ng = NativeGraph(g)
    # word 2 costs 1.0 + 10.0 acoustic: outside a 3.0 lattice beam
    lat = decode_lattice(ng, ll, lattice_beam=3.0)
    assert [h["words"] for h in nbest(lat, 5)] == [[1]]


def test_arpa_rescoring_flips_ranking(tmp_path):
    from satpu.chain.lattice import ArpaLM, nbest, rescore_nbest
    from satpu.native import NativeGraph, decode_lattice

    arpa = tmp_path / "lm.arpa"
    arpa.write_text("""
\\data\\
ngram 1=4
ngram 2=2

\\1-grams:
-0.1\t<s>\t-0.3
-0.1\t</s>
-2.0\thello\t-0.3
-0.2\tworld\t-0.3

\\2-grams:
-0.05\t<s> world
-0.05\tworld </s>

\\end\\
""")
    lm = ArpaLM(str(arpa))
    # sanity: P(world) >> P(hello)
    assert lm.score_sequence(["world"]) > lm.score_sequence(["hello"])

    g = _two_word_graph()
    ll = np.full((2, 4), -5.0, np.float32)
    ll[0, 0] = 0.0
    ll[0, 2] = -0.1
    ll[1, 1] = 0.0
    ll[1, 3] = -0.1
    lat = decode_lattice(NativeGraph(g), ll, lattice_beam=20.0)
    hyps = nbest(lat, 5)
    table = {1: "hello", 2: "world"}
    assert hyps[0]["words"] == [1]  # decode prefers "hello"
    rescored = rescore_nbest(hyps, table, lm, lm_scale=10.0)
    assert rescored[0]["text"] == "world"  # big LM flips it


def test_ctm_output():
    from satpu.chain.lattice import best_path, to_ctm
    from satpu.native import NativeGraph, decode_lattice
    from satpu.chain.fst import Arc, Fst

    # "hello world", one pdf per frame, words emitted at frames 0 and 2
    g = Fst()
    s = [g.add_state() for _ in range(5)]
    g.start = s[0]
    g.add_arc(s[0], Arc(1, 1, 0.0, s[1]))
    g.add_arc(s[1], Arc(2, 0, 0.0, s[2]))
    g.add_arc(s[2], Arc(3, 2, 0.0, s[3]))
    g.add_arc(s[3], Arc(4, 0, 0.0, s[4]))
    g.set_final(s[4], 0.0)
    ll = np.full((4, 4), -8.0, np.float32)
    for t, p in enumerate([0, 1, 2, 3]):
        ll[t, p] = 0.0
    lat = decode_lattice(NativeGraph(g), ll)
    bp = best_path(lat)
    lines = to_ctm(bp, {1: "hello", 2: "world"}, utt="u1", frame_shift=0.03)
    assert lines == ["u1 1 0.00 0.06 hello", "u1 1 0.06 0.06 world"]


def test_kaldi_named_api():
    """The reference-named decode API wrappers (chain/decoder.py:9-122)."""
    import numpy as np

    from satpu.chain.decoder import kaldi_decode, kaldi_get_align, kaldi_lm_rescoring

    g = _two_word_graph()
    ll = np.full((2, 4), -5.0, np.float32)
    ll[0, 0] = 0.0
    ll[1, 1] = 0.0
    table = {1: "hello", 2: "world"}
    out = kaldi_decode(ll, g, word_table=table, lattice_beam=20.0)
    assert out["text"] == "hello"
    assert out["lattice"] is not None
    ctm = kaldi_get_align({"words": out["words"], "times": out.get("times", [0]),
                           "end_frame": 2}, table, utt="u1")
    assert ctm and ctm[0].startswith("u1 ")
