"""Tests for Viterbi decoding + WER scoring."""
import numpy as np


def test_compute_wer():
    from satpu.utils.wer import compute_wer, corpus_wer

    r = compute_wer("the cat sat on the mat", "the cat sit on mat")
    assert r.words == 6
    assert r.substitutions == 1 and r.deletions == 1 and r.insertions == 0
    np.testing.assert_allclose(r.wer, 2 / 6)

    agg = corpus_wer({"u1": "a b c", "u2": "d e"}, {"u1": "a b c", "u2": "d x"})
    np.testing.assert_allclose(agg.wer, 1 / 5)


def test_best_path_decode_toy_graph():
    from satpu.chain.decoder import best_path_decode, greedy_decode
    from satpu.chain.fst import Arc, Fst

    # words: 1="hello" (pdfs 0,1), 2="world" (pdfs 2,3); graph allows
    # hello world with self-loops
    g = Fst()
    s = [g.add_state() for _ in range(5)]
    g.start = s[0]
    g.add_arc(s[0], Arc(1, 1, 0.0, s[1]))  # pdf0, word "hello"
    g.add_arc(s[1], Arc(1, 0, 0.0, s[1]))
    g.add_arc(s[1], Arc(2, 0, 0.0, s[2]))  # pdf1
    g.add_arc(s[2], Arc(2, 0, 0.0, s[2]))
    g.add_arc(s[2], Arc(3, 2, 0.0, s[3]))  # pdf2, word "world"
    g.add_arc(s[3], Arc(3, 0, 0.0, s[3]))
    g.add_arc(s[3], Arc(4, 0, 0.0, s[4]))  # pdf3
    g.add_arc(s[4], Arc(4, 0, 0.0, s[4]))
    g.set_final(s[4], 0.0)

    T, P = 8, 4
    ll = np.full((T, P), -10.0, np.float32)
    # frames strongly prefer pdf sequence 0,0,1,1,2,2,3,3
    seq = [0, 0, 1, 1, 2, 2, 3, 3]
    for t, p in enumerate(seq):
        ll[t, p] = 0.0

    res = best_path_decode(ll, g, word_table={1: "hello", 2: "world"})
    assert res.text == "hello world"
    assert res.alignment == seq
    assert np.isfinite(res.score)

    assert greedy_decode(ll) == [0, 1, 2, 3]


def test_decode_with_weights_prefers_cheap_path():
    from satpu.chain.decoder import best_path_decode
    from satpu.chain.fst import Arc, Fst

    # two parallel 1-frame paths with different graph costs, equal acoustics
    g = Fst()
    s0, s1 = g.add_state(), g.add_state()
    g.add_arc(s0, Arc(1, 1, 5.0, s1))  # word 1, expensive
    g.add_arc(s0, Arc(2, 2, 0.5, s1))  # word 2, cheap
    g.set_final(s1, 0.0)
    ll = np.zeros((1, 2), np.float32)
    res = best_path_decode(ll, g)
    assert res.words == [2]


def test_native_decoder_matches_python():
    import pytest

    from satpu import native
    from satpu.chain.decoder import best_path_decode
    from satpu.chain.fst import Arc, Fst

    if not native.available():
        pytest.skip("no C++ toolchain")

    rng = np.random.default_rng(3)
    # random-ish layered graph with words
    g = Fst()
    P, L = 6, 5
    layers = [[g.add_state() for _ in range(3)] for _ in range(L + 1)]
    g.start = layers[0][0]
    for l in range(L):
        for i, s in enumerate(layers[l]):
            for j, d in enumerate(layers[l + 1]):
                pdf = (l + i + j) % P
                word = (l * 3 + j + 1) if j == i else 0
                g.add_arc(s, Arc(pdf + 1, word, float(rng.uniform(0, 2)), d))
    for s in layers[L]:
        g.set_final(s, 0.0)

    T = L
    ll = rng.standard_normal((T, P)).astype(np.float32)
    py = best_path_decode(ll, g, acoustic_scale=1.0)
    ng = native.NativeGraph(g)
    words, align, cost = native.decode(ng, ll, acoustic_scale=1.0)
    np.testing.assert_allclose(cost, py.score, rtol=1e-5, atol=1e-5)
    assert align == py.alignment
    assert words == py.words


def test_native_decoder_epsilon_arcs():
    import pytest

    from satpu import native
    from satpu.chain.fst import Arc, Fst

    if not native.available():
        pytest.skip("no C++ toolchain")
    # eps arc carrying a word between two emitting arcs
    g = Fst()
    s = [g.add_state() for _ in range(4)]
    g.add_arc(s[0], Arc(1, 0, 0.0, s[1]))
    g.add_arc(s[1], Arc(0, 7, 0.1, s[2]))  # epsilon with word 7
    g.add_arc(s[2], Arc(2, 0, 0.0, s[3]))
    g.set_final(s[3], 0.0)
    ll = np.zeros((2, 2), np.float32)
    ng = native.NativeGraph(g)
    words, align, cost = native.decode(ng, ll)
    assert words == [7]
    assert align == [0, 1]


def test_wer_html_diff():
    from satpu.utils.wer import compute_wer, html_diff

    r = compute_wer("the cat sat on the mat", "the bat sat on mat")
    html = html_diff(r, title="utt1")
    assert "utt1" in html and "<span" in html
    assert "ref: cat" in html              # substitution tooltip
    assert "line-through" in html          # deletion styled
    assert html.count("<span") == len(r.alignment)
