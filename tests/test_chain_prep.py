"""Python chain data prep end-to-end: plain data dir -> den/normalization
fsts + numerator graphs -> trainable chain step (VERDICT round-1 item 4)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _make_asr_data_dir(tmp_path, n_utts=6):
    from satpu.utils import kaldi_data

    d = str(tmp_path / "data")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    texts = ["ab ba", "abba ab", "ba ab ab", "abba ba", "ab ab", "ba abba"]
    wav_scp, utt2spk, text = {}, {}, {}
    for i in range(n_utts):
        T = 6000 + 900 * i
        x = (np.sin(np.linspace(0, 100 + 30 * i, T)) * 0.2
             + rng.standard_normal(T) * 0.01).astype(np.float32)
        p = str(tmp_path / f"a{i}.wav")
        kaldi_data.write_wav(p, x, 16000)
        wav_scp[f"utt{i}"] = p
        utt2spk[f"utt{i}"] = f"s{i % 2}"
        text[f"utt{i}"] = texts[i % len(texts)]
    kaldi_data.write_keyed_text(wav_scp, os.path.join(d, "wav.scp"))
    kaldi_data.write_keyed_text(utt2spk, os.path.join(d, "utt2spk"))
    kaldi_data.write_keyed_text(text, os.path.join(d, "text"))
    return d


def test_prepare_chain_data_and_train(tmp_path):
    import jax
    import jax.numpy as jnp

    from satpu.chain.dataset import BucketBatchSampler, EgsDataset
    from satpu.chain.fst import Fst
    from satpu.chain.objf import DenominatorGraph
    from satpu.chain.prep import prepare_chain_data
    from satpu.chain.trainer import (ChainTrainOpts, init_chain_state,
                                     make_chain_optimizer, make_chain_train_step)
    from satpu.models.asrbn import TDNNFNet, TDNNFNetConfig

    data_dir = _make_asr_data_dir(tmp_path)
    out = prepare_chain_data(data_dir, str(tmp_path / "chain"),
                             num_lengths=4, valid_fraction=0.0)
    # artifacts exist
    for k in ("den_fst", "normalization_fst", "fst_train_scp"):
        assert os.path.exists(out[k]), k
    assert out["num_pdfs"] > 0
    # perturbed lengths land exactly on the allowed ladder
    allowed = {int(l) for l in open(
        os.path.join(out["egs_dir"], "allowed_lengths.txt"))}
    from satpu.utils.kaldi_data import read_utt2len_file

    u2l = read_utt2len_file(os.path.join(out["egs_dir"], "utt2len"))
    assert u2l and all(v in allowed for v in u2l.values())

    den_fst = Fst.read(out["den_fst"])
    # den graph labels cover exactly the pdf alphabet
    labels = {a.ilabel for arcs in den_fst.arcs for a in arcs}
    assert max(labels) <= out["num_pdfs"]
    den = DenominatorGraph.from_fst(den_fst, num_pdfs=out["num_pdfs"])

    ds = EgsDataset(os.path.join(out["egs_dir"], "wav.scp"),
                    out["fst_train_scp"],
                    os.path.join(out["egs_dir"], "utt2len"),
                    normalization_fst=out["normalization_fst"])
    removed = ds.filter_min_path()
    assert len(ds) > 0

    cfg = TDNNFNetConfig(output_dim=out["num_pdfs"], hidden_dim=16,
                         bottleneck_dim=8, prefinal_bottleneck_dim=8)
    model = TDNNFNet(cfg)
    topts = ChainTrainOpts(lr=0.01)
    opt = make_chain_optimizer(topts)
    state = init_chain_state(model, jax.random.PRNGKey(0),
                             np.zeros((2, 6000), np.float32), opt)
    step = jax.jit(make_chain_train_step(model, den, opt, topts))
    sampler = BucketBatchSampler(ds, 2)
    objfs = []
    for bi in list(sampler)[:3]:
        wavs, graphs, frames, _ = ds.load_batch(bi)
        graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
        state, metrics = step(state, wavs, graphs, jnp.asarray(frames),
                              jax.random.PRNGKey(0))
        objfs.append(float(metrics["chain_objf"]))
    assert all(np.isfinite(o) for o in objfs)
    # LF-MMI objective = num - den logprob must be <= 0 within tolerance
    assert all(o < 1.0 for o in objfs)


def test_numerator_fst_structure():
    from satpu.chain.prep import BiphoneTree, numerator_fst

    phones = ["SIL", "a", "b"]
    seqs = [[1, 2, 3, 1], [1, 3, 2, 1]]
    tree = BiphoneTree.build(seqs, phones)
    f = numerator_fst([1, 2, 3, 1], tree, optional_sil=1)
    assert f.num_states > 4
    # at least one complete path exists and all labels are valid pdfs+1
    labels = {a.ilabel for arcs in f.arcs for a in arcs if a.ilabel > 0}
    assert labels and max(labels) <= tree.num_pdfs
    finals = [s for s, w in enumerate(f.finals) if w != float("inf")]
    assert finals


def test_phone_bigram_normalized():
    from satpu.chain.prep import estimate_phone_bigram

    seqs = [[1, 2, 1], [2, 1, 1], [1, 1, 2]]
    init, trans, final = estimate_phone_bigram(seqs, 2)
    rowsum = trans.sum(axis=1) + final
    np.testing.assert_allclose(rowsum[1:], 1.0, atol=1e-8)
    assert (trans[:, 1:] > 0).all()


def test_decode_graph_recovers_words():
    """make_decode_graph (the kaldi-mkgraph equivalent): loglikes crafted
    along a known pdf path decode back to the word sequence."""
    import numpy as np

    from satpu import native
    from satpu.chain.prep import (BiphoneTree, Lexicon, estimate_word_bigram,
                                  make_decode_graph, text_to_phones)

    if not native.available():
        import pytest

        pytest.skip("native decoder unavailable")
    texts = [t.split() for t in ("ab ba", "ba ab", "ab ab ba")]
    lex = Lexicon.grapheme([w for t in texts for w in t])
    phones = lex.phones()
    phone_id = {p: i + 1 for i, p in enumerate(phones)}
    import random

    seqs = [[phone_id[p] for p in text_to_phones(t, lex, 0.0, random.Random(0))]
            for t in texts]
    tree = BiphoneTree.build(seqs, phones)
    vocab, init, trans, final = estimate_word_bigram(texts)
    graph, word_table = make_decode_graph(tree, lex, phone_id, vocab, trans,
                                          final)
    assert graph.num_states > 0

    # craft loglikes tracing "ab ba": SIL? words use optional sil between —
    # follow the graph-intended pdf sequence: a b (word "ab"), b a (word "ba"),
    # with biphone left contexts as the graph tracks them (BOS=0 for first)
    def pdfs_for(words):
        out = []
        left = 0
        for w in words:
            for ph in [phone_id[c] for c in w]:
                out.append(tree.forward_pdf(left, ph))
                out.append(tree.selfloop_pdf(left, ph))  # 2 frames per phone
                left = ph
        return out

    path = pdfs_for(["ab", "ba"])
    T, P = len(path), tree.num_pdfs
    ll = np.full((T, P), -8.0, np.float32)
    for t, pdf in enumerate(path):
        ll[t, pdf] = 0.0
    ng = native.NativeGraph(graph)
    words, align, cost = native.decode(ng, ll, acoustic_scale=1.0, beam=30.0)
    hyp = " ".join(word_table[w] for w in words)
    assert hyp == "ab ba", f"decoded {hyp!r}"
