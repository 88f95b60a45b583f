"""LF-MMI chain objective tests: brute-force path enumeration oracle,
gradient = posterior identities, FST IO round-trips."""
import io
import itertools

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def brute_force_logprob(fst, loglikes):
    """Enumerate all T-length paths through the FST (tiny graphs only)."""
    from satpu.chain.fst import INF

    T = loglikes.shape[0]
    total = -np.inf
    # dfs over (state, t, logp)
    stack = [(fst.start, 0, 0.0)]
    while stack:
        s, t, lp = stack.pop()
        if t == T:
            if fst.finals[s] != INF:
                total = np.logaddexp(total, lp - fst.finals[s])
            continue
        for a in fst.arcs[s]:
            pdf = a.ilabel - 1
            stack.append((a.nextstate, t + 1, lp - a.weight + loglikes[t, pdf]))
    return total


def _toy_fst():
    from satpu.chain.fst import Arc, Fst

    # 3 states, 2 pdfs, with weights
    fst = Fst()
    s0, s1, s2 = fst.add_state(), fst.add_state(), fst.add_state()
    fst.add_arc(s0, Arc(1, 1, 0.2, s1))
    fst.add_arc(s0, Arc(2, 2, 0.5, s0))
    fst.add_arc(s1, Arc(2, 2, 0.1, s2))
    fst.add_arc(s1, Arc(1, 1, 0.3, s1))
    fst.add_arc(s2, Arc(1, 1, 0.0, s2))
    fst.set_final(s2, 0.4)
    fst.set_final(s1, 1.0)
    return fst


def test_fst_forward_matches_brute_force(rng):
    import jax.numpy as jnp

    from satpu.chain.fst import fst_to_arrays
    from satpu.chain.objf import fst_forward

    fst = _toy_fst()
    g = fst_to_arrays(fst)
    for T in [1, 2, 4, 6]:
        ll = rng.standard_normal((T, 2)).astype(np.float32)
        ref = brute_force_logprob(fst, ll)
        out = float(fst_forward(jnp.asarray(ll), g.arc_src, g.arc_dst, g.arc_pdf,
                                g.arc_logprob, g.start_logprob, g.final_logprob))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4, err_msg=f"T={T}")


def test_den_forward_and_posteriors(rng):
    import jax
    import jax.numpy as jnp

    from satpu.chain.objf import DenominatorGraph, den_forward

    fst = _toy_fst()
    den = DenominatorGraph.from_fst(fst, num_pdfs=2)
    B, T = 3, 5
    ll = rng.standard_normal((B, T, 2)).astype(np.float32)
    out = np.asarray(den_forward(jnp.asarray(ll), den, leaky_hmm_coefficient=0.0))
    for b in range(B):
        ref = brute_force_logprob(fst, ll[b])
        np.testing.assert_allclose(out[b], ref, rtol=1e-4, atol=1e-4)

    # gradient wrt loglikes = state-occupation posteriors: sum over pdfs = 1/frame
    g = jax.grad(lambda x: jnp.sum(den_forward(x, den, 0.0)))(jnp.asarray(ll))
    sums = np.asarray(g).sum(axis=2)
    np.testing.assert_allclose(sums, np.ones((B, T)), rtol=1e-3, atol=1e-3)

    # leaky HMM slightly changes the result but stays finite
    out_leaky = np.asarray(den_forward(jnp.asarray(ll), den, 1e-5))
    assert np.isfinite(out_leaky).all()
    assert np.all(out_leaky >= out - 1e-4)  # leaking adds probability mass


def test_chain_objf_end_to_end(rng):
    import jax
    import jax.numpy as jnp

    from satpu.chain.fst import linear_fst_from_pdf_sequence, fst_to_arrays, pad_graph_arrays
    from satpu.chain.objf import DenominatorGraph, chain_objf_and_grad

    P = 4
    den_fst = linear_fst_from_pdf_sequence([0, 1, 2, 3], self_loops=True)
    # make the den graph loop back so it accepts any length
    from satpu.chain.fst import Arc

    den_fst.add_arc(4, Arc(1, 1, 0.0, 0))
    for s in range(den_fst.num_states):
        den_fst.set_final(s, 0.0)
    den = DenominatorGraph.from_fst(den_fst, num_pdfs=P)

    utts = [[0, 1], [2, 3, 0]]
    graphs = pad_graph_arrays([fst_to_arrays(linear_fst_from_pdf_sequence(u)) for u in utts])
    graphs = {k: jnp.asarray(v) for k, v in graphs.items()}

    B, T = 2, 6
    num_frames = jnp.asarray([6, 6])
    chain_out = jnp.asarray(rng.standard_normal((B, T, P)).astype(np.float32))
    xent_out = jax.nn.log_softmax(chain_out, axis=-1)

    loss, metrics = chain_objf_and_grad(chain_out, xent_out, graphs, den,
                                        num_frames=num_frames)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["num_logprob"]))
    assert np.isfinite(float(metrics["den_logprob"]))

    # loss decreases under gradient descent on the outputs
    def loss_fn(co):
        l, _ = chain_objf_and_grad(co, jax.nn.log_softmax(co, axis=-1), graphs, den,
                                   num_frames=num_frames)
        return l

    co = chain_out
    prev = float(loss_fn(co))
    for _ in range(20):
        g = jax.grad(loss_fn)(co)
        co = co - 0.5 * g
    after = float(loss_fn(co))
    assert after < prev, (prev, after)


def test_fst_binary_roundtrip_and_text(tmp_path):
    from satpu.chain.fst import Fst

    fst = _toy_fst()
    p = str(tmp_path / "a.fst")
    fst.write(p)
    fst2 = Fst.read(p)
    assert fst2.num_states == fst.num_states
    assert fst2.start == fst.start
    for s in range(fst.num_states):
        np.testing.assert_allclose(fst2.finals[s], fst.finals[s], rtol=1e-6)
        assert len(fst2.arcs[s]) == len(fst.arcs[s])
        for a, b in zip(fst.arcs[s], fst2.arcs[s]):
            assert (a.ilabel, a.olabel, a.nextstate) == (b.ilabel, b.olabel, b.nextstate)
            np.testing.assert_allclose(a.weight, b.weight, rtol=1e-6)

    fst3 = Fst.from_text(fst.to_text())
    assert fst3.to_text() == fst.to_text()


def test_fst_forward_unreachable_states_stay_finite(rng):
    """Regression: states with no incoming mass produced -inf alphas, and the
    one-hot matmul formulation turned -inf * 0 into NaN on the next frame
    (also: the old 1e-38 floor is subnormal and flushes to zero under FTZ)."""
    import jax.numpy as jnp

    from satpu.chain.fst import Arc, Fst, fst_to_arrays
    from satpu.chain.objf import fst_forward

    f = Fst()
    s0, s1, s2, s3 = (f.add_state() for _ in range(4))
    f.add_arc(s0, Arc(1, 0, 0.5, s1))
    f.add_arc(s1, Arc(2, 0, 0.3, s2))
    f.add_arc(s2, Arc(1, 0, 0.1, s3))
    f.set_final(s3, 0.0)
    g = fst_to_arrays(f)
    ll = np.asarray(rng.standard_normal((3, 3)), np.float32)
    out = fst_forward(jnp.asarray(ll), g.arc_src, g.arc_dst, g.arc_pdf,
                      g.arc_logprob, g.start_logprob, g.final_logprob)
    assert np.isfinite(float(out)), out
    # brute force: single path prob
    expect = (-0.5 + ll[0, 0]) + (-0.3 + ll[1, 1]) + (-0.1 + ll[2, 0])
    np.testing.assert_allclose(float(out), expect, rtol=1e-5, atol=1e-5)


def test_den_factored_matches_arc_formulation(rng):
    """The destination-factored den recursion (dense [S, S] cross matmul +
    diagonal self-loops, DenFactored) must match the per-arc one-hot
    formulation exactly — values AND gradients — on a real chain-topology den
    graph built by prep.make_den_fst."""
    import jax
    import jax.numpy as jnp

    from satpu.chain.objf import DenominatorGraph, den_forward
    from satpu.chain.prep import BiphoneTree, make_den_fst

    P = 5
    phones = [f"p{i}" for i in range(1, P + 1)]
    seqs = [rng.integers(1, P + 1, 12).tolist() for _ in range(8)]
    tree = BiphoneTree.build(seqs, phones, biphone=True)
    # bigram transition matrix + final probs from the sequences
    trans = np.full((P + 1, P + 1), 1e-8)
    final = np.full(P + 1, 0.2)
    for seq in seqs:
        prev = 0
        for p in seq:
            trans[prev, p] += 1.0
            prev = p
    trans /= trans.sum(axis=1, keepdims=True)
    den_fst = make_den_fst(trans, final, tree)
    den = DenominatorGraph.from_fst(den_fst, num_pdfs=tree.num_pdfs)
    assert den.factored is not None, "chain den graph should factor"

    B, T = 3, 7
    ll = jnp.asarray(rng.standard_normal((B, T, tree.num_pdfs)).astype(np.float32))
    for leaky in (0.0, 1e-5):
        fast = np.asarray(den_forward(ll, den, leaky, use_factored=True))
        slow = np.asarray(den_forward(ll, den, leaky, use_factored=False))
        np.testing.assert_allclose(fast, slow, rtol=1e-4, atol=1e-4)
    g_fast = jax.grad(lambda x: jnp.sum(den_forward(x, den, 1e-5, use_factored=True)))(ll)
    g_slow = jax.grad(lambda x: jnp.sum(den_forward(x, den, 1e-5, use_factored=False)))(ll)
    np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_slow),
                               rtol=1e-3, atol=1e-4)


def test_den_pallas_matches_xla(rng, monkeypatch):
    """The Pallas FB kernels (pallas_fb.py, interpreter mode on CPU) must
    match the XLA factored den recursion — values AND gradients — including
    batch padding (B=3 pads to 8) and state padding (S pads to 128)."""
    import jax
    import jax.numpy as jnp

    from satpu.chain.objf import DenominatorGraph, den_forward
    from satpu.chain.prep import BiphoneTree, make_den_fst

    P = 5
    phones = [f"p{i}" for i in range(1, P + 1)]
    seqs = [rng.integers(1, P + 1, 12).tolist() for _ in range(8)]
    tree = BiphoneTree.build(seqs, phones, biphone=True)
    trans = np.full((P + 1, P + 1), 1e-8)
    final = np.full(P + 1, 0.2)
    for seq in seqs:
        prev = 0
        for p in seq:
            trans[prev, p] += 1.0
            prev = p
    trans /= trans.sum(axis=1, keepdims=True)
    den_fst = make_den_fst(trans, final, tree)
    den = DenominatorGraph.from_fst(den_fst, num_pdfs=tree.num_pdfs)
    assert den.factored is not None

    B, T = 3, 7
    ll = jnp.asarray(rng.standard_normal((B, T, tree.num_pdfs)).astype(np.float32))

    def run(leaky):
        monkeypatch.setenv("SATPU_PALLAS_FB", "1")
        fast = np.asarray(den_forward(ll, den, leaky, use_factored=True))
        g_fast = np.asarray(jax.grad(lambda x: jnp.sum(
            den_forward(x, den, leaky, use_factored=True)))(ll))
        monkeypatch.setenv("SATPU_PALLAS_FB", "0")
        ref = np.asarray(den_forward(ll, den, leaky, use_factored=True))
        g_ref = np.asarray(jax.grad(lambda x: jnp.sum(
            den_forward(x, den, leaky, use_factored=True)))(ll))
        np.testing.assert_allclose(fast, ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(g_fast, g_ref, rtol=1e-3, atol=1e-4)

    for leaky in (0.0, 1e-5):
        run(leaky)


def test_den_factored_rejects_per_arc_pdfs():
    """A graph whose incoming arcs carry different pdfs must fall back to the
    per-arc formulation (factored is None)."""
    from satpu.chain.fst import Arc, Fst
    from satpu.chain.objf import DenominatorGraph

    f = Fst()
    s0, s1 = f.add_state(), f.add_state()
    f.add_arc(s0, Arc(1, 1, 0.5, s1))
    f.add_arc(s0, Arc(2, 2, 0.7, s1))  # second pdf into the same state
    f.add_arc(s1, Arc(1, 1, 0.1, s0))
    f.set_final(s1, 0.0)
    den = DenominatorGraph.from_fst(f, num_pdfs=2)
    assert den.factored is None
