"""TransitionModel round-trip + transition-id -> pdf mapping
(reference csrc/hmm.cc ReadTransitionModel)."""
import io

import numpy as np


def _chain_tmodel():
    from satpu.chain.hmm import TransitionModel, chain_topology

    phones = [1, 2, 3]
    topo = chain_topology(phones)
    # biphone-free: one tuple per phone, forward pdf 2p-2, self-loop 2p-1
    tuples = [(p, 0, 2 * (p - 1), 2 * (p - 1) + 1) for p in phones]
    return TransitionModel(topo, tuples)


def test_transition_model_roundtrip():
    from satpu.chain.hmm import TransitionModel

    tm = _chain_tmodel()
    buf = io.BytesIO()
    tm.write(buf)
    buf.seek(0)
    tm2 = TransitionModel.read(buf)
    assert tm2.tuples == tm.tuples
    assert tm2.num_transition_ids == tm.num_transition_ids
    assert [s.transitions for e in tm2.topo.entries for s in e] == \
           [s.transitions for e in tm.topo.entries for s in e]


def test_transition_id_to_pdf_chain_topology():
    tm = _chain_tmodel()
    # per phone: 2 transitions (self-loop -> self_loop_pdf, forward -> fwd pdf)
    assert tm.num_transition_ids == 6
    got = [tm.transition_id_to_pdf(t) for t in range(1, 7)]
    # tuple order: phone 1 (tids 1=selfloop pdf1, 2=forward pdf0), ...
    assert got == [1, 0, 3, 2, 5, 4]
    assert tm.num_pdfs == 6


def test_relabel_fst_to_pdfs():
    from satpu.chain.fst import Arc, Fst
    from satpu.chain.hmm import relabel_fst_to_pdfs

    tm = _chain_tmodel()
    f = Fst.from_text("0 1 2 0 0.0\n1 1 1 0 0.0\n1 0.0")  # fwd(p1), loop(p1)
    relabel_fst_to_pdfs(f, tm)
    assert f.arcs[0][0].ilabel == 0 + 1  # forward pdf 0 -> label 1
    assert f.arcs[1][0].ilabel == 1 + 1  # self-loop pdf 1 -> label 2
