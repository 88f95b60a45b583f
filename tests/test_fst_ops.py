"""FST composition / connect / const-fst: the supervision-normalization
mechanics (reference AddWeightToSupervisionFst, csrc/pkwrap-main.h:113)."""
import numpy as np


def test_compose_acceptor_weights_add():
    from satpu.chain.fst import Fst, fst_compose_acceptor

    # a: accepts "1 2" (cost 0.5) and "1 3" (cost 0.6)
    a = Fst.from_text("0 1 1 1 0.5\n1 2 2 2 0.0\n1 3 3 3 0.1\n2 0.0\n3 0.0")
    # b: unigram-ish acceptor: label 1 cost 1.0, label 2 cost 2.0 (loops)
    b = Fst.from_text("0 0 1 1 1.0\n0 0 2 2 2.0\n0 0.25")
    c = fst_compose_acceptor(a, b)
    # only "1 2" survives (b has no label 3); weights add along the path
    paths = []
    def walk(s, cost, labs):
        if c.finals[s] != float("inf"):
            paths.append((tuple(labs), cost + c.finals[s]))
        for arc in c.arcs[s]:
            walk(arc.nextstate, cost + arc.weight, labs + [arc.ilabel])
    walk(c.start, 0.0, [])
    assert paths == [((1, 2), 0.5 + 1.0 + 0.0 + 2.0 + 0.25)]


def test_compose_epsilon_in_left():
    from satpu.chain.fst import Arc, Fst, fst_compose_acceptor

    a = Fst.from_text("0 1 0 0 0.25\n1 2 1 1 0.0\n2 0.0")  # eps then label 1
    b = Fst.from_text("0 0 1 1 0.5\n0 0.0")
    c = fst_compose_acceptor(a, b)
    total = []
    def walk(s, cost, labs):
        if c.finals[s] != float("inf"):
            total.append(cost)
        for arc in c.arcs[s]:
            walk(arc.nextstate, cost + arc.weight, labs + [arc.ilabel])
    walk(c.start, 0.0, [])
    np.testing.assert_allclose(total, [0.75])


def test_connect_trims_dead_states():
    from satpu.chain.fst import Fst, fst_connect

    f = Fst.from_text("0 1 1 1 0.0\n0 2 2 2 0.0\n1 0.0\n3 0.0")  # 2 dead, 3 unreachable
    g = fst_connect(f)
    assert g.num_states == 2
    assert g.finals[1] == 0.0


def test_const_fst_roundtrip(tmp_path):
    """Write a ConstFst<StdArc> body per the openfst layout and read it back."""
    import struct

    from satpu.chain.fst import Fst, OPENFST_MAGIC

    src = Fst.from_text("0 1 1 1 0.5\n1 1 2 2 0.25\n1 1.5")
    p = tmp_path / "const.fst"
    with open(p, "wb") as f:
        def wstr(s):
            f.write(struct.pack("<i", len(s)))
            f.write(s.encode())
        f.write(struct.pack("<i", OPENFST_MAGIC))
        wstr("const")
        wstr("standard")
        f.write(struct.pack("<i", 2))
        f.write(struct.pack("<i", 0))
        f.write(struct.pack("<Q", 0))
        f.write(struct.pack("<q", src.start))
        f.write(struct.pack("<q", src.num_states))
        f.write(struct.pack("<q", src.num_arcs))
        def align16():
            pad = (-f.tell()) % 16
            f.write(b"\0" * pad)
        align16()
        pos = 0
        for s in range(src.num_states):
            w = src.finals[s]
            f.write(struct.pack("<f", w if w != float("inf") else np.float32(np.inf)))
            f.write(struct.pack("<IIII", pos, len(src.arcs[s]), 0, 0))
            pos += len(src.arcs[s])
        align16()
        for s in range(src.num_states):
            for a in src.arcs[s]:
                f.write(struct.pack("<iifi", a.ilabel, a.olabel, a.weight, a.nextstate))
    got = Fst.read(str(p))
    assert got.num_states == src.num_states
    assert got.to_text() == src.to_text()
