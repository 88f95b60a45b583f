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
