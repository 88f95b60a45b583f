"""Fused Pallas MRF stage (satpu/ops/pallas_mrf.py) vs the XLA module path.

The kernel replaces the generator's resblock groups on the serving path
(reference semantics: satools/satools/hifigan/nn.py:93-187 ResBlock1 +
archi.py:62-71 mean-over-resblocks). On CPU it runs in interpreter mode;
these tests establish exact structural agreement with the flax module path
at bf16 tolerance, including block/halo edges.
"""
import dataclasses

import numpy as np
import pytest


def _mk(cfg_kw, rng, B=2, T=50, in_dim=12):
    import jax
    import jax.numpy as jnp

    from satpu.models.hifigan import CoreHifiGan, CoreHifiGanConfig

    cfg = CoreHifiGanConfig(input_dim=in_dim, **cfg_kw)
    m0 = CoreHifiGan(cfg)
    m1 = CoreHifiGan(dataclasses.replace(cfg, fused_mrf=True))
    x = jnp.asarray(rng.standard_normal((B, T, in_dim)), jnp.float32)
    v = m0.init(jax.random.PRNGKey(0), x)
    return m0, m1, v, x


def test_fused_mrf_matches_module_path(rng):
    """Full tiny generator, fused vs module MRF: bf16-tolerance waveform
    agreement and identical param structure (same init works for both)."""
    m0, m1, v, x = _mk(dict(upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
                            upsample_initial_channel=64,
                            compute_dtype="bfloat16"), rng)
    y0 = np.asarray(m0.apply(v, x), np.float32)
    y1 = np.asarray(m1.apply(v, x), np.float32)
    assert np.isfinite(y1).all()
    scale = max(np.abs(y0).max(), 1e-6)
    assert np.abs(y0 - y1).max() <= 2e-2 * scale + 1e-3


def test_fused_mrf_multi_block_halo(rng):
    """T large enough to split into several kernel blocks (the halo path):
    interior block boundaries must be exact, not just the sequence edges."""
    import jax.numpy as jnp

    from satpu.ops import pallas_mrf
    from satpu.ops.pallas_mrf import mrf_stage

    # shrink blocks so a short sequence spans >2 blocks with halos
    orig = pallas_mrf._pick_t_blk
    pallas_mrf._pick_t_blk = lambda T: 256
    try:
        C, T, B = 16, 700, 2
        ks = (3, 7, 11)
        ds = ((1, 3, 5),) * 3
        x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
        weights = []
        for k in ks:
            w1 = jnp.asarray(rng.standard_normal((3, k, C, C)) * 0.2, jnp.float32)
            b1 = jnp.asarray(rng.standard_normal((3, C)) * 0.1, jnp.float32)
            w2 = jnp.asarray(rng.standard_normal((3, k, C, C)) * 0.2, jnp.float32)
            b2 = jnp.asarray(rng.standard_normal((3, C)) * 0.1, jnp.float32)
            weights.append((w1, b1, w2, b2))
        y = np.asarray(mrf_stage(x, weights, ks, ds), np.float32)
    finally:
        pallas_mrf._pick_t_blk = orig

    # reference: plain jnp resblocks (same math, 'same' zero padding)
    def leaky(v):
        return jnp.where(v > 0, v, 0.1 * v)

    def conv(v, w, b, d):
        k = w.shape[0]
        acc = jnp.zeros(v.shape[:2] + (w.shape[2],), jnp.float32)
        p = (k - 1) // 2 * d
        vp = jnp.pad(v.astype(jnp.float32), ((0, 0), (p, p), (0, 0)))
        for j in range(k):
            acc = acc + jnp.einsum("btc,co->bto", vp[:, j * d:j * d + T],
                                   w[j].astype(jnp.float32))
        return (acc + b[None, None, :]).astype(v.dtype)

    ref = 0.0
    for (w1, b1, w2, b2), k in zip(weights, ks):
        xr = x
        for i, d in enumerate((1, 3, 5)):
            t = conv(leaky(xr), w1[i], b1[i], d)
            t = conv(leaky(t), w2[i], b2[i], 1)
            xr = xr + t
        ref = ref + np.asarray(xr, np.float32)
    ref = ref / len(ks)
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(ref - y).max() <= 3e-2 * scale


def test_fused_mrf_split_path(rng):
    """The VMEM-overflow split (per-resblock calls + XLA average) matches the
    fused group result on the same inputs."""
    import jax.numpy as jnp

    from satpu.ops import pallas_mrf

    C, T, B = 8, 64, 1
    ks, ds = (3, 5), ((1, 2, 3), (1, 2, 3))
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.bfloat16)
    weights = []
    for k in ks:
        weights.append(tuple(
            jnp.asarray(rng.standard_normal(s) * 0.2, jnp.float32)
            for s in ((3, k, C, C), (3, C), (3, k, C, C), (3, C))))
    y_fused = np.asarray(pallas_mrf.mrf_stage(x, weights, ks, ds), np.float32)
    orig = pallas_mrf._stage_vmem_bytes
    pallas_mrf._stage_vmem_bytes = lambda *a: 1 << 40  # force the split path
    try:
        y_split = np.asarray(pallas_mrf.mrf_stage(x, weights, ks, ds),
                             np.float32)
    finally:
        pallas_mrf._stage_vmem_bytes = orig
    scale = max(np.abs(y_fused).max(), 1e-6)
    assert np.abs(y_fused - y_split).max() <= 1e-2 * scale
