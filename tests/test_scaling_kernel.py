"""Theil-Sen device kernel vs the numpy oracle."""

import numpy as np
import jax.numpy as jnp

from dnascent_tpu.ops import reference as ref, scaling


def test_masked_kth_smallest_matches_sort(rng):
    B, N = 4, 257
    vals = rng.normal(size=(B, N)).astype(np.float32) * 10
    vals[0, :7] = [-np.inf, np.inf, 0.0, -0.0, 1e-30, -1e30, 3.5]
    mask = rng.random((B, N)) > 0.3
    mask[:, 0] = True
    ks = np.minimum(mask.sum(1) // 2, mask.sum(1) - 1).astype(np.int32)
    out = np.asarray(scaling.masked_kth_smallest(
        jnp.asarray(vals), jnp.asarray(mask), jnp.asarray(ks)))
    for b in range(B):
        expect = np.sort(vals[b][mask[b]])[ks[b]]
        assert out[b] == expect or (np.isnan(out[b]) and np.isnan(expect))


def test_theilsen_device_matches_oracle(rng):
    B, P = 3, 1400
    sigs = np.zeros((B, P), dtype=np.float32)
    mms = np.zeros((B, P), dtype=np.float32)
    n = np.array([1400, 1200, 500], dtype=np.int32)  # last one: passthrough
    shift = np.array([90.0, 85.0, 88.0], dtype=np.float32)
    scale = np.array([16.0, 15.0, 14.0], dtype=np.float32)
    true_shift = [92.0, 83.5, 0]
    true_scale = [16.5, 14.2, 0]
    for b in range(B):
        mm = rng.normal(size=n[b]).astype(np.float32)
        sig = true_shift[b] + true_scale[b] * mm + rng.normal(
            0, 0.05, n[b]).astype(np.float32)
        sigs[b, : n[b]] = sig
        mms[b, : n[b]] = mm
    ns, sc = scaling.theilsen_refine(
        jnp.asarray(sigs), jnp.asarray(mms), jnp.asarray(n),
        jnp.asarray(shift), jnp.asarray(scale))
    ns, sc = np.asarray(ns), np.asarray(sc)
    for b in range(2):
        es, ec = ref.estimate_scaling_theilsen(
            sigs[b, : n[b]].astype(np.float64), mms[b, : n[b]].astype(np.float64),
            float(shift[b]), float(scale[b]))
        # float32 device vs float64 oracle: tight but not bitwise
        assert abs(ns[b] - es) < 5e-2, (b, ns[b], es)
        assert abs(sc[b] - ec) < 5e-3, (b, sc[b], ec)
        # and both near the generating truth
        assert abs(ns[b] - true_shift[b]) < 0.3
        assert abs(sc[b] - true_scale[b]) < 0.1
    # passthrough row
    assert ns[2] == shift[2] and sc[2] == scale[2]


def test_quantile_scaling_device_matches_oracle(models, rng):
    from dnascent_tpu.ops import scaling as sc
    B, E, K = 3, 5000, 2000
    ev = np.full((B, E), np.inf, np.float32)
    mm = np.full((B, K), np.inf, np.float32)
    ne = np.array([5000, 3200, 4100], np.int32)
    nk = np.array([2000, 1500, 1800], np.int32)
    expect = []
    for b in range(B):
        e = rng.normal(90, 15, ne[b])
        m = rng.normal(0, 1, nk[b])
        ev[b, : ne[b]] = e
        mm[b, : nk[b]] = m
        expect.append(ref.estimate_scaling_quantiles(e, m))
    sh, scl = sc.quantile_scaling_device(
        jnp.asarray(ev), jnp.asarray(ne), jnp.asarray(mm), jnp.asarray(nk))
    for b in range(B):
        assert abs(float(sh[b]) - expect[b][0]) < 1e-2, b
        assert abs(float(scl[b]) - expect[b][1]) < 1e-3, b


def test_theilsen_pregathered_matches_full(rng):
    """Host stride-subsample + lean kernel == original padded kernel."""
    B, P = 3, 1400
    sigs = np.zeros((B, P), dtype=np.float32)
    ranks = np.zeros((B, P), dtype=np.int64)
    pore = np.zeros((4 ** 9, 2), dtype=np.float32)
    pore[:, 0] = rng.normal(90, 10, 4 ** 9).astype(np.float32)
    n = np.array([1400, 1200, 500], dtype=np.int32)
    shift = np.array([90.0, 85.0, 88.0], dtype=np.float32)
    scale = np.array([16.0, 15.0, 14.0], dtype=np.float32)
    mms = np.zeros((B, P), dtype=np.float32)
    for b in range(B):
        r = rng.integers(0, 4 ** 9, n[b])
        ranks[b, : n[b]] = r
        mms[b, : n[b]] = pore[r, 0]
        sigs[b, : n[b]] = (88.0 + 15.0 * rng.normal(size=n[b])).astype(np.float32)
    exp_sh, exp_sc = scaling.theilsen_refine(
        jnp.asarray(sigs), jnp.asarray(mms), jnp.asarray(n),
        jnp.asarray(shift), jnp.asarray(scale))
    mp, tr = 1000, 50
    g_sig = np.zeros((B, mp), np.float32)
    g_y = np.zeros((B, mp), np.float32)
    npts = np.zeros(B, np.int32)
    passth = np.zeros(B, bool)
    for b in range(B):
        g_sig[b], g_y[b], npts[b], passth[b] = scaling.theilsen_pregather(
            sigs[b, : n[b]], ranks[b, : n[b]], pore, mp, tr)
    got_sh, got_sc = scaling.theilsen_refine_pregathered(
        jnp.asarray(g_sig), jnp.asarray(g_y), jnp.asarray(npts),
        jnp.asarray(passth), jnp.asarray(shift), jnp.asarray(scale),
        max_points=mp)
    np.testing.assert_array_equal(np.asarray(exp_sh), np.asarray(got_sh))
    np.testing.assert_array_equal(np.asarray(exp_sc), np.asarray(got_sc))
