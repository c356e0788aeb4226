"""Pallas viterbi fill vs the XLA scan fill (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from dnascent_tpu.config import DNA_R10

HMM_KEY = ("external_D2D", "external_D2M", "external_I2M", "external_M2D",
           "internal_M2I", "internal_I2I")


def _run(use_pallas, obs, n_obs, ranks, n_states, epb, table):
    from dnascent_tpu.ops import viterbi as vit
    safe = jnp.clip(jnp.asarray(ranks), 0, table.shape[0] - 1)
    mu = jnp.asarray(table)[safe, 0]
    sigma = jnp.maximum(jnp.asarray(table)[safe, 1], 1e-6)
    lpc = jnp.float32(np.log(0.3989422804014327)) - jnp.log(sigma)
    lpc = jnp.where(jnp.asarray(ranks) < 0, -jnp.inf, lpc)
    hp = tuple(getattr(DNA_R10.hmm, k) for k in HMM_KEY)
    return vit.viterbi_fill_backtrace(
        jnp.asarray(obs), jnp.asarray(n_obs), mu, 1.0 / sigma, lpc,
        jnp.asarray(n_states), jnp.asarray(epb), hp, use_pallas=use_pallas)


def test_pallas_fill_matches_scan(monkeypatch):
    from jax.experimental.pallas import tpu as pltpu
    import dnascent_tpu.ops.viterbi_pallas as vp

    # small W blocks so the test exercises the multi-block carry reset
    monkeypatch.setattr(vp, "WBLK", 128)
    rng = np.random.default_rng(3)
    W, T, N = 300, 64, 72
    obs = rng.normal(90, 12, (W, T)).astype(np.float32)
    n_obs = rng.integers(10, T, W).astype(np.int32)
    ranks = rng.integers(0, 4 ** 9, (W, N)).astype(np.int32)
    n_states = rng.integers(5, 42, W).astype(np.int32)
    ranks[np.arange(N)[None, :] >= n_states[:, None]] = -1
    epb = rng.uniform(1.5, 3.0, W).astype(np.float32)
    table = np.stack([rng.normal(90, 10, 4 ** 9),
                      rng.uniform(1, 3, 4 ** 9)], 1).astype(np.float32)

    pc_x, pl_x, sc_x = _run(False, obs, n_obs, ranks, n_states, epb, table)
    with pltpu.force_tpu_interpret_mode():
        pc_p, pl_p, sc_p = _run(True, obs, n_obs, ranks, n_states, epb, table)
    np.testing.assert_allclose(np.asarray(sc_p), np.asarray(sc_x), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(pl_p), np.asarray(pl_x))
    # the pallas path uses the countdown backtrace: PAD-gapped stream whose
    # filtered move sequence must equal the scan walk exactly
    pc_x, pc_p = np.asarray(pc_x), np.asarray(pc_p)
    for w in range(pc_x.shape[0]):
        np.testing.assert_array_equal(pc_p[w][(pc_p[w] & 3) != 3],
                                      pc_x[w][(pc_x[w] & 3) != 3])
