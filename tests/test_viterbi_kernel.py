"""Device windowed-Viterbi kernel vs the numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.ops import reference as ref, viterbi


HMM = DNA_R10.hmm
HMM_PROBS = (HMM.external_D2D, HMM.external_D2M, HMM.external_I2M,
             HMM.external_M2D, HMM.internal_M2I, HMM.internal_I2I)
LOG_INV_SQRT_2PI = float(np.log(0.3989422804014327))


def _make_window(models, rng, n_states, n_obs_mult, epb=2.0):
    ranks = rng.integers(0, 4 ** 9, size=n_states)
    mu = models.pore_model[ranks, 0].astype(np.float64)
    reps = rng.integers(1, n_obs_mult + 1, size=n_states)
    obs = np.repeat(mu, reps) + rng.normal(0, 0.03, int(reps.sum()))
    return ranks, obs


def _run_batch(models, windows, N, T, epb=2.0):
    W = len(windows)
    obs = np.zeros((W, T), dtype=np.float32)
    n_obs = np.zeros(W, dtype=np.int32)
    mu = np.zeros((W, N), dtype=np.float32)
    inv_s = np.ones((W, N), dtype=np.float32)
    lpc = np.full((W, N), -np.inf, dtype=np.float32)
    n_states = np.zeros(W, dtype=np.int32)
    for w, (ranks, o) in enumerate(windows):
        n_obs[w] = len(o)
        obs[w, : len(o)] = o
        m = models.pore_model[ranks, 0]
        s = models.pore_model[ranks, 1]
        mu[w, : len(ranks)] = m
        inv_s[w, : len(ranks)] = 1.0 / s
        lpc[w, : len(ranks)] = LOG_INV_SQRT_2PI - np.log(s)
        n_states[w] = len(ranks)
    pc, pl, score = viterbi.viterbi_jit(
        jnp.asarray(obs), jnp.asarray(n_obs), jnp.asarray(mu),
        jnp.asarray(inv_s), jnp.asarray(lpc), jnp.asarray(n_states),
        jnp.full((W,), epb, dtype=np.float32), HMM_PROBS)
    return (np.asarray(pc), np.asarray(pl), np.asarray(score), n_states)


def test_viterbi_kernel_matches_oracle(models, rng):
    windows = [_make_window(models, rng, ns, m)
               for ns, m in [(42, 2), (42, 3), (20, 1), (55, 2), (7, 2)]]
    N = 64
    T = max(len(o) for _, o in windows)
    pc, pl, score, ns = _run_batch(models, windows, N, T)
    for w, (ranks, obs) in enumerate(windows):
        want = ref.builtin_viterbi(obs, ranks, models.pore_model, 0.0, 1.0,
                                   events_per_base=2.0)
        L = pc.shape[1]
        got_kind, got_pos = viterbi.decode_path(pc[w, L - pl[w]:],
                                                int(ns[w]))
        # oracle path kinds: 0=D,1=M,2=I — same encoding
        assert pl[w] == want.path.shape[0], (w, pl[w], want.path.shape)
        np.testing.assert_array_equal(got_kind, want.path[:, 0])
        np.testing.assert_array_equal(got_pos, want.path[:, 1])
        assert abs(score[w] - want.score) < 1e-2 * max(1.0, abs(want.score))


def test_viterbi_kernel_matches_oracle_noisy(models, rng):
    # noisier observations exercise I/D states harder
    windows = []
    for i in range(6):
        ranks = rng.integers(0, 4 ** 9, size=42)
        mu = models.pore_model[ranks, 0].astype(np.float64)
        keep = rng.random(42) > 0.1           # ~10% skips
        reps = rng.integers(1, 4, size=42) * keep
        obs = np.repeat(mu, reps) + rng.normal(0, 0.1, int(reps.sum()))
        # a couple of gross outliers to force insertions
        if len(obs) > 10:
            obs[5] += 3.0
        windows.append((ranks, obs))
    N = 64
    T = max(len(o) for _, o in windows)
    pc, pl, score, ns = _run_batch(models, windows, N, T)
    mismatches = 0
    total = 0
    for w, (ranks, obs) in enumerate(windows):
        want = ref.builtin_viterbi(obs, ranks, models.pore_model, 0.0, 1.0,
                                   events_per_base=2.0)
        L = pc.shape[1]
        gk, gp = viterbi.decode_path(pc[w, L - pl[w]:], int(ns[w]))
        got = np.stack([gk.astype(np.int64), gp], axis=1)
        total += 1
        if got.shape != want.path.shape or not (got == want.path).all():
            mismatches += 1
    # f32 device vs f64 oracle: allow an occasional tie-induced divergence
    assert mismatches <= 1, f"{mismatches}/{total} windows diverged"


def test_path_code_pack_roundtrip():
    """3-bit path-code packing (8 codes per 3 bytes) round-trips exactly,
    with leading KIND_PAD padding that consumers filter."""
    import numpy as np
    import jax.numpy as jnp
    from dnascent_tpu.ops.viterbi import (KIND_PAD, pack_path_codes,
                                          unpack_path_codes)
    rng = np.random.default_rng(2)
    for W, L in [(4, 64), (3, 37), (7, 331)]:
        pc = rng.integers(0, 8, size=(W, L)).astype(np.uint8)
        out = unpack_path_codes(np.asarray(pack_path_codes(jnp.asarray(pc))))
        pad = (-L) % 8
        if pad:
            assert (out[:, :pad] == KIND_PAD).all()
        np.testing.assert_array_equal(out[:, pad:], pc)
