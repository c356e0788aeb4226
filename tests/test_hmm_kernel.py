"""Forward-HMM device kernel vs the numpy oracle."""

import numpy as np
import jax.numpy as jnp

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.ops import reference as ref
from dnascent_tpu.ops.hmm import forward_batch_jit

HMM = DNA_R10.hmm
HMM_PROBS = (HMM.external_D2D, HMM.external_D2M, HMM.external_I2M,
             HMM.external_M2D, HMM.internal_M2I, HMM.internal_I2I)


def test_forward_batch_matches_oracle(models, rng):
    w = 12
    n = 2 * w
    W = 6
    T = 40
    obs = np.zeros((W, T), dtype=np.float32)
    n_obs = np.zeros(W, dtype=np.int32)
    mu = np.zeros((W, n), dtype=np.float32)
    sd = np.ones((W, n), dtype=np.float32)
    expected = []
    for i in range(W):
        ranks = rng.integers(0, 4 ** 9, size=n + 9)
        m = models.unlabelled_model[ranks[:n], 0]
        reps = rng.integers(1, 3, size=n)
        o = np.repeat(m, reps)[: T] + rng.normal(0, 0.05, min(int(reps.sum()), T))
        n_obs[i] = len(o)
        obs[i, : len(o)] = o
        mu[i] = m
        sd[i] = models.unlabelled_model[ranks[:n], 1]
        hasT = np.ones(n + 9, dtype=bool)
        expected.append(ref.sequence_probability(
            o.astype(np.float64), ranks, hasT, w, False,
            models.unlabelled_model, models.analogue_model, 0.0, 1.0, 2.0,
            0, 0))
    got = np.asarray(forward_batch_jit(
        jnp.asarray(obs), jnp.asarray(n_obs), jnp.asarray(mu),
        jnp.asarray(sd), jnp.asarray(np.full(W, n, np.int32)),
        jnp.asarray(np.full(W, 2.0, np.float32)), HMM_PROBS))
    for i in range(W):
        assert abs(got[i] - expected[i]) < 2e-2 * max(1.0, abs(expected[i])), (
            i, got[i], expected[i])


def test_hmm_detect_batched_packing_invariant(models):
    """hmm_detect_reads packs all windows of a read batch into one device
    dispatch; per-read LLR text must not depend on which reads share the
    batch (guards the cross-read packing of mu/sd/epb and the padding)."""
    from dnascent_tpu.pipeline.hmm_detect import hmm_detect_reads
    from dnascent_tpu.pipeline.source import SimulatedSource

    records = list(SimulatedSource(models, DNA_R10, n_reads=4, length=1500,
                                   seed=17))
    one = dict(hmm_detect_reads(records, models, DNA_R10, batch_size=1))
    four = dict(hmm_detect_reads(records, models, DNA_R10, batch_size=4))
    assert set(one) == set(four) and len(one) == 4
    for rid in one:
        assert one[rid] == four[rid]
