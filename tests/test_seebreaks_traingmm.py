"""seeBreaks and trainGMM tests on synthetic inputs."""

import os

import numpy as np
import pytest

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.pipeline import seebreaks as sb
from dnascent_tpu.pipeline import traingmm as tg
from dnascent_tpu.io.poremodel import synthetic_model_set


def _write_forksense_beds(tmp_path, rng, n_reads=120, breaks=False):
    """Synthetic fork + analogue beds.  When ``breaks``, many tracks end at
    the read end (run-off), emulating frequent breaks."""
    left, right, analogue = [], [], []
    v5, v3 = [], []
    for i in range(n_reads):
        r5 = int(rng.integers(0, 100000))
        rlen = int(rng.integers(40000, 80000))
        r3 = r5 + rlen
        v5.append(r5)
        v3.append(r3)
        rid = f"read{i}"
        # one right fork per read: analogue track inside the read
        tlen = int(rng.integers(3000, 8000))
        a5 = r5 + 2500 + int(rng.integers(0, rlen - tlen - 6000))
        a3 = a5 + tlen
        if breaks and rng.random() < 0.6:
            a3 = r3 - int(rng.integers(0, 200))   # run-off at read end
            a5 = a3 - tlen
        line = f"chr1 {a5} {a3} {rid} {r5} {r3} fwd -1 -3.0\n"
        right.append(line)
        analogue.append(f"chr1 {a5} {a3} {rid} {r5} {r3} fwd -1 -3.0\n")
    lf = os.path.join(tmp_path, "left.bed")
    rf = os.path.join(tmp_path, "right.bed")
    af = os.path.join(tmp_path, "analogue.bed")
    open(lf, "w").write("")
    open(rf, "w").write("".join(right))
    open(af, "w").write("".join(analogue))
    return lf, rf, af, np.asarray(v5), np.asarray(v3)


@pytest.mark.parametrize("parity", [True, False])
def test_seebreaks_detects_breaks(tmp_path, parity):
    rng = np.random.default_rng(1)
    lf, rf, af, v5, v3 = _write_forksense_beds(str(tmp_path), rng, breaks=True)

    def reads_by_minlen(minlen):
        keep = (v3 - v5) >= minlen
        return v5[keep], v3[keep]

    res = sb.run_seebreaks(None, rf, af, v5, reads_by_minlen,
                           DNA_R10.seebreaks, parity=parity)
    assert res.n_forks > 20
    # observed run-off fraction far exceeds the simulated null
    assert res.obs_mean > res.sim_mean + 3 * (res.sim_std + res.obs_std)
    assert res.ci_low > 0


def test_seebreaks_null_case(tmp_path):
    rng = np.random.default_rng(2)
    lf, rf, af, v5, v3 = _write_forksense_beds(str(tmp_path), rng, breaks=False)

    def reads_by_minlen(minlen):
        keep = (v3 - v5) >= minlen
        return v5[keep], v3[keep]

    res = sb.run_seebreaks(None, rf, af, v5, reads_by_minlen,
                           DNA_R10.seebreaks, parity=True)
    # no painted breaks: CI should include zero or be close to it
    assert res.ci_low < 0.05


def test_seebreaks_output_file(tmp_path):
    rng = np.random.default_rng(3)
    lf, rf, af, v5, v3 = _write_forksense_beds(str(tmp_path), rng, breaks=True)

    def reads_by_minlen(minlen):
        keep = (v3 - v5) >= minlen
        return v5[keep], v3[keep]

    res = sb.run_seebreaks(None, rf, af, v5, reads_by_minlen,
                           DNA_R10.seebreaks, parity=True)
    out = os.path.join(tmp_path, "out.seeBreaks")
    sb.write_seebreaks_output(res, out, "d.bam", "left.bed", "right.bed")
    text = open(out).read()
    assert "#nForks" in text
    assert ">ExpectedReadEndFractions:" in text
    assert ">ObservedReadEndFractions:" in text


def test_dbscan_filter_1d():
    rng = np.random.default_rng(0)
    core = rng.normal(0.0, 0.2, 500)
    outliers = np.array([5.0, -7.0, 9.0])
    ev = np.concatenate([core, outliers])
    keep = tg.dbscan_filter_1d(ev, 0.5, int(0.025 * ev.shape[0]))
    assert keep[:500].all()
    assert not keep[500:].any()


def test_train_gmm_recovers_mixture(models):
    rng = np.random.default_rng(5)
    pools = {}
    true = {}
    for idx in [7, 123, 99999]:
        mu1 = models.pore_model[idx, 0]
        s1 = models.pore_model[idx, 1]
        mu2 = mu1 + 0.45
        n = 2000
        z = rng.random(n) < 0.5
        ev = np.where(z, rng.normal(mu2, 0.12, n), rng.normal(mu1, s1, n))
        pools[idx] = ev
        true[idx] = mu2
    fits = tg.train_gmm(pools, models, DNA_R10)
    assert len(fits) == 3
    for f in fits:
        assert abs(f.mu2 - true[f.kmer_index]) < 0.08, (f.kmer_index, f.mu2)
        assert 0.3 < f.pi2 < 0.7
        assert f.mu1 == f.ont_mean  # component 1 pinned


def test_gmm_table_roundtrip(models, tmp_path):
    rng = np.random.default_rng(6)
    pools = {11: rng.normal(models.pore_model[11, 0] + 0.3, 0.15, 1000)}
    fits = tg.train_gmm(pools, models, DNA_R10)
    path = os.path.join(tmp_path, "fit.model")
    tg.write_gmm_table(fits, path)
    from dnascent_tpu.io.poremodel import import_traingmm_model
    table = import_traingmm_model(path, 9)
    assert abs(table[11, 0] - fits[0].mu2) < 1e-5
    assert abs(table[11, 1] - fits[0].sigma2) < 1e-5


def test_seebreaks_device_bootstrap_matches_numpy_stats():
    """The jax.random device bootstrap (fast mode on an accelerator,
    VERDICT r3 item 10) must reproduce the numpy fast path's statistics:
    same math, independent RNG streams, so means agree to bootstrap noise
    (compared at ~5 sigma of the mean-of-means)."""
    rng = np.random.default_rng(7)
    n_reads, n_forks, iters = 200, 150, 4000
    v5 = rng.integers(0, 100000, n_reads).astype(np.int64)
    v3 = v5 + rng.integers(40000, 90000, n_reads)
    track_lengths = rng.integers(2000, 9000, 300).astype(np.int64)
    runoffs = rng.random(n_forks) < 0.3
    fsb, tol = 2000, 300

    sim_np = sb.simulation_fast(v5, v3, track_lengths, n_forks, iters, 5,
                                fsb, tol)
    obs_np = sb.observation_fast(runoffs, iters, 5)
    sim_dv, obs_dv = sb.bootstrap_fast_device(
        v5.astype(np.int32), v3.astype(np.int32),
        track_lengths.astype(np.int32), runoffs, iters, 5, fsb, tol)

    assert sim_dv.shape == (iters,) and obs_dv.shape == (iters,)
    se_sim = sim_np.std(ddof=1) / np.sqrt(iters)
    assert abs(sim_dv.mean() - sim_np.mean()) < 5 * se_sim + 1e-3
    se_obs = obs_np.std(ddof=1) / np.sqrt(iters)
    assert abs(obs_dv.mean() - obs_np.mean()) < 5 * se_obs + 1e-3
    # spreads agree to ~15%
    assert abs(sim_dv.std() - sim_np.std()) < 0.15 * max(sim_np.std(), 1e-3)
    assert abs(obs_dv.std() - obs_np.std()) < 0.15 * max(obs_np.std(), 1e-3)
