"""The bench-only C++ CPU baseline (native/baseline_cpu.cpp) must do the
same per-read work as the numpy parity oracles — otherwise the measured
benchmark denominator would be quietly wrong (a QC short-circuit or skipped
stage would fake speed)."""

import numpy as np
import pytest

from dnascent_tpu import native
from dnascent_tpu.ops import reference as refops
from dnascent_tpu.pipeline.source import SimulatedSource
from dnascent_tpu.utils.seqtools import kmer_ranks


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_baseline_checksum_matches_oracle(cfg, models):
    rec = next(iter(SimulatedSource(models, cfg, n_reads=1, length=3000,
                                    seed=100)))
    rq = kmer_ranks(rec.basecall, cfg.kmer_len)
    rr = kmer_ranks(rec.reference_seq, cfg.kmer_len)
    q2r = np.full(rq.shape[0], -1, np.int64)
    m = min(rec.query_to_ref.shape[0], rq.shape[0])
    q2r[:m] = rec.query_to_ref[:m]
    table = models.pore_model.astype(np.float64)

    got = native.baseline_detect_read(rec.raw, rq, rr, q2r, table, cfg)

    # oracle twin of the same windowed hot path (bench.py geometry)
    et = refops.detect_events(rec.raw, cfg.events)
    me = refops.merge_events(et, rec.raw.shape[0])
    rq0 = np.where(rq < 0, 0, rq)
    rr0 = np.where(rr < 0, 0, rr)
    mm = models.pore_model[rr0, 0].astype(np.float64)
    sh, sc = refops.estimate_scaling_quantiles(me.mean, mm, cfg.scaling)
    q2r_d = {i: int(q2r[i]) for i in range(q2r.shape[0]) if q2r[i] >= 0}
    br = refops.adaptive_banded_align(me.mean, rq0, rr0, q2r_d,
                                      models.pore_model, sh, sc, cfg.banded)
    assert br.qc_pass, "fixture read should pass banded QC"
    mm_clean = models.pore_model[
        np.where(br.cleaned_ranks < 0, 0, br.cleaned_ranks), 0]
    sh2, sc2 = refops.estimate_scaling_theilsen(br.cleaned_signals, mm_clean,
                                                sh, sc, cfg.scaling)
    if sh2 == -1.0:
        sh2, sc2 = sh, sc
    epb = max(1.01, et.mean.shape[0] / max(1, rq.shape[0]))
    pairs = br.event_alignment
    ns = cfg.window_length_align - cfg.kmer_len + 1
    want = 0.0
    i = 0
    while i + ns <= rr.shape[0]:
        lo = np.searchsorted(pairs[:, 1], i)
        hi = np.searchsorted(pairs[:, 1], i + ns)
        if hi > lo:
            e_lo = pairs[lo, 0]
            e_hi = pairs[min(hi, pairs.shape[0] - 1), 0]
            obs = me.mean[e_lo : e_hi + 1]
            if obs.shape[0] > 1:
                want += refops.builtin_viterbi(
                    obs, rr0[i : i + ns], models.pore_model, sh2, sc2, epb,
                    cfg.hmm).score
        i += ns
    assert np.isfinite(got)
    assert got == pytest.approx(want, rel=1e-5)


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_baseline_flags_qc_failure(cfg, models):
    """Garbage signal must come back NaN (QC fail), like the pipeline."""
    rng = np.random.default_rng(0)
    raw = rng.uniform(0.0, 1.0, 4000)  # flat noise, no event structure
    n = 500
    rq = rng.integers(0, 4 ** cfg.kmer_len, n).astype(np.int64)
    rr = rng.integers(0, 4 ** cfg.kmer_len, n).astype(np.int64)
    q2r = np.arange(n, dtype=np.int64)
    got = native.baseline_detect_read(raw, rq, rr, q2r,
                                      models.pore_model.astype(np.float64),
                                      cfg)
    assert np.isnan(got)
