"""Full biological workflow on synthetic data: train the CNN on analogue-
painted reads, detect on fork-structured reads, and verify forkSense calls
the painted forks.  The strongest end-to-end proof the pipeline carries
signal, not just structure."""

import numpy as np
import pytest

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.models import cnn as cnn_mod
from dnascent_tpu.pipeline import forksense as fsm
from dnascent_tpu.pipeline.detect import detect_reads
from dnascent_tpu.pipeline.source import ReadRecord
from dnascent_tpu.pipeline.traincnn import (batches_from_labelled_reads,
                                            train_detect_cnn)
from dnascent_tpu.testing.simulate import simulate_read
from dnascent_tpu.utils.seqtools import kmer_ranks


def _painted_read(models, edu_model, length, labels, seed, read_id,
                  ref_start=10000):
    cfg = DNA_R10
    sim = simulate_read(models.pore_model, cfg, length=length, seed=seed)
    rng = np.random.default_rng(seed)
    ranks = kmer_ranks(sim.sequence, cfg.kmer_len)
    ranks = np.where(ranks < 0, 0, ranks)
    lab_k = labels[: ranks.shape[0]]
    means = models.pore_model[ranks, 0].astype(np.float64)
    means = np.where(lab_k == 1, models.analogue_model[ranks, 0], means)
    means = np.where(lab_k == 2, edu_model[ranks, 0], means)
    dwell = 4 + rng.poisson(8.0, size=ranks.shape[0])
    raw = np.repeat(sim.shift + sim.scale * means, dwell) \
        + rng.normal(0, 1.2, int(dwell.sum()))
    idx = np.arange(length, dtype=np.int64)
    return ReadRecord(
        read_id=read_id, contig="chrW", ref_start=ref_start,
        ref_end=ref_start + length, is_reverse=False, basecall=sim.sequence,
        reference_seq=sim.sequence, ref_to_query=idx.copy(),
        query_to_ref=idx.copy(), ref_to_del=np.zeros(length, bool), raw=raw)


@pytest.mark.slow
def test_full_workflow_fork_recovery(models):
    cfg = DNA_R10
    edu_model = models.analogue_model.copy()
    edu_model[:, 0] -= 0.8

    # --- train on short painted reads ---
    length = 3000
    labels = np.zeros(length, dtype=np.int32)
    labels[400:1300] = 1   # BrdU
    labels[1700:2600] = 2  # EdU
    train_pairs = [
        (_painted_read(models, edu_model, length, labels, 900 + i,
                       f"train-{i}"), labels)
        for i in range(10)
    ]
    batches = list(batches_from_labelled_reads(train_pairs, models, cfg,
                                               seq_len=512, batch_size=4))
    model = cnn_mod.create_model(d_model=96, d_core=48, d_residual=16,
                                 d_signal=48, dilations=(1, 2, 4, 8))
    params, losses = train_detect_cnn(iter(batches), model=model,
                                      learning_rate=1e-3, epochs=25)
    assert losses[-1] < losses[0] * 0.6

    # --- detect on fork-structured reads (EdU track then BrdU track) ---
    flen = 10000
    flabels = np.zeros(flen, dtype=np.int32)
    flabels[2000:4500] = 2   # EdU first pulse
    flabels[4700:7200] = 1   # BrdU second pulse -> right fork
    fork_reads = [
        _painted_read(models, edu_model, flen, flabels, 2000 + i,
                      f"fork-{i}")
        for i in range(6)
    ]
    detected = []
    for rid, d in detect_reads(fork_reads, models, model, params, cfg,
                               batch_size=6):
        detected.append(d)
    assert len(detected) >= 5

    # calls should separate painted regions
    d0 = detected[0]
    rel = d0.ref_coords - d0.record.ref_start
    in_brdu = (rel >= 4700) & (rel < 7200)
    in_edu = (rel >= 2000) & (rel < 4500)
    outside = ~(in_brdu | in_edu)
    assert d0.brdu_prob[in_brdu].mean() > 2 * d0.brdu_prob[outside].mean()
    assert d0.edu_prob[in_edu].mean() > 2 * d0.edu_prob[outside].mean()

    # --- forkSense on the detect output ---
    fs_reads = [
        fsm.DetectedReadData(
            read_id=d.record.read_id, contig=d.record.contig,
            ref_start=d.record.ref_start, ref_end=d.record.ref_end,
            strand=d.record.strand, coords=d.ref_coords,
            edu=d.edu_prob, brdu=d.brdu_prob)
        for d in detected
    ]
    inc, outputs = fsm.forksense_run(fs_reads, "EdU,BrdU", cfg)
    right = [l for o in outputs for l in o.right_forks]
    # the CNN is deliberately tiny and briefly trained, so call densities sit
    # near the DBSCAN threshold: require the chain to produce at least one
    # called fork spanning the painted pulses
    assert len(right) >= 1, "no right forks called"
    # fork span should cover the painted pulse region
    cols = right[0].split()
    lb, ub = int(cols[1]), int(cols[2])
    assert lb < 10000 + 4500 and ub > 10000 + 4700
