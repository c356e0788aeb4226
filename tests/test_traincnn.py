"""Train the detect CNN on painted synthetic reads and verify the analogue
classes become separable — the full learning loop end-to-end."""

import numpy as np
import pytest

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.models import cnn as cnn_mod
from dnascent_tpu.pipeline.source import SimulatedSource
from dnascent_tpu.pipeline.traincnn import (batches_from_labelled_reads,
                                            reference_arch_trainer,
                                            train_detect_cnn)


def test_reference_arch_fit_decreases_loss(models):
    """The reference detect-CNN topology is trainable in-framework: loss
    falls, and the frozen BatchNorm moving statistics stay untouched."""
    cfg = DNA_R10
    records_and_labels = []
    for i, rec in enumerate(SimulatedSource(models, cfg, n_reads=3,
                                            length=1200, seed=321)):
        lab = np.full(len(rec.reference_seq), (i % 2) + 1, np.int32)
        records_and_labels.append((rec, lab))
    batches = list(batches_from_labelled_reads(
        records_and_labels, models, cfg, seq_len=192, batch_size=2))
    assert batches
    model, params, opt = reference_arch_trainer(learning_rate=3e-3)
    before_mm = np.asarray(params["layer3"]["moving_mean"]).copy()
    fitted, losses = train_detect_cnn(iter(batches), model=model,
                                      params=params, epochs=4, optimizer=opt)
    assert losses[-1] < losses[0], (losses[0], losses[-1])
    np.testing.assert_array_equal(
        np.asarray(fitted["layer3"]["moving_mean"]), before_mm)
    assert not np.allclose(np.asarray(fitted["layer2"]["kernel"]),
                           np.asarray(params["layer2"]["kernel"]))


def _painter_and_labels(length, brdu_span, edu_span):
    """Label per ref position: 0 thymidine, 1 BrdU, 2 EdU."""
    labels = np.zeros(length, dtype=np.int32)
    labels[slice(*brdu_span)] = 1
    labels[slice(*edu_span)] = 2
    return labels


@pytest.mark.slow
def test_cnn_learns_analogue_separation(models):
    cfg = DNA_R10
    length = 3000
    brdu_span = (500, 1200)
    edu_span = (1800, 2500)
    labels = _painter_and_labels(length, brdu_span, edu_span)

    # paint BrdU with the analogue model; approximate EdU with a shifted
    # table so the two classes have distinct signal signatures
    edu_model = models.analogue_model.copy()
    edu_model[:, 0] -= 0.8

    from dnascent_tpu.testing.simulate import simulate_read
    from dnascent_tpu.pipeline.source import ReadRecord

    records_and_labels = []
    for i in range(12):
        seed = 500 + i
        # compose per-kmer model: rows switch by label of kmer start
        sim = simulate_read(models.pore_model, cfg, length=length, seed=seed)
        # re-simulate signal with painted levels
        from dnascent_tpu.utils.seqtools import kmer_ranks
        rng = np.random.default_rng(seed)
        ranks = np.where(kmer_ranks(sim.sequence, cfg.kmer_len) < 0, 0,
                         kmer_ranks(sim.sequence, cfg.kmer_len))
        lab_k = labels[: ranks.shape[0]]
        means = models.pore_model[ranks, 0].astype(np.float64)
        means = np.where(lab_k == 1, models.analogue_model[ranks, 0], means)
        means = np.where(lab_k == 2, edu_model[ranks, 0], means)
        dwell = 4 + rng.poisson(8.0, size=ranks.shape[0])
        level = sim.shift + sim.scale * means
        raw = np.repeat(level, dwell) + rng.normal(0, 1.2, int(dwell.sum()))
        idx = np.arange(length, dtype=np.int64)
        rec = ReadRecord(
            read_id=f"train-{i}", contig="chrT", ref_start=0, ref_end=length,
            is_reverse=False, basecall=sim.sequence,
            reference_seq=sim.sequence, ref_to_query=idx.copy(),
            query_to_ref=idx.copy(), ref_to_del=np.zeros(length, bool),
            raw=raw)
        records_and_labels.append((rec, labels))

    batches = list(batches_from_labelled_reads(
        records_and_labels, models, cfg, seq_len=512, batch_size=4))
    assert len(batches) >= 4
    model = cnn_mod.create_model(d_model=96, d_core=48, d_residual=16,
                                 d_signal=48, dilations=(1, 2, 4, 8))
    params, losses = train_detect_cnn(iter(batches), model=model,
                                      learning_rate=1e-3, epochs=25)
    assert losses[-1] < losses[0] * 0.6, (losses[0], losses[-1])

    # evaluate on a held-out batch: masked accuracy well above chance
    b = batches[0]
    import jax.numpy as jnp
    probs = np.asarray(model.apply(params, jnp.asarray(b.core_idx),
                                   jnp.asarray(b.residual_idx),
                                   jnp.asarray(b.signal)))
    pred = probs.argmax(-1)
    m = b.mask
    acc = (pred[m] == b.labels[m]).mean()
    assert acc > 0.7, f"accuracy {acc}"
