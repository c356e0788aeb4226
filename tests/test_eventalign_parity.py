"""Definitive eventalign parity: strict mode vs a pure-oracle reimplementation
of the reference's windowing loop (alignment.cpp:547-741) driven by the
numpy Viterbi oracle.  Pins the trickiest glue semantics: readHead cursors,
lastM advances, breakpoint selection, stay-chain signal accumulation."""

import numpy as np
import pytest

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.ops import reference as ref
from dnascent_tpu.pipeline.eventalign import run_eventalign
from dnascent_tpu.pipeline.prep import prepare_reads
from dnascent_tpu.pipeline.source import SimulatedSource
from dnascent_tpu.utils.seqtools import kmer_ranks


def oracle_eventalign(p, models, cfg):
    """alignment.cpp:547-741 re-expressed with the numpy oracle Viterbi.

    Returns per-position dicts {coord: (kmer_start, [scaled samples...])} in
    insertion order, exactly as refCoordToAP accumulates.
    """
    k = cfg.kmer_len
    rec = p.record
    seq = rec.reference_seq
    ref_len = len(seq)
    ranks = np.where(p.kmer_ranks_ref < 0, 0, p.kmer_ranks_ref)
    mean_ref = models.pore_model[ranks, 0].astype(np.float64)
    r2q = rec.ref_to_query
    pairs = p.event_alignment
    total_wl = cfg.window_length_align
    defined = np.array([c in "ACGT" for c in seq])

    positions = {}
    order = []
    read_head = 0
    ri = 0
    while ri < ref_len - k + 1:
        bases_to_end = ref_len - ri
        wl = min(bases_to_end, total_wl)
        if bases_to_end > 1.5 * total_wl:
            if not defined[ri : ri + int(1.5 * wl)].all():
                ri += wl
                continue
            for i in range(wl, int(1.5 * wl - k - 1)):
                g1 = abs(mean_ref[ri + i] - mean_ref[ri + i + 1])
                g2 = abs(mean_ref[ri + i] - mean_ref[ri + i - 1])
                if g1 > 0.75 and g2 > 0.75:
                    wl = i + k
                    break
        if not defined[ri : ri + wl].all():
            ri += wl
            continue
        lo, hi = r2q[ri], r2q[ri + wl - k + 1]
        ev_sel = []
        first = None
        for j in range(read_head, pairs.shape[0]):
            if lo <= pairs[j, 1] < hi:
                if first is None:
                    first = j
                m = p.event_mean[pairs[j, 0]]
                if 0.0 < m < 250.0:
                    ev_sel.append(int(pairs[j, 0]))
            if pairs[j, 1] >= hi:
                break
        if len(ev_sel) < 2:
            ri += wl
            continue
        obs = p.event_mean[ev_sel]
        wranks = ranks[ri : ri + wl - k + 1]
        res = ref.builtin_viterbi(obs, wranks, models.pore_model, p.shift,
                                  p.scale, p.events_per_base, cfg.hmm)
        if rec.is_reverse:
            ref_coord = rec.ref_end - ri - k // 2
        else:
            ref_coord = rec.ref_start + ri + k // 2
        last_m_ev = 0
        last_m_ref = 0
        ev_idx = 0
        for kind, pos in res.path:
            if kind == 1:
                last_m_ev = ev_idx
                last_m_ref = pos
            if kind != 0:
                ev_idx += 1
        ev_idx = 0
        for kind, pos in res.path:
            if kind == 0:
                continue
            if kind == 1:
                coord = (ref_coord - pos - 1 if rec.is_reverse
                         else ref_coord + pos)
                eg = ev_sel[ev_idx]
                sl = slice(p.event_raw_start[eg], p.event_raw_end[eg] + 1)
                scaled = (rec.raw[sl] - p.shift) / p.scale
                if coord not in positions:
                    positions[coord] = (ri + pos, [])
                    order.append(coord)
                positions[coord][1].extend(scaled.tolist())
            ev_idx += 1
        read_head = first + last_m_ev + 1
        ri += last_m_ref + 1
    return positions, order


@pytest.mark.slow
@pytest.mark.parametrize("reverse", [False, True],
                         ids=["forward", "reverse"])
def test_strict_mode_matches_oracle_eventalign(models, reverse):
    cfg = DNA_R10
    src = SimulatedSource(models, cfg, n_reads=2, length=1500, seed=300,
                          reverse=reverse)
    prepped = prepare_reads(list(src), models, cfg)
    results = run_eventalign(prepped, models, cfg, strict=True)
    checked = 0
    for p in prepped:
        if not p.passed:
            continue
        res = results[p.record.read_id]
        if not res.qc_passed:
            continue
        want_pos, want_order = oracle_eventalign(p, models, cfg)
        got = res.positions
        # identical position sets in identical order
        assert got.coord.tolist() == want_order, (
            f"coord order mismatch: {len(got.coord)} vs {len(want_order)}")
        for i, c in enumerate(got.coord):
            ks, samples = want_pos[int(c)]
            assert int(got.kmer_start[i]) == ks
            assert int(got.n_signals[i]) == len(samples)
            n = min(len(samples), 20)
            np.testing.assert_allclose(got.signal[i, :n], samples[:n],
                                       rtol=1e-5)
        checked += 1
    assert checked >= 1


def test_strict_flat_rounds_match_plane_rounds(models, monkeypatch):
    """The upload-lean strict dispatch (batch-flat f32 obs + offset-only
    rounds, DNASCENT_STRICT_FLAT=1 default) must reproduce the plane-upload
    dispatch's AlignedPositions exactly — it reorganises transfers, not
    math."""
    cfg = DNA_R10
    src = list(SimulatedSource(models, cfg, n_reads=3, length=1800,
                               seed=77))
    prepped = prepare_reads(src, models, cfg)

    def run(flag):
        monkeypatch.setenv("DNASCENT_STRICT_FLAT", flag)
        res = run_eventalign(prepped, models, cfg, strict=True)
        out = {}
        for rid, r in res.items():
            if r.positions is not None:
                out[rid] = (r.positions.coord.copy(),
                            r.positions.kmer_start.copy(),
                            r.positions.n_signals.copy())
        return out

    flat = run("1")
    plane = run("0")
    assert flat.keys() == plane.keys() and flat
    for rid in flat:
        for a, b in zip(flat[rid], plane[rid]):
            np.testing.assert_array_equal(a, b)
