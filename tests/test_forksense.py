"""forkSense analysis layer on synthetic detect data with known fork
structure."""

import numpy as np
import pytest

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.pipeline import forksense as fsm


def _synthetic_read(seed, n=8000, spacing=2, tracks=None, read_id="r0"):
    """Detect-style read: coords every `spacing` bp; tracks paint analogue
    probability regions: list of (start_idx, end_idx, kind) kind in
    {'E','B'}."""
    rng = np.random.default_rng(seed)
    coords = 10000 + spacing * np.arange(n)
    edu = rng.uniform(0.0, 0.25, n)
    brdu = rng.uniform(0.0, 0.25, n)
    for s, e, kind in tracks or []:
        m = rng.random(e - s) < 0.6  # 60% positive call density in track
        if kind == "E":
            edu[s:e] = np.where(m, rng.uniform(0.6, 1.0, e - s), edu[s:e])
        else:
            brdu[s:e] = np.where(m, rng.uniform(0.6, 1.0, e - s), brdu[s:e])
    return fsm.DetectedReadData(read_id, "chr1", int(coords[0]),
                               int(coords[-1]) + 1, "fwd", coords, edu, brdu)


@pytest.fixture(scope="module")
def fork_reads():
    # right fork: EdU track then BrdU track downstream (order EdU,BrdU)
    reads = []
    for i in range(12):
        reads.append(_synthetic_read(
            seed=i, tracks=[(1000, 2200, "E"), (2300, 3500, "B")],
            read_id=f"rightfork-{i}"))
    # left fork reads: BrdU upstream of EdU
    for i in range(12):
        reads.append(_synthetic_read(
            seed=100 + i, tracks=[(4000, 5200, "B"), (5300, 6500, "E")],
            read_id=f"leftfork-{i}"))
    return reads


def test_call_fractions_and_twomeans(fork_reads):
    fs = DNA_R10.forksense
    bfr, efr = fsm.call_fractions_read(fork_reads[0].coords,
                                       fork_reads[0].edu, fork_reads[0].brdu,
                                       fs)
    assert bfr.shape[0] > 5
    inc_b, inc_e = [], []
    bs, es = [], []
    for r in fork_reads:
        b, e = fsm.call_fractions_read(r.coords, r.edu, r.brdu, fs)
        bs.append(b)
        es.append(e)
    inc = fsm.estimate_analogue_incorporation(np.concatenate(bs),
                                              np.concatenate(es), fs)
    # painted density is ~0.6
    assert 0.4 < inc.centroid_1 < 0.8   # BrdU upper centroid
    assert 0.4 < inc.centroid_2 < 0.8   # EdU upper centroid


def test_dbscan_segmentation(fork_reads):
    fs = DNA_R10.forksense
    r = fork_reads[0]
    bs, es = [], []
    for rr in fork_reads:
        b, e = fsm.call_fractions_read(rr.coords, rr.edu, rr.brdu, fs)
        bs.append(b); es.append(e)
    inc = fsm.estimate_analogue_incorporation(np.concatenate(bs),
                                              np.concatenate(es), fs)
    labs = fsm.run_dbscan(r, inc, fs)
    fsm.call_segmentation(r, *labs, fs)
    assert len(r.edu_segments) == 1
    assert len(r.brdu_segments) == 1
    e = r.edu_segments[0]
    b = r.brdu_segments[0]
    # segment bounds should roughly match painted tracks (coords = 2*idx+10000)
    assert abs(e.left_coord - (10000 + 2 * 1000)) < 600
    assert abs(e.right_coord - (10000 + 2 * 2200)) < 600
    assert abs(b.left_coord - (10000 + 2 * 2300)) < 600
    assert abs(b.right_coord - (10000 + 2 * 3500)) < 600


def test_full_forksense_run(fork_reads):
    inc, outputs = fsm.forksense_run(iter(fork_reads), "EdU,BrdU", DNA_R10,
                                     make_signatures=True)
    right = [l for o in outputs for l in o.right_forks]
    left = [l for o in outputs for l in o.left_forks]
    # each right-fork read should yield one right fork and each left-fork
    # read one left fork
    assert len(right) >= 10
    assert len(left) >= 10
    # bed format: contig lb ub readID refStart refEnd strand querySpan score
    cols = right[0].split()
    assert cols[0] == "chr1"
    assert int(cols[1]) < int(cols[2])
    assert cols[6] == "fwd"
    float(cols[8])
    # signatures have 7 extra numbers + score
    sig_cols = ([l for o in outputs for l in o.left_signatures]
                + [l for o in outputs for l in o.right_signatures])[0].split()
    assert len(sig_cols) == 7 + 8
    # main segmentation output present for partnered reads
    mains = [m for o in outputs for m in o.main]
    assert len(mains) >= 20
    first = mains[0].splitlines()
    assert first[0].startswith(">")
    assert len(first[1].split("\t")) == 3


def test_stall_scores_range(fork_reads):
    inc, outputs = fsm.forksense_run(iter(fork_reads), "EdU,BrdU", DNA_R10)
    scores = []
    for o in outputs:
        for line in o.left_forks + o.right_forks:
            scores.append(float(line.split()[8]))
    assert scores
    for s in scores:
        assert s in (-1.0, -2.0, -3.0) or 0.0 <= s <= 1.0


def test_stitch_segments():
    fs = DNA_R10.forksense
    prim = [fsm.Segment(0, 0, 1000, 10), fsm.Segment(2000, 20, 3000, 30),
            fsm.Segment(10000, 100, 11000, 110)]
    sec = []
    out = fsm.stitch_segments(prim, sec, fs)
    # first two merge (gap 1000 < 3000), third stays
    assert len(out) == 2
    assert out[0].left_coord == 0 and out[0].right_coord == 3000
    # an intervening secondary segment blocks stitching
    sec = [fsm.Segment(1200, 12, 1800, 18)]
    out = fsm.stitch_segments(prim, sec, fs)
    assert len(out) == 3
