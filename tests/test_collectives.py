"""Cross-host collective aggregation: gather_ordered semantics in-process,
and a real 2-process (gloo) run of the forkSense CLI asserting N-host
output equals 1-host output."""

import os
import subprocess
import sys

import numpy as np
import pytest

from dnascent_tpu.parallel.collectives import gather_ordered, window_keys


def test_gather_ordered_single_process():
    v = np.asarray([3.0, 1.0, 2.0])
    k = np.asarray([30, 10, 20], np.int64)
    np.testing.assert_array_equal(gather_ordered(v, k), [1.0, 2.0, 3.0])
    # 2-D rows ride along
    v2 = np.asarray([[3, 3], [1, 1]], np.int64)
    np.testing.assert_array_equal(
        gather_ordered(v2, np.asarray([5, 2], np.int64)),
        [[1, 1], [3, 3]])


def test_window_keys_are_globally_ordered():
    # reads with global ordinals [0, 2, 1] and 2/1/3 windows each:
    # sorting by key restores read-0 windows, then read-1's, then read-2's
    k = window_keys([0, 2, 1], [2, 1, 3])
    assert list(np.argsort(k)) == [0, 1, 3, 4, 5, 2]


def test_forksense_sharded_pass1_equals_single(cfg):
    """In-process: forksense_run with shard ordinals reassembles pass-1
    fraction vectors in global order, so 2-means input is identical."""
    from tests.test_forksense import _synthetic_read
    from dnascent_tpu.pipeline.forksense import forksense_run

    reads = [_synthetic_read(seed=i,
                             tracks=[(1000, 2200, "E"), (2300, 3500, "B")],
                             read_id=f"r{i}") for i in range(8)]
    inc_single, _ = forksense_run(reads, "EdU,BrdU", cfg)
    # a permuted shard with explicit global ordinals must give the same
    # pass-1 statistics (the window vector is re-sorted to global order)
    perm = [3, 0, 6, 1, 7, 4, 2, 5]
    inc_perm, _ = forksense_run([reads[i] for i in perm], "EdU,BrdU", cfg,
                                read_ordinals=perm)
    assert inc_perm == inc_single


_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid, nprocs, port, detect, outdir = sys.argv[1:6]
os.chdir(outdir)
from dnascent_tpu import cli
rc = cli.main(["forkSense", "-d", detect,
               "-o", os.path.join(outdir, "sharded.forkSense"),
               "--order", "EdU,BrdU", "--markForks",
               "--coordinator", f"localhost:{port}",
               "--nprocs", nprocs, "--procid", pid])
sys.exit(rc)
"""


@pytest.mark.slow
def test_forksense_two_process_gloo(tmp_path, cfg):
    """Launch the forkSense CLI in 2 cooperating jax.distributed processes
    (CPU/gloo collectives); the merged output must carry the identical
    pass-1 incorporation estimates and the identical fork calls as a
    single-process run."""
    from tests.test_forksense import _synthetic_read

    reads = []
    for i in range(12):
        reads.append(_synthetic_read(
            seed=i, tracks=[(1000, 2200, "E"), (2300, 3500, "B")],
            read_id=f"rf-{i}"))
    for i in range(12):
        reads.append(_synthetic_read(
            seed=100 + i, tracks=[(4000, 5200, "B"), (5300, 6500, "E")],
            read_id=f"lf-{i}"))
    detect_path = str(tmp_path / "synthetic.detect")
    with open(detect_path, "w") as fh:
        fh.write("#Mode CNN\n")
        for r in reads:
            fh.write(f">{r.read_id} {r.contig} {r.ref_start} {r.ref_end} "
                     f"{r.strand}\n")
            for i in range(r.coords.shape[0]):
                fh.write(f"{r.coords[i]}\t{r.edu[i]:.6f}\t{r.brdu[i]:.6f}\n")

    # single-process run (in a subprocess too, for a clean cwd)
    single_dir = tmp_path / "single"
    single_dir.mkdir()
    from dnascent_tpu import cli
    cwd = os.getcwd()
    os.chdir(single_dir)
    try:
        assert cli.main(["forkSense", "-d", detect_path,
                         "-o", str(single_dir / "single.forkSense"),
                         "--order", "EdU,BrdU", "--markForks"]) == 0
    finally:
        os.chdir(cwd)

    shard_dir = tmp_path / "sharded"
    shard_dir.mkdir()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH",
                                                             ""))
    env.pop("XLA_FLAGS", None)
    port = "12653"
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(k), "2", port, detect_path,
         str(shard_dir)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for k in range(2)]
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    def est_lines(path):
        return [l for l in open(path) if l.startswith("#EstimatedRegion")]

    def blocks(path):
        return sorted(l for l in open(path) if l and l[0] not in "#")

    merged = shard_dir / "sharded.forkSense"
    single = single_dir / "single.forkSense"
    assert merged.exists()
    # pass-1 statistics identical (the collective 2-means input is the
    # byte-identical global fraction vector)
    assert est_lines(merged) == est_lines(single)
    # per-read fork segmentation identical up to canonical ordering
    assert blocks(merged) == blocks(single)
    bed_m = shard_dir / "rightForks_DNAscent_forkSense.bed"
    bed_s = single_dir / "rightForks_DNAscent_forkSense.bed"
    assert blocks(bed_m) == blocks(bed_s)
