#!/usr/bin/env python
"""Per-callsite host<->device byte attribution for the detect pipeline.

Monkeypatches parallel.compute.put_rows/put_rep (uploads) and count_d2h
(downloads) to tag every transfer with its caller (file:line), runs a small
detect batch, and prints sorted tables of bytes by callsite plus dtype/shape
examples.  Runs fine on CPU — byte counts do not depend on the backend.
NOTE: `rep` uploads tagged once-per-process (pore-model table) amortise to
~0 in a long run; read the steady-state picture from the per-batch sites.

Usage: PYTHONPATH=. python scripts/profile_transfers.py [n_reads] [read_len]
"""

import collections
import sys
import traceback

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 16
L = int(sys.argv[2]) if len(sys.argv) > 2 else 10000

from dnascent_tpu.parallel import compute

BY_SITE = collections.Counter()
EXAMPLE = {}
CALLS = collections.Counter()


def _site():
    for fr in reversed(traceback.extract_stack()[:-2]):
        if (fr.name in ("_enqueue_d2h", "count_d2h", "_count_d2h")
                or "compute.py" in fr.filename):
            continue   # attribute to the enqueuer, not the helper
        if "dnascent_tpu" in fr.filename:
            return f"{fr.filename.split('dnascent_tpu/')[-1]}:{fr.lineno}"
    return "<?>"


_orig_rows, _orig_rep = compute.put_rows, compute.put_rep


def _wrap(orig, kind):
    def f(x):
        nbytes = int(np.prod(np.shape(x))) * x.dtype.itemsize
        site = f"{kind} {_site()}"
        BY_SITE[site] += nbytes
        CALLS[site] += 1
        EXAMPLE.setdefault(site, f"{np.shape(x)} {x.dtype}")
        return orig(x)
    return f


compute.put_rows = _wrap(_orig_rows, "rows")
compute.put_rep = _wrap(_orig_rep, "rep ")

D2H_BY_SITE = collections.Counter()
D2H_EXAMPLE = {}
D2H_CALLS = collections.Counter()
_orig_count_d2h = compute.count_d2h


def _count_d2h(*arrays):
    site = _site()
    for a in arrays:
        if hasattr(a, "dtype"):
            D2H_BY_SITE[site] += int(np.prod(a.shape)) * a.dtype.itemsize
            D2H_CALLS[site] += 1
            D2H_EXAMPLE.setdefault(site, f"{np.shape(a)} {a.dtype}")
    return _orig_count_d2h(*arrays)


compute.count_d2h = _count_d2h

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.models import cnn as cnn_mod
from dnascent_tpu.pipeline.detect import detect_reads, DetectStats
from dnascent_tpu.pipeline.source import SimulatedSource

cfg = DNA_R10
models = synthetic_model_set(cfg)
model = cnn_mod.create_model()
params = cnn_mod.default_params(model)
records = list(SimulatedSource(models, cfg, n_reads=N, length=L, seed=1234))
raw_samples = sum(r.raw.shape[0] for r in records)
stats = DetectStats()
n = sum(1 for _ in detect_reads(records, models, model, params, cfg,
                                batch_size=min(16, N), stats=stats,
                                pipeline_depth=1))

total = sum(BY_SITE.values())
print(f"\nreads={n} (fail {stats.failed})  read_len={L}  "
      f"raw_samples/read={raw_samples // N}")
print(f"total h2d: {total / 1e6:.2f} MB  ({total / N / 1e3:.1f} KB/read; "
      f"raw i16 would be {2 * raw_samples / N / 1e3:.1f} KB/read)")
print(f"{'bytes/read(KB)':>14}  {'%':>5}  {'calls':>5}  site / example")
for site, b in BY_SITE.most_common():
    print(f"{b / N / 1e3:14.1f}  {100 * b / total:5.1f}  {CALLS[site]:5d}  "
          f"{site}  {EXAMPLE[site]}")

d2h_total = sum(D2H_BY_SITE.values())
print(f"\ntotal d2h: {d2h_total / 1e6:.2f} MB  ({d2h_total / N / 1e3:.1f} "
      f"KB/read)")
print(f"{'bytes/read(KB)':>14}  {'%':>5}  {'calls':>5}  site / example")
for site, b in D2H_BY_SITE.most_common():
    print(f"{b / N / 1e3:14.1f}  {100 * b / d2h_total:5.1f}  "
          f"{D2H_CALLS[site]:5d}  {site}  {D2H_EXAMPLE[site]}")
