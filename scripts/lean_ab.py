#!/usr/bin/env python
"""On-chip A/B: production 3-plane Pallas fill vs the lean static-stdv fill.
Queue-amortised timing (launch REPS, sync once) per microbench_device.py."""
import sys
import time
import numpy as np

from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from dnascent_tpu import config as dcfg
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.ops import banded_pallas as bp
from dnascent_tpu.pipeline.eventalign import _device_model_table

cfg = dcfg.DNA_R10
models = synthetic_model_set(cfg)
rng = np.random.default_rng(0)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
E = K = int(sys.argv[2]) if len(sys.argv) > 2 else 12288
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 8
ev = rng.normal(90, 10, size=(B, E)).astype(np.float16)
codes = rng.integers(0, 4, size=(B, K + 8)).astype(np.uint8)
n_ev = np.full(B, E - 100, np.int32)
n_km = np.full(B, K - 100, np.int32)
tbl = _device_model_table(models)
d_ev, d_codes = jnp.asarray(ev), jnp.asarray(codes)
d_nev, d_nkm = jnp.asarray(n_ev), jnp.asarray(n_km)

sig0 = float(models.pore_model[0, 1])
inv_sigma = 1.0 / sig0
lp_const = float(np.log(0.3989422804014327) - np.log(sig0))

kw = dict(bandwidth=cfg.banded.bandwidth, epsilon_skip=cfg.banded.epsilon_skip,
          p_trim=cfg.banded.p_trim)

def prod():
    return bp.banded_fill_pallas_from_codes_jit(d_ev, d_codes, tbl, d_nev,
                                                d_nkm, **kw)

def lean():
    return bp.banded_fill_pallas_lean_from_codes_jit(
        d_ev, d_codes, tbl, d_nev, d_nkm, inv_sigma=inv_sigma,
        lp_const=lp_const, **kw)

def _sync(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[:1]

def bench(tag, fn):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag:24s} {dt*1000:9.2f} ms/call (x{REPS} amortised)", flush=True)
    return dt

a = prod(); b = lean()
tp_a, rp_a, be_a, _ = [np.asarray(x) for x in a]
tp_b, rp_b, be_b, _ = [np.asarray(x) for x in b]
print("rights equal:", np.array_equal(rp_a, rp_b),
      " trace mismatch:", float((tp_a != tp_b).mean()),
      " best_e equal:", np.array_equal(be_a, be_b), flush=True)

for _ in range(3):
    ta = bench("prod 3-plane", prod)
    tb = bench("lean static-stdv", lean)
    print(f"  lean/prod = {tb/ta:.3f}", flush=True)
