#!/usr/bin/env python
"""On-chip A/B: XLA scan chase vs Pallas band-sequenced chase."""
import sys
import time
import numpy as np

from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from dnascent_tpu import config as dcfg
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.ops import banded
from dnascent_tpu.ops import banded_pallas as bp
from dnascent_tpu.pipeline.eventalign import _device_model_table

cfg = dcfg.DNA_R10
models = synthetic_model_set(cfg)
rng = np.random.default_rng(0)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
E = K = int(sys.argv[2]) if len(sys.argv) > 2 else 12288
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 20

ev = rng.normal(90, 10, size=(B, E)).astype(np.float16)
codes = rng.integers(0, 4, size=(B, K + 8)).astype(np.uint8)
n_ev = np.full(B, E - 100, np.int32)
n_km = np.full(B, K - 100, np.int32)
tbl = _device_model_table(models)
sig0 = float(models.pore_model[0, 1])
tp, rp, best_e, _ = bp.banded_fill_pallas_lean_from_codes_jit(
    jnp.asarray(ev), jnp.asarray(codes), tbl, jnp.asarray(n_ev),
    jnp.asarray(n_km), inv_sigma=1.0 / sig0,
    lp_const=float(np.log(0.3989422804014327) - np.log(sig0)),
    bandwidth=cfg.banded.bandwidth, epsilon_skip=cfg.banded.epsilon_skip,
    p_trim=cfg.banded.p_trim)
jax.block_until_ready((tp, rp, best_e))
d_nkm = jnp.asarray(n_km)
be = jnp.asarray(best_e)

def scan():
    return banded.backtrace_moves_device(tp, rp, be, d_nkm,
                                         bandwidth=cfg.banded.bandwidth)

def pallas():
    return bp.backtrace_moves_pallas_jit(tp, rp, be, d_nkm,
                                         bandwidth=cfg.banded.bandwidth)

def _sync(out):
    return np.asarray(out).ravel()[:1]

def bench(tag, fn):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag:24s} {dt*1000:9.2f} ms/call (x{REPS})", flush=True)
    return dt

# agreement (PAD-filtered move streams)
a = np.asarray(scan()); b = np.asarray(pallas())
def unpack(p, col):
    by = p[:, col].astype(np.int64)
    mv = np.stack([(by >> (2 * j)) & 3 for j in range(4)], axis=1).reshape(-1)
    return mv[mv != 3]
ok = all(np.array_equal(unpack(a, c), unpack(b, c)) for c in range(B))
print("move streams equal:", ok, flush=True)

for _ in range(3):
    ts = bench("scan chase", scan)
    tc = bench("pallas chase", pallas)
    print(f"  pallas/scan = {tc/ts:.3f}", flush=True)
