#!/usr/bin/env python
"""Same-process back-to-back device timings of the detect pipeline's
kernels at bench shapes (tunnel drift makes cross-process timings
incomparable; these share one process and interleave nothing).

Usage: python scripts/microbench_device.py [reps]

NB (r4): sync on the SMALLEST output leaf.  The r3 version synced on the
first leaf — for the fill that is the ~10 MB trace tensor, whose download
over the ~10-30 MB/s tunnel dominated the figure (fill "~100 ms" was really
~15 ms device + ~85 ms of amortised trace download).  Device outputs that
stay device-resident in the pipeline must not be charged to the kernel.
"""

import sys
import time

import numpy as np

from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.models import reference_cnn
from dnascent_tpu.ops import banded, viterbi as vit
from dnascent_tpu.ops.banded_pallas import banded_fill_pallas_from_codes_jit
from dnascent_tpu.pipeline.eventalign import _device_model_table

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
cfg = DNA_R10
models = synthetic_model_set(cfg)
rng = np.random.default_rng(0)


def _sync(out):
    # force a real sync: download one element of the SMALLEST leaf
    # (block_until_ready can be a no-op through the axon plugin, and big
    # leaves charge their tunnel download to the kernel being timed)
    leaves = jax.tree_util.tree_leaves(out)
    smallest = min(leaves, key=lambda a: int(np.prod(a.shape)) * a.dtype.itemsize)
    return np.asarray(smallest).ravel()[:1]


def bench(tag, fn, *args, **kw):
    _sync(fn(*args, **kw))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args, **kw)
    _sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag:44s} {dt*1000:9.2f} ms", flush=True)
    return dt


# --- banded fill + chase at bench shapes (B=16, E=12288, K=12288) ---
B, E, K = 16, 12288, 12288
ev = rng.normal(90, 10, size=(B, E)).astype(np.float16)
codes = rng.integers(0, 4, size=(B, K + 8)).astype(np.uint8)
n_ev = np.full(B, E - 100, np.int32)
n_km = np.full(B, K - 100, np.int32)
tbl = _device_model_table(models)
d_ev, d_codes = jnp.asarray(ev), jnp.asarray(codes)
d_nev, d_nkm = jnp.asarray(n_ev), jnp.asarray(n_km)

fill = lambda: banded_fill_pallas_from_codes_jit(
    d_ev, d_codes, tbl, d_nev, d_nkm, bandwidth=cfg.banded.bandwidth,
    epsilon_skip=cfg.banded.epsilon_skip, p_trim=cfg.banded.p_trim)
bench(f"pallas fill (B={B}, E={E}, K={K})", fill)

from dnascent_tpu.ops.banded_pallas import banded_fill_pallas_lean_from_codes_jit
_sig0 = float(models.pore_model[0, 1])
fill_lean = lambda: banded_fill_pallas_lean_from_codes_jit(
    d_ev, d_codes, tbl, d_nev, d_nkm, inv_sigma=1.0 / _sig0,
    lp_const=float(np.log(0.3989422804014327) - np.log(_sig0)),
    bandwidth=cfg.banded.bandwidth, epsilon_skip=cfg.banded.epsilon_skip,
    p_trim=cfg.banded.p_trim)
bench(f"lean pallas fill (B={B}, E={E}, K={K})", fill_lean)

tp, rp, best_e, _ = fill()
jax.block_until_ready((tp, rp, best_e))
bench("backtrace chase (same shapes)",
      lambda: banded.backtrace_moves_device(
          tp, rp, jnp.asarray(best_e), d_nkm,
          bandwidth=cfg.banded.bandwidth))

# --- windowed viterbi at bench shapes: 3.8k windows, T=256 bucket ---
NW, T, NS = 4096, 256, 72
obs_flat = jnp.asarray(rng.normal(90, 10, size=(1 << 20,)).astype(np.float16))
ranks_flat = jnp.asarray(rng.integers(0, 4**9, size=(1 << 18,)).astype(np.int32))
lens = np.full(NW, 180, np.int32)
ostarts = (np.arange(NW, dtype=np.int32) * 200) % ((1 << 20) - 256)
rstarts = (np.arange(NW, dtype=np.int32) * 40) % ((1 << 18) - 64)
ns = np.full(NW, 42, np.int32)
epb = np.full(NW, 1.8, np.float32)
from dnascent_tpu.pipeline.eventalign import HMM_KEY
hmm_probs = tuple(getattr(cfg.hmm, k) for k in HMM_KEY)
bench(f"viterbi ({NW} windows, T={T})",
      lambda: vit.viterbi_from_flat_jit(
          obs_flat, jnp.asarray(ostarts), jnp.asarray(lens),
          jnp.asarray(rstarts), ranks_flat, tbl, jnp.asarray(ns),
          jnp.asarray(epb), hmm_probs, NS, T))

# --- reference CNN forward at bench shapes (B=16, L=12288) ---
model = reference_cnn.create_model()
params = reference_cnn.params_from_tensors(reference_cnn.synthetic_tensors(0))
Bc, L = 16, 12288
core = jnp.asarray(rng.integers(1, 1025, size=(Bc, L)).astype(np.int32))
resid = jnp.asarray(rng.integers(1, 257, size=(Bc, L)).astype(np.int32))
sig = jnp.asarray(rng.integers(0, 256,
                               size=(Bc, L, reference_cnn.RAWDEPTH)
                               ).astype(np.uint8))
fwd = jax.jit(lambda c, r, s: model.apply(params, c, r, s))
bench(f"reference CNN fwd (B={Bc}, L={L})", fwd, core, resid, sig)

# --- scaling probes: fill/chase at B=32, viterbi at 8192 windows ---
B2 = 32
ev2 = rng.normal(90, 10, size=(B2, E)).astype(np.float16)
codes2 = rng.integers(0, 4, size=(B2, K + 8)).astype(np.uint8)
n_ev2 = np.full(B2, E - 100, np.int32)
n_km2 = np.full(B2, K - 100, np.int32)
d_ev2, d_codes2 = jnp.asarray(ev2), jnp.asarray(codes2)
d_nev2, d_nkm2 = jnp.asarray(n_ev2), jnp.asarray(n_km2)
fill2 = lambda: banded_fill_pallas_from_codes_jit(
    d_ev2, d_codes2, tbl, d_nev2, d_nkm2, bandwidth=cfg.banded.bandwidth,
    epsilon_skip=cfg.banded.epsilon_skip, p_trim=cfg.banded.p_trim)
bench(f"pallas fill (B={B2}, E={E}, K={K})", fill2)
tp2, rp2, best_e2, _ = fill2()
jax.block_until_ready((tp2, rp2))
bench(f"backtrace chase (B={B2})",
      lambda: banded.backtrace_moves_device(
          tp2, rp2, jnp.asarray(best_e2), d_nkm2,
          bandwidth=cfg.banded.bandwidth))

NW2 = 8192
lens2 = np.full(NW2, 180, np.int32)
ostarts2 = (np.arange(NW2, dtype=np.int32) * 200) % ((1 << 20) - 256)
rstarts2 = (np.arange(NW2, dtype=np.int32) * 40) % ((1 << 18) - 64)
ns2 = np.full(NW2, 42, np.int32)
epb2 = np.full(NW2, 1.8, np.float32)
bench(f"viterbi ({NW2} windows, T={T})",
      lambda: vit.viterbi_from_flat_jit(
          obs_flat, jnp.asarray(ostarts2), jnp.asarray(lens2),
          jnp.asarray(rstarts2), ranks_flat, tbl, jnp.asarray(ns2),
          jnp.asarray(epb2), hmm_probs, NS, T))
