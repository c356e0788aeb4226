#!/usr/bin/env python
"""Finer-grained stage timings: banded fill device time vs transfers vs host
backtrace; viterbi device vs host window processing."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.ops import banded
from dnascent_tpu.pipeline import eventalign as ea
from dnascent_tpu.pipeline.prep import prepare_reads, _detect_and_merge
from dnascent_tpu.pipeline.source import SimulatedSource
from dnascent_tpu.utils.seqtools import kmer_ranks
from dnascent_tpu import native

cfg = DNA_R10
models = synthetic_model_set(cfg)
n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 16
read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 5000

src = SimulatedSource(models, cfg, n_reads=n_reads, length=read_len, seed=77)
records = list(src)

t0 = time.perf_counter()
ev = [_detect_and_merge(r.raw, cfg) for r in records]
print(f"event detect (native):        {1000*(time.perf_counter()-t0):8.1f} ms")

t0 = time.perf_counter()
rq = [kmer_ranks(r.basecall, 9) for r in records]
print(f"kmer ranks:                   {1000*(time.perf_counter()-t0):8.1f} ms")

# build one padded bucket
E = max(e[0].shape[0] for e in ev)
E = ((E + 2047) // 2048) * 2048
K = ((read_len + 1023) // 1024) * 1024
B = len(records)
scaled = np.zeros((B, E), dtype=np.float32)
mu = np.zeros((B, K), dtype=np.float32)
ivs = np.ones((B, K), dtype=np.float32)
lpc = np.full((B, K), -np.float32(np.inf), np.float32)
n_ev = np.zeros(B, np.int32); n_km = np.zeros(B, np.int32)
for b, r in enumerate(records):
    mean = ev[b][0]
    ranks = np.where(rq[b] < 0, 0, rq[b])
    mm = models.pore_model[ranks]
    ne, nk = mean.shape[0], ranks.shape[0]
    scaled[b, :ne] = (mean - 90.0) / 16.0
    mu[b, :nk] = mm[:, 0]
    ivs[b, :nk] = 1.0 / mm[:, 1]
    lpc[b, :nk] = np.log(0.3989422804014327) - np.log(mm[:, 1])
    n_ev[b], n_km[b] = ne, nk

args = [jnp.asarray(x) for x in (scaled, mu, ivs, lpc, n_ev, n_km)]
# compile
out = banded.banded_fill_jit(*args)
jax.block_until_ready(out)
t0 = time.perf_counter()
out = banded.banded_fill_jit(*args)
jax.block_until_ready(out)
dt = time.perf_counter() - t0
n_bands = E + K + 2
print(f"banded fill device ({B}x{E}x{K}): {1000*dt:8.1f} ms "
      f"({B * n_bands / dt / 1e6:.1f} Mbands/s)")

t0 = time.perf_counter()
tp = np.asarray(out[0]); rp = np.asarray(out[1]); be = np.asarray(out[2])
print(f"trace transfer ({tp.nbytes/1e6:.1f} MB):   {1000*(time.perf_counter()-t0):8.1f} ms")

t0 = time.perf_counter()
for b in range(B):
    ne, nk = int(n_ev[b]), int(n_km[b])
    nb = ne + nk + 2
    tr, rg = banded.unpack_trace(tp[:, b:b+1], rp[:, b:b+1], nb)
print(f"unpack_trace host:            {1000*(time.perf_counter()-t0):8.1f} ms")

t0 = time.perf_counter()
for b in range(B):
    ne, nk = int(n_ev[b]), int(n_km[b])
    nb = ne + nk + 2
    tr, rg = banded.unpack_trace(tp[:, b:b+1], rp[:, b:b+1], nb)
    q2r = np.arange(nk, dtype=np.int64)
    native.banded_backtrace(tr[:, 0], rg[:, 0].astype(np.uint8), nb, 100,
                            ne, nk, int(be[b]), ev[b][0], scaled[b, :ne],
                            mu[b, :nk], ivs[b, :nk], lpc[b, :nk], q2r,
                            np.where(rq[b] < 0, 0, rq[b]))
print(f"unpack+backtrace host:        {1000*(time.perf_counter()-t0):8.1f} ms")

# full prep + eventalign split
t0 = time.perf_counter()
prepped = prepare_reads(records, models, cfg)
print(f"prepare_reads total:          {1000*(time.perf_counter()-t0):8.1f} ms")

HMM_PROBS = tuple(getattr(cfg.hmm, k) for k in ea.HMM_KEY)
states = [ea._build_state(p, models, cfg) for p in prepped if p.passed]
t0 = time.perf_counter()
wins = []
for st in states:
    wins.extend(ea._build_all_windows(st, cfg, 1024))
print(f"window build host ({len(wins)}):     {1000*(time.perf_counter()-t0):8.1f} ms")

t0 = time.perf_counter()
res = ea._viterbi_windows(wins, models, cfg, HMM_PROBS, 72, (256, 1024))
print(f"viterbi batch (incl compile): {1000*(time.perf_counter()-t0):8.1f} ms")
t0 = time.perf_counter()
res = ea._viterbi_windows(wins, models, cfg, HMM_PROBS, 72, (256, 1024))
print(f"viterbi batch (steady):       {1000*(time.perf_counter()-t0):8.1f} ms")

t0 = time.perf_counter()
for w, (codes, ns_w) in zip(wins, res):
    ea._process_window(w, codes, ns_w, cfg, False, None,
                       update_cursor=False)
print(f"process windows host:         {1000*(time.perf_counter()-t0):8.1f} ms")
