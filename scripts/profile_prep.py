#!/usr/bin/env python
"""Split prepare_reads into its sub-phases at bench shapes."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp
from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from dnascent_tpu.config import DNA_R10
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.pipeline.prep import (prepare_reads, _detect_and_merge,
                                        _bucket, PreparedRead)
from dnascent_tpu.pipeline.source import SimulatedSource
from dnascent_tpu.ops import banded, reference as refops, scaling
from dnascent_tpu.utils.seqtools import kmer_ranks
from dnascent_tpu.pipeline.eventalign import _device_model_table

cfg = DNA_R10
models = synthetic_model_set(cfg)
n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 32
read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
records = list(SimulatedSource(models, cfg, n_reads=n_reads,
                               length=read_len, seed=1234))
prepare_reads(records, models, cfg)  # warm

for rep in range(2):
    k = cfg.kmer_len
    t0 = time.perf_counter()
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=2) as ex:
        detected = list(ex.map(lambda r: _detect_and_merge(r.raw, cfg), records))
    t_ev = time.perf_counter() - t0

    t0 = time.perf_counter()
    prepped = []
    for rec, (mean, rs, re_, et_n) in zip(records, detected):
        rq = kmer_ranks(rec.basecall, k); rr = kmer_ranks(rec.reference_seq, k)
        prepped.append(PreparedRead(rec, mean, rs, re_, et_n, rq, rr))
    live = [p for p in prepped if p.passed]
    for p in live:
        safe_rr = np.where(p.kmer_ranks_ref < 0, 0, p.kmer_ranks_ref)
        mm = models.pore_model[safe_rr, 0].astype(np.float64)
        p.shift, p.scale = refops.estimate_scaling_quantiles(
            p.event_mean, mm, cfg.scaling)
    t_q = time.perf_counter() - t0

    # fill: batch build + dispatch
    buckets = {}
    for p in live:
        key = (_bucket(p.n_events, 4096), _bucket(p.n_kmers, 4096))
        buckets.setdefault(key, []).append(p)
    bw = cfg.banded.bandwidth
    from dnascent_tpu.ops.banded_pallas import banded_fill_pallas_from_codes_jit
    from dnascent_tpu.utils.seqtools import encode_bases
    t0 = time.perf_counter()
    dispatched = []
    for (E, K), group in buckets.items():
        for c in range(0, len(group), 16):
            g = group[c:c+16]
            B = len(g)
            scaled = np.zeros((B, E), dtype=np.float32)
            codes = np.zeros((B, K + 8), dtype=np.uint8)
            n_ev = np.zeros(B, np.int32); n_km = np.zeros(B, np.int32)
            for b, p in enumerate(g):
                ne, nk = p.n_events, p.n_kmers
                scaled[b, :ne] = (p.event_mean - p.shift) / p.scale
                bc = encode_bases(p.record.basecall).astype(np.uint8)
                codes[b, :bc.shape[0]] = bc
                n_ev[b], n_km[b] = ne, nk
            tp, rp, best_e, _ = banded_fill_pallas_from_codes_jit(
                jnp.asarray(scaled.astype(np.float16)), jnp.asarray(codes),
                _device_model_table(models), jnp.asarray(n_ev), jnp.asarray(n_km),
                bandwidth=bw, epsilon_skip=cfg.banded.epsilon_skip,
                p_trim=cfg.banded.p_trim)
            packed_dev = banded.backtrace_moves_device(
                tp, rp, jnp.asarray(best_e), jnp.asarray(n_km), bandwidth=bw)
            dispatched.append((g, scaled, packed_dev, best_e))
    t_fd = time.perf_counter() - t0

    t0 = time.perf_counter()
    for g, scaled, packed_dev, best_e in dispatched:
        packed_dev.block_until_ready()
    t_fwait = time.perf_counter() - t0

    t0 = time.perf_counter()
    downs = [(np.asarray(pd), np.asarray(be)) for _, _, pd, be in dispatched]
    nbytes = sum(a.nbytes for a, _ in downs)
    t_fdl = time.perf_counter() - t0

    t0 = time.perf_counter()
    cleaned = {}
    for (g, scaled, _, _), (packed, best_e) in zip(dispatched, downs):
        for b, p in enumerate(g):
            ne, nk = p.n_events, p.n_kmers
            q2r = np.full(p.n_kmers, -1, dtype=np.int64)
            q2r_src = p.record.query_to_ref[: p.n_kmers]
            q2r[: q2r_src.shape[0]] = q2r_src
            mu_b, inv_b, lpc_b = banded.prepare_emission_coefficients(
                p.kmer_ranks_query[None, :], models.pore_model)
            pairs, cs, cr, avg_em, spanned, max_gap = banded.decode_moves_host(
                packed, b, int(best_e[b]), nk, p.event_mean,
                scaled[b, :ne], mu_b[0], inv_b[0], lpc_b[0], q2r,
                p.kmer_ranks_ref)
            p.event_alignment = pairs
            cleaned[id(p)] = (cs, cr)
    t_dec = time.perf_counter() - t0

    t0 = time.perf_counter()
    mp = cfg.scaling.theilsen_max_points
    B = len(live)
    sig = np.zeros((B, mp), np.float32); mms = np.zeros((B, mp), np.float32)
    npts = np.zeros(B, np.int32); passth = np.zeros(B, bool)
    sh = np.zeros(B, np.float32); sc = np.zeros(B, np.float32)
    for b, p in enumerate(live):
        cs, cr = cleaned[id(p)]
        sig[b], mms[b], npts[b], passth[b] = scaling.theilsen_pregather(
            cs, cr, models.pore_model, mp, cfg.scaling.theilsen_trim)
        sh[b], sc[b] = p.shift, p.scale
    new_sh, new_sc = scaling.theilsen_refine_pregathered(
        jnp.asarray(sig), jnp.asarray(mms), jnp.asarray(npts),
        jnp.asarray(passth), jnp.asarray(sh), jnp.asarray(sc), max_points=mp)
    np.asarray(new_sh)
    t_ts = time.perf_counter() - t0

    print(f"rep{rep}: events {1000*t_ev:.0f} | quantile+ranks {1000*t_q:.0f} | "
          f"fill build+disp {1000*t_fd:.0f} | fill wait {1000*t_fwait:.0f} | "
          f"moves dl ({nbytes/1e6:.2f}MB) {1000*t_fdl:.0f} | decode {1000*t_dec:.0f} | "
          f"theilsen {1000*t_ts:.0f} ms")
