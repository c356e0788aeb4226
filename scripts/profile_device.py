#!/usr/bin/env python
"""Device-vs-host-vs-transfer split at bench shapes.

Times, for one batch: event detect (host), banded fill (device wait),
packed-move download, host move decode, Theil-Sen, viterbi device wait vs
download vs host decode, CNN device wait, post-process host.

Usage: python scripts/profile_device.py [n_reads] [read_len]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.models import cnn as cnn_mod
from dnascent_tpu.pipeline import eventalign as ea
from dnascent_tpu.pipeline.detect import run_cnn_batched
from dnascent_tpu.pipeline.prep import prepare_reads
from dnascent_tpu.pipeline.source import SimulatedSource

cfg = DNA_R10
models = synthetic_model_set(cfg)
n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 32
read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000

records = list(SimulatedSource(models, cfg, n_reads=n_reads,
                               length=read_len, seed=1234))
model = cnn_mod.create_model()
params = cnn_mod.default_params(model)

# full warmup pass (compiles everything)
prepped = prepare_reads(records, models, cfg)
results = ea.run_eventalign(prepped, models, cfg, collect_text=False)
probs = run_cnn_batched(model, params, results, prepped)

hmm = cfg.hmm
hmm_probs = tuple(getattr(hmm, k) for k in ea.HMM_KEY)


def bench_once(tag):
    print(f"--- {tag}: {n_reads} reads x {read_len} bp")
    t0 = time.perf_counter()
    prepped = prepare_reads(records, models, cfg)
    t_prep = time.perf_counter() - t0

    # eventalign stages, hand-unrolled
    t0 = time.perf_counter()
    states = [ea._build_state(p, models, cfg)
              for p in prepped if p.passed and p.event_alignment.shape[0]]
    t_state = time.perf_counter() - t0

    t_buckets = (128, 256, 512, 1024)
    t0 = time.perf_counter()
    all_windows = []
    ranges = []
    for st in states:
        w0 = len(all_windows)
        all_windows.extend(ea._build_all_windows(st, cfg, t_buckets[-1]))
        ranges.append((st, w0, len(all_windows)))
    t_wb = time.perf_counter() - t0

    # flat obs upload + dispatch (mirror run_eventalign fast path)
    t0 = time.perf_counter()
    obs_parts, base = [], 0
    for st, w0, w1 in ranges:
        if w1 > w0:
            st.flat_obs_base = base
            obs_parts.append(st.g_obs)
            base += st.g_obs.shape[0]
    obs_flat = np.zeros(ea._bucket_up(base, 1 << 17), dtype=np.float16)
    if obs_parts:
        obs_flat[:base] = np.concatenate(obs_parts)
    obs_flat_dev = jnp.asarray(obs_flat)
    shared = states[0].p.flat_ranks_device
    for st in states:
        st.rank_off = st.p.flat_ranks_offset
    obs_start_all = np.empty(len(all_windows), dtype=np.int64)
    rank_start_all = np.empty(len(all_windows), dtype=np.int64)
    for st, w0, w1 in ranges:
        for i in range(w0, w1):
            w = all_windows[i]
            obs_start_all[i] = st.flat_obs_base + w.flat_local
            rank_start_all[i] = st.rank_off + w.ref_index
    wlens = np.fromiter((w.obs_scaled.shape[0] for w in all_windows),
                        np.int64, len(all_windows))
    wbucket = np.searchsorted(np.asarray(t_buckets), wlens, side="left")
    handles = []
    for bi in range(len(t_buckets)):
        order = np.flatnonzero(wbucket == bi)
        for c0 in range(0, order.shape[0], 8192):
            cid = order[c0:c0 + 8192]
            chunk = [all_windows[i] for i in cid]
            handles.append((cid, ea._viterbi_windows_dispatch_flat(
                chunk, obs_flat_dev, shared, obs_start_all[cid],
                rank_start_all[cid], models, cfg, hmm_probs, 72, t_buckets)))
    t_disp = time.perf_counter() - t0

    # device wait: block until all outputs ready, without copying
    t0 = time.perf_counter()
    for _, h in handles:
        h[0].block_until_ready()
        h[1].block_until_ready()
    t_wait = time.perf_counter() - t0

    # downloads
    t0 = time.perf_counter()
    raws = [(np.asarray(h[0]), np.asarray(h[1])) for _, h in handles]
    t_dl = time.perf_counter() - t0
    nbytes = sum(a.nbytes + b.nbytes for a, b in raws)

    # host decode
    t0 = time.perf_counter()
    import dnascent_tpu.ops.viterbi as vit
    results = {}
    for (cid, h), (pc_raw, pl_raw) in zip(handles, raws):
        pc = vit.unpack_path_codes(pc_raw)
        L = pc.shape[1]
        for j, wid in enumerate(cid):
            results[wid] = (pc[j, L - pl_raw[j]:], int(h[2][j]))
    t_dec = time.perf_counter() - t0

    t0 = time.perf_counter()
    for st, w0, w1 in ranges:
        ea._process_read_windows_batched(
            st, all_windows[w0:w1], [results[i] for i in range(w0, w1)], cfg)
    t_post = time.perf_counter() - t0

    # finalize AlignedPositions (reuse run_eventalign tail via fresh call is
    # complex; approximate with the accumulation already done)
    res = {}
    from dnascent_tpu.pipeline.eventalign import EventalignResult, AlignedPositions, RAWDEPTH
    t0 = time.perf_counter()
    for st in states:
        rid = st.p.record.read_id
        acc = st.acc
        if not acc["coord"]:
            res[rid] = EventalignResult(None, None, False)
            continue
        n_signals = np.concatenate([np.atleast_1d(np.asarray(x, np.int64))
                                    for x in acc["nsig"]])
        pos = AlignedPositions(
            coord=np.concatenate(acc["coord"]),
            kmer_start=np.concatenate(acc["kmer_start"]),
            query_idx=np.concatenate(acc["query_idx"]),
            ref_idx=np.concatenate(acc["ref_idx"]),
            core_idx=np.concatenate(acc["core"]),
            residual_idx=np.concatenate(acc["res"]),
            n_signals=n_signals,
            center_is_T=np.concatenate(acc["centerT"]),
            indel_score=np.concatenate(acc["indel"]),
            signal_u8_flat=np.concatenate(acc["sigflat"]),
            signal_counts=np.minimum(n_signals, RAWDEPTH).astype(np.uint8),
            _sig_store=acc["sigstore"][0])
        res[rid] = EventalignResult(pos, None, True)
    t_fin = time.perf_counter() - t0

    t0 = time.perf_counter()
    probs = run_cnn_batched(model, params, res, prepped)
    t_cnn = time.perf_counter() - t0

    print(f"  prep total             {1000*t_prep:8.1f} ms")
    print(f"  ea state build         {1000*t_state:8.1f} ms")
    print(f"  ea window build        {1000*t_wb:8.1f} ms")
    print(f"  ea dispatch            {1000*t_disp:8.1f} ms")
    print(f"  ea device wait         {1000*t_wait:8.1f} ms")
    print(f"  ea download ({nbytes/1e6:5.2f} MB) {1000*t_dl:8.1f} ms")
    print(f"  ea host decode         {1000*t_dec:8.1f} ms")
    print(f"  ea post-process        {1000*t_post:8.1f} ms")
    print(f"  ea finalize            {1000*t_fin:8.1f} ms")
    print(f"  cnn (incl wait)        {1000*t_cnn:8.1f} ms")


bench_once("steady1")
bench_once("steady2")
