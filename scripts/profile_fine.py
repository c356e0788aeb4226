#!/usr/bin/env python
"""Fine-grained substage profile of detect on the current backend.

Breaks eventalign into: state build, window build (host numpy), viterbi
dispatch (host pack + upload enqueue), viterbi collect (device block +
download), post-process (host numpy).  Breaks prep into: event detect
(native), quantile scaling, fill dispatch, backtrace collect, theil-sen.

Usage: python scripts/profile_fine.py [n_reads] [read_len]
"""

import sys
import time

import numpy as np
import jax

from dnascent_tpu.config import DNA_R10
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.models import cnn as cnn_mod
from dnascent_tpu.pipeline import eventalign as ea
from dnascent_tpu.pipeline.detect import run_cnn_batched
from dnascent_tpu.pipeline.prep import prepare_reads
from dnascent_tpu.pipeline.source import SimulatedSource


def profile_eventalign(prepped, models, cfg, tag):
    t = {}
    hmm = cfg.hmm
    hmm_probs = tuple(getattr(hmm, k) for k in ea.HMM_KEY)
    t0 = time.perf_counter()
    states = [ea._build_state(p, models, cfg)
              for p in prepped if p.passed and p.event_alignment.shape[0]]
    t["state build"] = time.perf_counter() - t0

    t_buckets = (256, 1024)
    t0 = time.perf_counter()
    all_windows = []
    ranges = []
    for st in states:
        w0 = len(all_windows)
        all_windows.extend(ea._build_all_windows(st, cfg, t_buckets[-1]))
        ranges.append((st, w0, len(all_windows)))
    t["window build"] = time.perf_counter() - t0

    order = sorted(range(len(all_windows)),
                   key=lambda i: all_windows[i].obs_scaled.shape[0])
    t0 = time.perf_counter()
    handles = []
    for c0 in range(0, len(order), 4096):
        chunk_ids = order[c0:c0 + 4096]
        chunk = [all_windows[i] for i in chunk_ids]
        handles.append((chunk_ids, ea._viterbi_windows_dispatch(
            chunk, models, cfg, hmm_probs, 72, t_buckets)))
    t["viterbi dispatch"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    results = {}
    for chunk_ids, h in handles:
        for wid, res in zip(chunk_ids, ea._viterbi_windows_collect(h)):
            results[wid] = res
    t["viterbi collect"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    for st, w0, w1 in ranges:
        ea._process_read_windows_batched(
            st, all_windows[w0:w1], [results[i] for i in range(w0, w1)], cfg)
    t["post-process"] = time.perf_counter() - t0

    total = sum(t.values())
    n_win = len(all_windows)
    tsum = sum(w.obs_scaled.shape[0] for w in all_windows)
    print(f"--- eventalign[{tag}]: {len(states)} reads, {n_win} windows, "
          f"{tsum} obs, total {total*1000:.0f} ms")
    for k, v in t.items():
        print(f"  {k:20s} {v*1000:9.1f} ms")
    # rebuild results dict into run_eventalign-compatible output
    out = {}
    for st in states:
        rid = st.p.record.read_id
        acc = st.acc
        if not acc["coord"]:
            continue

        def cat(xs, dtype):
            return np.concatenate([np.atleast_1d(np.asarray(x, dtype))
                                   for x in xs])
        n_signals = cat(acc["nsig"], np.int64)
        out[rid] = ea.EventalignResult(ea.AlignedPositions(
            coord=cat(acc["coord"], np.int64),
            kmer_start=cat(acc["kmer_start"], np.int64),
            query_idx=cat(acc["query_idx"], np.int64),
            ref_idx=cat(acc["ref_idx"], np.int64),
            core_idx=cat(acc["core"], np.int64),
            residual_idx=cat(acc["res"], np.int64),
            n_signals=n_signals,
            center_is_T=cat(acc["centerT"], bool),
            indel_score=cat(acc["indel"], np.int64),
            signal_u8_flat=np.concatenate(acc["sigflat"]),
            signal_counts=np.minimum(n_signals, 20).astype(np.uint8),
            _sig_store=ea._merge_sig_stores(acc["sigstore"]),
        ), None, True)
    return out


def main():
    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    read_len = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    cfg = DNA_R10
    models = synthetic_model_set(cfg)
    model = cnn_mod.create_model()
    params = cnn_mod.default_params(model)
    src = SimulatedSource(models, cfg, n_reads=n_reads, length=read_len,
                          seed=77)
    records = list(src)

    for tag in ("warm", "steady", "steady2"):
        t0 = time.perf_counter()
        prepped = prepare_reads(records, models, cfg)
        t_prep = time.perf_counter() - t0
        results = profile_eventalign(prepped, models, cfg, tag)
        t0 = time.perf_counter()
        probs = run_cnn_batched(model, params, results, prepped)
        t_cnn = time.perf_counter() - t0
        print(f"  prep {t_prep*1000:9.1f} ms   cnn {t_cnn*1000:9.1f} ms")


if __name__ == "__main__":
    main()
