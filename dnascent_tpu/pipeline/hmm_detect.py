"""Legacy --HMM detect path: per-thymidine log-likelihood ratios.

Re-design of ``llAcrossRead`` (reference: src/detect.cpp:381-574): POIs are
every reference T at least 2*window from the read edges; each POI scores a
±window snippet under analogue-substituted vs unmodified emission tables via
the forward algorithm.  All POI windows of a read batch run as one device
batch (ops/hmm.py) — two forward passes per window instead of the
reference's sequential per-POI CPU loops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..config import SubstrateConfig, DNA_R10
from ..io.poremodel import PoreModelSet
from ..ops.hmm import forward_batch_jit
from ..utils.seqtools import encode_bases, reverse_complement
from .prep import PreparedRead, prepare_reads
from .eventalign import HMM_KEY


def _poi_windows(p: PreparedRead, models: PoreModelSet, cfg: SubstrateConfig,
                 window: int):
    """Build all scorable POI windows for one read (detect.cpp:381-547)."""
    k = cfg.kmer_len
    rec = p.record
    seq = rec.reference_seq
    codes = encode_bases(seq)
    n = len(seq)
    pois = np.nonzero(codes[2 * window : n - 2 * window] == 1)[0] + 2 * window
    if rec.is_reverse:
        pois = pois[::-1]
    r2q = rec.ref_to_query
    pairs = p.event_alignment
    ranks = np.where(p.kmer_ranks_ref < 0, 0, p.kmer_ranks_ref)
    hasT = np.zeros(ranks.shape[0], dtype=bool)
    isT = codes == 1
    for i in range(k):
        hasT[: ranks.shape[0]] |= isT[i : i + ranks.shape[0]]

    out = []
    for pos in pois:
        lo_q = r2q[pos - window]
        hi_q = r2q[pos + window]
        snippet_codes = codes[pos - window : pos + window + k]
        if (snippet_codes < 0).any():
            continue
        j0 = np.searchsorted(pairs[:, 1], lo_q, side="left")
        j1 = np.searchsorted(pairs[:, 1], hi_q, side="left")
        if j1 <= j0:
            continue
        ev = p.event_mean[pairs[j0:j1, 0]]
        ev = ev[(ev > 0.0) & (ev < 250.0)]
        if ev.shape[0] < 2 * window - k:  # detect.cpp:510
            continue
        pos_on_query = int(r2q[pos])
        out.append((int(pos), ev, pos_on_query))
    return out


def _bucket_up(n: int, step: int) -> int:
    return max(step, ((n + step - 1) // step) * step)


def hmm_detect_reads(records, models: PoreModelSet,
                     cfg: SubstrateConfig = DNA_R10, stats=None,
                     batch_size: int = 32):
    """Generator of (read_id, human-readable text block) for --HMM mode.

    All POI windows of the whole read BATCH run as one device dispatch
    (the reference scores each POI sequentially on a CPU thread,
    detect.cpp:527-541): per-read device calls would pay one interconnect
    round trip per read.  Placements ride the active compute mesh, sharded
    on the window axis."""
    from ..parallel import compute

    hmm_probs = tuple(getattr(cfg.hmm, kk) for kk in HMM_KEY)
    window = cfg.detect.hmm_window
    k = cfg.kmer_len
    n_states = 2 * window

    def flush(batch):
        prepped = prepare_reads(batch, models, cfg)
        jobs = []          # (p, header, wins) for scorable reads
        results = {}       # rid -> text or None, in prepped order
        for p in prepped:
            rid = p.record.read_id
            if not p.passed or p.event_alignment.shape[0] == 0:
                results[rid] = None
                continue
            wins = _poi_windows(p, models, cfg, window)
            rec = p.record
            header = (f">{rid} {rec.contig} {rec.ref_start} {rec.ref_end} "
                      f"{rec.strand}\n")
            if not wins:
                results[rid] = header
                continue
            jobs.append((p, header, wins))
            results[rid] = header  # placeholder; overwritten below

        if jobs:
            n_win = sum(len(wins) for _, _, wins in jobs)
            W = compute.pad_rows(_bucket_up(n_win, 512))
            T = _bucket_up(max(len(ev) for _, _, wins in jobs
                               for _, ev, _ in wins), 64)
            obs = np.zeros((W, T), dtype=np.float32)
            n_obs = np.zeros(W, dtype=np.int32)
            mu_un = np.zeros((W, n_states), dtype=np.float32)
            sd_un = np.ones((W, n_states), dtype=np.float32)
            mu_an = np.zeros((W, n_states), dtype=np.float32)
            sd_an = np.ones((W, n_states), dtype=np.float32)
            epb = np.ones(W, dtype=np.float32)
            w = 0
            for p, _header, wins in jobs:
                rec = p.record
                ranks = np.where(p.kmer_ranks_ref < 0, 0, p.kmer_ranks_ref)
                codes = encode_bases(rec.reference_seq)
                isT = codes == 1
                hasT = np.zeros(ranks.shape[0], dtype=bool)
                for i in range(k):
                    hasT |= isT[i : i + ranks.shape[0]]
                brdu_lo = window - k // 2          # detect.cpp:544
                brdu_hi = window + k // 2
                i = np.arange(n_states)
                for pos, ev, _pq in wins:
                    obs[w, : len(ev)] = (ev - p.shift) / p.scale
                    n_obs[w] = len(ev)
                    rr = ranks[pos - window : pos - window + n_states]
                    mu_un[w] = models.unlabelled_model[rr, 0]
                    sd_un[w] = models.unlabelled_model[rr, 1]
                    sel = ((i >= brdu_lo) & (i <= brdu_hi)
                           & hasT[pos - window : pos - window + n_states])
                    mu_an[w] = np.where(sel, models.analogue_model[rr, 0],
                                        mu_un[w])
                    sd_an[w] = np.where(sel, models.analogue_model[rr, 1],
                                        sd_un[w])
                    epb[w] = p.events_per_base
                    w += 1
            ns = np.full(W, n_states, dtype=np.int32)
            # one upload per array, shared by both forward passes
            obs_d = compute.put_rows(obs)
            n_obs_d = compute.put_rows(n_obs)
            ns_d = compute.put_rows(ns)
            epb_d = compute.put_rows(epb)
            ll_an = forward_batch_jit(
                obs_d, n_obs_d, compute.put_rows(mu_an),
                compute.put_rows(sd_an), ns_d, epb_d, hmm_probs)
            ll_un = forward_batch_jit(
                obs_d, n_obs_d, compute.put_rows(mu_un),
                compute.put_rows(sd_un), ns_d, epb_d, hmm_probs)
            from .eventalign import _enqueue_d2h
            _enqueue_d2h(ll_an, ll_un)
            llr = np.asarray(ll_an) - np.asarray(ll_un)
            w = 0
            for p, header, wins in jobs:
                rec = p.record
                lines = [header]
                for pos, _ev, pos_q in wins:
                    kmer_ref = rec.reference_seq[pos - k // 2
                                                 : pos - k // 2 + k]
                    kmer_query = rec.basecall[pos_q - k // 2
                                              : pos_q - k // 2 + k]
                    if rec.is_reverse:
                        coord = rec.ref_end - pos - 1
                        kmer_ref = reverse_complement(kmer_ref)
                        kmer_query = reverse_complement(kmer_query)
                    else:
                        coord = rec.ref_start + pos
                    lines.append(f"{coord}\t{llr[w]:.6f}\t{kmer_ref}"
                                 f"\t{kmer_query}\n")
                    w += 1
                results[p.record.read_id] = "".join(lines)

        return [(p.record.read_id, results[p.record.read_id])
                for p in prepped]

    def emit(items):
        for rid, text in items:
            if stats is not None:
                stats.processed += 1
                if text is None:
                    stats.failed += 1
            yield rid, text

    # batches software-pipelined like detect_reads: neighbouring batches'
    # device waits and host numpy overlap; output stays in submission order
    # (stats are counted on the consumer side — worker threads must not
    # race the counters)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor
    depth = 10
    with ThreadPoolExecutor(max_workers=depth) as ex:
        pending: deque = deque()
        batch = []
        for rec in records:
            batch.append(rec)
            if len(batch) >= batch_size:
                pending.append(ex.submit(flush, batch))
                batch = []
                while len(pending) >= depth:
                    yield from emit(pending.popleft().result())
        if batch:
            pending.append(ex.submit(flush, batch))
        while pending:
            yield from emit(pending.popleft().result())
