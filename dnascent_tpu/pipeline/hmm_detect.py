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


def hmm_detect_reads(records, models: PoreModelSet,
                     cfg: SubstrateConfig = DNA_R10, stats=None,
                     batch_size: int = 32):
    """Generator of (read_id, human-readable text block) for --HMM mode."""
    hmm_probs = tuple(getattr(cfg.hmm, kk) for kk in HMM_KEY)
    window = cfg.detect.hmm_window
    k = cfg.kmer_len
    n_states = 2 * window

    def flush(batch):
        prepped = prepare_reads(batch, models, cfg)
        for p in prepped:
            rid = p.record.read_id
            if not p.passed or p.event_alignment.shape[0] == 0:
                if stats is not None:
                    stats.failed += 1
                    stats.processed += 1
                yield rid, None
                continue
            wins = _poi_windows(p, models, cfg, window)
            rec = p.record
            header = (f">{rid} {rec.contig} {rec.ref_start} {rec.ref_end} "
                      f"{rec.strand}\n")
            if not wins:
                if stats is not None:
                    stats.processed += 1
                yield rid, header
                continue
            W = len(wins)
            T = max(len(w[1]) for w in wins)
            obs = np.zeros((W, T), dtype=np.float32)
            n_obs = np.zeros(W, dtype=np.int32)
            mu_un = np.zeros((W, n_states), dtype=np.float32)
            sd_un = np.ones((W, n_states), dtype=np.float32)
            mu_an = np.zeros((W, n_states), dtype=np.float32)
            sd_an = np.ones((W, n_states), dtype=np.float32)
            ranks = np.where(p.kmer_ranks_ref < 0, 0, p.kmer_ranks_ref)
            codes = encode_bases(rec.reference_seq)
            isT = codes == 1
            hasT = np.zeros(ranks.shape[0], dtype=bool)
            for i in range(k):
                hasT |= isT[i : i + ranks.shape[0]]
            brdu_lo = window - k // 2          # detect.cpp:544
            brdu_hi = window + k // 2
            for w, (pos, ev, _pq) in enumerate(wins):
                obs[w, : len(ev)] = (ev - p.shift) / p.scale
                n_obs[w] = len(ev)
                rr = ranks[pos - window : pos - window + n_states]
                mu_un[w] = models.unlabelled_model[rr, 0]
                sd_un[w] = models.unlabelled_model[rr, 1]
                i = np.arange(n_states)
                sel = ((i >= brdu_lo) & (i <= brdu_hi)
                       & hasT[pos - window : pos - window + n_states])
                mu_an[w] = np.where(sel, models.analogue_model[rr, 0], mu_un[w])
                sd_an[w] = np.where(sel, models.analogue_model[rr, 1], sd_un[w])
            epb = np.full(W, p.events_per_base, dtype=np.float32)
            ns = np.full(W, n_states, dtype=np.int32)
            ll_an = np.asarray(forward_batch_jit(
                jnp.asarray(obs), jnp.asarray(n_obs), jnp.asarray(mu_an),
                jnp.asarray(sd_an), jnp.asarray(ns), jnp.asarray(epb),
                hmm_probs))
            ll_un = np.asarray(forward_batch_jit(
                jnp.asarray(obs), jnp.asarray(n_obs), jnp.asarray(mu_un),
                jnp.asarray(sd_un), jnp.asarray(ns), jnp.asarray(epb),
                hmm_probs))
            llr = ll_an - ll_un
            lines = [header]
            for w, (pos, _ev, pos_q) in enumerate(wins):
                kmer_ref = rec.reference_seq[pos - k // 2 : pos - k // 2 + k]
                kmer_query = rec.basecall[pos_q - k // 2 : pos_q - k // 2 + k]
                if rec.is_reverse:
                    coord = rec.ref_end - pos - 1
                    kmer_ref = reverse_complement(kmer_ref)
                    kmer_query = reverse_complement(kmer_query)
                else:
                    coord = rec.ref_start + pos
                lines.append(f"{coord}\t{llr[w]:.6f}\t{kmer_ref}"
                             f"\t{kmer_query}\n")
            if stats is not None:
                stats.processed += 1
            yield rid, "".join(lines)

    batch = []
    for rec in records:
        batch.append(rec)
        if len(batch) >= batch_size:
            yield from flush(batch)
            batch = []
    if batch:
        yield from flush(batch)
