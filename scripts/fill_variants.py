#!/usr/bin/env python
"""Timing experiments for the Pallas banded-fill kernel: variants that
isolate suspected per-step costs (outputs of the variants are GARBAGE —
timing only).  Also sweeps the backtrace-chase unroll.

Usage: python scripts/fill_variants.py
"""

import functools
import time

import numpy as np

from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dnascent_tpu import config as dcfg
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.ops import banded
from dnascent_tpu.ops import banded_pallas as bp
from dnascent_tpu.pipeline.eventalign import _device_model_table

cfg = dcfg.DNA_R10
models = synthetic_model_set(cfg)
rng = np.random.default_rng(0)

B, E, K = 16, 12288, 12288
ev = rng.normal(90, 10, size=(B, E)).astype(np.float16)
codes = rng.integers(0, 4, size=(B, K + 8)).astype(np.uint8)
n_ev = np.full(B, E - 100, np.int32)
n_km = np.full(B, K - 100, np.int32)
tbl = _device_model_table(models)
d_ev, d_codes = jnp.asarray(ev), jnp.asarray(codes)
d_nev, d_nkm = jnp.asarray(n_ev), jnp.asarray(n_km)


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    return np.asarray(leaves[0]).ravel()[:1]


def bench(tag, fn, reps=5):
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _sync(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{tag:44s} {dt*1000:9.2f} ms", flush=True)
    return dt


def run_variant(tag, *, rev_off=False, flush=8, notrim=False,
                no_rights=False, no_trace=False, i32_out=False):
    """Clone of banded_fill_pallas with switches; outputs garbage when any
    switch is on — used only to attribute per-step cost."""
    orig_kernel = bp._kernel
    orig_flush = bp.FLUSH

    def kernel(coef_ref, ev_ref, revmat_ref, readvec_ref,
               trace_ref, rights_ref, best_score_ref, best_event_ref,
               prev1, prev2, win_coef, win_ev, e0v_s, k0v_s, rp_s,
               best_s, best_e, *, B, W, lp_skip, lp_trim, Kp, Ep, n_steps):
        step = pl.program_id(0)
        offs = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        half = W // 2

        @pl.when(step == 0)
        def _init():
            lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
            prev2[:] = jnp.where(lane == half, jnp.float32(0.0), bp.NEG)
            prev1[:] = jnp.where(lane == half, jnp.float32(lp_trim), bp.NEG)
            e0v_s[:] = jnp.full((B, 1), half, jnp.int32)
            k0v_s[:] = jnp.full((B, 1), -1 - half, jnp.int32)
            rp_s[:] = jnp.zeros((B, 1), jnp.int32)
            best_s[:] = jnp.full((B, 1), bp.NEG)
            best_e[:] = jnp.zeros((B, 1), jnp.int32)

        @pl.when(step % bp.REFILL_STEPS == 0)
        def _refill():
            e0 = e0v_s[:]
            k0 = k0v_s[:]
            for b in range(B):
                k0_b = k0[b, 0]
                e0_b = e0[b, 0]
                ks = jnp.clip(k0_b + W, 0, Kp - 384)
                es = jnp.clip(e0_b + 1, 0, Ep - 384)
                kbase = pl.multiple_of((ks // 128) * 128, 128)
                ebase = pl.multiple_of((es // 128) * 128, 128)
                krem = ks - kbase
                erem = es - ebase
                for c in range(3):
                    sl = coef_ref[c * B + b : c * B + b + 1, pl.ds(kbase, 384)]
                    rot = pltpu.roll(sl, 384 - krem, 1)
                    win_coef[c * B + b : c * B + b + 1, :] = rot[:, :bp.WIN]
                sl = ev_ref[b : b + 1, pl.ds(ebase, 384)]
                rot = pltpu.roll(sl, 384 - erem, 1)
                win_ev[b : b + 1, :] = rot[:, :bp.WIN]

        trace_acc = jnp.zeros((B, W), dtype=jnp.int32)
        rights_acc = jnp.zeros((B, 1), dtype=jnp.int32)
        bs = best_s[:]
        be = best_e[:]
        e0v = e0v_s[:]
        k0v = k0v_s[:]
        rp = rp_s[:]
        lp_stay_v = readvec_ref[:, 0:1]
        lp_step_v = readvec_ref[:, 1:2]
        n_ev_v = readvec_ref[:, 2:3].astype(jnp.int32)
        n_km_v = readvec_ref[:, 3:4].astype(jnp.int32)

        wc = win_coef[:]
        we = win_ev[:]
        p1 = prev1[:]
        p2 = prev2[:]

        def shift_left_lane(x):
            return jnp.concatenate(
                [x[:, 1:], jnp.zeros((x.shape[0], 1), x.dtype)], axis=1)

        for j in range(4):
            band_idx = step * 4 + j + 2
            ll = p1[:, 0:1]
            ur = p1[:, W - 1 : W]
            both_ob = (ll == bp.NEG) & (ur == bp.NEG)
            right_i = jnp.where(both_ob, band_idx % 2,
                                (ll < ur).astype(jnp.int32))
            rb = right_i == 1

            e0v = e0v + (1 - right_i)
            k0v = k0v + right_i

            rb3 = jnp.concatenate([rb, rb, rb], axis=0)
            wc = jnp.where(rb3, shift_left_lane(wc), wc)
            we = jnp.where(rb, we, shift_left_lane(we))

            cA = wc[0 * B : 1 * B, :W]
            cB = wc[1 * B : 2 * B, :W]
            cC = wc[2 * B : 3 * B, :W]
            if rev_off:
                ev_ = we[:, :W]
            else:
                ev_ = jax.lax.dot_general(we[:, :W], revmat_ref[:],
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)

            def shift_up(p):
                return jnp.concatenate([p[:, 1:], jnp.full((B, 1), bp.NEG)],
                                       axis=1)

            def shift_down(p):
                return jnp.concatenate([jnp.full((B, 1), bp.NEG), p[:, :-1]],
                                       axis=1)

            up = jnp.where(rb, shift_up(p1), p1)
            left = jnp.where(rb, p1, shift_down(p1))
            ddv = right_i + rp
            diag = jnp.where(ddv == 0, shift_down(p2),
                             jnp.where(ddv == 1, p2, shift_up(p2)))
            rp = right_i

            em = cA + cB * ev_ + cC * ev_ * ev_
            score_d = diag + lp_step_v + em
            score_u = up + lp_stay_v + em
            score_l = left + np.float32(lp_skip)
            max_du = jnp.maximum(score_d, score_u)
            from_du = jnp.where(max_du == score_u, bp.FROM_U, bp.FROM_D)
            max_all = jnp.maximum(max_du, score_l)
            frm = jnp.where(max_all == score_l, bp.FROM_L, from_du)

            e = e0v - offs
            k = k0v + offs
            valid = (e >= 0) & (e < n_ev_v) & (k >= 0) & (k < n_km_v)
            band = jnp.where(valid, max_all, bp.NEG)
            frm = jnp.where(valid, frm, 0)

            if not notrim:
                ot = -1 - k0v
                e_trim = e0v - ot
                trim_ok = (ot >= 0) & (ot < W) & (e_trim >= 0) & (e_trim < n_ev_v)
                is_trim = (offs == ot) & trim_ok
                band = jnp.where(
                    is_trim,
                    np.float32(lp_trim) * (e_trim.astype(jnp.float32) + 1.0),
                    band)
                frm = jnp.where(is_trim, bp.FROM_U, frm)

            p2 = p1
            p1 = band
            trace_acc = trace_acc | (frm << (2 * j))
            rights_acc = rights_acc | (right_i << j)

            if not notrim:
                o_fin = (n_km_v - 1) - k0v
                e_fin = e0v - o_fin
                ok = ((o_fin >= 0) & (o_fin < W) & (e_fin >= 0)
                      & (e_fin < n_ev_v))
                fin_val = jnp.max(jnp.where(offs == o_fin, band, bp.NEG),
                                  axis=1, keepdims=True)
                cand = fin_val + (n_ev_v - e_fin).astype(jnp.float32) \
                    * np.float32(lp_trim)
                better = ok & (cand > bs)
                bs = jnp.where(better, cand, bs)
                be = jnp.where(better, e_fin, be)

        prev2[:] = p2
        prev1[:] = p1
        win_coef[:] = wc
        win_ev[:] = we
        e0v_s[:] = e0v
        k0v_s[:] = k0v
        rp_s[:] = rp
        best_s[:] = bs
        best_e[:] = be
        if not no_trace:
            trace_ref[step % flush] = trace_acc.astype(jnp.uint8)
        if not no_rights:
            rights_ref[step % flush] = rights_acc.astype(jnp.uint8
                                                         ).reshape(1, B)

        @pl.when(step == n_steps - 1)
        def _final():
            best_score_ref[:] = bs.reshape(1, B)
            best_event_ref[:] = be.reshape(1, B)

    bp._kernel = kernel
    bp.FLUSH = flush
    try:
        fill = jax.jit(functools.partial(
            bp.banded_fill_pallas_from_codes_jit.__wrapped__,
            bandwidth=cfg.banded.bandwidth,
            epsilon_skip=cfg.banded.epsilon_skip, p_trim=cfg.banded.p_trim))
        bench(tag, lambda: fill(d_ev, d_codes, tbl, d_nev, d_nkm))
    finally:
        bp._kernel = orig_kernel
        bp.FLUSH = orig_flush


def run_bands8(tag):
    """Timing prototype: 8 bands per grid step, two trace rows per step.
    Same math per band as the production kernel; packing layout differs
    only in row interleave (logical semantics preserved for the chase)."""
    orig_fill = bp.banded_fill_pallas

    def fill8(scaled_events, mu, inv_sigma, lp_const, n_events, n_kmers,
              bandwidth=100, epsilon_skip=1e-30, p_trim=0.01):
        B0, E_ = scaled_events.shape
        Bpad = (-B0) % 8
        if Bpad:
            zf = lambda x, fill=0.0: jnp.pad(x, ((0, Bpad), (0, 0)),
                                             constant_values=fill)
            scaled_events = zf(scaled_events)
            mu = zf(mu)
            inv_sigma = zf(inv_sigma, 1.0)
            lp_const = zf(lp_const)
            n_events = jnp.pad(n_events, (0, Bpad), constant_values=2)
            n_kmers = jnp.pad(n_kmers, (0, Bpad), constant_values=2)
        Bk = B0 + Bpad
        K_ = mu.shape[1]
        W = bandwidth
        REFILL = 16  # grid steps; 8 bands each -> 128 bands per refill
        assert W + 8 * REFILL <= bp.WIN
        n_bands = E_ + K_ + 2
        n_grid = (n_bands - 2 + 7) // 8
        FL = 8

        fE = n_events.astype(jnp.float32)
        fK = n_kmers.astype(jnp.float32)
        p_stay = 1.0 - (1.0 / (fE / fK + 1.0))
        lp_stay = jnp.log(p_stay).astype(jnp.float32)
        lp_step = jnp.log1p(-(jnp.float32(epsilon_skip) + p_stay)
                            ).astype(jnp.float32)
        lp_skip = float(np.log(epsilon_skip))
        lp_trim = float(np.log(p_trim))
        inv2 = inv_sigma * inv_sigma
        cC_ = (-0.5 * inv2).astype(jnp.float32)
        cB_ = (mu * inv2).astype(jnp.float32)
        cA_ = (lp_const - 0.5 * (mu * inv_sigma) ** 2).astype(jnp.float32)

        def _round_up(v, m):
            return ((v + m - 1) // m) * m

        Kp = _round_up(K_ + W + 384 + 8 * REFILL + 8, 128)
        Ep = _round_up(E_ + W + 384 + 8 * REFILL + 8, 128)

        def _pad_to(x, total, fill=0.0):
            return jnp.pad(x, ((0, 0), (W, total - x.shape[-1] - W)),
                           constant_values=fill)

        coef = jnp.concatenate([
            _pad_to(cA_, Kp, bp.NEG),
            _pad_to(cB_, Kp),
            _pad_to(cC_, Kp),
        ], axis=0)
        ev_p = _pad_to(scaled_events.astype(jnp.float32), Ep)

        def kernel(coef_ref, ev_ref, revmat_ref, readvec_ref,
                   trace_ref, rights_ref, best_score_ref, best_event_ref,
                   prev1, prev2, win_coef, win_ev, e0v_s, k0v_s, rp_s,
                   best_s, best_e):
            step = pl.program_id(0)
            offs = jax.lax.broadcasted_iota(jnp.int32, (Bk, W), 1)
            half = W // 2

            @pl.when(step == 0)
            def _init():
                lane = jax.lax.broadcasted_iota(jnp.int32, (Bk, W), 1)
                prev2[:] = jnp.where(lane == half, jnp.float32(0.0), bp.NEG)
                prev1[:] = jnp.where(lane == half, jnp.float32(lp_trim),
                                     bp.NEG)
                e0v_s[:] = jnp.full((Bk, 1), half, jnp.int32)
                k0v_s[:] = jnp.full((Bk, 1), -1 - half, jnp.int32)
                rp_s[:] = jnp.zeros((Bk, 1), jnp.int32)
                best_s[:] = jnp.full((Bk, 1), bp.NEG)
                best_e[:] = jnp.zeros((Bk, 1), jnp.int32)

            @pl.when(step % REFILL == 0)
            def _refill():
                e0 = e0v_s[:]
                k0 = k0v_s[:]
                for b in range(Bk):
                    k0_b = k0[b, 0]
                    e0_b = e0[b, 0]
                    ks = jnp.clip(k0_b + W, 0, Kp - 384)
                    es = jnp.clip(e0_b + 1, 0, Ep - 384)
                    kbase = pl.multiple_of((ks // 128) * 128, 128)
                    ebase = pl.multiple_of((es // 128) * 128, 128)
                    krem = ks - kbase
                    erem = es - ebase
                    for c in range(3):
                        sl = coef_ref[c * Bk + b : c * Bk + b + 1,
                                      pl.ds(kbase, 384)]
                        rot = pltpu.roll(sl, 384 - krem, 1)
                        win_coef[c * Bk + b : c * Bk + b + 1, :] = \
                            rot[:, :bp.WIN]
                    sl = ev_ref[b : b + 1, pl.ds(ebase, 384)]
                    rot = pltpu.roll(sl, 384 - erem, 1)
                    win_ev[b : b + 1, :] = rot[:, :bp.WIN]

            acc0 = jnp.zeros((Bk, W), dtype=jnp.int32)
            acc1 = jnp.zeros((Bk, W), dtype=jnp.int32)
            racc = jnp.zeros((Bk, 1), dtype=jnp.int32)
            bs = best_s[:]
            be = best_e[:]
            e0v = e0v_s[:]
            k0v = k0v_s[:]
            rp = rp_s[:]
            lp_stay_v = readvec_ref[:, 0:1]
            lp_step_v = readvec_ref[:, 1:2]
            n_ev_v = readvec_ref[:, 2:3].astype(jnp.int32)
            n_km_v = readvec_ref[:, 3:4].astype(jnp.int32)
            wc = win_coef[:]
            we = win_ev[:]
            p1 = prev1[:]
            p2 = prev2[:]

            def shift_left_lane(x):
                return jnp.concatenate(
                    [x[:, 1:], jnp.zeros((x.shape[0], 1), x.dtype)], axis=1)

            for j in range(8):
                band_idx = step * 8 + j + 2
                ll = p1[:, 0:1]
                ur = p1[:, W - 1 : W]
                both_ob = (ll == bp.NEG) & (ur == bp.NEG)
                right_i = jnp.where(both_ob, band_idx % 2,
                                    (ll < ur).astype(jnp.int32))
                rb = right_i == 1
                e0v = e0v + (1 - right_i)
                k0v = k0v + right_i
                rb3 = jnp.concatenate([rb, rb, rb], axis=0)
                wc = jnp.where(rb3, shift_left_lane(wc), wc)
                we = jnp.where(rb, we, shift_left_lane(we))
                cA = wc[0 * Bk : 1 * Bk, :W]
                cB = wc[1 * Bk : 2 * Bk, :W]
                cC = wc[2 * Bk : 3 * Bk, :W]
                ev_ = jax.lax.dot_general(we[:, :W], revmat_ref[:],
                                          (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.float32)

                def shift_up(p):
                    return jnp.concatenate(
                        [p[:, 1:], jnp.full((Bk, 1), bp.NEG)], axis=1)

                def shift_down(p):
                    return jnp.concatenate(
                        [jnp.full((Bk, 1), bp.NEG), p[:, :-1]], axis=1)

                up = jnp.where(rb, shift_up(p1), p1)
                left = jnp.where(rb, p1, shift_down(p1))
                ddv = right_i + rp
                diag = jnp.where(ddv == 0, shift_down(p2),
                                 jnp.where(ddv == 1, p2, shift_up(p2)))
                rp = right_i
                em = cA + cB * ev_ + cC * ev_ * ev_
                score_d = diag + lp_step_v + em
                score_u = up + lp_stay_v + em
                score_l = left + np.float32(lp_skip)
                max_du = jnp.maximum(score_d, score_u)
                from_du = jnp.where(max_du == score_u, bp.FROM_U, bp.FROM_D)
                max_all = jnp.maximum(max_du, score_l)
                frm = jnp.where(max_all == score_l, bp.FROM_L, from_du)
                e = e0v - offs
                k = k0v + offs
                valid = (e >= 0) & (e < n_ev_v) & (k >= 0) & (k < n_km_v)
                band = jnp.where(valid, max_all, bp.NEG)
                frm = jnp.where(valid, frm, 0)
                ot = -1 - k0v
                e_trim = e0v - ot
                trim_ok = ((ot >= 0) & (ot < W) & (e_trim >= 0)
                           & (e_trim < n_ev_v))
                is_trim = (offs == ot) & trim_ok
                band = jnp.where(
                    is_trim,
                    np.float32(lp_trim) * (e_trim.astype(jnp.float32) + 1.0),
                    band)
                frm = jnp.where(is_trim, bp.FROM_U, frm)
                p2 = p1
                p1 = band
                if j < 4:
                    acc0 = acc0 | (frm << (2 * j))
                else:
                    acc1 = acc1 | (frm << (2 * (j - 4)))
                racc = racc | (right_i << j)
                o_fin = (n_km_v - 1) - k0v
                e_fin = e0v - o_fin
                ok = ((o_fin >= 0) & (o_fin < W) & (e_fin >= 0)
                      & (e_fin < n_ev_v))
                fin_val = jnp.max(jnp.where(offs == o_fin, band, bp.NEG),
                                  axis=1, keepdims=True)
                cand = fin_val + (n_ev_v - e_fin).astype(jnp.float32) \
                    * np.float32(lp_trim)
                better = ok & (cand > bs)
                bs = jnp.where(better, cand, bs)
                be = jnp.where(better, e_fin, be)

            prev2[:] = p2
            prev1[:] = p1
            win_coef[:] = wc
            win_ev[:] = we
            e0v_s[:] = e0v
            k0v_s[:] = k0v
            rp_s[:] = rp
            best_s[:] = bs
            best_e[:] = be
            r = step % FL
            trace_ref[2 * r] = acc0.astype(jnp.uint8)
            trace_ref[2 * r + 1] = acc1.astype(jnp.uint8)
            rights_ref[2 * r] = (racc & 15).astype(jnp.uint8).reshape(1, Bk)
            rights_ref[2 * r + 1] = (racc >> 4).astype(jnp.uint8
                                                       ).reshape(1, Bk)

            @pl.when(step == n_grid - 1)
            def _final():
                best_score_ref[:] = bs.reshape(1, Bk)
                best_event_ref[:] = be.reshape(1, Bk)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(n_grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((2 * FL, Bk, W), lambda i, *_: (i // FL, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * FL, 1, Bk), lambda i, *_: (i // FL, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bk), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Bk), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((Bk, W), jnp.float32),
                pltpu.VMEM((Bk, W), jnp.float32),
                pltpu.VMEM((3 * Bk, bp.WIN), jnp.float32),
                pltpu.VMEM((Bk, bp.WIN), jnp.float32),
                pltpu.VMEM((Bk, 1), jnp.int32),
                pltpu.VMEM((Bk, 1), jnp.int32),
                pltpu.VMEM((Bk, 1), jnp.int32),
                pltpu.VMEM((Bk, 1), jnp.float32),
                pltpu.VMEM((Bk, 1), jnp.int32),
            ],
        )
        readvec = jnp.stack(
            [lp_stay, lp_step, n_events.astype(jnp.float32),
             n_kmers.astype(jnp.float32)], axis=1)
        n_rows = _round_up(2 * n_grid, 2 * FL)
        trace, rights, best_score, best_event = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_rows, Bk, W), jnp.uint8),
                jax.ShapeDtypeStruct((n_rows, 1, Bk), jnp.uint8),
                jax.ShapeDtypeStruct((1, Bk), jnp.float32),
                jax.ShapeDtypeStruct((1, Bk), jnp.int32),
            ),
        )(coef, ev_p, jnp.asarray(np.eye(W, dtype=np.float32)[::-1]),
          readvec)
        n_steps4 = (n_bands - 2 + 3) // 4
        return (trace[:n_steps4, :B0, :], rights[:n_steps4, 0, :B0],
                best_event[0, :B0], best_score[0, :B0])

    bp.banded_fill_pallas = fill8
    try:
        fill = jax.jit(functools.partial(
            bp.banded_fill_pallas_from_codes_jit.__wrapped__,
            bandwidth=cfg.banded.bandwidth,
            epsilon_skip=cfg.banded.epsilon_skip, p_trim=cfg.banded.p_trim))
        out8 = fill(d_ev, d_codes, tbl, d_nev, d_nkm)
        bench(tag, lambda: fill(d_ev, d_codes, tbl, d_nev, d_nkm))
    finally:
        bp.banded_fill_pallas = orig_fill
    return out8


run_variant("V0 baseline clone (valid)")
run_variant("V9 no rights store (garbage)", no_rights=True)
run_variant("V10 no trace+rights store (garbage)", no_trace=True,
            no_rights=True)

SKIP_CHASE = True
# --- chase unroll sweep ---
fill0 = lambda: bp.banded_fill_pallas_from_codes_jit(
    d_ev, d_codes, tbl, d_nev, d_nkm, bandwidth=cfg.banded.bandwidth,
    epsilon_skip=cfg.banded.epsilon_skip, p_trim=cfg.banded.p_trim)
tp, rp_, best_e, _ = fill0()
_sync((tp,))
import os
for u in ([] if SKIP_CHASE else [8]):
    os.environ["DNASCENT_BT_UNROLL"] = str(u)
    bench(f"chase unroll={u}",
          lambda: banded.backtrace_moves_device(
              tp, rp_, jnp.asarray(best_e), d_nkm,
              bandwidth=cfg.banded.bandwidth))
