"""Pallas TPU kernel for the adaptive banded fill.

Same contract as ops.banded.banded_fill (the XLA scan version), built for
speed-of-light on the VPU.  Mosaic does not allow dynamic lane-offset vector
loads, so the kernel never indexes dynamically:

* sequential grid over packed 4-band steps — on TPU the grid executes in
  order on one core, so VMEM scratch carries the DP state between steps;
* each read keeps *sliding windows* over its emission coefficients and
  events: 256-lane VMEM buffers whose lane 0 tracks the band's lower-left
  corner.  A band advance shifts the window by one lane (a static shift
  selected per read), and every 128 bands the windows are re-fetched with
  per-row DMAs from HBM (arbitrary byte offsets are legal for DMA);
* emission uses the quadratic form A + B*x + C*x^2 per query k-mer; the
  three coefficient planes are stacked as (3B, 256) so one shift op slides
  them all;
* Suzuki decisions, predecessor shifts, scores, trim cells, validity masks,
  and the final-k-mer start-cell tracking are fully vectorised over (B, W);
* traceback codes pack four bands per byte, rights one bit per band —
  identical to the scan version, so the same host unpack/backtrace applies.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.float32(-np.inf)
FROM_D, FROM_U, FROM_L = 0, 1, 2
WIN = 256          # sliding window lanes
REFILL_STEPS = 32  # refill every 32 grid steps = 128 bands (<= WIN - W - 4)
FLUSH = 8          # grid steps per output-block flush (one DMA per FLUSH)
EPAD_L = 256       # lean kernel: left pad of the event plane (see _kernel_lean)


def _kernel(coef_ref, ev_ref, revmat_ref, readvec_ref,      # VMEM inputs
            trace_ref, rights_ref, best_score_ref, best_event_ref,  # outputs
            prev1, prev2, win_coef, win_ev, e0v_s, k0v_s, rp_s,
            best_s, best_e,                                 # scratch
            *, B: int, W: int, lp_skip: float, lp_trim: float,
            Kp: int, Ep: int, n_steps: int):
    step = pl.program_id(0)
    offs = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    half = W // 2

    @pl.when(step == 0)
    def _init():
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        prev2[:] = jnp.where(lane == half, jnp.float32(0.0), NEG)
        prev1[:] = jnp.where(lane == half, jnp.float32(lp_trim), NEG)
        e0v_s[:] = jnp.full((B, 1), half, jnp.int32)
        k0v_s[:] = jnp.full((B, 1), -1 - half, jnp.int32)
        rp_s[:] = jnp.zeros((B, 1), jnp.int32)
        best_s[:] = jnp.full((B, 1), NEG)
        best_e[:] = jnp.zeros((B, 1), jnp.int32)

    @pl.when(step % REFILL_STEPS == 0)
    def _refill():
        # windows are refilled from VMEM-resident inputs: a 128-aligned
        # 384-lane slice (alignment provable, so Mosaic allows the dynamic
        # offset) rotated into place with a dynamic lane rotate
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
                win_coef[c * B + b : c * B + b + 1, :] = rot[:, :WIN]
            sl = ev_ref[b : b + 1, pl.ds(ebase, 384)]
            rot = pltpu.roll(sl, 384 - erem, 1)
            win_ev[b : b + 1, :] = rot[:, :WIN]

    # accumulate packs in i32 (Mosaic lacks i8 vector shifts); cast at write
    trace_acc = jnp.zeros((B, W), dtype=jnp.int32)
    rights_acc = jnp.zeros((B, 1), dtype=jnp.int32)
    bs = best_s[:]
    be = best_e[:]
    e0v = e0v_s[:]
    k0v = k0v_s[:]
    rp = rp_s[:]
    # per-read vectors as (B, 1) VMEM loads — the previous per-step SMEM
    # scalar gathers (4 x B reads + stacks every step) were measurable at
    # ~5.6k grid steps per call
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
        both_ob = (ll == NEG) & (ur == NEG)
        # keep the decision in i32: scalar-bool -> vector-bool broadcasts hit
        # an unsupported i8->i1 truncation in Mosaic
        right_i = jnp.where(both_ob, band_idx % 2,
                            (ll < ur).astype(jnp.int32))  # (B,1) i32
        rb = right_i == 1

        e0v = e0v + (1 - right_i)
        k0v = k0v + right_i

        # slide the windows: kmer windows advance on right-moves, the event
        # window on down-moves (both by one lane)
        rb3 = jnp.concatenate([rb, rb, rb], axis=0)      # (3B,1)
        wc = jnp.where(rb3, shift_left_lane(wc), wc)
        we = jnp.where(rb, we, shift_left_lane(we))

        cA = wc[0 * B : 1 * B, :W]
        cB = wc[1 * B : 2 * B, :W]
        cC = wc[2 * B : 3 * B, :W]
        # lane reversal via an exact permutation matmul (Mosaic lacks rev):
        # ev[e0 - o] = win[W-1-o]
        ev = jax.lax.dot_general(we[:, :W], revmat_ref[:],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

        def shift_up(p):
            return jnp.concatenate([p[:, 1:], jnp.full((B, 1), NEG)], axis=1)

        def shift_down(p):
            return jnp.concatenate([jnp.full((B, 1), NEG), p[:, :-1]], axis=1)

        up = jnp.where(rb, shift_up(p1), p1)
        left = jnp.where(rb, p1, shift_down(p1))
        ddv = right_i + rp
        diag = jnp.where(ddv == 0, shift_down(p2),
                         jnp.where(ddv == 1, p2, shift_up(p2)))
        rp = right_i

        em = cA + cB * ev + cC * ev * ev
        score_d = diag + lp_step_v + em
        score_u = up + lp_stay_v + em
        score_l = left + np.float32(lp_skip)
        max_du = jnp.maximum(score_d, score_u)
        from_du = jnp.where(max_du == score_u, FROM_U, FROM_D)
        max_all = jnp.maximum(max_du, score_l)
        frm = jnp.where(max_all == score_l, FROM_L, from_du)  # i32

        e = e0v - offs
        k = k0v + offs
        valid = (e >= 0) & (e < n_ev_v) & (k >= 0) & (k < n_km_v)
        band = jnp.where(valid, max_all, NEG)
        frm = jnp.where(valid, frm, 0)

        # trim state (event_handling.cpp:255-265)
        ot = -1 - k0v
        e_trim = e0v - ot
        trim_ok = (ot >= 0) & (ot < W) & (e_trim >= 0) & (e_trim < n_ev_v)
        is_trim = (offs == ot) & trim_ok
        band = jnp.where(is_trim,
                         np.float32(lp_trim) * (e_trim.astype(jnp.float32) + 1.0),
                         band)
        frm = jnp.where(is_trim, FROM_U, frm)

        p2 = p1
        p1 = band
        trace_acc = trace_acc | (frm << (2 * j))
        rights_acc = rights_acc | (right_i << j)

        # start-cell tracking as a masked lane reduction
        # (event_handling.cpp:324-340)
        o_fin = (n_km_v - 1) - k0v
        e_fin = e0v - o_fin
        ok = ((o_fin >= 0) & (o_fin < W) & (e_fin >= 0) & (e_fin < n_ev_v))
        fin_val = jnp.max(jnp.where(offs == o_fin, band, NEG), axis=1,
                          keepdims=True)
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
    # outputs are blocked FLUSH grid steps at a time (same block index for
    # FLUSH consecutive steps), so the per-step output DMA issue cost is
    # paid once per FLUSH steps instead of twice per step
    trace_ref[step % FLUSH] = trace_acc.astype(jnp.uint8)
    rights_ref[step % FLUSH] = rights_acc.astype(jnp.uint8).reshape(1, B)

    @pl.when(step == n_steps - 1)
    def _final():
        best_score_ref[:] = bs.reshape(1, B)
        best_event_ref[:] = be.reshape(1, B)


def banded_fill_pallas(scaled_events: jnp.ndarray,   # (B, E) f32
                       mu: jnp.ndarray,              # (B, K) f32
                       inv_sigma: jnp.ndarray,       # (B, K) f32
                       lp_const: jnp.ndarray,        # (B, K) f32
                       n_events: jnp.ndarray,        # (B,) i32
                       n_kmers: jnp.ndarray,         # (B,) i32
                       bandwidth: int = 100,
                       epsilon_skip: float = 1e-30,
                       p_trim: float = 0.01):
    """Pallas drop-in for ops.banded.banded_fill (same outputs).

    The batch is padded to a multiple of 8 rows (sub-8 sublane batches hit
    Mosaic lowering gaps); padded rows are stripped from the outputs.
    """
    B0, E = scaled_events.shape
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
    B = B0 + Bpad
    K = mu.shape[1]
    W = bandwidth
    assert W + 4 * REFILL_STEPS <= WIN, "refill cadence exceeds window slack"
    n_bands = E + K + 2
    n_steps = (n_bands - 2 + 3) // 4

    fE = n_events.astype(jnp.float32)
    fK = n_kmers.astype(jnp.float32)
    p_stay = 1.0 - (1.0 / (fE / fK + 1.0))
    lp_stay = jnp.log(p_stay).astype(jnp.float32)
    lp_step = jnp.log1p(-(jnp.float32(epsilon_skip) + p_stay)).astype(jnp.float32)
    lp_skip = float(np.log(epsilon_skip))
    lp_trim = float(np.log(p_trim))

    # quadratic emission coefficients: em = A + B*x + C*x^2
    inv2 = inv_sigma * inv_sigma
    cC = (-0.5 * inv2).astype(jnp.float32)
    cB = (mu * inv2).astype(jnp.float32)
    cA = (lp_const - 0.5 * (mu * inv_sigma) ** 2).astype(jnp.float32)

    # pad: W slack left (negative k0 early on), WIN + advance slack right so
    # every clipped refill window stays in range; lanes multiple of 128
    def _round_up(v, m):
        return ((v + m - 1) // m) * m

    Kp = _round_up(K + W + 384 + 4 * REFILL_STEPS + 8, 128)
    Ep = _round_up(E + W + 384 + 4 * REFILL_STEPS + 8, 128)

    def _pad_to(x, total, fill=0.0):
        return jnp.pad(x, ((0, 0), (W, total - x.shape[-1] - W)),
                       constant_values=fill)

    coef = jnp.concatenate([
        _pad_to(cA, Kp, NEG),
        _pad_to(cB, Kp),
        _pad_to(cC, Kp),
    ], axis=0)                          # (3B, Kp) row-stacked
    ev_p = _pad_to(scaled_events, Ep)   # (B, Ep)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coef
            pl.BlockSpec(memory_space=pltpu.VMEM),  # events
            pl.BlockSpec(memory_space=pltpu.VMEM),  # reversal matrix
            pl.BlockSpec(memory_space=pltpu.VMEM),  # per-read vectors (B, 4)
        ],
        out_specs=(
            pl.BlockSpec((FLUSH, B, W), lambda i, *_: (i // FLUSH, 0, 0),
                         memory_space=pltpu.VMEM),   # trace
            pl.BlockSpec((FLUSH, 1, B), lambda i, *_: (i // FLUSH, 0, 0),
                         memory_space=pltpu.VMEM),   # rights
            pl.BlockSpec((1, B), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),   # best_score
            pl.BlockSpec((1, B), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),   # best_event
        ),
        scratch_shapes=[
            pltpu.VMEM((B, W), jnp.float32),        # prev1
            pltpu.VMEM((B, W), jnp.float32),        # prev2
            pltpu.VMEM((3 * B, WIN), jnp.float32),  # win_coef
            pltpu.VMEM((B, WIN), jnp.float32),      # win_ev
            pltpu.VMEM((B, 1), jnp.int32),          # e0v
            pltpu.VMEM((B, 1), jnp.int32),          # k0v
            pltpu.VMEM((B, 1), jnp.int32),          # right_prev
            pltpu.VMEM((B, 1), jnp.float32),        # best_s
            pltpu.VMEM((B, 1), jnp.int32),          # best_e
        ],
    )
    kernel = functools.partial(_kernel, B=B, W=W, lp_skip=lp_skip,
                               lp_trim=lp_trim, Kp=Kp, Ep=Ep,
                               n_steps=n_steps)
    readvec = jnp.stack(
        [lp_stay, lp_step, n_events.astype(jnp.float32),
         n_kmers.astype(jnp.float32)], axis=1)              # (B, 4) f32
    trace, rights, best_score, best_event = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((_round_up(n_steps, FLUSH), B, W),
                                 jnp.uint8),
            jax.ShapeDtypeStruct((_round_up(n_steps, FLUSH), 1, B),
                                 jnp.uint8),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
    )(coef, ev_p, jnp.asarray(np.eye(W, dtype=np.float32)[::-1]), readvec)
    return (trace[:n_steps, :B0, :], rights[:n_steps, 0, :B0],
            best_event[0, :B0], best_score[0, :B0])


@functools.partial(jax.jit, static_argnames=("bandwidth", "epsilon_skip",
                                             "p_trim"))
def banded_fill_pallas_jit(scaled_events, mu, inv_sigma, lp_const, n_events,
                           n_kmers, bandwidth=100, epsilon_skip=1e-30,
                           p_trim=0.01):
    return banded_fill_pallas(scaled_events, mu, inv_sigma, lp_const,
                              n_events, n_kmers, bandwidth, epsilon_skip,
                              p_trim)


def _kernel_lean(mu_ref, evr_ref, readvec_ref,          # VMEM inputs
                 trace_ref, rights_ref, best_score_ref, best_event_ref,
                 prev1, prev2, win_mu, win_ev, e0v_s, k0v_s, rp_s,
                 best_s, best_e, land_mu, land_ev, dma_sems,  # scratch
                 *, B: int, W: int, lp_skip: float, lp_trim: float,
                 h_c: float, Kp: int, Ep: int, n_steps: int,
                 hbm: bool = False):
    """Static-stdv specialisation of _kernel (the shipping pipeline's case:
    the banded aligner scores against the ONT model with stdv forced to 0.14,
    data_IO.cpp:173, so inv_sigma and lp_const are per-call scalars).

    Differences from the general kernel, each removing per-band work from the
    critical chain (the fill is per-band vector-op latency bound — r3
    measurements in CLAUDE.md):
    * ONE coefficient plane (mu) instead of three: em = h_c*(x-mu)^2 with
      h_c = -0.5*inv_sigma^2 a compile-time scalar and lp_const folded into
      the per-read lp_stay/lp_step vectors host-side.  Invalid kmers carry
      mu=+inf, which makes em exactly -inf (finite - inf squared times a
      negative scalar).
    * events are stored REVERSED in HBM (evr[j] = ev_p[Ep-1-j]) so the event
      window slides right on down-moves and the live lanes [D, D+W) are
      already in band-offset order — no per-band lane-reversal matmul.
    * validity as a lane-range mask (two compares) instead of materialising
      (e, k) planes and four compares.

    (A pl.when gate skipping start-cell tracking for provably-dead early
    bands was tried and REVERTED: four scalar branches per grid step cost
    ~11% — more than the skipped vector work was worth.)

    ``hbm=True`` leaves the mu/event planes in HBM and refills the windows
    by per-row async DMA at arbitrary offsets instead of VMEM slicing —
    VMEM residency becomes independent of read length, so any read
    (hundreds of kb to Mb) runs the fast kernel at full batch instead of
    spilling to the XLA scan (SURVEY §7.3 item 3).
    """
    step = pl.program_id(0)
    offs = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
    half = W // 2
    D = WIN - W

    @pl.when(step == 0)
    def _init():
        lane = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)
        prev2[:] = jnp.where(lane == half, jnp.float32(0.0), NEG)
        prev1[:] = jnp.where(lane == half, jnp.float32(lp_trim), NEG)
        e0v_s[:] = jnp.full((B, 1), half, jnp.int32)
        k0v_s[:] = jnp.full((B, 1), -1 - half, jnp.int32)
        rp_s[:] = jnp.zeros((B, 1), jnp.int32)
        best_s[:] = jnp.full((B, 1), NEG)
        best_e[:] = jnp.zeros((B, 1), jnp.int32)

    @pl.when(step % REFILL_STEPS == 0)
    def _refill():
        e0 = e0v_s[:]
        k0 = k0v_s[:]
        if hbm:
            # streamed planes: the HBM memref keeps the (8, 128) tiling, so
            # a DMA source slice must be 8-aligned in sublanes and
            # 128-aligned in lanes — copy the aligned 8-row block that
            # CONTAINS each read's row (at that read's lane base) into a
            # per-read landing block, then roll the read's row into its
            # window like the VMEM-resident path
            dmas = []
            rems = []
            for b in range(B):
                blk = (b // 8) * 8
                ks = jnp.clip(k0[b, 0] + W, 0, Kp - 384)
                es = jnp.clip(Ep - 1 - D - EPAD_L - e0[b, 0], 0, Ep - 384)
                kbase = pl.multiple_of((ks // 128) * 128, 128)
                ebase = pl.multiple_of((es // 128) * 128, 128)
                rems.append((ks - kbase, es - ebase))
                d1 = pltpu.make_async_copy(
                    mu_ref.at[blk : blk + 8, pl.ds(kbase, 384)],
                    land_mu.at[8 * b : 8 * b + 8, :], dma_sems.at[2 * b])
                d2 = pltpu.make_async_copy(
                    evr_ref.at[blk : blk + 8, pl.ds(ebase, 384)],
                    land_ev.at[8 * b : 8 * b + 8, :], dma_sems.at[2 * b + 1])
                d1.start()
                d2.start()
                dmas.append(d1)
                dmas.append(d2)
            for d in dmas:
                d.wait()
            for b in range(B):
                krem, erem = rems[b]
                r = 8 * b + (b % 8)
                sl = land_mu[r : r + 1, :]
                win_mu[b : b + 1, :] = pltpu.roll(sl, 384 - krem, 1)[:, :WIN]
                sl = land_ev[r : r + 1, :]
                win_ev[b : b + 1, :] = pltpu.roll(sl, 384 - erem, 1)[:, :WIN]
        else:
            for b in range(B):
                ks = jnp.clip(k0[b, 0] + W, 0, Kp - 384)
                es = jnp.clip(Ep - 1 - D - EPAD_L - e0[b, 0], 0, Ep - 384)
                kbase = pl.multiple_of((ks // 128) * 128, 128)
                ebase = pl.multiple_of((es // 128) * 128, 128)
                krem = ks - kbase
                erem = es - ebase
                sl = mu_ref[b : b + 1, pl.ds(kbase, 384)]
                win_mu[b : b + 1, :] = pltpu.roll(sl, 384 - krem, 1)[:, :WIN]
                sl = evr_ref[b : b + 1, pl.ds(ebase, 384)]
                win_ev[b : b + 1, :] = pltpu.roll(sl, 384 - erem, 1)[:, :WIN]

    trace_acc = jnp.zeros((B, W), dtype=jnp.int32)
    rights_acc = jnp.zeros((B, 1), dtype=jnp.int32)
    bs = best_s[:]
    be = best_e[:]
    e0v = e0v_s[:]
    k0v = k0v_s[:]
    rp = rp_s[:]
    # lp_const is folded into both transition vectors host-side
    lp_stay_v = readvec_ref[:, 0:1]
    lp_step_v = readvec_ref[:, 1:2]
    n_ev_v = readvec_ref[:, 2:3].astype(jnp.int32)
    n_km_v = readvec_ref[:, 3:4].astype(jnp.int32)

    wm = win_mu[:]
    we = win_ev[:]
    p1 = prev1[:]
    p2 = prev2[:]

    def shift_left_lane(x):
        return jnp.concatenate(
            [x[:, 1:], jnp.zeros((x.shape[0], 1), x.dtype)], axis=1)

    def shift_right_lane(x):
        return jnp.concatenate(
            [jnp.zeros((x.shape[0], 1), x.dtype), x[:, :-1]], axis=1)

    for j in range(4):
        band_idx = step * 4 + j + 2
        ll = p1[:, 0:1]
        ur = p1[:, W - 1 : W]
        both_ob = (ll == NEG) & (ur == NEG)
        right_i = jnp.where(both_ob, band_idx % 2,
                            (ll < ur).astype(jnp.int32))  # (B,1) i32
        rb = right_i == 1

        e0v = e0v + (1 - right_i)
        k0v = k0v + right_i

        # kmer window slides left on right-moves; the reversed event window
        # slides right on down-moves
        wm = jnp.where(rb, shift_left_lane(wm), wm)
        we = jnp.where(rb, we, shift_right_lane(we))

        t = we[:, D : D + W] - wm[:, :W]
        em = np.float32(h_c) * (t * t)

        def shift_up(p):
            return jnp.concatenate([p[:, 1:], jnp.full((B, 1), NEG)], axis=1)

        def shift_down(p):
            return jnp.concatenate([jnp.full((B, 1), NEG), p[:, :-1]], axis=1)

        up = jnp.where(rb, shift_up(p1), p1)
        left = jnp.where(rb, p1, shift_down(p1))
        ddv = right_i + rp
        diag = jnp.where(ddv == 0, shift_down(p2),
                         jnp.where(ddv == 1, p2, shift_up(p2)))
        rp = right_i

        score_d = diag + (lp_step_v + em)
        score_u = up + (lp_stay_v + em)
        score_l = left + np.float32(lp_skip)
        max_du = jnp.maximum(score_d, score_u)
        from_du = jnp.where(max_du == score_u, FROM_U, FROM_D)
        max_all = jnp.maximum(max_du, score_l)
        frm = jnp.where(max_all == score_l, FROM_L, from_du)  # i32

        # validity as a lane range: e = e0-o in [0, n_ev), k = k0+o in
        # [0, n_km)  <=>  o in [max(-k0, e0-n_ev+1), min(e0, n_km-k0-1)]
        lo = jnp.maximum(-k0v, e0v - n_ev_v + 1)
        hi = jnp.minimum(e0v, n_km_v - k0v - 1)
        valid = (offs >= lo) & (offs <= hi)
        band = jnp.where(valid, max_all, NEG)
        frm = jnp.where(valid, frm, 0)

        # trim state (event_handling.cpp:255-265)
        ot = -1 - k0v
        e_trim = e0v - ot
        trim_ok = (ot >= 0) & (ot < W) & (e_trim >= 0) & (e_trim < n_ev_v)
        is_trim = (offs == ot) & trim_ok
        band = jnp.where(is_trim,
                         np.float32(lp_trim) * (e_trim.astype(jnp.float32) + 1.0),
                         band)
        frm = jnp.where(is_trim, FROM_U, frm)

        p2 = p1
        p1 = band
        trace_acc = trace_acc | (frm << (2 * j))
        rights_acc = rights_acc | (right_i << j)

        # start-cell tracking (event_handling.cpp:324-340)
        o_fin = (n_km_v - 1) - k0v
        e_fin = e0v - o_fin
        ok = ((o_fin >= 0) & (o_fin < W) & (e_fin >= 0) & (e_fin < n_ev_v))
        fin_val = jnp.max(jnp.where(offs == o_fin, band, NEG), axis=1,
                          keepdims=True)
        cand = fin_val + (n_ev_v - e_fin).astype(jnp.float32) \
            * np.float32(lp_trim)
        better = ok & (cand > bs)
        bs = jnp.where(better, cand, bs)
        be = jnp.where(better, e_fin, be)

    prev2[:] = p2
    prev1[:] = p1
    win_mu[:] = wm
    win_ev[:] = we
    e0v_s[:] = e0v
    k0v_s[:] = k0v
    rp_s[:] = rp
    best_s[:] = bs
    best_e[:] = be
    trace_ref[step % FLUSH] = trace_acc.astype(jnp.uint8)
    rights_ref[step % FLUSH] = rights_acc.astype(jnp.uint8).reshape(1, B)

    @pl.when(step == n_steps - 1)
    def _final():
        best_score_ref[:] = bs.reshape(1, B)
        best_event_ref[:] = be.reshape(1, B)


def banded_fill_pallas_lean(scaled_events: jnp.ndarray,  # (B, E) f32
                            mu: jnp.ndarray,             # (B, K) f32, +inf=invalid
                            n_events: jnp.ndarray,       # (B,) i32
                            n_kmers: jnp.ndarray,        # (B,) i32
                            *,
                            inv_sigma: float,
                            lp_const: float,
                            bandwidth: int = 100,
                            epsilon_skip: float = 1e-30,
                            p_trim: float = 0.01,
                            hbm_stream: bool = False):
    """Static-stdv Pallas fill (same outputs as banded_fill_pallas).

    ``inv_sigma`` and ``lp_const`` are per-call Python scalars (the static
    0.14-stdv model); ``mu`` carries +inf at undefined kmers.
    ``hbm_stream`` keeps the planes in HBM and refills by DMA — VMEM use
    becomes length-independent, so arbitrarily long reads take this kernel
    instead of the XLA-scan spill.
    """
    B0, E = scaled_events.shape
    Bpad = (-B0) % 8
    if Bpad:
        scaled_events = jnp.pad(scaled_events, ((0, Bpad), (0, 0)))
        mu = jnp.pad(mu, ((0, Bpad), (0, 0)), constant_values=np.inf)
        n_events = jnp.pad(n_events, (0, Bpad), constant_values=2)
        n_kmers = jnp.pad(n_kmers, (0, Bpad), constant_values=2)
    B = B0 + Bpad
    K = mu.shape[1]
    W = bandwidth
    assert W + 4 * REFILL_STEPS <= WIN, "refill cadence exceeds window slack"
    n_bands = E + K + 2
    n_steps = (n_bands - 2 + 3) // 4

    fE = n_events.astype(jnp.float32)
    fK = n_kmers.astype(jnp.float32)
    p_stay = 1.0 - (1.0 / (fE / fK + 1.0))
    lp_stay = jnp.log(p_stay).astype(jnp.float32) + np.float32(lp_const)
    lp_step = (jnp.log1p(-(jnp.float32(epsilon_skip) + p_stay))
               .astype(jnp.float32) + np.float32(lp_const))
    lp_skip = float(np.log(epsilon_skip))
    lp_trim = float(np.log(p_trim))
    h_c = float(-0.5 * inv_sigma * inv_sigma)

    def _round_up(v, m):
        return ((v + m - 1) // m) * m

    Kp = _round_up(K + W + 384 + 4 * REFILL_STEPS + 8, 128)
    # event plane: EPAD_L lanes of left slack keep the reversed refill base
    # below the Ep-384 clip at small e0 (base = Ep-1-D-EPAD_L-e0)
    Ep = _round_up(E + 2 * EPAD_L + 128, 128)

    mu_p = jnp.pad(mu, ((0, 0), (W, Kp - K - W)), constant_values=np.inf)
    ev_p = jnp.pad(scaled_events, ((0, 0), (EPAD_L, Ep - E - EPAD_L)))
    evr_p = ev_p[:, ::-1]  # reversed once, outside the kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(memory_space=(pltpu.MemorySpace.HBM if hbm_stream
                                       else pltpu.VMEM)),  # mu plane
            pl.BlockSpec(memory_space=(pltpu.MemorySpace.HBM if hbm_stream
                                       else pltpu.VMEM)),  # reversed events
            pl.BlockSpec(memory_space=pltpu.VMEM),  # per-read vectors (B, 4)
        ],
        out_specs=(
            pl.BlockSpec((FLUSH, B, W), lambda i, *_: (i // FLUSH, 0, 0),
                         memory_space=pltpu.VMEM),   # trace
            pl.BlockSpec((FLUSH, 1, B), lambda i, *_: (i // FLUSH, 0, 0),
                         memory_space=pltpu.VMEM),   # rights
            pl.BlockSpec((1, B), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),   # best_score
            pl.BlockSpec((1, B), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),   # best_event
        ),
        scratch_shapes=[
            pltpu.VMEM((B, W), jnp.float32),        # prev1
            pltpu.VMEM((B, W), jnp.float32),        # prev2
            pltpu.VMEM((B, WIN), jnp.float32),      # win_mu
            pltpu.VMEM((B, WIN), jnp.float32),      # win_ev
            pltpu.VMEM((B, 1), jnp.int32),          # e0v
            pltpu.VMEM((B, 1), jnp.int32),          # k0v
            pltpu.VMEM((B, 1), jnp.int32),          # right_prev
            pltpu.VMEM((B, 1), jnp.float32),        # best_s
            pltpu.VMEM((B, 1), jnp.int32),          # best_e
            pltpu.VMEM((8 * B, 384), jnp.float32),  # hbm landing (mu)
            pltpu.VMEM((8 * B, 384), jnp.float32),  # hbm landing (events)
            pltpu.SemaphoreType.DMA((2 * B,)),      # hbm refill semaphores
        ],
    )
    kernel = functools.partial(_kernel_lean, B=B, W=W, lp_skip=lp_skip,
                               lp_trim=lp_trim, h_c=h_c, Kp=Kp, Ep=Ep,
                               n_steps=n_steps, hbm=hbm_stream)
    readvec = jnp.stack(
        [lp_stay, lp_step, n_events.astype(jnp.float32),
         n_kmers.astype(jnp.float32)], axis=1)              # (B, 4) f32
    trace, rights, best_score, best_event = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((_round_up(n_steps, FLUSH), B, W),
                                 jnp.uint8),
            jax.ShapeDtypeStruct((_round_up(n_steps, FLUSH), 1, B),
                                 jnp.uint8),
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, B), jnp.int32),
        ),
    )(mu_p, evr_p, readvec)
    return (trace[:n_steps, :B0, :], rights[:n_steps, 0, :B0],
            best_event[0, :B0], best_score[0, :B0])


def _lean_mu_from_codes(codes, model_table):
    from .seqcodes import ranks_from_codes
    ranks = ranks_from_codes(codes)   # always >= 0 (defaulting map)
    return model_table[ranks, 0].astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=(
    "inv_sigma", "lp_const", "bandwidth", "epsilon_skip", "p_trim"))
def banded_fill_pallas_lean_from_codes_jit(scaled_events, codes, model_table,
                                           n_events, n_kmers, *,
                                           inv_sigma, lp_const,
                                           bandwidth=100, epsilon_skip=1e-30,
                                           p_trim=0.01):
    """Upload-lean static-stdv fill: u8 base codes + the resident pore table
    on device; inv_sigma/lp_const are host-known scalars of the static-stdv
    model (all table rows share one stdv)."""
    mu = _lean_mu_from_codes(codes, model_table)
    return banded_fill_pallas_lean(
        scaled_events.astype(jnp.float32), mu, n_events, n_kmers,
        inv_sigma=inv_sigma, lp_const=lp_const, bandwidth=bandwidth,
        epsilon_skip=epsilon_skip, p_trim=p_trim)


@functools.partial(jax.jit, static_argnames=(
    "n_codes", "inv_sigma", "lp_const", "bandwidth", "epsilon_skip",
    "p_trim", "hbm_stream"))
def banded_fill_pallas_lean_from_packed_jit(scaled_events, packed, badmap,
                                            model_table, n_events, n_kmers,
                                            *, n_codes, inv_sigma, lp_const,
                                            bandwidth=100,
                                            epsilon_skip=1e-30,
                                            p_trim=0.01, hbm_stream=False):
    """Lean fill fed 2-bit packed base codes + non-ACGT bitmap (4x fewer
    sequence bytes over the tunnel than the u8 code stream)."""
    from .seqcodes import codes_from_packed
    codes = codes_from_packed(packed, badmap, n_codes)
    mu = _lean_mu_from_codes(codes, model_table)
    return banded_fill_pallas_lean(
        scaled_events.astype(jnp.float32), mu, n_events, n_kmers,
        inv_sigma=inv_sigma, lp_const=lp_const, bandwidth=bandwidth,
        epsilon_skip=epsilon_skip, p_trim=p_trim, hbm_stream=hbm_stream)


@functools.lru_cache(maxsize=None)
def _lean_packed_fill_sharded_fn(mesh, n_codes, inv_sigma, lp_const,
                                 bandwidth, epsilon_skip, p_trim,
                                 hbm_stream=False):
    from jax.sharding import PartitionSpec as P

    def inner(scaled_events, packed, badmap, model_table, n_events, n_kmers):
        from .seqcodes import codes_from_packed
        codes = codes_from_packed(packed, badmap, n_codes)
        mu = _lean_mu_from_codes(codes, model_table)
        return banded_fill_pallas_lean(
            scaled_events.astype(jnp.float32), mu, n_events, n_kmers,
            inv_sigma=inv_sigma, lp_const=lp_const, bandwidth=bandwidth,
            epsilon_skip=epsilon_skip, p_trim=p_trim,
            hbm_stream=hbm_stream)

    row2 = P("data", None)
    sm = jax.shard_map(
        inner, mesh=mesh, check_vma=False,
        in_specs=(row2, row2, row2, P(), P("data"), P("data")),
        out_specs=(P(None, "data", None), P(None, "data"), P("data"),
                   P("data")))
    return jax.jit(sm)


def banded_fill_pallas_lean_from_packed_sharded(mesh, scaled_events, packed,
                                                badmap, model_table,
                                                n_events, n_kmers, *,
                                                n_codes, inv_sigma, lp_const,
                                                bandwidth=100,
                                                epsilon_skip=1e-30,
                                                p_trim=0.01,
                                                hbm_stream=False):
    return _lean_packed_fill_sharded_fn(
        mesh, n_codes, inv_sigma, lp_const, bandwidth, epsilon_skip,
        p_trim, hbm_stream)(scaled_events, packed, badmap, model_table,
                            n_events, n_kmers)


@functools.lru_cache(maxsize=None)
def _lean_codes_fill_sharded_fn(mesh, inv_sigma, lp_const, bandwidth,
                                epsilon_skip, p_trim):
    from jax.sharding import PartitionSpec as P

    def inner(scaled_events, codes, model_table, n_events, n_kmers):
        mu = _lean_mu_from_codes(codes, model_table)
        return banded_fill_pallas_lean(
            scaled_events.astype(jnp.float32), mu, n_events, n_kmers,
            inv_sigma=inv_sigma, lp_const=lp_const, bandwidth=bandwidth,
            epsilon_skip=epsilon_skip, p_trim=p_trim)

    row2 = P("data", None)
    sm = jax.shard_map(
        inner, mesh=mesh, check_vma=False,
        in_specs=(row2, row2, P(), P("data"), P("data")),
        out_specs=(P(None, "data", None), P(None, "data"), P("data"),
                   P("data")))
    return jax.jit(sm)


def banded_fill_pallas_lean_from_codes_sharded(mesh, scaled_events, codes,
                                               model_table, n_events,
                                               n_kmers, *, inv_sigma,
                                               lp_const, bandwidth=100,
                                               epsilon_skip=1e-30,
                                               p_trim=0.01):
    """Mesh-parallel static-stdv fill: per-device Pallas via shard_map (see
    banded_fill_pallas_from_codes_sharded)."""
    return _lean_codes_fill_sharded_fn(
        mesh, inv_sigma, lp_const, bandwidth, epsilon_skip, p_trim)(
        scaled_events, codes, model_table, n_events, n_kmers)


@functools.partial(jax.jit, static_argnames=("bandwidth", "epsilon_skip",
                                             "p_trim"))
def banded_fill_pallas_from_codes_jit(scaled_events, codes, model_table,
                                      n_events, n_kmers, bandwidth=100,
                                      epsilon_skip=1e-30, p_trim=0.01):
    """Most upload-lean variant: (B, K+k-1) u8 base codes (255 = non-ACGT)
    replace the i32 rank plane — 4x fewer bytes over the tunnel; ranks are
    recomputed on device (ops/seqcodes.py)."""
    from .seqcodes import ranks_from_codes
    ranks = ranks_from_codes(codes)
    return _fill_from_ranks(scaled_events, ranks, model_table, n_events,
                            n_kmers, bandwidth, epsilon_skip, p_trim)


def _fill_from_ranks(scaled_events, ranks, model_table, n_events, n_kmers,
                     bandwidth, epsilon_skip, p_trim):
    scaled_events = scaled_events.astype(jnp.float32)
    safe = jnp.clip(ranks, 0, model_table.shape[0] - 1)
    mu = model_table[safe, 0]
    sigma = jnp.maximum(model_table[safe, 1], 1e-6)
    inv_sigma = 1.0 / sigma
    lp_const = jnp.float32(np.log(0.3989422804014327)) - jnp.log(sigma)
    lp_const = jnp.where(ranks < 0, NEG, lp_const)
    return banded_fill_pallas(scaled_events, mu, inv_sigma, lp_const,
                              n_events, n_kmers, bandwidth, epsilon_skip,
                              p_trim)


@functools.partial(jax.jit, static_argnames=("bandwidth", "epsilon_skip",
                                             "p_trim"))
def banded_fill_pallas_from_ranks_jit(scaled_events, ranks, model_table,
                                      n_events, n_kmers, bandwidth=100,
                                      epsilon_skip=1e-30, p_trim=0.01):
    """Upload-lean variant: (B,K) i32 ranks + the resident pore table replace
    the three f32 coefficient planes; scaled events may arrive f16."""
    return _fill_from_ranks(scaled_events, ranks, model_table, n_events,
                            n_kmers, bandwidth, epsilon_skip, p_trim)


@functools.lru_cache(maxsize=None)
def _codes_fill_sharded_fn(mesh, bandwidth, epsilon_skip, p_trim):
    from jax.sharding import PartitionSpec as P

    def inner(scaled_events, codes, model_table, n_events, n_kmers):
        from .seqcodes import ranks_from_codes
        ranks = ranks_from_codes(codes)
        return _fill_from_ranks(scaled_events, ranks, model_table, n_events,
                                n_kmers, bandwidth, epsilon_skip, p_trim)

    row2 = P("data", None)
    sm = jax.shard_map(
        inner, mesh=mesh, check_vma=False,
        in_specs=(row2, row2, P(), P("data"), P("data")),
        out_specs=(P(None, "data", None), P(None, "data"), P("data"),
                   P("data")))
    return jax.jit(sm)


def banded_fill_pallas_from_codes_sharded(mesh, scaled_events, codes,
                                          model_table, n_events, n_kmers,
                                          bandwidth=100, epsilon_skip=1e-30,
                                          p_trim=0.01):
    """Mesh-parallel Pallas fill: each device runs the Pallas kernel on its
    row shard via shard_map (pallas_call has no GSPMD partitioning rule, so
    a plain jit under a mesh would replicate the whole batch on every
    device).  Per-row math is identical to the single-device codes variant,
    so N-device output is bitwise equal to 1-device."""
    return _codes_fill_sharded_fn(mesh, bandwidth, epsilon_skip, p_trim)(
        scaled_events, codes, model_table, n_events, n_kmers)



# ---------------------------------------------------------------------------
# Pallas backtrace chase
# ---------------------------------------------------------------------------

CH_ROWS = 4  # packed trace rows (16 bands) per grid step


def _chase_kernel(trace_ref, rights_ref, init_ref,      # VMEM blocks/inputs
                  out_ref,                              # output block
                  st,                                   # scratch (B, 8) i32
                  *, B: int, W: int, n_blocks: int):
    """Band-sequenced backtrace walk (replaces the XLA scan chase, which
    paid per-step dispatch overhead for ~n_bands tiny steps — 53 ms at
    bench shapes vs ~5 ms here).

    The walk visits strictly decreasing band indices (every move decrements
    e and/or k), so a single global band countdown processes all reads in
    lockstep: a read emits its move when the countdown passes its current
    band (e+k+2) and a PAD code otherwise.  Unlike the scan's walk-ordered
    stream, the output is *band-ordered* with PAD gaps where a read skipped
    a band (diagonal move) or had not started yet — the decoders skip PADs,
    which preserves the move sequence exactly (bands decrease monotonically
    along the walk).

    Trace blocks stream HIGHEST band first (reversed grid index map); the
    band-lower-left event index (off = bll - e selects the lane) unwinds
    incrementally from the rights bits, so no O(n_bands x B) index plane is
    materialised.  State lives in one (B, 8) i32 scratch: columns e, k,
    bll, done.
    """
    i = pl.program_id(0)
    offs = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    @pl.when(i == 0)
    def _init():
        st[:, 0:1] = init_ref[:, 0:1]   # e = best_event
        st[:, 1:2] = init_ref[:, 1:2]   # k = n_kmers - 1
        st[:, 2:3] = init_ref[:, 2:3]   # bll at the top band
        st[:, 3:4] = init_ref[:, 3:4]   # done
        st[:, 4:8] = jnp.zeros((B, 4), jnp.int32)

    e = st[:, 0:1]
    k = st[:, 1:2]
    bll = st[:, 2:3]
    done = st[:, 3:4]

    base_sr = (n_blocks - 1 - i) * CH_ROWS
    for rl in range(CH_ROWS - 1, -1, -1):
        sr = base_sr + rl
        trow = trace_ref[rl].astype(jnp.int32)          # (B, W)
        rrow = rights_ref[rl].astype(jnp.int32)         # (B, 1)
        acc = jnp.zeros((B, 1), jnp.int32)
        for j in range(3, -1, -1):
            band = sr * 4 + j + 2
            active = (done == 0) & ((e + k + 2) == band)
            off = jnp.clip(bll - e, 0, W - 1)
            byte = jnp.sum(jnp.where(offs == off, trow, 0), axis=1,
                           keepdims=True)
            code = (byte >> (2 * j)) & 3
            is_d = active & (code == FROM_D)
            is_u = active & (code == FROM_U)
            is_l = active & (code == FROM_L)
            e = e - jnp.where(is_d | is_u, 1, 0)
            k = k - jnp.where(is_d | is_l, 1, 0)
            out_code = jnp.where(active, code, 3)
            done = jnp.where((e < 0) | (k < 0), 1, done)
            acc = acc | (out_code << (2 * (3 - j)))
            rbit = (rrow >> j) & 1
            bll = bll - (1 - rbit)
        out_ref[CH_ROWS - 1 - rl] = acc.astype(jnp.uint8)

    st[:, 0:1] = e
    st[:, 1:2] = k
    st[:, 2:3] = bll
    st[:, 3:4] = done


def backtrace_moves_pallas(trace_packed: jnp.ndarray,   # (S, B, W) u8
                           rights_packed: jnp.ndarray,  # (S, B) u8
                           best_event: jnp.ndarray,     # (B,) i32
                           n_kmers: jnp.ndarray,        # (B,) i32
                           bandwidth: int = 100):
    """Pallas drop-in for ops.banded.backtrace_moves_device.  Output is the
    band-ordered packed move stream (PAD-gapped; decoders skip PADs), shape
    (ceil(S/CH_ROWS)*CH_ROWS, B) u8 — same consumers as the scan version."""
    S, B0, W = trace_packed.shape
    half = bandwidth // 2
    Bpad = (-B0) % 8
    if Bpad:
        trace_packed = jnp.pad(trace_packed, ((0, 0), (0, Bpad), (0, 0)))
        rights_packed = jnp.pad(rights_packed, ((0, 0), (0, Bpad)))
        best_event = jnp.pad(best_event, (0, Bpad), constant_values=-1)
        n_kmers = jnp.pad(n_kmers, (0, Bpad))
    B = B0 + Bpad
    Sp = -(-S // CH_ROWS) * CH_ROWS
    if Sp != S:
        # padded high bands: no read starts there (start band <= n_bands-1
        # <= 4S+1); zero rights rows count as downs in the bll unwind and
        # in bll_top below, so the two stay consistent
        trace_packed = jnp.pad(trace_packed, ((0, Sp - S), (0, 0), (0, 0)))
        rights_packed = jnp.pad(rights_packed, ((0, Sp - S), (0, 0)))
    n_blocks = Sp // CH_ROWS

    rights_i = rights_packed.astype(jnp.int32)
    n_rights = sum(((rights_i >> j) & 1) for j in range(4)).sum(axis=0)
    bll_top = half + (4 * Sp - n_rights).astype(jnp.int32)   # (B,)

    e0 = best_event.astype(jnp.int32)
    k0 = n_kmers.astype(jnp.int32) - 1
    done0 = ((e0 < 0) | (k0 < 0)).astype(jnp.int32)
    init = jnp.stack([e0, k0, bll_top, done0] + [jnp.zeros_like(e0)] * 4,
                     axis=1)                                  # (B, 8) i32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((CH_ROWS, B, W),
                         lambda i, *_: (n_blocks - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CH_ROWS, B, 1),
                         lambda i, *_: (n_blocks - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # init (B, 8)
        ],
        out_specs=pl.BlockSpec((CH_ROWS, B, 1), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, 8), jnp.int32)],
    )
    kernel = functools.partial(_chase_kernel, B=B, W=W, n_blocks=n_blocks)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Sp, B, 1), jnp.uint8),
    )(trace_packed, rights_packed.reshape(Sp, B, 1), init)
    return out[:, :B0, 0]                                    # (Sp, B0) u8


@functools.partial(jax.jit, static_argnames=("bandwidth",))
def backtrace_moves_pallas_jit(trace_packed, rights_packed, best_event,
                               n_kmers, bandwidth=100):
    return backtrace_moves_pallas(trace_packed, rights_packed, best_event,
                                  n_kmers, bandwidth)


@functools.lru_cache(maxsize=None)
def _chase_sharded_fn(mesh, bandwidth):
    from jax.sharding import PartitionSpec as P

    def inner(tp, rp, best_event, n_kmers):
        return backtrace_moves_pallas(tp, rp, best_event, n_kmers, bandwidth)

    sm = jax.shard_map(
        inner, mesh=mesh, check_vma=False,
        in_specs=(P(None, "data", None), P(None, "data"), P("data"),
                  P("data")),
        out_specs=P(None, "data"))
    return jax.jit(sm)


def backtrace_moves_pallas_sharded(mesh, trace_packed, rights_packed,
                                   best_event, n_kmers, bandwidth=100):
    """Mesh-parallel Pallas chase (per-device rows via shard_map)."""
    return _chase_sharded_fn(mesh, bandwidth)(
        trace_packed, rights_packed, best_event, n_kmers)
