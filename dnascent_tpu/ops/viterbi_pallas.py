"""Pallas TPU kernel for the windowed-Viterbi fill.

Drop-in replacement for the ``lax.scan`` fill inside
``ops.viterbi.viterbi_fill_backtrace`` (reference algorithm:
src/alignment.cpp:193-516).  The XLA scan pays HBM round trips for the
step's intermediates; here the whole recursion lives in VMEM scratch and
only the per-column backtrace codes stream out.

Layout: states on sublanes (N=72), windows on lanes.  The grid is
(W blocks, T): for each 2048-lane window block the T observation columns run
sequentially, with the I/M/D carries in VMEM scratch re-initialised at
column 0 of each block.  Shifts along the state axis are static sublane
concatenations; the deletion chain's closed-form cumulative max is a
log2(N) shift-and-max doubling ladder.  Candidate argmaxes use
strict-greater chains so ties resolve first-wins, matching the reference's
lnArgMax order (alignment.cpp:377-381).

Outputs are bit-identical in structure to the scan fill: codes (T, N, W)
uint8 with the same bitfield packing, plus the three final state planes for
termination; ``ops.viterbi`` runs its backtrace scan on them unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = np.float32(-np.inf)
_I_SHIFT, _M_SHIFT, _D_SHIFT = 0, 2, 5
WBLK = 2048  # lanes per window block (bounds the kernel's VMEM footprint)


def _kernel(obs_ref, coef_ref, trans_ref, nv_ref,       # inputs (blocked)
            codes_ref, finals_ref,                       # outputs (blocked)
            I_s, M_s, D_s,                               # scratch carries
            *, N: int, WB: int, T: int,
            eD2D: float, eD2M: float, eI2M: float, eM2D: float,
            iM2I: float, iI2I: float):
    t = pl.program_id(1)

    sidx = jax.lax.broadcasted_iota(jnp.int32, (N, WB), 0)
    n_obs = nv_ref[0:1, :]
    n_states = nv_ref[1:2, :]
    in_range = sidx < n_states
    is0 = sidx == 0

    @pl.when(t == 0)
    def _init():
        D_s[:] = jnp.where(in_range,
                           np.float32(eM2D)
                           + sidx.astype(jnp.float32) * np.float32(eD2D), NEG)
        I_s[:] = jnp.full((N, WB), NEG)
        M_s[:] = jnp.full((N, WB), NEG)

    I_prev = I_s[:]
    M_prev = M_s[:]
    D_prev = D_s[:]
    mu = coef_ref[0 * N : 1 * N, :]
    inv = coef_ref[1 * N : 2 * N, :]
    lpc = coef_ref[2 * N : 3 * N, :]
    iM2M = trans_ref[0:1, :]                             # (1, WB)
    eM2M = trans_ref[1:2, :]
    eOrIM2M = trans_ref[2:3, :]

    xt = obs_ref[0]                                      # (1, WB)
    a = (xt - mu) * inv
    em = lpc - jnp.float32(0.5) * a * a

    at0 = t == 0                                         # traced scalar bool

    def shift_dn(v):
        """v[i-1] along the state axis, NEG-filled at i=0."""
        return jnp.concatenate([jnp.full((1, WB), NEG), v[:-1, :]], axis=0)

    # --- insertions: candidates [I+iI2I, M+iM2I, start+iM2I] first-wins ---
    c0 = I_prev + np.float32(iI2I)
    c1 = M_prev + np.float32(iM2I)
    c2 = jnp.where(is0 & at0, np.float32(iM2I), NEG)
    aI = jnp.where(c1 > c0, 1, 0)
    I_curr = jnp.maximum(c0, c1)
    aI = jnp.where(c2 > I_curr, 2, aI)
    I_curr = jnp.maximum(I_curr, c2)

    # --- matches (i>=1): [sh(I)+eI2M, sh(M)+eM2M, M+iM2M, sh(D)+eD2M] ---
    m0 = shift_dn(I_prev) + np.float32(eI2M)
    m1 = shift_dn(M_prev) + eM2M
    m2 = M_prev + iM2M
    m3 = shift_dn(D_prev) + np.float32(eD2M)
    aM = jnp.where(m1 > m0, 1, 0)
    best = jnp.maximum(m0, m1)
    aM = jnp.where(m2 > best, 2, aM)
    best = jnp.maximum(best, m2)
    aM = jnp.where(m3 > best, 3, aM)
    best = jnp.maximum(best, m3)
    # state 0: [M+iM2M, start+eOrIM2M] -> codes {2, 4}
    s1 = jnp.where(is0 & at0, eOrIM2M, NEG)
    aM0 = jnp.where(s1 > m2, 4, 2)
    best0 = jnp.maximum(m2, s1)
    M_curr = jnp.where(is0, best0, best) + em
    aM = jnp.where(is0, aM0, aM)

    # --- deletions, closed-form chain ---
    fj = sidx.astype(jnp.float32)
    A = M_curr - fj * np.float32(eD2D)
    # inclusive cumulative max along states via shift-and-max doubling
    cm = A
    s = 1
    while s < N:
        cm = jnp.maximum(cm, jnp.concatenate(
            [jnp.full((s, WB), NEG), cm[:-s, :]], axis=0))
        s *= 2
    cmax_excl = shift_dn(cm)
    D_curr = jnp.where(is0, NEG,
                       cmax_excl + np.float32(eM2D)
                       + (fj - 1.0) * np.float32(eD2D))
    d0 = shift_dn(M_curr) + np.float32(eM2D)
    d1 = shift_dn(D_curr) + np.float32(eD2D)
    aD = jnp.where(d0 >= d1, 0, 1)

    # keep previous column beyond each window's observation count
    active = (t < n_obs) & in_range                      # (N, WB)
    I_curr = jnp.where(active, I_curr, jnp.where(in_range, I_prev, NEG))
    M_curr = jnp.where(active, M_curr, jnp.where(in_range, M_prev, NEG))
    D_curr = jnp.where(active, D_curr, jnp.where(in_range, D_prev, NEG))

    I_s[:] = I_curr
    M_s[:] = M_curr
    D_s[:] = D_curr

    code = (aI << _I_SHIFT) | (aM << _M_SHIFT) | (aD << _D_SHIFT)
    codes_ref[0] = code.astype(jnp.uint8)

    @pl.when(t == T - 1)
    def _final():
        finals_ref[0 * N : 1 * N, :] = I_curr
        finals_ref[1 * N : 2 * N, :] = M_curr
        finals_ref[2 * N : 3 * N, :] = D_curr


def viterbi_fill_codes_pallas(obs_T: jnp.ndarray,        # (T, W) f32
                              muT: jnp.ndarray,          # (N, W) f32
                              invT: jnp.ndarray,         # (N, W) f32
                              lpcT: jnp.ndarray,         # (N, W) f32
                              n_obs: jnp.ndarray,        # (W,) i32
                              n_states: jnp.ndarray,     # (W,) i32
                              iM2M: jnp.ndarray,         # (W,) f32
                              eM2M: jnp.ndarray,         # (W,) f32
                              eOrIM2M: jnp.ndarray,      # (W,) f32
                              hmm_logs: tuple[float, float, float, float,
                                              float, float]):
    """Returns (codes (T, N, W) u8, I_fin, M_fin, D_fin each (N, W) f32) —
    the same intermediates the XLA scan fill produces."""
    T, W = obs_T.shape
    N = muT.shape[0]
    eD2D, eD2M, eI2M, eM2D, iM2I, iI2I = hmm_logs
    WB = min(WBLK, max(128, ((W + 127) // 128) * 128))
    Wpad = (-W) % WB
    if Wpad:
        pad = lambda x, fill: jnp.pad(x, ((0, 0), (0, Wpad)),
                                      constant_values=fill)
        obs_T = pad(obs_T, 0.0)
        muT = pad(muT, 0.0)
        invT = pad(invT, 1.0)
        lpcT = pad(lpcT, NEG)
        n_obs = jnp.pad(n_obs, (0, Wpad))
        n_states = jnp.pad(n_states, (0, Wpad), constant_values=1)
        iM2M = jnp.pad(iM2M, (0, Wpad))
        eM2M = jnp.pad(eM2M, (0, Wpad))
        eOrIM2M = jnp.pad(eOrIM2M, (0, Wpad))
    Wp = W + Wpad
    nW = Wp // WB

    coef = jnp.concatenate([muT, invT, lpcT], axis=0)    # (3N, Wp)
    trans = jnp.stack([iM2M, eM2M, eOrIM2M], axis=0)     # (3, Wp)
    nv = jnp.stack([n_obs.astype(jnp.int32),
                    n_states.astype(jnp.int32)], axis=0)  # (2, Wp)

    kernel = functools.partial(
        _kernel, N=N, WB=WB, T=T,
        eD2D=float(eD2D), eD2M=float(eD2M), eI2M=float(eI2M),
        eM2D=float(eM2D), iM2I=float(iM2I), iI2I=float(iI2I))
    codes, finals = pl.pallas_call(
        kernel,
        grid=(nW, T),
        in_specs=[
            pl.BlockSpec((1, 1, WB), lambda w, t: (t, 0, w)),  # obs column
            pl.BlockSpec((3 * N, WB), lambda w, t: (0, w)),    # coef
            pl.BlockSpec((3, WB), lambda w, t: (0, w)),        # trans
            pl.BlockSpec((2, WB), lambda w, t: (0, w)),        # nv
        ],
        out_specs=(
            pl.BlockSpec((1, N, WB), lambda w, t: (t, 0, w)),  # codes
            pl.BlockSpec((3 * N, WB), lambda w, t: (0, w)),    # finals
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, N, Wp), jnp.uint8),
            jax.ShapeDtypeStruct((3 * N, Wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, WB), jnp.float32),
            pltpu.VMEM((N, WB), jnp.float32),
            pltpu.VMEM((N, WB), jnp.float32),
        ],
    )(obs_T[:, None, :], coef, trans, nv)
    codes = codes[:, :, :W]
    I_fin = finals[0 * N : 1 * N, :W]
    M_fin = finals[1 * N : 2 * N, :W]
    D_fin = finals[2 * N : 3 * N, :W]
    return codes, I_fin, M_fin, D_fin


# ---------------------------------------------------------------------------
# Pallas countdown backtrace
# ---------------------------------------------------------------------------

KIND_D, KIND_M, KIND_I, KIND_PAD = 0, 1, 2, 3
BT_DH = 8  # diagonal planes (countdown values) per grid step


def _bt_kernel(dpl_ref, init_ref, out_ref, st,
               *, N: int, W: int, n_blocks: int):
    """Countdown backtrace over the code planes (replaces the XLA scan in
    ops.viterbi._terminate_and_backtrace, which paid a scattered (W,)
    gather per step for ~T+N tiny steps).

    Every walk move strictly decreases s = column + position (D: pos-1;
    M/I: col-1, M sometimes both), so a single global s countdown advances
    all windows in lockstep: a window moves when the countdown passes its
    s and emits KIND_PAD otherwise (the consumer filters PADs, which
    preserves the move order — s decreases monotonically along the walk).
    The code byte a window needs at s lives on the anti-diagonal
    t + pos = s - 1 of its (T, N) plane, so the caller pre-shears the codes
    into diagonal planes dpl[s, pos, w] = codes[s-1-pos, pos, w], PACKS four
    consecutive state planes per i32 word (the per-s-row reduction then
    touches N/4 i32 sublanes instead of N u8->i32 converts — measured ~30%
    off the kernel), and the kernel streams them highest-s-first; the
    per-window byte is a masked sublane reduction at pos>>2 plus an 8-bit
    extract at (pos&3)*8.
    """
    i = pl.program_id(0)
    N4 = -(-N // 4)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (N4, W), 0)

    @pl.when(i == 0)
    def _init():
        st[...] = init_ref[...]

    kind = st[0:1, :]
    pos = st[1:2, :]
    col = st[2:3, :]
    done = st[3:4, :]

    base = (n_blocks - 1 - i) * BT_DH
    for rl in range(BT_DH - 1, -1, -1):
        s = base + rl
        plane = dpl_ref[rl]                              # (N4, W) i32
        active = (done == 0) & ((col + pos) == s)        # (1, W)
        posc = jnp.clip(pos, 0, N - 1)
        word = jnp.sum(jnp.where(iota_sub == (posc >> 2), plane, 0),
                       axis=0, keepdims=True)            # (1, W)
        byte = (word >> ((posc & 3) * 8)) & 255
        cI = byte & 3
        cM = (byte >> 2) & 7
        cD = (byte >> 5) & 1
        at_init = col == 0
        # D predecessors (same column; init column chains down to start)
        nk_D = jnp.where(at_init | (cD == 1), KIND_D, KIND_M)
        np_D = pos - 1
        nc_D = col
        # fin flags stay i32: bool vectors as where VALUES hit Mosaic's
        # unsupported i8->i1 truncation (CLAUDE.md gotcha)
        fin_D = jnp.where(at_init & (pos == 0), 1, 0)
        # M predecessors (column - 1); cM==4 = from start (fin)
        nk_M = jnp.where(cM == 0, KIND_I,
                         jnp.where(cM == 3, KIND_D, KIND_M))
        np_M = jnp.where((cM == 2) | (cM >= 4), pos, pos - 1)
        nc_M = col - 1
        fin_M = jnp.where(cM == 4, 1, 0)
        # I predecessors (column - 1); cI==2 = from start (fin)
        nk_I = jnp.where(cI == 0, KIND_I, KIND_M)
        np_I = pos
        nc_I = col - 1
        fin_I = jnp.where(cI == 2, 1, 0)

        is_D = kind == KIND_D
        is_M = kind == KIND_M
        nk = jnp.where(is_D, nk_D, jnp.where(is_M, nk_M, nk_I))
        npos = jnp.where(is_D, np_D, jnp.where(is_M, np_M, np_I))
        ncol = jnp.where(is_D, nc_D, jnp.where(is_M, nc_M, nc_I))
        fin = jnp.where(is_D, fin_D, jnp.where(is_M, fin_M, fin_I))

        delta = jnp.clip(pos - npos, 0, 1)
        out_code = jnp.where(active, kind | (delta << 2), KIND_PAD)
        done = jnp.where(active & (fin == 1), 1, done)
        kind = jnp.where(active, nk, kind)
        pos = jnp.where(active, npos, pos)
        col = jnp.where(active, ncol, col)
        out_ref[BT_DH - 1 - rl] = out_code.astype(jnp.uint8)

    st[0:1, :] = kind
    st[1:2, :] = pos
    st[2:3, :] = col
    st[3:4, :] = done


def viterbi_backtrace_pallas(codes: jnp.ndarray,   # (T, N, W) u8 fill codes
                             kind0: jnp.ndarray,   # (W,) i32 termination kind
                             n_obs: jnp.ndarray,   # (W,) i32
                             n_states: jnp.ndarray,  # (W,) i32
                             s_rows: int):
    """Countdown backtrace -> (path_code (W, s_pad) u8 forward order with
    PAD gaps, path_len (W,)).  ``s_rows`` is a host-known bound on
    max(n_obs + n_states) (bucketed static)."""
    T, N, W = codes.shape
    Wp = -(-W // 128) * 128
    if Wp != W:
        codes = jnp.pad(codes, ((0, 0), (0, 0), (0, Wp - W)))
        kind0 = jnp.pad(kind0, (0, Wp - W))
        n_obs = jnp.pad(n_obs, (0, Wp - W))
        n_states = jnp.pad(n_states, (0, Wp - W), constant_values=1)
    s_pad = -(-s_rows // BT_DH) * BT_DH
    n_blocks = s_pad // BT_DH
    N4 = -(-N // 4)

    # shear: dpl[s, pos, w] = codes[s - 1 - pos, pos, w] (zeros out of
    # range), then pack 4 consecutive state planes per i32 word (see
    # _bt_kernel docstring)
    planes = []
    for i in range(N):
        p = codes[:, i, :]
        front = i + 1
        back = max(0, s_pad - T - front)
        planes.append(jnp.pad(p, ((front, back), (0, 0)))[:s_pad])
    packed = []
    for j in range(N4):
        w = planes[4 * j].astype(jnp.int32)
        for b in range(1, 4):
            if 4 * j + b < N:
                w = w | (planes[4 * j + b].astype(jnp.int32) << (8 * b))
        packed.append(w)
    dpl = jnp.stack(packed, axis=1)                      # (s_pad, N4, Wp)

    init = jnp.stack([
        kind0.astype(jnp.int32),
        (n_states - 1).astype(jnp.int32),
        n_obs.astype(jnp.int32),
        ((n_obs < 0)).astype(jnp.int32),
    ] + [jnp.zeros((Wp,), jnp.int32)] * 4, axis=0)       # (8, Wp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BT_DH, N4, Wp),
                         lambda i, *_: (n_blocks - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),       # init (8, Wp)
        ],
        out_specs=pl.BlockSpec((BT_DH, 1, Wp), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, Wp), jnp.int32)],
    )
    kernel = functools.partial(_bt_kernel, N=N, W=Wp, n_blocks=n_blocks)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, 1, Wp), jnp.uint8),
    )(dpl, init)
    # rows were emitted s-descending = walk order; flip to forward order
    path_code = out[::-1, 0, :].T[:W]                    # (W, s_pad)
    path_len = jnp.sum((path_code & 3) != KIND_PAD, axis=1).astype(jnp.int32)
    return path_code, path_len
