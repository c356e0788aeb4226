#!/usr/bin/env python
"""A/B experiment: countdown backtrace with i32-packed diagonal planes
(4 state-codes per word) vs the shipping u8-plane kernel.  Checks output
equality, then times both on chip."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dnascent_tpu.ops import viterbi_pallas as vp

BT_DH = vp.BT_DH
KIND_D, KIND_M, KIND_I, KIND_PAD = 0, 1, 2, 3


def _bt_kernel_packed(dpl_ref, init_ref, out_ref, st,
                      *, N4: int, W: int, n_blocks: int, dh: int):
    i = pl.program_id(0)
    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (N4, W), 0)

    @pl.when(i == 0)
    def _init():
        st[...] = init_ref[...]

    kind = st[0:1, :]
    pos = st[1:2, :]
    col = st[2:3, :]
    done = st[3:4, :]

    base = (n_blocks - 1 - i) * dh
    for rl in range(dh - 1, -1, -1):
        s = base + rl
        plane = dpl_ref[rl]                              # (N4, W) i32
        active = (done == 0) & ((col + pos) == s)        # (1, W)
        posc = jnp.clip(pos, 0, 4 * N4 - 1)
        grp = posc >> 2
        sub = (posc & 3) * 8
        word = jnp.sum(jnp.where(iota_sub == grp, plane, 0), axis=0,
                       keepdims=True)                    # (1, W)
        byte = (word >> sub) & 255
        cI = byte & 3
        cM = (byte >> 2) & 7
        cD = (byte >> 5) & 1
        at_init = col == 0
        nk_D = jnp.where(at_init | (cD == 1), KIND_D, KIND_M)
        np_D = pos - 1
        nc_D = col
        fin_D = jnp.where(at_init & (pos == 0), 1, 0)
        nk_M = jnp.where(cM == 0, KIND_I,
                         jnp.where(cM == 3, KIND_D, KIND_M))
        np_M = jnp.where((cM == 2) | (cM >= 4), pos, pos - 1)
        nc_M = col - 1
        fin_M = jnp.where(cM == 4, 1, 0)
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
        out_ref[dh - 1 - rl] = out_code.astype(jnp.uint8)

    st[0:1, :] = kind
    st[1:2, :] = pos
    st[2:3, :] = col
    st[3:4, :] = done


def backtrace_packed(codes, kind0, n_obs, n_states, s_rows, dh=BT_DH):
    T, N, W = codes.shape
    Wp = -(-W // 128) * 128
    if Wp != W:
        codes = jnp.pad(codes, ((0, 0), (0, 0), (0, Wp - W)))
        kind0 = jnp.pad(kind0, (0, Wp - W))
        n_obs = jnp.pad(n_obs, (0, Wp - W))
        n_states = jnp.pad(n_states, (0, Wp - W), constant_values=1)
    s_pad = -(-s_rows // dh) * dh
    n_blocks = s_pad // dh
    N4 = -(-N // 4)

    planes = []
    for i in range(N):
        p = codes[:, i, :]
        front = i + 1
        back = max(0, s_pad - T - front)
        planes.append(jnp.pad(p, ((front, back), (0, 0)))[:s_pad])
    # pack 4 consecutive state planes into one i32 word plane
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
    ] + [jnp.zeros((Wp,), jnp.int32)] * 4, axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((dh, N4, Wp),
                         lambda i, *_: (n_blocks - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((dh, 1, Wp), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((8, Wp), jnp.int32)],
    )
    kernel = functools.partial(_bt_kernel_packed, N4=N4, W=Wp,
                               n_blocks=n_blocks, dh=dh)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s_pad, 1, Wp), jnp.uint8),
    )(dpl, init)
    path_code = out[::-1, 0, :].T[:W]
    path_len = jnp.sum((path_code & 3) != KIND_PAD, axis=1).astype(jnp.int32)
    return path_code, path_len


def _sync(out):
    # real sync: download one element of the SMALLEST leaf
    # (block_until_ready can be a no-op through the axon plugin)
    leaves = jax.tree_util.tree_leaves(out)
    smallest = min(leaves,
                   key=lambda a: int(np.prod(a.shape)) * a.dtype.itemsize)
    return np.asarray(smallest).ravel()[:1]


REPS = 20


def bench(tag, fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag:28s} {dt*1000:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    W, T, N = (int(x) for x in (sys.argv[1:4]
                                + ["2048", "192", "48"][len(sys.argv) - 1:]))
    s_rows = T + N
    # random-but-valid codes: any byte decodes somewhere; walks terminate by
    # countdown regardless, so random codes exercise the kernel fully
    codes = jnp.asarray(rng.integers(0, 256, (T, N, W)).astype(np.uint8))
    kind0 = jnp.asarray(rng.integers(0, 3, W).astype(np.int32))
    n_obs = jnp.asarray(np.full(W, T * 3 // 4, np.int32))
    n_states = jnp.asarray(np.full(W, 42, np.int32))

    ref_fn = jax.jit(lambda c, k: vp.viterbi_backtrace_pallas(
        c, k, n_obs, n_states, s_rows))
    pc_a, pl_a = jax.block_until_ready(ref_fn(codes, kind0))

    for dh in (BT_DH, 8):
        fn = jax.jit(functools.partial(backtrace_packed, s_rows=s_rows,
                                       dh=dh))
        pc_b, pl_b = fn(codes, kind0, n_obs, n_states)
        ok = (np.array_equal(np.asarray(pc_a), np.asarray(pc_b))
              and np.array_equal(np.asarray(pl_a), np.asarray(pl_b)))
        bench(f"packed dh={dh} equal={ok}", fn, codes, kind0, n_obs,
              n_states)
    bench("shipping u8 kernel", ref_fn, codes, kind0)


if __name__ == "__main__":
    main()
