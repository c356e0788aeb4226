#!/usr/bin/env python
"""A/B: banded chase with i32-packed trace rows (4 u8 rows per word -> one
lane-select per 16 bands) and varying rows-per-grid-step, vs the shipping
u8 kernel.  Exact-equality checked on real fill output."""
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
from dnascent_tpu.config import DNA_R10
from dnascent_tpu.io.poremodel import synthetic_model_set
from dnascent_tpu.ops import banded_pallas as bp
from dnascent_tpu.ops.banded_pallas import FROM_D, FROM_U, FROM_L
from dnascent_tpu.pipeline.eventalign import _device_model_table

cfg = DNA_R10
models = synthetic_model_set(cfg)
rng = np.random.default_rng(0)


def _chase_kernel_packed(trace_ref, rights_ref, init_ref, out_ref, st,
                         *, B: int, W: int, n_blocks: int, dh32: int):
    i = pl.program_id(0)
    offs = jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    @pl.when(i == 0)
    def _init():
        st[:, 0:1] = init_ref[:, 0:1]
        st[:, 1:2] = init_ref[:, 1:2]
        st[:, 2:3] = init_ref[:, 2:3]
        st[:, 3:4] = init_ref[:, 3:4]
        st[:, 4:8] = jnp.zeros((B, 4), jnp.int32)

    e = st[:, 0:1]
    k = st[:, 1:2]
    bll = st[:, 2:3]
    done = st[:, 3:4]

    base_sr = (n_blocks - 1 - i) * dh32 * 4
    for w32 in range(dh32 - 1, -1, -1):
        word_plane = trace_ref[w32]                       # (B, W) i32
        for rb in range(3, -1, -1):
            sr = base_sr + w32 * 4 + rb
            rrow = rights_ref[w32 * 4 + rb].astype(jnp.int32)  # (B, 1)
            acc = jnp.zeros((B, 1), jnp.int32)
            # one lane-select per 4 logical rows is NOT possible: bll moves
            # between rows, so select per row but on the packed word
            for j in range(3, -1, -1):
                band = sr * 4 + j + 2
                active = (done == 0) & ((e + k + 2) == band)
                off = jnp.clip(bll - e, 0, W - 1)
                word = jnp.sum(jnp.where(offs == off, word_plane, 0),
                               axis=1, keepdims=True)
                byte = (word >> (8 * rb)) & 255
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
            out_ref[(dh32 - 1 - w32) * 4 + (3 - rb)] = acc.astype(jnp.uint8)

    st[:, 0:1] = e
    st[:, 1:2] = k
    st[:, 2:3] = bll
    st[:, 3:4] = done


def backtrace_packed(trace_packed, rights_packed, best_event, n_kmers,
                     bandwidth=100, dh32=2):
    S, B0, W = trace_packed.shape
    half = bandwidth // 2
    Bpad = (-B0) % 8
    if Bpad:
        trace_packed = jnp.pad(trace_packed, ((0, 0), (0, Bpad), (0, 0)))
        rights_packed = jnp.pad(rights_packed, ((0, 0), (0, Bpad)))
        best_event = jnp.pad(best_event, (0, Bpad), constant_values=-1)
        n_kmers = jnp.pad(n_kmers, (0, Bpad))
    B = B0 + Bpad
    rows_per = dh32 * 4
    Sp = -(-S // rows_per) * rows_per
    if Sp != S:
        trace_packed = jnp.pad(trace_packed, ((0, Sp - S), (0, 0), (0, 0)))
        rights_packed = jnp.pad(rights_packed, ((0, Sp - S), (0, 0)))
    n_blocks = Sp // rows_per

    # pack 4 consecutive trace rows per i32 word plane
    t32 = trace_packed.astype(jnp.int32).reshape(Sp // 4, 4, B, W)
    t32 = (t32[:, 0] | (t32[:, 1] << 8) | (t32[:, 2] << 16)
           | (t32[:, 3] << 24))                           # (Sp/4, B, W)

    rights_i = rights_packed.astype(jnp.int32)
    n_rights = sum(((rights_i >> j) & 1) for j in range(4)).sum(axis=0)
    bll_top = half + (4 * Sp - n_rights).astype(jnp.int32)

    e0 = best_event.astype(jnp.int32)
    k0 = n_kmers.astype(jnp.int32) - 1
    done0 = ((e0 < 0) | (k0 < 0)).astype(jnp.int32)
    init = jnp.stack([e0, k0, bll_top, done0] + [jnp.zeros_like(e0)] * 4,
                     axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((dh32, B, W),
                         lambda i, *_: (n_blocks - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_per, B, 1),
                         lambda i, *_: (n_blocks - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_per, B, 1), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((B, 8), jnp.int32)],
    )
    kernel = functools.partial(_chase_kernel_packed, B=B, W=W,
                               n_blocks=n_blocks, dh32=dh32)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Sp, B, 1), jnp.uint8),
    )(t32, rights_packed.reshape(Sp, B, 1), init)
    return out[:, :B0, 0]


def _sync(out):
    leaves = jax.tree_util.tree_leaves(out)
    smallest = min(leaves,
                   key=lambda a: int(np.prod(a.shape)) * a.dtype.itemsize)
    return np.asarray(smallest).ravel()[:1]


def bench(tag, fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    REPS = 20
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    print(f"{tag:26s} {(time.perf_counter()-t0)/REPS*1000:8.2f} ms",
          flush=True)


def main():
    B, E, K = 16, 12288, 12288
    from dnascent_tpu.ops.banded_pallas import (
        banded_fill_pallas_from_codes_jit)
    ev = jnp.asarray(rng.normal(90, 10, (B, E)).astype(np.float16))
    codes = jnp.asarray(rng.integers(0, 4, (B, K + 8)).astype(np.uint8))
    n_ev = jnp.asarray(np.full(B, E - 100, np.int32))
    n_km = jnp.asarray(np.full(B, K - 100, np.int32))
    tbl = _device_model_table(models)
    tp, rp, best_e, _ = banded_fill_pallas_from_codes_jit(
        ev, codes, tbl, n_ev, n_km, bandwidth=cfg.banded.bandwidth,
        epsilon_skip=cfg.banded.epsilon_skip, p_trim=cfg.banded.p_trim)
    tp, rp = jax.block_until_ready((tp, rp))
    be = jnp.asarray(best_e)

    ref_fn = jax.jit(lambda: bp.backtrace_moves_pallas_jit(tp, rp, be, n_km))
    ref = np.asarray(ref_fn())

    def unpacked(a):
        by = a.astype(np.int64)
        mv = np.stack([(by >> (2 * j)) & 3 for j in range(4)], 1)
        return [mv.reshape(-1, 4 * a.shape[0] // a.shape[0], B)[..., b]
                for b in range(B)]

    for dh32 in (1, 2, 4):
        fn = jax.jit(functools.partial(backtrace_packed, dh32=dh32))
        got = np.asarray(fn(tp, rp, be, n_km))
        # same PAD-filtered move stream per read
        ok = True
        for b in range(B):
            fa = ref[:, b].astype(np.int64)
            fb = got[:, b].astype(np.int64)
            ma = np.stack([(fa >> (2 * j)) & 3 for j in range(4)], 1).ravel()
            mb = np.stack([(fb >> (2 * j)) & 3 for j in range(4)], 1).ravel()
            if not np.array_equal(ma[ma != 3], mb[mb != 3]):
                ok = False
                break
        bench(f"packed dh32={dh32} equal={ok}", fn, tp, rp, be, n_km)
    bench("shipping u8 kernel", ref_fn)


if __name__ == "__main__":
    main()
