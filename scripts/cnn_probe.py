#!/usr/bin/env python
"""Attribute the reference-CNN forward's device time: GRU vs conv trunk vs
depthwise convs vs BN chains, at bench shapes (B=16, L=12288).

Usage: python scripts/cnn_probe.py [reps]
"""

import sys
import time

import numpy as np

from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()

import jax
import jax.numpy as jnp

from dnascent_tpu.models import reference_cnn as rc

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
rng = np.random.default_rng(0)
B, L = 16, 12288


def _sync(out):
    return np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def bench(tag, fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag:44s} {dt*1000:9.2f} ms", flush=True)
    return dt


params = rc.params_from_tensors(rc.synthetic_tensors(0))
core = jnp.asarray(rng.integers(1, 1025, size=(B, L)).astype(np.int32))
resid = jnp.asarray(rng.integers(1, 257, size=(B, L)).astype(np.int32))
sig = jnp.asarray(rng.integers(0, 256, size=(B, L, rc.RAWDEPTH)
                               ).astype(np.uint8))

model = rc.create_model()
# every probe returns a scalar: a large output's D2H download would dominate
# the measurement on the tunnel
fwd = jax.jit(lambda c, r, s: model.apply(params, c, r, s).sum())
bench("full forward", fwd, core, resid, sig)


# GRU alone (incl. u8 dequant, as in apply)
@jax.jit
def gru_only(signal):
    from dnascent_tpu.models.cnn import SIG_QUANT_SCALE, SIG_QUANT_LO
    q = signal.astype(jnp.float32)
    s = jnp.where(q == 0.0, 0.0, (q - 1.0) / SIG_QUANT_SCALE + SIG_QUANT_LO)
    flat = s.reshape(B * L, rc.RAWDEPTH)
    return rc._gru_scan(flat, flat != 0.0, params["gru0"],
                        params["gru1"]).sum()


bench("GRU encoder alone", gru_only, sig)

# trunk alone from a fixed feature tensor
feats = jnp.asarray(rng.normal(0, 1, size=(B, L, 64)).astype(np.float32))


@jax.jit
def trunk_only(x):
    x = rc._conv1d(x, params["layer2"]["kernel"], params["layer2"]["bias"])
    x = jax.nn.relu(rc._bn(x, params["layer3"]))
    for blk in rc._BLOCKS:
        y = x
        for s_, b_ in zip(blk["seps"][:-1], blk["bns"]):
            y = rc._sepconv1d(y, params[f"layer{s_}"])
            y = jax.nn.relu(rc._bn(y, params[f"layer{b_}"]))
        y = rc._sepconv1d(y, params[f"layer{blk['seps'][-1]}"])
        s_ = rc._conv1d(x, params[f"layer{blk['shortcut']}"]["kernel"],
                        params[f"layer{blk['shortcut']}"]["bias"])
        y = rc._bn(y, params[f"layer{blk['bn_main']}"])
        s_ = rc._bn(s_, params[f"layer{blk['bn_short']}"])
        x = jax.nn.relu(y + s_)
    for conv, bn in rc._EPILOGUE:
        x = rc._conv1d(x, params[f"layer{conv}"]["kernel"],
                       params[f"layer{conv}"]["bias"])
        if bn is not None:
            x = jax.nn.relu(rc._bn(x, params[f"layer{bn}"]))
        else:
            x = jax.nn.relu(x)
    return x.sum()


bench("conv trunk alone", trunk_only, feats)


# depthwise-only and pointwise-only chains over the widest block shape
x256 = jnp.asarray(rng.normal(0, 1, size=(B, L, 256)).astype(np.float32))
p60 = params["layer60"]  # 17-tap, 128->256; use its depthwise on 256 ch
dw = jnp.asarray(rng.normal(0, 0.1, size=(17, 256, 1)).astype(np.float32))
pw = jnp.asarray(rng.normal(0, 0.1, size=(1, 256, 256)).astype(np.float32))


@jax.jit
def depthwise_chain(x):
    dwk = jnp.transpose(dw, (0, 2, 1))
    for _ in range(6):
        x = jax.lax.conv_general_dilated(
            x.astype(rc._CONV_DTYPE), dwk.astype(rc._CONV_DTYPE),
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=256).astype(jnp.float32)
    return x.sum()


@jax.jit
def pointwise_chain(x):
    for _ in range(6):
        x = jax.lax.conv_general_dilated(
            x.astype(rc._CONV_DTYPE), pw.astype(rc._CONV_DTYPE),
            window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC")).astype(jnp.float32)
    return x.sum()


bench("6x depthwise k=17 c=256 (widest)", depthwise_chain, x256)
bench("6x pointwise 256->256", pointwise_chain, x256)
