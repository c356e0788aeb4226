#!/usr/bin/env python
"""Attribute viterbi device time: pallas fill alone, terminate glue, the
pre-backtrace shear, the countdown backtrace kernel, and the full chain —
at bench-like shapes.  Sync is on a small leaf (device outputs stay
resident in the pipeline; downloads must not be charged to kernels)."""
import os, sys, time
import numpy as np, jax, jax.numpy as jnp
from dnascent_tpu.utils.jaxcache import enable_compilation_cache
enable_compilation_cache()
from dnascent_tpu.config import DNA_R10
from dnascent_tpu.ops import viterbi as vit
from dnascent_tpu.ops import viterbi_pallas as vp

cfg = DNA_R10
hmm = cfg.hmm
HMM_KEY = ("external_D2D", "external_D2M", "external_I2M", "external_M2D",
           "internal_M2I", "internal_I2I")
hmm_probs = tuple(getattr(hmm, k) for k in HMM_KEY)
rng = np.random.default_rng(0)

W, T, N = (int(x) for x in (sys.argv[1:4] + ["2048", "192", "48"][len(sys.argv)-1:]))
REPS = 20

obs = jnp.asarray(rng.normal(0, 1, (W, T)).astype(np.float32))
mu = jnp.asarray(rng.normal(90, 10, (W, N)).astype(np.float32))
inv = jnp.asarray(rng.uniform(0.5, 1.0, (W, N)).astype(np.float32))
lpc = jnp.asarray(rng.normal(-2, 0.3, (W, N)).astype(np.float32))
n_obs = jnp.asarray(np.full(W, T * 3 // 4, np.int32))
n_states = jnp.asarray(np.full(W, 42, np.int32))
epb = jnp.asarray(np.full(W, 1.8, np.float32))

eD2D_f, eD2M_f, eI2M_f, eM2D_f, iM2I_f, iI2I_f = hmm_probs
iM2M = jnp.log(1.0 - (1.0 / epb)).astype(jnp.float32)
eM2M = jnp.log(1.0 - eM2D_f - iM2I_f - (1.0 - 1.0 / epb)).astype(jnp.float32)
eOrIM2M = jnp.logaddexp(eM2M, jnp.float32(np.log(eM2D_f)))
hmm_logs = tuple(float(np.log(v)) for v in hmm_probs)


def _sync(out):
    # real sync: download one element of the SMALLEST leaf
    # (block_until_ready can be a no-op through the axon plugin)
    leaves = jax.tree_util.tree_leaves(out)
    smallest = min(leaves,
                   key=lambda a: int(np.prod(a.shape)) * a.dtype.itemsize)
    return np.asarray(smallest).ravel()[:1]


def bench(tag, fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{tag:34s} {1000*dt:8.2f} ms", flush=True)


obs_T = obs.T
muT, invT, lpcT = mu.T, inv.T, lpc.T

fill = jax.jit(lambda *a: vp.viterbi_fill_codes_pallas(*a, hmm_logs))
bench("pallas fill alone", fill, obs_T, muT, invT, lpcT, n_obs, n_states,
      iM2M, eM2M, eOrIM2M)

codes, I_fin, M_fin, D_fin = fill(obs_T, muT, invT, lpcT, n_obs, n_states,
                                  iM2M, eM2M, eOrIM2M)
codes = jax.block_until_ready(codes)
s_rows = T + N


@jax.jit
def shear_only(codes):
    Tc, Nc, Wc = codes.shape
    s_pad = -(-s_rows // vp.BT_DH) * vp.BT_DH
    planes = []
    for i in range(Nc):
        p = codes[:, i, :]
        front = i + 1
        back = max(0, s_pad - Tc - front)
        planes.append(jnp.pad(p, ((front, back), (0, 0)))[:s_pad])
    return jnp.stack(planes, axis=1)


bench("shear alone (XLA)", shear_only, codes)

kind0 = jnp.asarray(rng.integers(0, 3, W).astype(np.int32))
bt = jax.jit(lambda c, k: vp.viterbi_backtrace_pallas(
    c, k, n_obs, n_states, s_rows))
bench("shear + countdown bt", bt, codes, kind0)

term_bt = jax.jit(lambda c, i_, m_, d_: vit._terminate_and_backtrace(
    c, i_, m_, d_, n_obs, n_states,
    jnp.logaddexp(eM2M, jnp.float32(np.log(eM2D_f))),
    jnp.float32(np.log(eI2M_f)), W, T, N, None, use_pallas_bt=True))
bench("terminate + bt", term_bt, codes, I_fin, M_fin, D_fin)

full = jax.jit(lambda *a: vit.viterbi_fill_backtrace(
    obs, n_obs, mu, inv, lpc, n_states, epb, hmm_probs, use_pallas=True))
bench("full chain", full, obs, n_obs, mu, inv, lpc, n_states, epb)
