"""Lossless block bit-pack codec (ops/blockpack.py + native blockpack_u8):
roundtrip exactness, native/numpy bitstream parity, and detect-pipeline
probability equality packed vs unpacked."""

import numpy as np
import jax.numpy as jnp
import pytest

from dnascent_tpu import native
from dnascent_tpu.ops import blockpack as bpk


def _streams():
    rng = np.random.default_rng(42)
    yield "random", rng.integers(0, 256, 128 * 64).astype(np.uint8)
    yield "gaussian", rng.normal(120, 20, 128 * 64).clip(0, 255).astype(
        np.uint8)
    yield "zeros", np.zeros(128 * 8, np.uint8)
    yield "const255", np.full(128 * 8, 255, np.uint8)
    yield "mixed", np.concatenate(
        [np.zeros(128 * 3, np.uint8),
         rng.integers(100, 140, 128 * 5).astype(np.uint8)])
    yield "width8", np.tile(np.array([0, 255], np.uint8), 128 * 4)


def _streams16():
    rng = np.random.default_rng(43)
    yield "random16", rng.integers(0, 1 << 16, 128 * 32).astype(np.uint16)
    yield "tdelta", rng.integers(1, 9, 128 * 32).astype(np.uint16)
    yield "zeros16", np.zeros(128 * 8, np.uint16)
    yield "width16", np.tile(np.array([0, 65535], np.uint16), 128 * 4)
    yield "mixed16", np.concatenate(
        [np.full(128 * 2, 511, np.uint16),
         rng.integers(0, 3000, 128 * 6).astype(np.uint16)])


def _variant(v):
    """(pack_fn, native_fn, unpack_fn) for a stream's dtype."""
    if v.dtype == np.uint16:
        return bpk.pack_u16_host, native.blockpack_u16, bpk.unpack_u16
    return bpk.pack_u8_host, native.blockpack_u8, bpk.unpack_u8


_ALL = list(_streams()) + list(_streams16())


@pytest.mark.parametrize("name,v", _ALL)
def test_roundtrip_exact(name, v):
    pack, _, unpack = _variant(v)
    payload, widths, mins, n_pay = pack(v)
    out = np.asarray(unpack(jnp.asarray(payload), jnp.asarray(widths),
                            jnp.asarray(mins), v.shape[0]))
    assert np.array_equal(out, v), name


@pytest.mark.parametrize("name,v", _ALL)
def test_numpy_fallback_roundtrip_exact(name, v):
    """The numpy packers (used on hosts without a toolchain) must produce a
    stream the device unpacker inverts exactly — incl. width-16 blocks
    (ADVICE r4: the u16 numpy fallback had no direct coverage)."""
    avail = native.available
    native.available = lambda: False
    try:
        pack, _, unpack = _variant(v)
        payload, widths, mins, n_pay = pack(v)
    finally:
        native.available = avail
    out = np.asarray(unpack(jnp.asarray(payload), jnp.asarray(widths),
                            jnp.asarray(mins), v.shape[0]))
    assert np.array_equal(out, v), name


@pytest.mark.skipif(not native.available(), reason="no native lib")
@pytest.mark.parametrize("name,v", _ALL)
def test_native_numpy_bitstream_parity(name, v):
    pack, native_fn, _ = _variant(v)
    p1, w1, m1, n1 = native_fn(v)
    avail = native.available
    native.available = lambda: False
    try:
        p2, w2, m2, n2 = pack(v)
    finally:
        native.available = avail
    assert n1 == n2, name
    assert np.array_equal(w1, w2) and np.array_equal(m1, m2), name
    assert np.array_equal(p1[:n1], p2[:n2]), name


def test_payload_padding_ignored():
    rng = np.random.default_rng(3)
    v = rng.normal(120, 15, 128 * 16).clip(0, 255).astype(np.uint8)
    payload, widths, mins, n_pay = bpk.pack_u8_host(v)
    padded = np.zeros(n_pay + 999, np.uint8)
    padded[:n_pay] = payload[:n_pay]
    out = np.asarray(bpk.unpack_u8(jnp.asarray(padded), jnp.asarray(widths),
                                   jnp.asarray(mins), v.shape[0]))
    assert np.array_equal(out, v)


def test_realistic_signal_compresses(models):
    """The shipping use: a quantised scaled-signal stream should pack to
    well under 8 bits/sample (the transfer win the codec exists for)."""
    from dnascent_tpu.config import DNA_R10
    from dnascent_tpu.models.cnn import quantise_signal_u8
    from dnascent_tpu.pipeline.source import SimulatedSource
    rec = next(iter(SimulatedSource(models, DNA_R10, n_reads=1, length=3000,
                                    seed=9)))
    sig = (rec.raw - np.median(rec.raw)) / (np.std(rec.raw) + 1e-9)
    q = quantise_signal_u8(sig[: (sig.shape[0] // 128) * 128])
    payload, widths, mins, n_pay = bpk.pack_u8_host(q)
    assert n_pay < 0.90 * q.shape[0]
    out = np.asarray(bpk.unpack_u8(jnp.asarray(payload), jnp.asarray(widths),
                                   jnp.asarray(mins), q.shape[0]))
    assert np.array_equal(out, q)


def test_detect_probabilities_bitwise_equal_packed_vs_unpacked(
        models, monkeypatch):
    """DNASCENT_PACK_SIG=1 (default) must reproduce the unpacked pipeline's
    CNN probabilities exactly — the codec is lossless end to end."""
    from dnascent_tpu.config import DNA_R10
    from dnascent_tpu.models import cnn as cnn_mod
    from dnascent_tpu.pipeline.detect import detect_reads
    from dnascent_tpu.pipeline.source import SimulatedSource

    model = cnn_mod.create_model(d_model=64, d_core=32, d_residual=16,
                                 d_signal=32, dilations=(1, 2))
    params = cnn_mod.default_params(model)

    def run(pack: str):
        monkeypatch.setenv("DNASCENT_PACK_SIG", pack)
        src = SimulatedSource(models, DNA_R10, n_reads=3, length=2000,
                              seed=77)
        return {rid: (d.edu_prob.copy(), d.brdu_prob.copy())
                for rid, d in detect_reads(src, models, model, params,
                                           cfg=DNA_R10)
                if d is not None}

    packed = run("1")
    plain = run("0")
    assert packed.keys() == plain.keys() and packed
    for rid in packed:
        np.testing.assert_array_equal(packed[rid][0], plain[rid][0])
        np.testing.assert_array_equal(packed[rid][1], plain[rid][1])


def test_apply_from_flat_ranks_packed_matches_unpacked():
    """The fully-packed ranks-path CNN entry (signal + aux + t_delta all
    block-packed) must reproduce the unpacked entry bitwise; on CPU the
    pipeline never takes this path, so cover it directly."""
    import jax.numpy as jnp
    from dnascent_tpu.models import cnn as cnn_mod

    rng = np.random.default_rng(11)
    B, L = 8, 256
    model = cnn_mod.create_model(d_model=32, d_core=16, d_residual=8,
                                 d_signal=16, dilations=(1, 2))
    params = cnn_mod.default_params(model)

    n_pos = np.full(B, L, np.int32)
    n_pos[-1] = L - 40
    ks_base = rng.integers(0, 50, B).astype(np.int32)
    ks_delta = rng.integers(0, 4, (B, L)).astype(np.uint8)
    flat_off = (np.arange(B) * 600).astype(np.int32)
    flat_ranks = rng.integers(0, 4 ** 9, 8 * 600 + 1024).astype(np.int32)
    counts = rng.integers(1, cnn_mod.RAWDEPTH + 1, (B, L)).astype(np.uint8)
    total = int(counts.astype(np.int64).sum())
    flat = rng.normal(128, 18, ((total + 127) // 128) * 128).clip(
        1, 255).astype(np.uint8)
    nt = 300
    t_delta = np.zeros(((nt + 127) // 128) * 128, np.uint16)
    t_delta[:nt] = rng.integers(1, 7, nt).astype(np.uint16)
    t_delta[0] = 5

    ref = np.asarray(cnn_mod.apply_model_from_flat_ranks_f16(
        model, params, jnp.asarray(ks_base), jnp.asarray(ks_delta),
        jnp.asarray(flat_off), jnp.asarray(n_pos), jnp.asarray(flat_ranks),
        jnp.asarray(flat), jnp.asarray(counts), jnp.asarray(t_delta)))

    sp, sw, sm, sn = bpk.pack_u8_host(flat)
    aux = np.concatenate([counts.reshape(-1), ks_delta.reshape(-1)])
    ap, aw, am, an = bpk.pack_u8_host(aux)
    tp, tw, tm, tn = bpk.pack_u16_host(t_delta)
    got = np.asarray(cnn_mod.apply_model_from_flat_ranks_f16_packed(
        model, params, jnp.asarray(ks_base), jnp.asarray(flat_off),
        jnp.asarray(n_pos), jnp.asarray(flat_ranks),
        jnp.asarray(sp[:sn]), jnp.asarray(sw), jnp.asarray(sm),
        jnp.asarray(ap[:an]), jnp.asarray(aw), jnp.asarray(am),
        jnp.asarray(tp[:tn]), jnp.asarray(tw), jnp.asarray(tm), L=L))
    np.testing.assert_array_equal(got, ref)


def test_obs_build_blockpacked_matches_u8():
    """Block-packed obs delta stream must rebuild the identical f16
    observation stream (bitwise) as the plain u8 stream."""
    import jax.numpy as jnp
    from dnascent_tpu.pipeline.eventalign import (_obs_build_jit,
                                                  _obs_build_blockpacked_jit)
    rng = np.random.default_rng(13)
    g = jnp.asarray(rng.normal(0, 1, size=(8, 512)).astype(np.float16))
    d = rng.integers(0, 4, size=1 << 10).astype(np.uint8)
    d[0] = 0
    rs = np.asarray([0, 300, 700, 1 << 10], np.int32)
    sb = np.asarray([0, 512, 1024, 0], np.int32)
    av = np.asarray([1.1, 0.9, 1.0, 1.0], np.float32)
    bv = np.asarray([0.1, -0.2, 0.0, 0.0], np.float32)
    a = _obs_build_jit((g,), jnp.asarray(d), jnp.asarray(rs),
                       jnp.asarray(sb), jnp.asarray(av), jnp.asarray(bv))
    payload, widths, mins, n_pay = bpk.pack_u8_host(d)
    b = _obs_build_blockpacked_jit(
        (g,), jnp.asarray(payload[:n_pay]), jnp.asarray(widths),
        jnp.asarray(mins), jnp.asarray(rs), jnp.asarray(sb),
        jnp.asarray(av), jnp.asarray(bv))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_detect_equal_compact_pc_on_vs_off(models, monkeypatch):
    """The compacted path-code download layout must reproduce the padded
    layout's detect output exactly (it reorders bytes, not information)."""
    from dnascent_tpu.config import DNA_R10
    from dnascent_tpu.models import cnn as cnn_mod
    from dnascent_tpu.pipeline.detect import detect_reads
    from dnascent_tpu.pipeline.source import SimulatedSource

    model = cnn_mod.create_model(d_model=32, d_core=16, d_residual=8,
                                 d_signal=16, dilations=(1,))
    params = cnn_mod.default_params(model)

    def run(flag: str):
        monkeypatch.setenv("DNASCENT_COMPACT_PC", flag)
        src = SimulatedSource(models, DNA_R10, n_reads=3, length=2000,
                              seed=21)
        return {rid: (d.ref_coords.copy(), d.edu_prob.copy(),
                      d.brdu_prob.copy())
                for rid, d in detect_reads(src, models, model, params,
                                           cfg=DNA_R10)
                if d is not None}

    on = run("1")
    off = run("0")
    assert on.keys() == off.keys() and on
    for rid in on:
        for a, b in zip(on[rid], off[rid]):
            np.testing.assert_array_equal(a, b)
