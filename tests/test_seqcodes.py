"""Device rank/core/residual arithmetic vs the host helpers."""

import numpy as np
import jax.numpy as jnp

from dnascent_tpu.ops import seqcodes
from dnascent_tpu.utils import seqtools


def test_ranks_from_codes_matches_host():
    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGTN"), p=[0.24, 0.24, 0.24, 0.24, 0.04],
                             size=500))
    host = seqtools.kmer_ranks(seq, 9)
    host_safe = np.where(host < 0, 0, host)
    codes = seqtools.encode_bases(seq).astype(np.uint8)
    dev = np.asarray(seqcodes.ranks_from_codes(jnp.asarray(codes)))
    np.testing.assert_array_equal(dev, host_safe)


def test_flat_ranks_segments():
    rng = np.random.default_rng(8)
    seqs = ["".join(rng.choice(list("ACGT"), size=n)) for n in (40, 73, 129)]
    flat = np.concatenate(
        [seqtools.encode_bases(s).astype(np.uint8) for s in seqs])
    out = np.asarray(seqcodes.flat_ranks_from_codes_jit(jnp.asarray(flat)))
    assert out.shape[0] == flat.shape[0]
    off = 0
    for s in seqs:
        nk = len(s) - 8
        host = seqtools.kmer_ranks(s, 9)
        np.testing.assert_array_equal(out[off : off + nk], host)
        off += len(s)


def test_core_residual_center_from_ranks():
    rng = np.random.default_rng(9)
    seq = "".join(rng.choice(list("ACGT"), size=300))
    codes = seqtools.encode_bases(seq)
    win = np.lib.stride_tricks.sliding_window_view(codes, 9)
    ranks = jnp.asarray(seqtools.kmer_ranks(seq, 9))
    np.testing.assert_array_equal(
        np.asarray(seqcodes.core_index_from_ranks(ranks)),
        seqtools.core_index_from_codes(win))
    np.testing.assert_array_equal(
        np.asarray(seqcodes.residual_index_from_ranks(ranks)),
        seqtools.residual_index_from_codes(win))
    np.testing.assert_array_equal(
        np.asarray(seqcodes.center_is_t_from_ranks(ranks)),
        win[:, 4] == 1)


def test_pack_codes_roundtrip():
    """2-bit pack + non-ACGT bitmap must reproduce the u8 code stream."""
    import numpy as np
    import jax.numpy as jnp
    from dnascent_tpu.ops.seqcodes import codes_from_packed, pack_codes_host

    rng = np.random.default_rng(3)
    for shape in [(16,), (3, 64), (2, 4096)]:
        codes = rng.integers(0, 4, size=shape).astype(np.uint8)
        bad = rng.random(shape) < 0.05
        codes[bad] = 255
        packed, badmap = pack_codes_host(codes)
        assert packed.shape[-1] == shape[-1] // 4
        out = np.asarray(codes_from_packed(jnp.asarray(packed),
                                           jnp.asarray(badmap),
                                           shape[-1]))
        np.testing.assert_array_equal(out, codes)


def test_flat_ranks_from_packed_matches_codes():
    import numpy as np
    import jax.numpy as jnp
    from dnascent_tpu.ops.seqcodes import (flat_ranks_from_codes_jit,
                                           flat_ranks_from_packed_jit,
                                           pack_codes_host)

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=1 << 12).astype(np.uint8)
    codes[rng.random(codes.shape[0]) < 0.02] = 255
    a = np.asarray(flat_ranks_from_codes_jit(jnp.asarray(codes)))
    packed, badmap = pack_codes_host(codes)
    b = np.asarray(flat_ranks_from_packed_jit(jnp.asarray(packed),
                                              jnp.asarray(badmap),
                                              codes.shape[0]))
    np.testing.assert_array_equal(a, b)
