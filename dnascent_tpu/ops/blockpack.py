"""Lossless block bit-packing for u8 interconnect streams.

The detect pipeline is interconnect-bound on high-latency links (see
bench.py): its largest upload is the flat u8 CNN signal stream at 8
bits/sample, whose per-128-sample dynamic range is typically ~6 bits.  This
module packs each 128-value block at its own bit width on the host (native
C++, numpy fallback) and reconstructs the exact u8 stream on device with a
vectorised gather — bit-identical, so every downstream probability is
unchanged while the upload shrinks ~25%.

Layout (shared with native/dnascent_native.cpp::blockpack_u8):
- ``widths``  (nb,) u8 — bits per value, 0..8, for each block
- ``mins``    (nb,) u8 — per-block minimum, subtracted before packing
- ``payload`` u8 — one continuous little-endian bitstream: block b
  contributes ``128 * widths[b]`` bits of (value - min) fields, no padding
  between blocks.

The stream length must be a multiple of the block size (callers pack
bucket-padded streams, so this holds by construction).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BLOCK = 128


def pack_u8_host(values: np.ndarray, block: int = BLOCK):
    """Pack a u8 stream; returns (payload, widths, mins, n_payload_bytes).

    Uses the native C++ packer when available; the numpy fallback produces
    the identical bitstream (used on hosts without a toolchain and in
    tests).
    """
    v = np.ascontiguousarray(values, dtype=np.uint8)
    n = v.shape[0]
    if n % block:
        raise ValueError(f"pack_u8_host: n={n} not a multiple of {block}")
    if 8 * n >= 2 ** 31:  # unpack_u8 computes bit positions in int32
        raise ValueError(f"pack_u8_host: {n} bytes exceeds the device "
                         "unpacker's int32 bit-position ceiling (2^31 bits)")
    from .. import native
    if native.available():
        return native.blockpack_u8(v, block)
    # numpy fallback: same layout via scatter-OR of each value's <=2 bytes
    b = v.reshape(-1, block).astype(np.int64)
    mins = b.min(axis=1)
    rng = b.max(axis=1) - mins
    widths = np.zeros(b.shape[0], dtype=np.int64)
    nz = rng > 0
    widths[nz] = np.floor(np.log2(rng[nz])).astype(np.int64) + 1
    rel = (b - mins[:, None]).reshape(-1)
    bit_base = np.concatenate(
        [[0], np.cumsum(block * widths)[:-1]])
    bitpos = (bit_base[:, None]
              + np.arange(block, dtype=np.int64)[None, :]
              * widths[:, None]).reshape(-1)
    total_bits = int(block * widths.sum())
    n_payload = (total_bits + 7) // 8
    payload = np.zeros(n + 8, dtype=np.uint8)
    keep = np.repeat(widths > 0, block)
    bp = bitpos[keep]
    shifted = rel[keep] << (bp & 7)
    np.bitwise_or.at(payload, bp >> 3, shifted & 0xFF)
    np.bitwise_or.at(payload, (bp >> 3) + 1, (shifted >> 8) & 0xFF)
    return payload, widths.astype(np.uint8), mins.astype(np.uint8), n_payload


def pack_u16_host(values: np.ndarray, block: int = BLOCK):
    """u16 variant of :func:`pack_u8_host` (widths 0..16, mins u16)."""
    v = np.ascontiguousarray(values, dtype=np.uint16)
    n = v.shape[0]
    if n % block:
        raise ValueError(f"pack_u16_host: n={n} not a multiple of {block}")
    if 16 * n >= 2 ** 31:  # unpack_u16 computes bit positions in int32
        raise ValueError(f"pack_u16_host: {n} values exceeds the device "
                         "unpacker's int32 bit-position ceiling (2^31 bits)")
    from .. import native
    if native.available():
        return native.blockpack_u16(v, block)
    b = v.reshape(-1, block).astype(np.int64)
    mins = b.min(axis=1)
    rng = b.max(axis=1) - mins
    widths = np.zeros(b.shape[0], dtype=np.int64)
    nz = rng > 0
    widths[nz] = np.floor(np.log2(rng[nz])).astype(np.int64) + 1
    rel = (b - mins[:, None]).reshape(-1)
    bit_base = np.concatenate([[0], np.cumsum(block * widths)[:-1]])
    bitpos = (bit_base[:, None]
              + np.arange(block, dtype=np.int64)[None, :]
              * widths[:, None]).reshape(-1)
    total_bits = int(block * widths.sum())
    n_payload = (total_bits + 7) // 8
    payload = np.zeros(2 * n + 8, dtype=np.uint8)
    keep = np.repeat(widths > 0, block)
    bp = bitpos[keep]
    shifted = rel[keep] << (bp & 7)   # <= 16 + 7 = 23 bits
    np.bitwise_or.at(payload, bp >> 3, shifted & 0xFF)
    np.bitwise_or.at(payload, (bp >> 3) + 1, (shifted >> 8) & 0xFF)
    np.bitwise_or.at(payload, (bp >> 3) + 2, (shifted >> 16) & 0xFF)
    return payload, widths.astype(np.uint8), mins.astype(np.uint16), n_payload


def unpack_u16(payload, widths, mins, n: int, block: int = BLOCK):
    """Device-side exact inverse of :func:`pack_u16_host` (traceable jnp).

    Fields are at most 16 bits wide and start at bit 0..7, so each spans at
    most three payload bytes.
    """
    w = widths.astype(jnp.int32)
    bit_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(block * w)[:-1]])
    j = jnp.arange(block, dtype=jnp.int32)
    bitpos = bit_base[:, None] + j[None, :] * w[:, None]
    byte = bitpos >> 3
    sh = bitpos & 7
    p = payload.astype(jnp.int32)
    last = p.shape[0] - 1
    lo = (p[jnp.clip(byte, 0, last)]
          | (p[jnp.clip(byte + 1, 0, last)] << 8)
          | (p[jnp.clip(byte + 2, 0, last)] << 16))
    mask = (1 << w) - 1
    val = ((lo >> sh) & mask[:, None]) + mins.astype(jnp.int32)[:, None]
    return val.reshape(-1)[:n].astype(jnp.uint16)


def unpack_u8(payload, widths, mins, n: int, block: int = BLOCK):
    """Device-side exact inverse of :func:`pack_u8_host` (traceable jnp).

    ``n`` is the static output length; ``payload`` may carry any amount of
    trailing padding (bucketed uploads).
    """
    w = widths.astype(jnp.int32)
    bit_base = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(block * w)[:-1]])
    j = jnp.arange(block, dtype=jnp.int32)
    bitpos = bit_base[:, None] + j[None, :] * w[:, None]
    byte = bitpos >> 3
    sh = bitpos & 7
    p = payload.astype(jnp.int32)
    last = p.shape[0] - 1
    # a field is at most 8 bits wide and starts at bit 0..7, so it spans at
    # most two payload bytes
    lo = (p[jnp.clip(byte, 0, last)]
          | (p[jnp.clip(byte + 1, 0, last)] << 8))
    mask = (1 << w) - 1
    val = ((lo >> sh) & mask[:, None]) + mins.astype(jnp.int32)[:, None]
    return val.reshape(-1)[:n].astype(jnp.uint8)
