"""Device-side k-mer rank arithmetic from packed base codes.

The tunnel to the chip moves ~20 MB/s, so per-kmer i32 rank uploads (4
bytes/kmer) are 4x more expensive than the u8 base codes they derive from.
These helpers recompute ranks (and the CNN's core/residual indices) on
device from u8 code streams, matching the host helpers in utils/seqtools
exactly:

* base codes: A=0, T=1, G=2, C=3 (data_IO.cpp:129-141); 255 marks non-ACGT
  (the u8 view of encode_bases' -1),
* rank = base-4 big-endian over the k window; any non-ACGT base in the
  window gives rank 0, mirroring the pipelines' ``where(rank < 0, 0, rank)``
  defaulting (data_IO.cpp:131),
* core index = 9-mer digits 2..6 (+1), residual = digits 0,1,7,8 (+1)
  (reads.h:112-138); centre base is digit 4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def ranks_from_codes(codes: jnp.ndarray, k: int = 9) -> jnp.ndarray:
    """(..., L) u8 base codes -> (..., L-k+1) i32 ranks (0 where the window
    contains a non-ACGT base)."""
    n = codes.shape[-1] - k + 1
    bad = codes == 255
    safe = jnp.where(bad, 0, codes).astype(jnp.int32)
    r = jnp.zeros(codes.shape[:-1] + (n,), jnp.int32)
    anybad = jnp.zeros(codes.shape[:-1] + (n,), bool)
    for i in range(k):
        r = r + (safe[..., i : i + n] << (2 * (k - 1 - i)))
        anybad = anybad | bad[..., i : i + n]
    return jnp.where(anybad, 0, r)


@functools.partial(jax.jit, static_argnames=("k",))
def flat_ranks_from_codes_jit(codes_flat: jnp.ndarray, k: int = 9):
    """Flat u8 code stream -> same-length i32 rank stream (tail k-1 entries
    zero-padded).  Per-read segments must carry their k-1 trailing bases so
    in-read ranks never mix reads; the spill ranks at each segment tail are
    garbage that downstream masks (n_states / n_kmers) never read."""
    r = ranks_from_codes(codes_flat, k)
    return jnp.pad(r, (0, k - 1))


def core_index_from_ranks(ranks: jnp.ndarray) -> jnp.ndarray:
    """9-mer rank -> CNN core-sequence index (digits 2..6, +1)."""
    return ((ranks >> 4) & 1023) + 1


def residual_index_from_ranks(ranks: jnp.ndarray) -> jnp.ndarray:
    """9-mer rank -> CNN residual-sequence index (digits 0,1,7,8, +1)."""
    return (((ranks >> 16) & 3) * 64 + ((ranks >> 14) & 3) * 16
            + ((ranks >> 2) & 3) * 4 + (ranks & 3) + 1)


def center_is_t_from_ranks(ranks: jnp.ndarray) -> jnp.ndarray:
    """9-mer rank -> centre base (digit 4) == T."""
    return ((ranks >> 8) & 3) == 1
