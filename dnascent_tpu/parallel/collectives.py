"""Cross-host collective aggregation (new subsystem — the reference is
single-process; SURVEY §5).

Two analyses need global statistics when reads are sharded across hosts:

* **forkSense pass 1** — the 1-D 2-means over 2 kb call-fraction windows is
  a whole-dataset statistic (reference: src/forkSense.cpp:1459-1615); each
  host computes its shard's fraction vectors and they are allgathered (with
  their global ordinals) so every host runs the identical 2-means on the
  identical, identically-ordered global vector — bit-exact agreement with
  the single-host run by construction.
* **seeBreaks** — the read-length and analogue-track-length vectors feed a
  mean+3σ filter and a seeded bootstrap (src/seeBreaks.cpp:288-350,537-539);
  they are gathered the same way before the statistics run.

The gathers ride ``jax.experimental.multihost_utils.process_allgather``
(ICI/DCN collectives under a jax.distributed runtime) and degrade to a
stable in-process sort for single-process runs, so the same code path is
exercised by the tests either way.
"""

from __future__ import annotations

import numpy as np
import jax


def gather_ordered(values: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Allgather per-host vectors and return the global vector sorted by
    ``keys`` (stable), identical on every host.

    ``values``: (n, ...) local rows; ``keys``: (n,) int64 global ordinals
    (unique across hosts — e.g. global read index, or read index composed
    with a per-read window index).  With one process this is just the
    stable reorder, so sharded and unsharded paths produce the same bytes.
    """
    values = np.asarray(values)
    keys = np.asarray(keys, dtype=np.int64)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        n = np.array([values.shape[0]], dtype=np.int64)
        ns = np.asarray(multihost_utils.process_allgather(n)).reshape(-1)
        m = int(ns.max()) if ns.size else 0
        tail = values.shape[1:]
        pad_v = np.zeros((m,) + tail, dtype=values.dtype)
        pad_v[: values.shape[0]] = values
        pad_k = np.full(m, -1, dtype=np.int64)
        pad_k[: keys.shape[0]] = keys
        av = np.asarray(multihost_utils.process_allgather(pad_v))
        ak = np.asarray(multihost_utils.process_allgather(pad_k))
        values = np.concatenate([av[i, : ns[i]] for i in range(len(ns))]) \
            if m else values
        keys = np.concatenate([ak[i, : ns[i]] for i in range(len(ns))]) \
            if m else keys
    order = np.argsort(keys, kind="stable")
    return values[order]


def window_keys(read_ordinals, counts) -> np.ndarray:
    """Composite per-window ordinals: global read index in the high bits,
    within-read window index below (2^24 windows/read headroom — a 2 kb
    window grid covers reads to 32 Gb)."""
    keys = []
    for o, c in zip(read_ordinals, counts):
        keys.append((np.int64(o) << 24) + np.arange(c, dtype=np.int64))
    return (np.concatenate(keys) if keys else np.empty(0, np.int64))


def barrier(name: str) -> None:
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
