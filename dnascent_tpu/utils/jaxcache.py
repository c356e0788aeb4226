"""Persistent XLA compilation cache setup.

Compiles dominate cold-start cost (the banded-fill scan alone takes minutes
through a remote-compile tunnel), so every entry point enables JAX's on-disk
compilation cache keyed under the repo: recompiles are paid once per kernel
per bucket shape per machine."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    cache_dir = path or os.environ.get(
        "DNASCENT_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "dnascent_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax versions: harmless
