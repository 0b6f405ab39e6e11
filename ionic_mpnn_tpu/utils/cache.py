"""Persistent XLA compilation cache (repo-local).

Remote compiles through the axon tunnel cost minutes per program shape;
the persistent cache collapses repeat compiles — including across
processes, which keeps bench.py's fresh-subprocess measurement
isolation cheap — to ~20 ms (measured
by ``scripts/tpu_probe_cache.py``: 0.41 s → 0.02 s on a toy program;
multi-minute saves on real train steps).

Call :func:`enable_compilation_cache` before the first backend use.
No-op when ``IONIC_MPNN_NO_CACHE=1``.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

DEFAULT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    if os.environ.get("IONIC_MPNN_NO_CACHE") == "1":
        return None
    import jax

    path = cache_dir or os.environ.get("IONIC_MPNN_CACHE_DIR") or DEFAULT_CACHE_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
