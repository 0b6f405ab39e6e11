#!/usr/bin/env python
"""Probe: does jax's persistent compilation cache work on the axon backend?

Run twice (two separate processes). If the second run's compile time for
the same program collapses, the cache works and every subprocess-isolated
benchmark gets cheap.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "a"
    print(f"[probe-{tag}] devices: {jax.devices()}", flush=True)

    # a distinctive program so we know it's ours in the cache
    @jax.jit
    def f(x, w):
        for _ in range(3):
            x = jnp.tanh(x @ w) + 0.12345
        return x.sum()

    x = jnp.ones((256, 256), jnp.float32)
    w = jnp.ones((256, 256), jnp.float32) * 0.01
    # fetch-synced (np.asarray): block_until_ready under-waits on the axon
    # relay backend (RESULTS.md battery 5/6), and the compile time measured
    # here dominates anyway
    t0 = time.perf_counter()
    out = float(np.asarray(f(x, w)))
    t1 = time.perf_counter()
    print(f"[probe-{tag}] first call (compile+run): {t1 - t0:.2f}s out={out:.4f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(x, w)
    np.asarray(out)
    print(f"[probe-{tag}] 10 steps: {time.perf_counter() - t0:.4f}s", flush=True)


if __name__ == "__main__":
    main()
