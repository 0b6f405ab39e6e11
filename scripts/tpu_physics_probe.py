#!/usr/bin/env python
"""Physics probes for the axon backend: what does the chip HONESTLY sustain?

All block_until_ready-based timings on this backend are fiction (battery 6:
0.4 ms block-synced vs 2146 ms fetch-synced for one identical dispatch), so
these probes fetch a scalar that depends on the ENTIRE computation chain.
Each mode runs in its own process for clean isolation (the matmul2 probe
below retracted the round-2 "second-executable" rule under fetch sync).

  matmul [n] [K] [iters] : chained bf16 (n,n)@(n,n) matmuls, K per dispatch,
                           iters dispatches threaded through the carry ->
                           TFLOP/s. Peak v5e bf16 = 197 TFLOP/s.
  matmul-f32 [n] ...     : same in float32.
  bandwidth [mb] [K]     : chained elementwise copy+scale over an mb-MB
                           array -> GB/s (reads+writes). Peak v5e HBM
                           = 819 GB/s.
  matmul2                : matmul twice with two DIFFERENT shapes in one
                           process -> is the honest speed of the second
                           executable different? (fetch-synced re-test of
                           the round-2 "second executable slow path")

The scalar fetched is the sum of the final result; every scan iteration
feeds the next and every dispatch feeds the next, so the relay cannot
serve any of it from a cache without doing the work.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def bench_matmul(n=4096, K=8, iters=3, warmup=1, dtype=jnp.bfloat16, tag="matmul"):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((n, n)), dtype)
    b = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n), dtype)

    @jax.jit
    def fn(a, b):
        def body(c, _):
            return jnp.dot(c, b, preferred_element_type=c.dtype), ()

        c, _ = jax.lax.scan(body, a, None, length=K)
        return c, jnp.sum(c.astype(jnp.float32))

    for _ in range(warmup):
        a, s = fn(a, b)
    np.asarray(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        a, s = fn(a, b)
    np.asarray(s)
    dt = (time.perf_counter() - t0) / iters
    flops = 2.0 * n * n * n * K
    print(
        f'{{"which": "{tag}", "n": {n}, "K": {K}, '
        f'"ms_per_dispatch": {dt*1e3:.3f}, '
        f'"ms_per_matmul": {dt/K*1e3:.4f}, '
        f'"tflops": {flops/dt/1e12:.2f}}}',
        flush=True,
    )
    return dt


def bench_bandwidth(mb=256, K=8, iters=3, warmup=1):
    n = mb * 1024 * 1024 // 4
    a = jnp.ones((n,), jnp.float32)

    @jax.jit
    def fn(a):
        def body(c, _):
            return c * 1.0000001 + 1e-9, ()

        c, _ = jax.lax.scan(body, a, None, length=K)
        return c, jnp.sum(c[:8])

    for _ in range(warmup):
        a, s = fn(a)
    np.asarray(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        a, s = fn(a)
    np.asarray(s)
    dt = (time.perf_counter() - t0) / iters
    gbytes = 2.0 * mb / 1024 * K  # read + write per scan step
    print(
        f'{{"which": "bandwidth", "mb": {mb}, "K": {K}, '
        f'"ms_per_dispatch": {dt*1e3:.3f}, "gb_per_s": {gbytes/dt:.1f}}}',
        flush=True,
    )
    return dt


def bench_gather(n_rows=226_944, n_idx=454_272, d=32, K=8, iters=3, warmup=1,
                 tag="gather"):
    """Honest ns/row for a sorted row gather (the MP step's src lookup)."""
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((n_rows, d)), jnp.float32)
    idx = jnp.asarray(np.sort(rng.integers(0, n_rows, n_idx)), jnp.int32)

    @jax.jit
    def fn(t, idx):
        # the indices vary per iteration (idx+i) so XLA can't hoist the
        # gather out of the loop as loop-invariant
        def body(c, i):
            g = jnp.take(t, jnp.minimum(idx + i, n_rows - 1), axis=0)
            return c + jnp.sum(g) * 1e-12, ()

        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(K, dtype=jnp.int32))
        return c

    for _ in range(warmup):
        s = fn(table, idx)
    np.asarray(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(table, idx)
    np.asarray(s)
    dt = (time.perf_counter() - t0) / iters
    per_row = dt / K / n_idx
    print(
        f'{{"which": "{tag}", "rows": {n_idx}, "d": {d}, "K": {K}, '
        f'"ms_per_gather": {dt/K*1e3:.3f}, "ns_per_row": {per_row*1e9:.2f}, '
        f'"gb_per_s": {n_idx*d*4*K/dt/1e9:.1f}}}',
        flush=True,
    )
    return dt


def bench_scatter(n_rows=226_944, n_idx=454_272, d=32, K=8, iters=3, warmup=1):
    """Honest ns/row for a sorted segment-sum (the MP step's aggregate)."""
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((n_idx, d)), jnp.float32)
    idx = jnp.asarray(np.sort(rng.integers(0, n_rows, n_idx)), jnp.int32)

    @jax.jit
    def fn(v, idx):
        def body(c, i):
            s = jax.ops.segment_sum(v + c, jnp.minimum(idx + i, n_rows - 1),
                                    num_segments=n_rows,
                                    indices_are_sorted=True)
            return c + jnp.sum(s) * 1e-12, ()

        c, _ = jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(K, dtype=jnp.int32))
        return c

    for _ in range(warmup):
        s = fn(vals, idx)
    np.asarray(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(vals, idx)
    np.asarray(s)
    dt = (time.perf_counter() - t0) / iters
    print(
        f'{{"which": "scatter", "rows": {n_idx}, "d": {d}, "K": {K}, '
        f'"ms_per_segsum": {dt/K*1e3:.3f}, '
        f'"ns_per_row": {dt/K/n_idx*1e9:.2f}}}',
        flush=True,
    )
    return dt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "matmul"
    if mode in ("matmul", "matmul-f32"):
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
        K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3
        dt = jnp.float32 if mode.endswith("f32") else jnp.bfloat16
        bench_matmul(n, K, iters, dtype=dt, tag=mode)
    elif mode == "bandwidth":
        mb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
        K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
        bench_bandwidth(mb, K)
    elif mode == "gather":
        n_idx = int(sys.argv[2]) if len(sys.argv) > 2 else 454_272
        d = int(sys.argv[3]) if len(sys.argv) > 3 else 32
        bench_gather(n_idx=n_idx, d=d)
    elif mode == "scatter":
        n_idx = int(sys.argv[2]) if len(sys.argv) > 2 else 454_272
        d = int(sys.argv[3]) if len(sys.argv) > 3 else 32
        bench_scatter(n_idx=n_idx, d=d)
    elif mode == "matmul2":
        bench_matmul(4096, 8, 3, tag="matmul2-first-4096")
        bench_matmul(2048, 8, 3, tag="matmul2-second-2048")
        bench_matmul(4096, 8, 3, tag="matmul2-third-4096-again")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
