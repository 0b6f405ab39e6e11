#!/usr/bin/env python
"""Isolation probe for AXON finding 4d: batched-matmul cost vs window count.

The production step's message phase is dominated by batched einsums with
tiny per-element dims — exactly the pair

    y   = einsum('wts,wsd->wtd', O_src (nw,T,W), H (nw,W,D))   # src select
    H'  = einsum('wtn,wtd->wnd', O_dst (nw,T,W), y)            # aggregate

(T=128, W=64, D=32 in production). Battery 42 measured the per-edge rate
dropping 1.48x when nw doubles at constant per-window shapes (lane-aligned
tiles, so 4e is excluded). This probe isolates that pair from the rest of
the step and A/Bs a candidate in-jit fix: computing the SAME einsums in
window-chunks via lax.map, so each batched matmul the compiler sees stays
in the (empirically linear) nw<=~1100 regime.

All arms are fetch-synced (np.asarray of a scalar chained through every
scan iteration and dispatch — block_until_ready lies on this backend) and
run in ONE process, one compile each.

Usage: python scripts/tpu_nw_cliff_probe.py [arm ...]
  arms: plain:NW | chunk:NW:C     (defaults: plain at 512/1024/2048/4096,
        chunk at 4096:1024, 4096:512, 2048:1024)
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

T, W, D = 128, 64, 32
K = 8  # chained einsum-pairs per dispatch (scan)
ITERS = 6


def make_operands(nw, seed=0):
    rng = np.random.default_rng(seed)
    # random dense stand-ins for the one-hots: identical matmul cost/shape,
    # scaled so the chained carry stays O(1)
    o = jnp.asarray(rng.standard_normal((nw, T, W)) / np.sqrt(W), jnp.bfloat16)
    h = jnp.asarray(rng.standard_normal((nw, W, D)), jnp.bfloat16)
    return o, h


def run(tag, fn, o, h, nw, chunk=None):
    jfn = jax.jit(fn)
    hh, s = jfn(o, h)
    np.asarray(s)  # compile + first dispatch
    t0 = time.perf_counter()
    for _ in range(ITERS):
        hh, s = jfn(o, hh)
    np.asarray(s)
    dt = (time.perf_counter() - t0) / ITERS / K
    # per einsum-pair: 2 * (nw*T*W*D) * 2 matmuls
    flops = 2.0 * nw * T * W * D * 2
    print(
        f'{{"arm": "{tag}", "nw": {nw}, "chunk": {chunk or 0}, '
        f'"us_per_pair": {dt*1e6:.1f}, '
        f'"us_per_window": {dt*1e6/nw:.4f}, '
        f'"tflops": {flops/dt/1e12:.3f}}}',
        flush=True,
    )


def plain_fn(o, h):
    def body(c, _):
        y = jnp.einsum("wts,wsd->wtd", o, c,
                       preferred_element_type=jnp.float32).astype(c.dtype)
        c2 = jnp.einsum("wtn,wtd->wnd", o, y,
                        preferred_element_type=jnp.float32).astype(c.dtype)
        return c2 * (0.125 / W), ()

    c, _ = jax.lax.scan(body, h, None, length=K)
    return c, jnp.sum(c.astype(jnp.float32))


def make_chunk_fn(chunk):
    def fn(o, h):
        nw = o.shape[0]
        k = nw // chunk
        ok = o.reshape(k, chunk, T, W)

        def body(c, _):
            ck = c.reshape(k, chunk, W, D)

            def one(args):
                oc, hc = args
                y = jnp.einsum("wts,wsd->wtd", oc, hc,
                               preferred_element_type=jnp.float32).astype(hc.dtype)
                return jnp.einsum("wtn,wtd->wnd", oc, y,
                                  preferred_element_type=jnp.float32).astype(hc.dtype)

            c2 = jax.lax.map(one, (ok, ck)).reshape(nw, W, D)
            return c2 * (0.125 / W), ()

        c, _ = jax.lax.scan(body, h, None, length=K)
        return c, jnp.sum(c.astype(jnp.float32))

    return fn


def make_unroll_fn(chunk):
    # chunked WITHOUT loop machinery: a Python-unrolled slice loop — same
    # per-matmul shapes as chunk:, zero lax.map/while overhead. Isolates
    # "is the superlinear cost per-matmul-call size?" from loop cost.
    def fn(o, h):
        nw = o.shape[0]
        k = nw // chunk

        def body(c, _):
            outs = []
            for i in range(k):
                oc = jax.lax.dynamic_slice_in_dim(o, i * chunk, chunk, 0)
                hc = jax.lax.dynamic_slice_in_dim(c, i * chunk, chunk, 0)
                y = jnp.einsum("wts,wsd->wtd", oc, hc,
                               preferred_element_type=jnp.float32).astype(hc.dtype)
                outs.append(jnp.einsum("wtn,wtd->wnd", oc, y,
                                       preferred_element_type=jnp.float32).astype(hc.dtype))
            c2 = jnp.concatenate(outs, axis=0)
            return c2 * (0.125 / W), ()

        c, _ = jax.lax.scan(body, h, None, length=K)
        return c, jnp.sum(c.astype(jnp.float32))

    return fn


def main():
    args = sys.argv[1:] or [
        "plain:512", "plain:1024", "plain:2048", "plain:4096",
        "chunk:4096:1024", "chunk:4096:512", "chunk:2048:1024",
    ]
    print(f"devices: {jax.devices()}", flush=True)
    for a in args:
        parts = a.split(":")
        if parts[0] == "plain":
            nw = int(parts[1])
            o, h = make_operands(nw)
            run("plain", plain_fn, o, h, nw)
        elif parts[0] == "chunk":
            nw, c = int(parts[1]), int(parts[2])
            o, h = make_operands(nw)
            run("chunk", make_chunk_fn(c), o, h, nw, chunk=c)
        elif parts[0] == "unroll":
            nw, c = int(parts[1]), int(parts[2])
            o, h = make_operands(nw)
            run("unroll", make_unroll_fn(c), o, h, nw, chunk=c)
        else:
            raise SystemExit(f"unknown arm {a}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
