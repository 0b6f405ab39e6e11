#!/usr/bin/env python
"""First-in-process microbench for the device-resident screening dispatch.

Round-2 finding: the 10M-pair device-pack sweep runs ~3.2 s per dispatch
(8 x 4096 candidates) when the forward alone should be milliseconds. Each
invocation measures ONE component (second-executable slowdown — CLAUDE.md):

  dispatch   : full screen step (pack both sides + fwd + top-k), scan-K
  pack       : grid_batch_on_device both sides only, scan-K
  pack-nodes : node block of pack_side_on_device only (searchsorted+gather)
  pack-edges : edge block only
  fwd        : fwd + top-k over K pre-packed DISTINCT stacked batches
  caps       : print the exact caps/shapes used (no device work)

Usage: python scripts/tpu_grid_microbench.py MODE [n_cations] [batch] [K]
Shapes mirror `scripts/screen.py --grid-cations 2688 --target-candidates
10000000 --batch-size 4096 --steps-per-call 8`.
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


def build(n_cations: int, B: int):
    from ionic_mpnn_tpu.config import viscosity_config
    from ionic_mpnn_tpu.data import Vocab
    from ionic_mpnn_tpu.data.packing import round_up
    from ionic_mpnn_tpu.data.synthetic import SCREEN_ANIONS, enumerate_cations
    from ionic_mpnn_tpu.inference import IonPool
    from ionic_mpnn_tpu.models import ViscosityModel

    vocab = Vocab.load("data/vocab.pkl")
    cat_pool = IonPool(enumerate_cations(n_cations), vocab)
    an_pool = IonPool(list(SCREEN_ANIONS), vocab)
    C, A = len(cat_pool), len(an_pool)
    n_t = max(1, -(-10_000_000 // (C * A)))
    temps = np.linspace(273.15, 393.15, n_t).astype(np.float32)
    total = C * A * n_t

    gids = np.arange(total, dtype=np.int64)
    ci_all = gids % C
    ai_all = (gids // C) % A

    def batch_max(lens):
        csum = np.zeros(total + 1, np.int64)
        np.cumsum(lens, out=csum[1:])
        bounds = np.arange(0, total + B, B).clip(max=total)
        return int(np.diff(csum[bounds]).max())

    node_cap = round_up(max(batch_max(cat_pool.a_len[ci_all]),
                            batch_max(an_pool.a_len[ai_all])), 128)
    edge_cap = round_up(max(batch_max(cat_pool.e_len[ci_all]),
                            batch_max(an_pool.e_len[ai_all])), 128)
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size)
    model = ViscosityModel(cfg)
    return (cat_pool, an_pool, temps, total, C, A, node_cap, edge_cap,
            model, cfg)


def timeit(fn, *args, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    mode = sys.argv[1]
    n_cations = int(sys.argv[2]) if len(sys.argv) > 2 else 2688
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    (cat_pool, an_pool, temps, total, C, A, node_cap, edge_cap,
     model, cfg) = build(n_cations, B)
    print(f"[shapes] C={C} A={A} total={total:,} node_cap={node_cap} "
          f"edge_cap={edge_cap} B={B} K={K}", flush=True)
    if mode == "caps":
        return

    from ionic_mpnn_tpu.ops.grid_pack import (
        device_pool, grid_batch_on_device, pack_side_on_device)

    cat_d = device_pool(cat_pool)
    an_d = device_pool(an_pool)
    temps_d = jnp.asarray(temps, jnp.float32)

    def one_batch(g0):
        return grid_batch_on_device(
            cat_d, an_d, temps_d, g0, n_cations=C, n_anions=A, total=total,
            batch_size=B, node_cap=node_cap, edge_cap=edge_cap,
            duplicate_edges=False, with_temperature=True)

    if mode == "dispatch":
        batch0 = one_batch(jnp.int32(0))
        params = model.init(jax.random.key(0), batch0, deterministic=True)

        @jax.jit
        def fn(g0):
            def body(carry, s):
                b = one_batch(g0 + s * B)
                pred = model.apply(params, b, deterministic=True)["pred"]
                score = jnp.where(b.sample_mask > 0, -pred, -jnp.inf)
                vals, idx = jax.lax.top_k(score, min(50, B))
                return carry, (vals, g0 + s * B + idx.astype(jnp.int32))
            _, (vs, gis) = jax.lax.scan(body, 0, jnp.arange(K, dtype=jnp.int32))
            v2, i2 = jax.lax.top_k(vs.reshape(-1), min(50, B))
            return v2, gis.reshape(-1)[i2]

        dt = timeit(lambda g: fn(g), jnp.int32(0))
        print(f"[dispatch] {dt*1e3:.1f} ms/dispatch = {dt/K*1e3:.2f} ms/batch "
              f"-> {B*K/dt:,.0f} pairs/s", flush=True)

    elif mode == "pack":
        @jax.jit
        def fn(g0):
            def body(carry, s):
                b = one_batch(g0 + s * B)
                # tiny reduction so nothing big ships back
                r = (jnp.sum(b.cation.atom_ids) + jnp.sum(b.anion.src)
                     + jnp.sum(b.temperature))
                return carry, r
            _, rs = jax.lax.scan(body, 0, jnp.arange(K, dtype=jnp.int32))
            return rs

        dt = timeit(lambda g: fn(g), jnp.int32(0))
        print(f"[pack] {dt*1e3:.1f} ms/dispatch = {dt/K*1e3:.2f} ms/batch",
              flush=True)

    elif mode in ("pack-nodes", "pack-edges"):
        # one cation side per scan step, node or edge block only
        @jax.jit
        def fn(g0):
            def body(carry, s):
                gg = g0 + s * B + jnp.arange(B, dtype=jnp.int32)
                sel = jnp.where(gg < total, gg, 0) % C
                p = pack_side_on_device(cat_d, sel, node_cap, edge_cap)
                if mode == "pack-nodes":
                    r = jnp.sum(p.atom_ids) + jnp.sum(p.node_graph)
                else:
                    r = jnp.sum(p.src) + jnp.sum(p.bond_ids)
                return carry, r
            _, rs = jax.lax.scan(body, 0, jnp.arange(K, dtype=jnp.int32))
            return rs

        dt = timeit(lambda g: fn(g), jnp.int32(0))
        print(f"[{mode}] {dt*1e3:.1f} ms/dispatch = {dt/K*1e3:.2f} ms/side",
              flush=True)

    elif mode == "fwd":
        # K DISTINCT batches packed eagerly once, stacked, scanned
        batches = [one_batch(jnp.int32(i * B)) for i in range(K)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        params = model.init(jax.random.key(0), batches[0], deterministic=True)

        @jax.jit
        def fn(stacked):
            def body(carry, b):
                pred = model.apply(params, b, deterministic=True)["pred"]
                score = jnp.where(b.sample_mask > 0, -pred, -jnp.inf)
                vals, idx = jax.lax.top_k(score, min(50, B))
                return carry, (vals, idx)
            _, out = jax.lax.scan(body, 0, stacked)
            return out

        dt = timeit(lambda s: fn(s), stacked)
        print(f"[fwd] {dt*1e3:.1f} ms/dispatch = {dt/K*1e3:.2f} ms/batch "
              f"-> {B*K/dt:,.0f} pairs/s", flush=True)

    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
