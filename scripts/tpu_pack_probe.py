#!/usr/bin/env python
"""Cost of the on-device grid pack ALONE (no model forward), fetch-synced.

Battery-28 follow-up: the aligned brute sweep runs ~44 ms per 4096-pair
batch while the train step suggests the forward itself is only a few ms —
if per-row gathers in ``pack_side_on_device``/``window_tile_on_device``
dominate, a molecule-major (row-gather) pack formulation would be the
next screening win. This probe times the jitted batch build by itself.

Usage: python scripts/tpu_pack_probe.py [batch] [iters]
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ionic_mpnn_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    mode = sys.argv[3] if len(sys.argv) > 3 else "elementwise"  # | padded

    from ionic_mpnn_tpu.benchmarks import make_bench_dataset
    from ionic_mpnn_tpu.data.synthetic import ANION_SMILES, CATION_TEMPLATES
    from ionic_mpnn_tpu.inference import IonPool
    from ionic_mpnn_tpu.ops.grid_pack import (
        device_pool,
        grid_batch_on_device,
        pool_aligned_tile_bound,
        pool_pitch,
    )

    cations = []
    for kind, fn in CATION_TEMPLATES:
        for n1 in (1, 2, 3, 4, 6, 8):
            cations.append(fn(n1, 1) if kind == "im" else fn(n1))
    cations = sorted(set(cations))
    anions = [s for _, s, _ in ANION_SMILES]
    records, vocab = make_bench_dataset(64)
    cat, an = IonPool(cations, vocab), IonPool(anions, vocab)
    C, A = len(cat), len(an)
    temps = jnp.asarray(np.linspace(280.0, 380.0, 8), np.float32)
    total = C * A * len(np.asarray(temps))
    window = 64

    p_c = pool_pitch(cat.a_len, window)
    p_a = pool_pitch(an.a_len, window)
    if mode == "padded":
        cat_d = device_pool(cat, pitch=p_c)
        an_d = device_pool(an, pitch=p_a)
    else:
        cat_d, an_d = device_pool(cat), device_pool(an)
    t_c = pool_aligned_tile_bound(cat.e_len, window, p_c)
    t_a = pool_aligned_tile_bound(an.e_len, window, p_a)

    def build(g0):
        b = grid_batch_on_device(
            cat_d, an_d, temps, g0,
            n_cations=C, n_anions=A, total=total, batch_size=batch,
            node_cap=batch * p_c, edge_cap=batch * 128,
            edge_layout="window_aligned", edge_tile=t_c, window=window,
            pitch=p_c, anion_node_cap=batch * p_a, anion_edge_cap=batch * 64,
            anion_edge_tile=t_a, anion_pitch=p_a,
        )
        # fold every produced plane into ONE scalar so the fetch forces the
        # whole pack to execute (fetch-synced; block_until_ready under-waits)
        s = jnp.int32(0)
        for side in (b.cation, b.anion):
            s = (s + jnp.sum(side.atom_ids) + jnp.sum(side.src)
                 + jnp.sum(side.dst) + jnp.sum(side.bond_ids)
                 + jnp.sum(side.edge_mask) + jnp.sum(side.node_mask))
        return s

    fn = jax.jit(build)
    t0 = time.perf_counter()
    out = int(np.asarray(fn(jnp.int32(0))))
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += int(np.asarray(fn(jnp.int32(i % max(total - batch, 1)))))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "mode": f"pack-only-aligned-perside-{mode}",
        "batch": batch, "window": window,
        "pitch": [p_c, p_a], "tile": [t_c, t_a],
        "node_caps": [batch * p_c, batch * p_a],
        "compile_s": round(compile_s, 2),
        "ms_per_batch": round(dt / iters * 1e3, 3),
        "checksum": acc,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
