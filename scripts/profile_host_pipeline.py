#!/usr/bin/env python
"""Host-side epoch pipeline breakdown (CPU-only, no TPU needed).

Times each stage of what fit() does per epoch on the host at production
scale: columnar flatten (once), per-epoch plan+pack+tile (C++), the
K-group np.stack assembly, and the per-batch Python bookkeeping. Guides
the round-3 'C++ epoch pipeline' work (CLAUDE.md agenda item 3).

Usage: python scripts/profile_host_pipeline.py [n_records] [batch] [K]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> int:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from ionic_mpnn_tpu.benchmarks import make_bench_dataset
    from ionic_mpnn_tpu.config import edge_layout_for
    from ionic_mpnn_tpu.data import plan_capacities
    from ionic_mpnn_tpu.data.columnar import ColumnarIonPairs, iter_batches_fast

    records, vocab = make_bench_dataset(n_records)
    # profile the ACCELERATOR layout on the host (this script runs on CPU,
    # where resolve_message_impl would pick "gather"/"sorted" — not what
    # fit() packs for on TPU), so the impl is pinned rather than resolved
    impl = "onehot"
    plan = plan_capacities(records, batch_size=batch,
                           edge_layout=edge_layout_for(impl))
    print(f"plan: node_cap={plan.node_cap} edge_cap={plan.edge_cap} "
          f"edge_tile={plan.edge_tile} layout={plan.edge_layout}")

    t0 = time.perf_counter()
    data = ColumnarIonPairs.from_records(records)
    t_flatten = time.perf_counter() - t0
    print(f"columnar flatten (once): {t_flatten:.3f}s")

    # per-epoch: pack only
    for rep in range(2):
        t0 = time.perf_counter()
        n_batches = 0
        bytes_total = 0
        for b in iter_batches_fast(data, plan, shuffle=True, seed=rep):
            n_batches += 1
            if n_batches == 1:
                for leaf in jax.tree.leaves(b):
                    bytes_total += np.asarray(leaf).nbytes
        t_pack = time.perf_counter() - t0
        print(f"epoch pack+tile (C++ via iter_batches_fast): {t_pack:.3f}s "
              f"({n_batches} batches, {bytes_total/1e6:.2f} MB/batch, "
              f"{bytes_total*n_batches/1e6:.1f} MB/epoch)")

    # per-epoch: pack + K-group np.stack (what fit() does before dispatch)
    for rep in range(2):
        t0 = time.perf_counter()
        t_stack = 0.0
        group = []
        n_groups = 0
        for b in iter_batches_fast(data, plan, shuffle=True, seed=rep):
            group.append(b)
            if len(group) == K:
                s0 = time.perf_counter()
                jax.tree.map(lambda *xs: np.stack(xs), *group)
                t_stack += time.perf_counter() - s0
                group = []
                n_groups += 1
        if group:
            s0 = time.perf_counter()
            group = group + [group[-1]] * (K - len(group))
            jax.tree.map(lambda *xs: np.stack(xs), *group)
            t_stack += time.perf_counter() - s0
            n_groups += 1
        t_all = time.perf_counter() - t0
        print(f"epoch pack+stack: {t_all:.3f}s (stack alone {t_stack:.3f}s, "
              f"{n_groups} groups)")

    # per-epoch: + sample_mask sum bookkeeping (fit's _run_group)
    t0 = time.perf_counter()
    for b in iter_batches_fast(data, plan, shuffle=True, seed=0):
        float(np.asarray(b.sample_mask).sum())
    print(f"mask-sum bookkeeping: {time.perf_counter() - t0:.3f}s incl. pack")

    # per-epoch: + device_put on CPU backend (upper bound for array create)
    t0 = time.perf_counter()
    group = []
    for b in iter_batches_fast(data, plan, shuffle=True, seed=0):
        group.append(b)
        if len(group) == K:
            stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
            jax.block_until_ready(jax.device_put(stacked))
            group = []
    if group:
        # same pad-and-process tail as the stack section, so the two
        # printed timings cover identical work
        group = group + [group[-1]] * (K - len(group))
        stacked = jax.tree.map(lambda *xs: np.stack(xs), *group)
        jax.block_until_ready(jax.device_put(stacked))
    print(f"pack+stack+device_put(cpu): {time.perf_counter() - t0:.3f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
