"""Multi-device scaling-efficiency harness (edges/s at 1..N devices).

North-star: ≥80% edges/s scaling efficiency (BASELINE.json). On real
multi-chip hardware this measures true DP scaling over ICI; on the CI
virtual CPU mesh it validates the harness end-to-end (the numbers are
not meaningful there — host cores are oversubscribed).
"""

from __future__ import annotations

import time
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MeshConfig, TrainConfig, viscosity_config
from ..data import iter_batches, plan_capacities
from ..models import ViscosityModel
from ..parallel import (
    make_dp_train_step,
    make_mesh,
    shard_batch,
    split_for_devices,
    stack_batches,
)
from ..training.loop import TrainState
from ..training.optim import make_optimizer
from .harness import make_bench_dataset

__all__ = ["run_scaling_benchmark"]


def _measure(model, cfg, tcfg, mesh, stacked, batches, iters, warmup):
    variables = model.init(jax.random.PRNGKey(0), batches[0])
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    params = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(
        step=jnp.int32(0), params=params, batch_stats={},
        opt_state=optimizer.init(params), rng=jax.random.PRNGKey(0),
    )
    step_fn = make_dp_train_step(model, cfg, tcfg, optimizer, mesh)
    sb = shard_batch(stacked, mesh)
    # Synchronize by FETCHING the loss to the host (np.asarray), never by
    # jax.block_until_ready: on the axon relay backend block_until_ready
    # returns before execution completes (round 2, RESULTS.md battery 5/6:
    # 0.4 ms block-synced vs 2146 ms fetch-synced for one identical
    # dispatch). The TrainState threads through every dispatch, so one
    # fetch of the final loss forces the whole timed chain.
    for _ in range(warmup):
        state, m = step_fn(state, sb)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step_fn(state, sb)
    np.asarray(m["loss"])
    return (time.perf_counter() - t0) / iters


def run_scaling_benchmark(
    per_device_batch: int = 256,
    num_steps: int = 4,
    iters: int = 10,
    warmup: int = 3,
    device_counts: List[int] | None = None,
) -> Dict[str, Any]:
    """Weak-scaling sweep: fixed per-device batch, growing device count."""
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16) if n <= len(all_devices)]

    records, vocab = make_bench_dataset(per_device_batch * max(device_counts))
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=num_steps)
    tcfg = TrainConfig()
    model = ViscosityModel(cfg)
    plan = plan_capacities(records, batch_size=per_device_batch)

    results = []
    base_rate = None
    for n in device_counts:
        mesh = make_mesh(MeshConfig(data_parallel=n), devices=all_devices[:n])
        shards = split_for_devices(records[: per_device_batch * n], n)
        batches = [next(iter_batches(s, plan)) for s in shards]
        stacked = stack_batches(batches)
        step_time = _measure(model, cfg, tcfg, mesh, stacked, batches, iters, warmup)
        edges = sum(
            int(np.asarray(b.cation.edge_mask).sum() + np.asarray(b.anion.edge_mask).sum())
            for b in batches
        ) * num_steps
        rate = edges / step_time
        per_chip = rate / n
        if base_rate is None:
            base_rate = per_chip
        results.append(
            {
                "devices": n,
                "edges_per_s": round(rate, 1),
                "edges_per_s_per_chip": round(per_chip, 1),
                "scaling_efficiency": round(per_chip / base_rate, 4),
                "step_ms": round(step_time * 1e3, 3),
            }
        )
    return {"platform": all_devices[0].platform, "weak_scaling": results}
