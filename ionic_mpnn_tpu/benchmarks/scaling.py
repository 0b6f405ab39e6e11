"""Multi-device scaling-efficiency harness (edges/s at 1..N devices).

North-star: ≥80% edges/s scaling efficiency (BASELINE.json). On real
multi-chip hardware this measures true scaling over ICI; on the CI
virtual CPU mesh it validates the harness end-to-end (the numbers are
not meaningful there — host cores are oversubscribed).

Three modes, covering every production parallelism tier:

  * ``"dp"`` — weak scaling: fixed per-device batch (gather math on
    sorted batches, replicated params, grad psum),
  * ``"dp_onehot"`` — weak scaling of the PRODUCTION step: onehot
    message impl on window_aligned batches under DP,
  * ``"aligned_ep"`` — STRONG scaling of one fixed global batch via
    aligned EP v3 (node-sharded onehot, zero per-message-step comm).
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
    make_aligned_ep_train_step,
    make_dp_train_step,
    make_mesh,
    shard_aligned_batch,
    shard_batch,
    split_for_devices,
    stack_batches,
)
from ..training.loop import TrainState
from ..training.optim import make_optimizer
from .harness import make_bench_dataset

__all__ = ["run_scaling_benchmark"]


def _time_steps(step_fn, state, batch, iters, warmup):
    # Synchronize by FETCHING the loss to the host (np.asarray), never by
    # jax.block_until_ready: on the axon relay backend block_until_ready
    # returns before execution completes (round 2, RESULTS.md battery 5/6:
    # 0.4 ms block-synced vs 2146 ms fetch-synced for one identical
    # dispatch). The TrainState threads through every dispatch, so one
    # fetch of the final loss forces the whole timed chain.
    for _ in range(warmup):
        state, m = step_fn(state, batch)
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step_fn(state, batch)
    np.asarray(m["loss"])
    return (time.perf_counter() - t0) / iters


def _new_state(model, cfg, tcfg, init_batch):
    # init with the collective-free twin so init works outside shard_map
    init_model = ViscosityModel(cfg.replace(ep_axis=None))
    variables = init_model.init(jax.random.PRNGKey(0), init_batch)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    params = jax.tree.map(jnp.array, variables["params"])
    return TrainState(
        step=jnp.int32(0), params=params, batch_stats={},
        opt_state=optimizer.init(params), rng=jax.random.PRNGKey(0),
    ), optimizer


def _count_edges(batches) -> int:
    return sum(
        int(np.asarray(b.cation.edge_mask).sum() + np.asarray(b.anion.edge_mask).sum())
        for b in batches
    )


def run_scaling_benchmark(
    per_device_batch: int = 256,
    num_steps: int = 4,
    iters: int = 10,
    warmup: int = 3,
    device_counts: List[int] | None = None,
    mode: str = "dp",  # "dp" | "dp_onehot" | "aligned_ep"
) -> Dict[str, Any]:
    """Scaling sweep over device counts (weak for DP modes, strong for
    aligned EP — see module docstring)."""
    all_devices = jax.devices()
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16) if n <= len(all_devices)]
    max_n = max(device_counts)

    records, vocab = make_bench_dataset(per_device_batch * max_n)
    onehot = mode in ("dp_onehot", "aligned_ep")
    cfg = viscosity_config(
        vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=num_steps,
        message_impl="onehot" if onehot else "gather",
    )
    tcfg = TrainConfig()
    layout = "window_aligned" if onehot else "sorted"

    results = []
    base_rate = None
    for n in device_counts:
        if mode == "aligned_ep":
            # strong scaling: ONE fixed global batch, node-sharded n ways
            mesh = make_mesh(MeshConfig(data_parallel=n),
                             devices=all_devices[:n])
            plan = plan_capacities(records, batch_size=per_device_batch * max_n,
                                   edge_layout=layout, node_shards=max_n)
            batch = next(iter_batches(records, plan))
            batches = [batch]
            cfg_ep = cfg.replace(ep_axis="data")
            state, optimizer = _new_state(ViscosityModel(cfg_ep), cfg_ep,
                                          tcfg, batch)
            step_fn = make_aligned_ep_train_step(
                ViscosityModel(cfg_ep), cfg_ep, tcfg, optimizer, mesh)
            dev_batch = shard_aligned_batch(batch, n, plan.window)
        else:
            mesh = make_mesh(MeshConfig(data_parallel=n), devices=all_devices[:n])
            plan = plan_capacities(records, batch_size=per_device_batch,
                                   edge_layout=layout)
            shards = split_for_devices(records[: per_device_batch * n], n)
            batches = [next(iter_batches(s, plan)) for s in shards]
            model = ViscosityModel(cfg)
            state, optimizer = _new_state(model, cfg, tcfg, batches[0])
            step_fn = make_dp_train_step(model, cfg, tcfg, optimizer, mesh)
            dev_batch = shard_batch(stack_batches(batches), mesh)
        step_time = _time_steps(step_fn, state, dev_batch, iters, warmup)
        edges = _count_edges(batches) * num_steps
        rate = edges / step_time
        if mode == "aligned_ep":
            # strong scaling: efficiency = speedup over 1 device / n
            if base_rate is None:
                base_rate = rate
            eff = (rate / base_rate) / (n / device_counts[0])
            per_chip = rate / n
        else:
            per_chip = rate / n
            if base_rate is None:
                base_rate = per_chip
            eff = per_chip / base_rate
        results.append(
            {
                "devices": n,
                "edges_per_s": round(rate, 1),
                "edges_per_s_per_chip": round(per_chip, 1),
                "scaling_efficiency": round(eff, 4),
                "step_ms": round(step_time * 1e3, 3),
            }
        )
    key = "strong_scaling" if mode == "aligned_ep" else "weak_scaling"
    return {"platform": all_devices[0].platform, "mode": mode, key: results}
