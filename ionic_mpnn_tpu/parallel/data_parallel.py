"""Data-parallel SPMD training over packed graph batches.

Replaces the reference's single-device ``model.fit``
(``train_viscosity.py:328-338``) with a shard_map'd train step over a
``Mesh`` data axis: every device owns one packed sub-batch (a full
statically-shaped :class:`IonPairBatch`), computes local grads, and the
gradient all-reduce rides ICI via ``psum``. Parameters and optimizer
state are replicated; the per-device loss is weighted by real-sample
counts so padded batch slots never bias the global loss.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ModelConfig, TrainConfig
from ..data.packing import IonPairBatch
from ..training.loop import TrainState, _data_loss, _l2_penalty

__all__ = ["stack_batches", "shard_batch", "make_dp_train_step",
           "make_per_device_step"]


def stack_batches(batches: Sequence[IonPairBatch]) -> IonPairBatch:
    """Stack per-device batches along a new leading device axis.

    All batches must share the same static capacities (guaranteed when they
    come from one :class:`BatchPlan`).
    """
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *batches)


def shard_batch(stacked: IonPairBatch, mesh: Mesh, data_axis: str = "data") -> IonPairBatch:
    """Device-put a stacked batch with its leading axis sharded over data."""
    sharding = NamedSharding(mesh, P(data_axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def _squeeze_leading(batch: IonPairBatch) -> IonPairBatch:
    return jax.tree.map(lambda x: x[0], batch)


def make_per_device_step(
    model,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    n_data: int,
    data_axis: str = "data",
    has_batch_stats: bool = False,
):
    """The DP step body that runs INSIDE shard_map on each device: takes a
    local (un-stacked) :class:`IonPairBatch`, psums grads/loss over
    ``data_axis``, applies the optimizer to the replicated state. Shared
    by :func:`make_dp_train_step` and the DP device-resident epoch runner
    (``training/device_epochs.make_dp_device_epoch_call``)."""
    loss_kind, delta, l2 = train_cfg.loss, train_cfg.huber_delta, model_cfg.fp_l2

    def per_device_step(state: TrainState, batch: IonPairBatch):
        rng = jax.random.fold_in(state.rng, jax.lax.axis_index(data_axis))
        rng, dropout_rng = jax.random.split(rng)

        def loss_fn(params):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = state.batch_stats
                out, mutated = model.apply(
                    variables, batch, deterministic=False,
                    rngs={"dropout": dropout_rng}, mutable=["batch_stats"],
                )
                new_stats = mutated["batch_stats"]
            else:
                out = model.apply(variables, batch, deterministic=False,
                                  rngs={"dropout": dropout_rng})
                new_stats = state.batch_stats
            # globally-correct weighting: local weighted sum / global count
            local_sum = _data_loss(out["pred"], batch.y, batch.sample_mask,
                                   loss_kind, delta) * jnp.sum(batch.sample_mask)
            global_n = jax.lax.psum(jnp.sum(batch.sample_mask), data_axis)
            data = local_sum / jnp.maximum(global_n, 1.0)
            reg = _l2_penalty(params, l2) / n_data  # added once globally after psum
            return data + reg, (data, new_stats, global_n)

        (loss, (data, new_stats, global_n)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.psum(grads, data_axis)
        loss = jax.lax.psum(loss, data_axis)
        if has_batch_stats:
            new_stats = jax.lax.pmean(new_stats, data_axis)

        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            rng=jax.random.fold_in(state.rng, 1),
        )
        return new_state, {"loss": loss, "n": global_n}

    return per_device_step


def make_dp_train_step(
    model,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    data_axis: str = "data",
    has_batch_stats: bool = False,
    steps_per_call: int = 1,
) -> Callable[[TrainState, IonPairBatch], Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the SPMD train step.

    With ``steps_per_call == 1`` (default): input batch is a stacked
    :class:`IonPairBatch` with leading axis = ``mesh.shape[data_axis]``,
    sharded over the data axis (see :func:`shard_batch`); returns
    ``{"loss", "n"}``. State is replicated.

    With ``steps_per_call == K > 1``: dispatch amortization composed with
    DP — the input carries TWO leading axes ``(K, n_dev, ...)`` (see
    :func:`stack_batch_groups`), a ``lax.scan`` over K runs INSIDE the
    shard_map body so one host dispatch drives K optimizer steps with one
    gradient psum each, and group-padding all-empty scan slots are
    skipped under ``lax.cond`` (the predicate is a psum → uniform across
    shards, so the collective placement stays SPMD-safe). Returns
    ``{"loss_sum", "n"}`` (sample-weighted, like ``make_scan_train_step``).
    """
    n_data = mesh.shape[data_axis]
    inner = make_per_device_step(model, model_cfg, train_cfg, optimizer,
                                 n_data, data_axis, has_batch_stats)

    def per_device_step(state: TrainState, dev_batch: IonPairBatch):
        return inner(state, _squeeze_leading(dev_batch))

    state_spec = P()  # replicated

    if steps_per_call <= 1:
        sharded = shard_map(
            per_device_step,
            mesh=mesh,
            in_specs=(state_spec, P(data_axis)),
            out_specs=(state_spec, P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,))

    def per_device_multi(state: TrainState, batches: IonPairBatch):
        # leaves: (K, 1, ...) — scan over K, squeeze the device axis inside
        def body(s, b):
            n_global = jax.lax.psum(jnp.sum(b.sample_mask), data_axis)

            def run(s_):
                s2, m = per_device_step(s_, b)
                return s2, (m["loss"], m["n"])

            def skip(s_):
                return s_, (jnp.float32(0.0), jnp.float32(0.0))

            return jax.lax.cond(n_global > 0, run, skip, s)

        state, (losses, ns) = jax.lax.scan(body, state, batches)
        return state, {"loss_sum": jnp.sum(losses * ns), "n": jnp.sum(ns)}

    sharded = shard_map(
        per_device_multi,
        mesh=mesh,
        in_specs=(state_spec, P(None, data_axis)),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def stack_batch_groups(
    groups: Sequence[Sequence[IonPairBatch]], mesh: Mesh, data_axis: str = "data"
) -> IonPairBatch:
    """Stack K groups of n_dev batches into (K, n_dev, ...) leaves, device
    axis sharded (for ``make_dp_train_step(steps_per_call=K)``)."""
    stacked = jax.tree.map(
        lambda *xs: np.stack(xs, axis=0), *[stack_batches(g) for g in groups]
    )
    sharding = NamedSharding(mesh, P(None, data_axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stacked)


def split_for_devices(
    records: Sequence[Any], n_devices: int
) -> List[Sequence[Any]]:
    """Round-robin records across devices (equal counts, off-by-one ok)."""
    return [list(records[i::n_devices]) for i in range(n_devices)]
