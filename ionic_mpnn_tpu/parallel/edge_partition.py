"""Edge-partitioned graph parallelism — the graph analogue of context/
sequence parallelism (SURVEY §2.3 row SP/CP, §5.7).

For batches whose edge count dwarfs a single chip (packed mega-batches,
screening sweeps), the packed edge list is partitioned across the mesh
``data`` axis while node states stay replicated: each device runs the
bond-matrix message + local segment-sum for its edge shard only — the
O(E·D²) dominant cost scales linearly — and one ``psum`` over ICI merges
the partial per-node aggregates before the (cheap, O(N·D²)) gated update
runs replicated. Messages are strictly additive, so the psum is exact.

The same decomposition with ``psum_scatter`` + node sharding is the
natural next step when node state itself outgrows a chip; molecular
graphs (≤ a few hundred atoms) never need that, so aggregates are merged
with a single all-reduce here.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..data.packing import IonPairBatch, PackedGraphs
from ..ops.message import edge_messages_from_table
from ..ops.segment import aggregate_to_nodes

__all__ = [
    "partition_edges",
    "edge_partitioned_aggregate",
    "partition_batch_edges",
    "make_ep_train_step",
]


def partition_edges(graphs: PackedGraphs, n_shards: int) -> PackedGraphs:
    """Reshape the edge axis into (n_shards, E/n_shards) for sharding.

    Edge capacity must divide evenly (the packer's 128-multiple rounding
    guarantees this for power-of-two meshes). Node arrays are left intact
    (replicated); edge shards keep global node indices so gathers stay
    local after replication.
    """
    E = graphs.edge_capacity
    if E % n_shards:
        raise ValueError(f"edge capacity {E} not divisible by {n_shards} shards")

    def shard_edges(x):
        return x.reshape(n_shards, E // n_shards, *x.shape[1:])

    return graphs.replace(
        bond_ids=shard_edges(graphs.bond_ids),
        src=shard_edges(graphs.src),
        dst=shard_edges(graphs.dst),
        edge_mask=shard_edges(graphs.edge_mask),
    )


def edge_partitioned_aggregate(
    mesh: Mesh,
    data_axis: str = "data",
) -> Callable:
    """Build the sharded message+aggregate: edges sharded, nodes replicated.

    Returns fn(node_states (N,D), m_table (V,D,D), sharded_graphs) -> (N,D)
    aggregates, where ``sharded_graphs`` came from :func:`partition_edges`
    with n_shards = mesh.shape[data_axis].
    """

    def local(node_states, m_table, bond_ids, src, dst, edge_mask):
        # leading shard axis stripped by shard_map
        messages = edge_messages_from_table(node_states, bond_ids[0], src[0], m_table)
        partial = aggregate_to_nodes(messages, dst[0], node_states.shape[0], edge_mask[0])
        return jax.lax.psum(partial, data_axis)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
        out_specs=P(),
        check_vma=False,
    )


def partition_batch_edges(batch: IonPairBatch, n_shards: int) -> IonPairBatch:
    """Shard both ions' edge arrays into (n_shards, E/n) for the EP step."""
    return batch.replace(
        cation=partition_edges(batch.cation, n_shards),
        anion=partition_edges(batch.anion, n_shards),
    )


_EDGE_FIELDS = ("bond_ids", "src", "dst", "edge_mask")


def _batch_specs(batch: IonPairBatch, axis: str) -> IonPairBatch:
    """PartitionSpec pytree with the SAME structure (incl. static aux) as
    ``batch``: edge arrays sharded over ``axis`` on their leading shard
    dim, node arrays / labels replicated."""

    def spec_for(path, _leaf):
        names = [getattr(p, "name", "") for p in path]
        return P(axis) if names and names[-1] in _EDGE_FIELDS else P()

    return jax.tree_util.tree_map_with_path(spec_for, batch)


def make_ep_train_step(
    model,
    model_cfg,
    train_cfg,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
):
    """Full edge-partitioned training step (graph analogue of context
    parallelism at the TRAINING level).

    The whole batch's node states and all parameters are replicated; only
    the edge lists shard over the mesh axis. Each message step aggregates
    its local edge shard and merges with one psum (``ModelConfig.ep_axis``
    must equal ``axis`` so the model inserts the collectives); everything
    downstream of the aggregates is replicated, so the loss is replicated
    and only the parameter gradients need a final psum (the edge-shard
    contributions to ``bond_transform``/embedding grads are partial).

    Input batch: from :func:`partition_batch_edges`. Use for packed
    mega-batches whose edge compute dwarfs one chip while node state fits.
    """
    assert model_cfg.ep_axis == axis, (
        f"ModelConfig.ep_axis={model_cfg.ep_axis!r} must equal mesh axis {axis!r}"
    )
    from ..training.loop import TrainState, _data_loss, _l2_penalty

    loss_kind, delta, l2 = train_cfg.loss, train_cfg.huber_delta, model_cfg.fp_l2
    n_shards = mesh.shape[axis]

    def _squeeze(graphs: PackedGraphs) -> PackedGraphs:
        return graphs.replace(
            bond_ids=graphs.bond_ids[0], src=graphs.src[0],
            dst=graphs.dst[0], edge_mask=graphs.edge_mask[0],
        )

    # Gradient exactness of psum(local_grads) / n_shards:
    #   * forward: every post-aggregate activation (and the loss) is
    #     replicated, so each shard's backward starts from the true seed;
    #   * edge-sharded paths: the transpose of the forward psum sums the
    #     (replicated) cotangents, giving each shard's edge contributions
    #     an n× cotangent — psum over shards then yields n × the true
    #     edge gradient;
    #   * replicated paths: every shard computes the identical true
    #     gradient — psum yields n × it as well.
    #   Dividing the psum by n therefore recovers the exact single-device
    #   gradient for BOTH path types (verified vs the single-device step
    #   in tests/test_ep_train.py).
    def per_device(state: TrainState, batch: IonPairBatch):
        local = batch.replace(
            cation=_squeeze(batch.cation), anion=_squeeze(batch.anion)
        )
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out = model.apply({"params": params}, local, deterministic=False,
                              rngs={"dropout": dropout_rng})
            data = _data_loss(out["pred"], local.y, local.sample_mask, loss_kind, delta)
            return data + _l2_penalty(params, l2), data

        (loss, data), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = jax.tree.map(lambda g: jax.lax.psum(g / n_shards, axis), grads)
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=new_params,
            opt_state=new_opt_state, rng=rng,
        )
        return new_state, {"loss": loss, "data_loss": data}

    def step(state: TrainState, batch: IonPairBatch):
        sharded = shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), _batch_specs(batch, axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return sharded(state, batch)

    return jax.jit(step, donate_argnums=(0,))
