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

from typing import Callable

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..data.packing import PackedGraphs
from ..ops.message import edge_messages_from_table
from ..ops.segment import aggregate_to_nodes

__all__ = ["partition_edges", "edge_partitioned_aggregate"]


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
