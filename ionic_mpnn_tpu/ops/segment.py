"""Segment reductions over packed graph batches.

These replace the reference's padded-dense scatter/mask ops:
``tf.scatter_nd`` aggregation (``models/layers.py:53-83``) and the masked
global sum pool (``models/layers.py:159-164``) become flat
``jax.ops.segment_sum`` calls over statically-shaped packed arrays —
no per-molecule padding waste, XLA-fusable, and shard_map-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["segment_sum", "aggregate_to_nodes", "graph_sum_pool", "graph_mean_pool"]


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    """Thin wrapper fixing the static ``num_segments`` + sorted hints off."""
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def aggregate_to_nodes(
    messages: jnp.ndarray,  # (E, D)
    dst: jnp.ndarray,  # (E,) int32, sorted ascending for determinism
    num_nodes: int,
    edge_mask: jnp.ndarray | None = None,  # (E,) bool
) -> jnp.ndarray:
    """Sum per-edge messages into their destination nodes.

    Equivalent of the reference ``Reduce`` layer (``models/layers.py:52-83``)
    minus its padding quirk; masking (including the parity quirk) is the
    caller's responsibility via ``edge_mask``.
    """
    if edge_mask is not None:
        messages = messages * edge_mask[:, None].astype(messages.dtype)
    return jax.ops.segment_sum(
        messages, dst, num_segments=num_nodes, indices_are_sorted=True
    )


def graph_sum_pool(
    node_states: jnp.ndarray,  # (N, D)
    node_graph: jnp.ndarray,  # (N,) int32 graph slot ids
    n_graphs: int,
    node_mask: jnp.ndarray,  # (N,) bool
    node_sorted: bool = False,
) -> jnp.ndarray:
    """Masked per-graph sum readout (reference ``GlobalSumPool``,
    ``models/layers.py:159-164``: mask = atom_ids > 0).

    ``node_sorted=True`` (PackedGraphs.node_sorted: the packer
    forward-filled pad/gap rows so ids are non-decreasing) takes the
    sorted segment-sum path — per-row scatter is the weak op on this
    backend, and unsorted-id pools were implicated in the balanced-mode
    regression (RESULTS battery 27/29). NEVER set it for ids that are
    not actually non-decreasing (silent wrong results).
    """
    weighted = node_states * node_mask[:, None].astype(node_states.dtype)
    return jax.ops.segment_sum(weighted, node_graph, num_segments=n_graphs,
                               indices_are_sorted=node_sorted)


def graph_mean_pool(
    node_states: jnp.ndarray,
    node_graph: jnp.ndarray,
    n_graphs: int,
    node_mask: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Mean readout (not in the reference; provided for the clean model zoo)."""
    sums = graph_sum_pool(node_states, node_graph, n_graphs, node_mask)
    counts = jax.ops.segment_sum(
        node_mask.astype(node_states.dtype), node_graph, num_segments=n_graphs,
    )
    return sums / (counts[:, None] + eps)
