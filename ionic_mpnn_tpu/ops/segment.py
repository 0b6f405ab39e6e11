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

__all__ = ["segment_sum", "aggregate_to_nodes", "graph_sum_pool",
           "graph_sum_pool_windowed", "graph_mean_pool"]


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


def graph_sum_pool_windowed(
    node_states: jnp.ndarray,  # (N, D)
    node_graph: jnp.ndarray,  # (N,) int32, non-decreasing (aligned packer)
    node_mask: jnp.ndarray,  # (N,) bool
    pool_slot: jnp.ndarray,  # (B,) int32 from packing.compute_pool_slots
    window: int,
    n_graphs: int,
) -> jnp.ndarray:
    """All-MXU masked per-graph sum for window-ALIGNED batches.

    The round-4 phase probe attributed 0.79 ms of the 2.21 ms production
    forward (batch 2048) to the two segment-sum readouts — per-row
    scatter cost again, same diagnosis as the message op (CLAUDE.md). On
    aligned batches no molecule straddles a window, so each graph's
    complete sum is one row of a PER-WINDOW one-hot pool::

        local[w, n]   = node_graph[w·W + n] − node_graph[w·W]
        o[w, t, n]    = (local[w, n] == t) & mask          (t, n < W)
        rows[w, t, :] = Σ_n o[w, t, n] · h[w·W + n, :]      (batched MXU)
        pooled[g]     = rows.reshape(nw·W, D)[pool_slot[g]]

    — batched (W, W) @ (W, D) matmuls plus ONE B-row gather; the
    autodiff backward is the transposed matmul + a B-row scatter (vs the
    N-row gather of the segment-sum backward). Pad/gap rows are masked
    out of ``o``; empty graph slots carry ``pool_slot == −1`` and read 0.

    PRECISION NOTE: the pooled sums are INTENTIONALLY returned in f32
    (``preferred_element_type`` accumulation, never cast back) even when
    ``node_states`` is bf16 — the readout feeds the fingerprint Dense,
    where the upgraded accumulation is free accuracy. The
    :func:`graph_sum_pool` fallback (non-aligned batches) accumulates in
    the input dtype and is therefore the LOWER-precision path of the two
    in bf16 configs.

    Reference math covered: ``models/layers.py:159-164`` (GlobalSumPool).
    """
    N, D = node_states.shape
    assert N % window == 0, (N, window)
    nw = N // window
    dtype = node_states.dtype
    ngw = node_graph.reshape(nw, window)
    local = ngw - ngw[:, :1]
    o = (local[:, None, :] == jnp.arange(window, dtype=node_graph.dtype)[None, :, None])
    o = o & node_mask.reshape(nw, 1, window)
    rows = jnp.einsum(
        "wtn,wnd->wtd", o.astype(dtype), node_states.reshape(nw, window, D),
        preferred_element_type=jnp.float32,
    )
    flat = rows.reshape(nw * window, D)
    safe = jnp.clip(pool_slot, 0, nw * window - 1)
    pooled = jnp.take(flat, safe, axis=0)
    return pooled * (pool_slot >= 0)[:, None].astype(pooled.dtype)


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
