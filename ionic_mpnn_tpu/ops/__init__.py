"""Core compute ops: packed segment reductions + bond-matrix messages.

Pure-JAX implementations live here (the ground truth and the XLA-fused
default); hand-written TPU kernels live in :mod:`.pallas` behind the same
signatures.
"""

from .segment import aggregate_to_nodes, graph_mean_pool, graph_sum_pool, segment_sum
from .message import (
    bond_type_matrices,
    edge_messages_dense,
    edge_messages_from_table,
    message_pass_aggregate,
    message_pass_aggregate_symmetric,
    message_pass_aggregate_typed,
    parity_edge_mask,
)
from .gru import gated_update

__all__ = [
    "aggregate_to_nodes",
    "graph_mean_pool",
    "graph_sum_pool",
    "segment_sum",
    "bond_type_matrices",
    "edge_messages_dense",
    "edge_messages_from_table",
    "message_pass_aggregate",
    "message_pass_aggregate_symmetric",
    "message_pass_aggregate_typed",
    "parity_edge_mask",
    "gated_update",
]
