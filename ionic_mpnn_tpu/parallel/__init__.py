"""Parallel tier: mesh construction, data-parallel and edge-partitioned SPMD."""

from .mesh import batch_sharding, make_mesh, replicated_sharding
from .data_parallel import make_dp_train_step, shard_batch, stack_batches, split_for_devices
from .edge_partition import (
    edge_partitioned_aggregate,
    make_ep_train_step,
    partition_batch_edges,
    partition_edges,
)
from .halo_partition import (
    collective_stats,
    make_halo_ep_train_step,
    partition_graphs_halo,
    partition_halo_batch,
)
from .aligned_partition import (
    make_aligned_ep_train_step,
    shard_aligned_batch,
    shard_graphs_aligned,
    stack_aligned_dp_batches,
)
from .tensor_parallel import (
    make_tp_train_step,
    param_specs,
    shard_params,
    shard_train_state,
    state_shardings,
)
from .distributed import host_record_shard, initialize_distributed

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicated_sharding",
    "make_dp_train_step",
    "shard_batch",
    "stack_batches",
    "split_for_devices",
    "edge_partitioned_aggregate",
    "make_ep_train_step",
    "partition_batch_edges",
    "partition_edges",
    "collective_stats",
    "make_aligned_ep_train_step",
    "shard_aligned_batch",
    "shard_graphs_aligned",
    "stack_aligned_dp_batches",
    "make_halo_ep_train_step",
    "partition_graphs_halo",
    "partition_halo_batch",
    "make_tp_train_step",
    "param_specs",
    "shard_params",
    "shard_train_state",
    "state_shardings",
    "host_record_shard",
    "initialize_distributed",
]
