"""Multi-host bootstrap: jax.distributed + per-host data sharding.

The reference is single-process (SURVEY §2.3/5.8). Multi-host TPU slices
here follow the standard JAX SPMD recipe: every host runs the same
program, ``jax.distributed.initialize()`` wires the backend, the mesh
spans all global devices, each host loads only its shard of the data,
and ``jax.make_array_from_process_local_data`` assembles globally-sharded
batches. Collectives ride ICI within a slice and DCN across slices —
XLA chooses routes from the mesh's device order.

Single-host (and the CI virtual-device mesh) is the degenerate case:
``initialize_distributed()`` is a no-op and host_shard returns everything.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_distributed", "host_record_shard", "global_batch_from_local"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize jax.distributed when running multi-process; returns
    process index (0 on single host). Safe to call unconditionally."""
    if num_processes is None or num_processes <= 1:
        return 0
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def host_record_shard(records: Sequence[Any]) -> Sequence[Any]:
    """The slice of a dataset this host is responsible for loading."""
    n = jax.process_count()
    if n <= 1:
        return records
    return list(records[jax.process_index()::n])


def global_batch_from_local(stacked_local, mesh: Mesh, data_axis: str = "data"):
    """Assemble a globally-sharded batch from each host's stacked local
    batches (leading axis = this host's local device count)."""
    sharding = NamedSharding(mesh, P(data_axis))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        stacked_local,
    )
