"""Tensor-parallel parameter sharding over the mesh ``model`` axis.

At the reference's dims (atom_dim 32) TP is unnecessary — one chip holds
everything thousands of times over (SURVEY §2.3). It exists for scaled-up
configs (wide fingerprints, large bond vocabularies): parameters are
placed with NamedShardings by path-suffix rules and XLA GSPMD inserts the
collectives; the model code is unchanged.

Default rules shard the largest tensors on their output-feature axis:
``bond_transform`` (F, D, D) on the last D, the fingerprint / head Dense
kernels on their output column, and embedding tables on the feature
column. Biases and LayerNorm scales stay replicated.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
from flax import traverse_util
from flax.core import unfreeze
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["DEFAULT_TP_RULES", "param_specs", "shard_params"]

# (path-suffix substring, PartitionSpec) — first match wins.
DEFAULT_TP_RULES: List[Tuple[str, P]] = [
    ("bond_transform", P(None, None, "model")),
    ("fp_dense/kernel", P(None, "model")),
    ("head_dense/kernel", P(None, "model")),
    ("atom_embed", P(None, "model")),
    ("bond_embed", P(None, "model")),
]


def _spec_for(name: str, rules: Sequence[Tuple[str, P]]) -> P:
    for suffix, spec in rules:
        if suffix in name:
            return spec
    return P()  # replicated


def param_specs(params: Any, rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES) -> Any:
    """PartitionSpec pytree matching ``params`` by path rules."""
    flat = traverse_util.flatten_dict(unfreeze(params))
    specs = {}
    for path, value in flat.items():
        name = "/".join(str(p) for p in path)
        spec = _spec_for(name, rules)
        # drop axes the tensor doesn't have (e.g. 2D rule on 1D bias)
        if len(spec) > value.ndim:
            spec = P(*spec[: value.ndim])
        specs[path] = spec
    return traverse_util.unflatten_dict(specs)


def shard_params(
    params: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES,
) -> Any:
    """Device-put params with TP NamedShardings over ``mesh``."""
    flat = traverse_util.flatten_dict(unfreeze(params))
    out = {}
    for path, value in flat.items():
        name = "/".join(str(p) for p in path)
        spec = _spec_for(name, rules)
        if len(spec) > value.ndim:
            spec = P(*spec[: value.ndim])
        out[path] = jax.device_put(value, NamedSharding(mesh, spec))
    return traverse_util.unflatten_dict(out)
