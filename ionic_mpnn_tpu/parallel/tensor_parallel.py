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

TRAINING: :func:`make_tp_train_step` jits the full train step with
in/out shardings derived from the same rules — parameters, gradients,
and the Adam moments (whose pytree paths embed the param paths, so one
rule set covers both) all live sharded over the ``model`` axis; XLA
GSPMD propagates the shardings through fwd+bwd+update and inserts the
collectives. Parameter updates match the replicated step exactly
(tests/test_tensor_parallel.py).
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import jax
import optax
from flax import traverse_util
from flax.core import unfreeze
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DEFAULT_TP_RULES",
    "param_specs",
    "shard_params",
    "state_shardings",
    "shard_train_state",
    "make_tp_train_step",
]

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


# ---------------------------------------------------------------------------
# TP training step (SURVEY §2.3 TP row: sharded grads + optimizer state)
# ---------------------------------------------------------------------------


def _path_name(path) -> str:
    """Join a jax key path into "a/b/c" so the suffix rules match both
    params and the optimizer-state subtrees that mirror them (Adam's
    ``mu``/``nu`` paths embed the full param path)."""
    parts = []
    for p in path:
        for attr in ("key", "name", "idx"):
            if hasattr(p, attr):
                parts.append(str(getattr(p, attr)))
                break
        else:
            parts.append(str(p))
    return "/".join(parts)


def state_shardings(
    state: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES,
) -> Any:
    """NamedSharding pytree for a full TrainState: params AND the Adam
    moments shard by the same path rules; counters/rng stay replicated."""

    def shard_for(path, leaf):
        spec = _spec_for(_path_name(path), rules)
        nd = getattr(leaf, "ndim", 0)
        if len(spec) > nd:
            spec = P(*spec[:nd])
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(shard_for, state)


def shard_train_state(
    state: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES,
) -> Tuple[Any, Any]:
    """Device-put a TrainState with TP shardings; returns (state, shardings)."""
    shardings = state_shardings(state, mesh, rules)
    return jax.device_put(state, shardings), shardings


def make_tp_train_step(
    model,
    model_cfg,
    train_cfg,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    state: Any,
    rules: Sequence[Tuple[str, P]] = DEFAULT_TP_RULES,
    has_batch_stats: bool = False,
):
    """Full tensor-parallel training step via GSPMD in/out shardings.

    The step body is the SAME function the single-device path jits
    (``training/loop.py::make_train_step``); only the placement changes:
    params / grads / Adam moments are sharded over the ``model`` axis per
    ``rules``, batches are replicated, and XLA inserts the collectives.
    Use for scaled configs (fp_size ≥ 512, bond_dim 1024) where one
    chip's HBM can't hold params + moments; at reference dims prefer DP.

    Returns ``(jitted_step, sharded_state)`` — feed the returned state
    (the input one is device_put with the TP shardings).
    """
    from ..training.loop import make_train_step

    step = make_train_step(model, model_cfg, train_cfg, optimizer,
                           has_batch_stats=has_batch_stats, jit_compile=False)
    sharded_state, shardings = shard_train_state(state, mesh, rules)
    replicated = NamedSharding(mesh, P())
    jitted = jax.jit(
        step,
        in_shardings=(shardings, replicated),
        out_shardings=(shardings, replicated),
        donate_argnums=(0,),
    )
    return jitted, sharded_state
