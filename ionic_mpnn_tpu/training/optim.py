"""Optimizer factories: Adam + gradient clipping, stage freezing.

The reference compiles every model with ``Adam(lr, clipnorm=1.0)``
(``train_viscosity.py:227-230``). Keras ``clipnorm`` clips EACH gradient
tensor's L2 norm independently (``global_clipnorm`` is the global
variant), so parity mode uses a per-variable clip transformation;
``clip_mode="global"`` provides ``optax.clip_by_global_norm`` for users
who prefer it. Transfer-learning stage freezing
(``train_melting_point_transfer.py:189-241``) is an
``optax.multi_transform`` partition: frozen params get ``set_to_zero``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["clip_by_per_variable_norm", "make_optimizer", "make_partitioned_optimizer"]


def clip_by_per_variable_norm(max_norm: float) -> optax.GradientTransformation:
    """Clip each gradient leaf's L2 norm to ``max_norm`` independently
    (Keras ``clipnorm`` semantics)."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params

        def clip(g):
            norm = jnp.sqrt(jnp.sum(jnp.square(g)))
            scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
            return g * scale

        return jax.tree.map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    learning_rate: float = 1e-3,
    clipnorm: Optional[float] = 1.0,
    weight_decay: float = 0.0,
    clip_mode: str = "per_variable",  # "per_variable" (Keras clipnorm) | "global"
    warmup_steps: int = 0,
) -> optax.GradientTransformation:
    """Adam(+clip) with optional LINEAR LR WARMUP over ``warmup_steps``.

    Warmup is a deliberate deviation from the reference recipe (constant
    Adam 1e-3): the dual-encoder's relu fingerprint path is collapse-
    prone under the huge early losses of the raw-scale viscosity target
    — the round-4 quality bisect caught a deterministic seed-0 run where
    31/32 cation fp units died in the first epochs and training plateaued
    at the temperature-only optimum (dev R² 0.46 vs 0.97; RESULTS
    battery 36). Parity runs keep ``warmup_steps=0``.
    """
    lr = learning_rate
    if warmup_steps > 0:
        lr = optax.linear_schedule(
            init_value=learning_rate / 25.0, end_value=learning_rate,
            transition_steps=warmup_steps,
        )
    parts = []
    if clipnorm is not None and clipnorm > 0:
        if clip_mode == "global":
            parts.append(optax.clip_by_global_norm(clipnorm))
        else:
            parts.append(clip_by_per_variable_norm(clipnorm))
    if weight_decay > 0:
        parts.append(optax.adamw(lr, weight_decay=weight_decay))
    else:
        parts.append(optax.adam(lr))
    return optax.chain(*parts)


def make_partitioned_optimizer(
    labels: Any,
    learning_rate: float,
    clipnorm: Optional[float] = 1.0,
) -> optax.GradientTransformation:
    """'trainable' params get Adam(+clip); 'frozen' params get zero updates."""
    return optax.multi_transform(
        {
            "trainable": make_optimizer(learning_rate, clipnorm),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
