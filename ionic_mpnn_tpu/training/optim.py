"""Optimizer factories: Adam + global-norm clipping, stage freezing.

The reference compiles every model with ``Adam(lr, clipnorm=1.0)``
(``train_viscosity.py:227-230``); Keras ``clipnorm`` clips the GLOBAL
gradient norm before the Adam update, which maps to
``optax.chain(clip_by_global_norm, adam)``. Transfer-learning stage
freezing (``train_melting_point_transfer.py:189-241``) is an
``optax.multi_transform`` partition: frozen params get ``set_to_zero``.
"""

from __future__ import annotations

from typing import Any, Optional

import optax

__all__ = ["make_optimizer", "make_partitioned_optimizer"]


def make_optimizer(
    learning_rate: float = 1e-3,
    clipnorm: Optional[float] = 1.0,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    parts = []
    if clipnorm is not None and clipnorm > 0:
        parts.append(optax.clip_by_global_norm(clipnorm))
    if weight_decay > 0:
        parts.append(optax.adamw(learning_rate, weight_decay=weight_decay))
    else:
        parts.append(optax.adam(learning_rate))
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
