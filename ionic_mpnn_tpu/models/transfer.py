"""Transfer-learning melting-point model: viscosity trunk + deep MLP head.

Reference: ``train_melting_point_transfer.py:76-106`` — loads the trained
viscosity model, taps the ``mix_cat_an`` output (our trunk's ``mixed``),
drops the temperature input, and stacks a new head
Dense(256)-BatchNorm-Dense(128)-Dropout(0.3)-Dense(64)-Dense(1).

Because the trunk here is the *same module* as the viscosity model's, the
pretrained parameters transfer as a subtree copy
(:func:`load_trunk_params`). Stage-wise freezing (head-only, then partial
trunk unfreeze — ``train_melting_point_transfer.py:189-241``) is handled
by the optimizer partition in :mod:`ionic_mpnn_tpu.training.optim`, via
:func:`transfer_stage_labels`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn
from flax.core import freeze, unfreeze
from flax import traverse_util

from ..config import ModelConfig
from ..data.packing import IonPairBatch
from .dual_encoder import DualEncoderTrunk
from .layers import glorot

__all__ = ["TransferMPModel", "load_trunk_params", "transfer_stage_labels"]


class TransferMPModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self, batch: IonPairBatch, deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        trunk_out = DualEncoderTrunk(cfg, name="trunk")(
            batch.cation, batch.anion, deterministic
        )
        x = nn.relu(
            nn.Dense(cfg.transfer_dims[0], kernel_init=glorot(), name="mp_dense_1")(
                trunk_out["mixed"]
            )
        )
        x = nn.BatchNorm(
            use_running_average=deterministic, momentum=0.99, epsilon=1e-3, name="mp_bn_1"
        )(x)
        x = nn.relu(
            nn.Dense(cfg.transfer_dims[1], kernel_init=glorot(), name="mp_dense_2")(x)
        )
        x = nn.Dropout(cfg.transfer_dropout, name="mp_dropout")(
            x, deterministic=deterministic
        )
        x = nn.relu(
            nn.Dense(cfg.transfer_dims[2], kernel_init=glorot(), name="mp_dense_3")(x)
        )
        pred = nn.Dense(1, kernel_init=glorot(), name="melting_point")(x)[:, 0]
        return {"pred": pred, **trunk_out}


def load_trunk_params(transfer_params: Any, viscosity_params: Any) -> Any:
    """Copy the pretrained viscosity trunk subtree into transfer params.

    Equivalent of the reference's model-surgery tap of ``mix_cat_an``
    (``train_melting_point_transfer.py:95-96``): everything up to and
    including the mixing projections transfers; the head stays fresh.
    """
    tp = unfreeze(transfer_params)
    vp = unfreeze(viscosity_params)
    tp["trunk"] = vp["trunk"]
    return freeze(tp) if hasattr(transfer_params, "unfreeze") else tp


# Default stage-2 unfreeze set — the reference unfreezes the LAST TWO
# message-passing steps of both ion encoders, their gated updates, and the
# mixing projections (UNFREEZE_KEYS, train_melting_point_transfer.py:
# 214-229; keras auto-names gated_update_2/3 = cat steps 2/3 and
# gated_update_6/7 = an steps 2/3).
STAGE2_UNFREEZE_SUBSTRINGS = (
    "trunk/cat_encoder/bmm_2",
    "trunk/cat_encoder/bmm_3",
    "trunk/an_encoder/bmm_2",
    "trunk/an_encoder/bmm_3",
    "trunk/cat_encoder/gru_2",
    "trunk/cat_encoder/gru_3",
    "trunk/an_encoder/gru_2",
    "trunk/an_encoder/gru_3",
    "trunk/cat_proj",
    "trunk/an_proj",
)


def transfer_stage_labels(params: Any, stage: int) -> Any:
    """Label params 'trainable' / 'frozen' for optax.multi_transform.

    Stage 1: only the mp_* head trains (``train_melting_point_transfer.py:
    189-193``). Stage 2: additionally the last two MP steps + mixing
    projections (``:214-229``).
    """
    flat = traverse_util.flatten_dict(unfreeze(params))
    labels = {}
    for path in flat:
        name = "/".join(str(p) for p in path)
        head = not name.startswith("trunk/")
        if head:
            labels[path] = "trainable"
        elif stage >= 2 and any(s in name for s in STAGE2_UNFREEZE_SUBSTRINGS):
            labels[path] = "trainable"
        else:
            labels[path] = "frozen"
    return traverse_util.unflatten_dict(labels)
