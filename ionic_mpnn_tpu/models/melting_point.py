"""Melting-point model: dual-encoder trunk + 2-layer MLP head.

Reference: ``train_melting_point.py:137-215`` — bond embedding dim =
atom_dim² (1024) feeding BondMatrixMessage(32, 1024); head =
Dense(fp_size, relu, L2 1e-5) → Dense(1) over the mixed representation;
the target is z-score normalized on train-split stats
(``train_melting_point.py:255-258``) so the output is in normalized units.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..data.packing import IonPairBatch
from .dual_encoder import DualEncoderTrunk
from .layers import glorot

__all__ = ["MeltingPointModel"]


class MeltingPointModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, batch: IonPairBatch, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        trunk_out = DualEncoderTrunk(cfg, name="trunk")(
            batch.cation, batch.anion, deterministic
        )
        x = nn.relu(
            nn.Dense(cfg.fp_size, kernel_init=glorot(), name="head_dense")(trunk_out["mixed"])
        )
        pred = nn.Dense(1, kernel_init=glorot(), name="head_out")(x)[:, 0]
        return {"pred": pred, **trunk_out}
