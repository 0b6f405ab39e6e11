"""Viscosity model: dual-encoder trunk + VFT physics head.

Reference: ``train_viscosity.py:139-231`` — shared embeddings, 4 MP steps
per ion, mixing sum, Dense(3) → constrained (A, B, C) →
``log10(eta) = A + B/(T/100 + C + 1e-6)``.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..data.packing import IonPairBatch
from .dual_encoder import DualEncoderTrunk
from .layers import VFTHead

__all__ = ["ViscosityModel"]


class ViscosityModel(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, batch: IonPairBatch, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        trunk_out = DualEncoderTrunk(cfg, name="trunk")(
            batch.cation, batch.anion, deterministic
        )
        pred = VFTHead(
            b_clip=cfg.vft_b_clip,
            c_clip=cfg.vft_c_clip,
            eps=cfg.vft_eps,
            t_scale=cfg.t_scale,
            name="vft_head",
        )(trunk_out["mixed"], batch.temperature)
        return {"pred": pred, **trunk_out}
