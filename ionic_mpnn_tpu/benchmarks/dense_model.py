"""Reference-style dense-padded viscosity forward, parameter-compatible
with the packed :class:`ViscosityModel`.

This is the benchmark baseline: the same weights and layer math evaluated
the way the reference evaluates them — padded ``(B, N)`` batches, per-edge
``tensordot(bond_state, W)`` matrices, scatter aggregation
(``models/layers.py:87-125``, ``train_viscosity.py:150-214``) — so
``bench.py`` can report the packed TPU-native design's speedup over the
reference design on identical hardware, identical numerics.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.dense_reference import (
    dense_bond_matrix_message,
    dense_gated_update,
    dense_global_sum_pool,
    dense_reduce,
)

__all__ = ["dense_viscosity_forward", "dense_mp_forward"]


def _dense_params(p: Any, name: str) -> Dict[str, jnp.ndarray]:
    gru = p[name]
    return {
        "wz": gru["dense_z"]["kernel"], "bz": gru["dense_z"]["bias"],
        "wr": gru["dense_r"]["kernel"], "br": gru["dense_r"]["bias"],
        "wh": gru["dense_h"]["kernel"], "bh": gru["dense_h"]["bias"],
        "ln_scale": gru["layernorm"]["scale"], "ln_bias": gru["layernorm"]["bias"],
    }


def dense_viscosity_forward(
    params: Any,  # the packed ViscosityModel's params["params"] tree
    cfg: ModelConfig,
    dense_inputs: Dict[str, jnp.ndarray],  # from pad_dense_batch x2 + temperature
) -> jnp.ndarray:
    """Evaluate the viscosity model on reference-style padded inputs."""
    mixed = _dense_trunk_mixed(params, cfg, dense_inputs)

    head = params["vft_head"]["visc_params"]
    raw = mixed @ head["kernel"] + head["bias"]
    a = raw[:, 0:1]
    b_ = jnp.clip(jax.nn.softplus(raw[:, 1:2]), *cfg.vft_b_clip)
    c = jnp.clip(jax.nn.softplus(raw[:, 2:3]), *cfg.vft_c_clip)
    t_scaled = dense_inputs["temperature"] / cfg.t_scale
    return (a + b_ / (t_scaled + c + cfg.vft_eps))[:, 0]


def _dense_trunk_mixed(params, cfg, dense_inputs):
    trunk = params["trunk"]
    atom_table = trunk["atom_embed"]
    bond_table = trunk["bond_embed"]

    def encode(prefix: str, enc_name: str):
        atom = dense_inputs[f"{prefix}_atom"]
        bond = dense_inputs[f"{prefix}_bond"]
        conn = dense_inputs[f"{prefix}_conn"]
        enc = trunk[enc_name]
        h = jnp.take(atom_table, atom, axis=0)
        b = jnp.take(bond_table, bond, axis=0)
        num_atoms = atom.shape[1]
        for step in range(cfg.num_steps):
            w = enc[f"bmm_{step}"]["bond_transform"]
            m = dense_bond_matrix_message(h, b, conn, w)
            agg = dense_reduce(m, conn[..., 1], num_atoms)
            h = dense_gated_update(h, agg, _dense_params(enc, f"gru_{step}"))
        pooled = dense_global_sum_pool(h, atom)
        return jax.nn.relu(pooled @ enc["fp_dense"]["kernel"] + enc["fp_dense"]["bias"])

    fp_cat = encode("cat", "cat_encoder")
    fp_an = encode("an", "an_encoder")
    cat_proj = jax.nn.relu(fp_cat @ trunk["cat_proj"]["kernel"] + trunk["cat_proj"]["bias"])
    an_proj = jax.nn.relu(fp_an @ trunk["an_proj"]["kernel"] + trunk["an_proj"]["bias"])
    return cat_proj + an_proj


def dense_mp_forward(
    params: Any,  # the packed MeltingPointModel's params["params"] tree
    cfg: ModelConfig,
    dense_inputs: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    """Reference-style dense melting-point forward: the (B, E, 1024) bond
    states hit the full (1024, 32, 32) per-edge tensordot every step
    (``train_melting_point.py:145-164``) — the configuration where the
    dense design is costliest."""
    mixed = _dense_trunk_mixed(params, cfg, dense_inputs)
    x = jax.nn.relu(
        mixed @ params["head_dense"]["kernel"] + params["head_dense"]["bias"]
    )
    return (x @ params["head_out"]["kernel"] + params["head_out"]["bias"])[:, 0]
