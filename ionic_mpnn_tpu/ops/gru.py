"""Functional gated node update (the reference's GRU-variant), packed form.

The reference ``GatedUpdate`` is NOT a stock GRU (``models/layers.py:
142-156``): z/r gates over ``concat([h, agg])``, candidate over
``concat([r*h, agg])``, blend, LayerNorm (Keras default eps 1e-3), then an
EXTRA residual ``+ h``, then dropout (rate 0 in all reference configs).

Expressed functionally over flat packed node arrays so the same math backs
the flax module, the parity tests, and (later) a fused Pallas kernel.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = ["gated_update", "GATED_UPDATE_PARAM_SHAPES"]


def GATED_UPDATE_PARAM_SHAPES(atom_dim: int) -> Dict[str, tuple]:
    return {
        "wz": (2 * atom_dim, atom_dim),
        "bz": (atom_dim,),
        "wr": (2 * atom_dim, atom_dim),
        "br": (atom_dim,),
        "wh": (2 * atom_dim, atom_dim),
        "bh": (atom_dim,),
        "ln_scale": (atom_dim,),
        "ln_bias": (atom_dim,),
    }


def gated_update(
    node_states: jnp.ndarray,  # (N, D)
    agg: jnp.ndarray,  # (N, D)
    params: Dict[str, jnp.ndarray],
    ln_eps: float = 1e-3,
    dtype=None,
) -> jnp.ndarray:
    """Apply the gated update to every packed node. Returns (N, D).

    ``dtype`` mirrors ``models.layers.GatedUpdate.compute_dtype``: the
    three Dense matmuls run in that dtype (bf16 on production
    accelerator configs) while the blend + LayerNorm stay f32."""
    if dtype:
        cast = {k: v.astype(dtype) for k, v in params.items()
                if k in ("wz", "bz", "wr", "br", "wh", "bh")}
        concat = jnp.concatenate(
            [node_states.astype(dtype), agg.astype(dtype)], axis=-1)
        z = jax.nn.sigmoid(jnp.dot(concat, cast["wz"]) + cast["bz"])
        r = jax.nn.sigmoid(jnp.dot(concat, cast["wr"]) + cast["br"])
        h_input = jnp.concatenate(
            [(r * node_states.astype(dtype)).astype(dtype),
             agg.astype(dtype)], axis=-1)
        h_tilde = jnp.tanh(jnp.dot(h_input, cast["wh"]) + cast["bh"])
        z = z.astype(jnp.float32)
        h_tilde = h_tilde.astype(jnp.float32)
    else:
        concat = jnp.concatenate([node_states, agg], axis=-1)
        z = jax.nn.sigmoid(
            jnp.dot(concat, params["wz"], preferred_element_type=jnp.float32) + params["bz"]
        )
        r = jax.nn.sigmoid(
            jnp.dot(concat, params["wr"], preferred_element_type=jnp.float32) + params["br"]
        )
        h_input = jnp.concatenate([r * node_states, agg], axis=-1)
        h_tilde = jnp.tanh(
            jnp.dot(h_input, params["wh"], preferred_element_type=jnp.float32) + params["bh"]
        )
    new_state = (1.0 - z) * node_states + z * h_tilde
    mean = new_state.mean(axis=-1, keepdims=True)
    var = jnp.mean((new_state - mean) ** 2, axis=-1, keepdims=True)
    normed = (new_state - mean) * jax.lax.rsqrt(var + ln_eps)
    normed = normed * params["ln_scale"] + params["ln_bias"]
    return normed + node_states
