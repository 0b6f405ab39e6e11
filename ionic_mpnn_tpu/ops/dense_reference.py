"""Dense padded-batch reference semantics, re-expressed in JAX.

This module is the *ground truth* for parity testing: it evaluates the
reference Keras layers' math on padded ``(B, N)``-style arrays exactly as
described in SURVEY.md §2.1 / §7 (gather → per-edge tensordot → masked
matvec → scatter-add → gated update → masked pool), including the quirks:

  * edges with padded src or tgt index 0 are dropped in BOTH the message
    layer (``models/layers.py:114-115``) and the aggregation
    (``models/layers.py:74``),
  * GatedUpdate applies LayerNorm then an EXTRA residual after the GRU-style
    blend (``models/layers.py:153-155``),
  * GlobalSumPool masks on ``atom_ids > 0`` (``models/layers.py:161-164``).

Not a performance path — O(B·N_max) padded compute, kept deliberately
straightforward. The packed ops in :mod:`ionic_mpnn_tpu.ops` are tested
allclose against this module.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

__all__ = [
    "dense_bond_matrix_message",
    "dense_reduce",
    "dense_gated_update",
    "dense_global_sum_pool",
]


def dense_bond_matrix_message(
    atom_state: jnp.ndarray,  # (B, N, D)
    bond_state: jnp.ndarray,  # (B, E, F)
    connectivity: jnp.ndarray,  # (B, E, 2) int32 padded with 0
    bond_transform: jnp.ndarray,  # (F, D, D)
) -> jnp.ndarray:
    """Per-edge messages with the atom-0 masking quirk. Returns (B, E, D)."""
    src_idx = connectivity[..., 0]
    tgt_idx = connectivity[..., 1]
    src_atoms = jnp.take_along_axis(atom_state, src_idx[..., None], axis=1)  # (B,E,D)
    bond_mats = jnp.einsum("bef,fij->beij", bond_state, bond_transform)
    messages = jnp.einsum("beij,bej->bei", bond_mats, src_atoms)
    valid = (src_idx > 0) & (tgt_idx > 0)
    return messages * valid[..., None].astype(messages.dtype)


def dense_reduce(
    messages: jnp.ndarray,  # (B, E, D)
    tgt_idx: jnp.ndarray,  # (B, E)
    num_atoms: int,
) -> jnp.ndarray:
    """Scatter-add messages onto target atoms, dropping tgt_idx == 0."""
    valid = (tgt_idx > 0)[..., None].astype(messages.dtype)
    masked = messages * valid

    def per_graph(m, t):
        return jax.ops.segment_sum(m, t, num_segments=num_atoms)

    agg = jax.vmap(per_graph)(masked, tgt_idx)
    # zero out the atom-0 row exactly as the reference (nothing scatters there,
    # but masked pad messages were zeroed before the scatter anyway).
    return agg


def dense_gated_update(
    atom_state: jnp.ndarray,  # (B, N, D)
    agg: jnp.ndarray,  # (B, N, D)
    params: Dict[str, jnp.ndarray],
    eps: float = 1e-3,
) -> jnp.ndarray:
    """Reference GatedUpdate math (``models/layers.py:142-156``).

    params: wz/bz, wr/br over concat([h, agg]); wh/bh over concat([r*h, agg]);
    ln_scale/ln_bias for LayerNorm (Keras default epsilon 1e-3).
    """
    concat = jnp.concatenate([atom_state, agg], axis=-1)
    z = jax.nn.sigmoid(concat @ params["wz"] + params["bz"])
    r = jax.nn.sigmoid(concat @ params["wr"] + params["br"])
    h_input = jnp.concatenate([r * atom_state, agg], axis=-1)
    h_tilde = jnp.tanh(h_input @ params["wh"] + params["bh"])
    new_state = (1.0 - z) * atom_state + z * h_tilde
    mean = new_state.mean(axis=-1, keepdims=True)
    var = ((new_state - mean) ** 2).mean(axis=-1, keepdims=True)
    normed = (new_state - mean) * jax.lax.rsqrt(var + eps)
    normed = normed * params["ln_scale"] + params["ln_bias"]
    return normed + atom_state  # the extra residual quirk


def dense_global_sum_pool(atom_state: jnp.ndarray, atom_ids: jnp.ndarray) -> jnp.ndarray:
    mask = (atom_ids > 0).astype(atom_state.dtype)[..., None]
    return (atom_state * mask).sum(axis=1)
