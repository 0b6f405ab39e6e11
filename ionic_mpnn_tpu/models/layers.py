"""Flax modules for the MPNN layer family (packed-graph native).

Re-designs of the reference Keras layers (``models/layers.py``) over flat
packed arrays instead of padded ``(B, N, ...)`` tensors:

  * :class:`BondMatrixMessage` — edge-conditioned messages via the
    bond-type-table precompute (see :mod:`ionic_mpnn_tpu.ops.message`),
  * :class:`GatedUpdate` — the reference's GRU variant with LayerNorm and
    the extra residual (``models/layers.py:128-156``),
  * VFT head pieces — softplus/clip parameter constraints and the
    physics form ``log10(eta) = A + B/(T/100 + C + 1e-6)``
    (``models/layers.py:10-42``, ``train_viscosity.py:197-214``).

Initializers match Keras defaults (glorot-uniform kernels, zero biases,
uniform(±0.05) embeddings) so training dynamics are comparable.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.message import (
    bond_type_matrices,
    message_pass_aggregate,
    message_pass_aggregate_onehot,
    message_pass_aggregate_symmetric,
    message_pass_aggregate_typed,
)

__all__ = ["BondMatrixMessage", "GatedUpdate", "VFTHead", "keras_embed_init"]

glorot = nn.initializers.glorot_uniform


def keras_embed_init(key, shape, dtype=jnp.float32):
    """Keras Embedding default: uniform(-0.05, 0.05) (symmetric —
    flax's nn.initializers.uniform samples [0, scale) only)."""
    return jax.random.uniform(key, shape, dtype, -0.05, 0.05)


class BondMatrixMessage(nn.Module):
    """Fused edge-conditioned message + destination aggregation.

    Covers the reference's BondMatrixMessage→Reduce pair
    (``models/layers.py:87-125`` + ``:52-83``): owns the Glorot-initialized
    ``bond_transform`` (F, D, D), but consumes the bond *embedding table* +
    per-edge bond ids — reference bond states are frozen embedding lookups
    (``train_viscosity.py:163-172``) — so the (V, D, D) message-matrix
    table is precomputed per call (a (V, F) @ (F, D·D) matmul) and no
    (E, D, D) tensor is ever materialized.

    ``impl``: "gather" (matrix gather + batched matvec + segment-sum),
    "typed" (type-bucketed scatter + one MXU matmul), "symmetric"
    (sorted-backward custom VJP), or "pallas_fused" (single fused Pallas
    kernel: halo one-hot src gather + typed transform + windowed
    aggregate — :mod:`ionic_mpnn_tpu.ops.pallas.fused_message`).
    """

    atom_dim: int
    bond_dim: int
    compute_dtype: jnp.dtype = jnp.float32
    impl: str = "gather"
    scatter: str = "xla"  # "xla" | "pallas" (sorted-scatter kernel)
    window: int = 128  # node window for impl="onehot" (window-tiled edges)
    # impl="onehot": False when the batch is window_ALIGNED (no molecule
    # straddles a window → src context is the window itself, 3x smaller)
    halo: bool = True
    select: str = "lanes"  # onehot typed-select formulation (see config)
    remat: bool = False  # jax.checkpoint the message+aggregate op
    # Edge-partitioned execution inside shard_map. The contract follows the
    # impl's natural partition (parallel/{edge_partition,aligned_partition}):
    #   * gather-family impls: EDGE arrays sharded over this axis, node
    #     states replicated — per-shard aggregates merge with one psum,
    #   * "onehot": NODE rows + window-tiled edges sharded together
    #     (window_aligned layout, halo=False). Shard boundaries land on
    #     window multiples, and the aligned packer guarantees no molecule
    #     straddles a window — so there are ZERO cross-shard edges and the
    #     per-shard aggregate is already complete. No collective here; the
    #     encoder psums the (B, D) pooled readout once per forward instead.
    ep_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        node_states: jnp.ndarray,  # (N, D)
        bond_table: jnp.ndarray,  # (V, F) embedding table
        bond_ids: jnp.ndarray,  # (E,)
        src: jnp.ndarray,  # (E,)
        dst: jnp.ndarray,  # (E,) sorted by destination
        edge_mask: jnp.ndarray,  # (E,) bool, parity-adjusted by the caller
    ) -> jnp.ndarray:
        # Keras glorot_uniform on (F, D, D) computes fan_in = fan_out = D·F
        # (leading dims count as receptive field). jax's glorot with
        # in_axis=-2/out_axis=-1 and NO batch_axis matches that; passing
        # batch_axis=(0,) would exclude F and inflate the init √F×.
        w = self.param(
            "bond_transform",
            glorot(in_axis=-2, out_axis=-1),
            (self.bond_dim, self.atom_dim, self.atom_dim),
        )
        m_table = bond_type_matrices(
            bond_table.astype(self.compute_dtype), w.astype(self.compute_dtype)
        )
        h = node_states.astype(self.compute_dtype)
        if self.impl == "pallas_fused":
            # one Pallas kernel: src-halo gather + typed transform +
            # windowed aggregate, sorted backward (ops/pallas/fused_message)
            from ..ops.pallas.fused_message import (
                fused_message_aggregate,
                message_table_to_lanes,
            )

            agg = fused_message_aggregate(
                h, message_table_to_lanes(m_table), bond_ids, src, dst,
                edge_mask, h.shape[0],
            )
        elif self.impl == "onehot":
            # all-MXU windowed one-hot matmuls — requires the window-tiled
            # edge layout (BatchPlan(edge_layout="window"))
            if self.ep_axis is not None and self.halo:
                raise ValueError(
                    "onehot under edge partitioning runs NODE-sharded and "
                    "needs the halo-free window_aligned layout "
                    "(edge_layout='window_aligned'); got a halo batch — "
                    "see parallel/aligned_partition.py"
                )
            # basis select contracts over the raw (F, D, D) transform +
            # embedding instead of the (V, D, D) table — pass both as
            # ARGS (traced values; see ops.message select='basis')
            basis_kw = dict(
                bond_transform=w.astype(self.compute_dtype),
                bond_embed=bond_table.astype(self.compute_dtype),
            )
            if self.remat:
                import functools

                op = jax.checkpoint(functools.partial(
                    message_pass_aggregate_onehot,
                    window=self.window, halo=self.halo, select=self.select,
                ))
                agg = op(h, bond_ids, src, dst, m_table, edge_mask,
                         **basis_kw)
            else:
                agg = message_pass_aggregate_onehot(
                    h, bond_ids, src, dst, m_table, edge_mask,
                    window=self.window, halo=self.halo, select=self.select,
                    **basis_kw,
                )
        elif self.impl == "typed":
            agg = message_pass_aggregate_typed(h, bond_ids, src, dst, m_table, edge_mask)
        elif self.impl == "symmetric":
            # sorted-backward custom VJP; requires reversal-closed edges
            # (guaranteed by the featurizer/packer contract)
            agg = message_pass_aggregate_symmetric(
                h, bond_ids, src, dst, m_table, edge_mask
            )
        else:
            agg = message_pass_aggregate(
                h, bond_ids, src, dst, m_table, edge_mask, scatter=self.scatter
            )
        if self.ep_axis is not None and self.impl != "onehot":
            # edge-sharded contract: messages are additive over edge shards
            # → one exact all-reduce of the replicated-node aggregate.
            # (onehot runs node-sharded: its aggregate is shard-OWNED and
            # complete — the class docstring's ep_axis note — so no psum.)
            agg = jax.lax.psum(agg, self.ep_axis)
        return agg


class _DenseParams(nn.Module):
    """Kernel+bias with nn.Dense-identical param tree/init, no matmul —
    lets fused formulations reuse checkpoints from the reference impl."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", glorot(), (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _LayerNormParams(nn.Module):
    """scale+bias with nn.LayerNorm-identical param tree/init, no math."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class BondTransformParams(nn.Module):
    """BondMatrixMessage's param tree (just ``bond_transform``) without the
    compute — instantiated under the same module name so the fused-step
    Pallas path shares checkpoints with the composed path."""

    atom_dim: int
    bond_dim: int

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "bond_transform",
            glorot(in_axis=-2, out_axis=-1),
            (self.bond_dim, self.atom_dim, self.atom_dim),
        )


class GatedUpdateParams(nn.Module):
    """GatedUpdate's exact param tree (dense_z/r/h + layernorm) as a dict
    keyed per :func:`ionic_mpnn_tpu.ops.gru.GATED_UPDATE_PARAM_SHAPES` —
    checkpoint-compatible params for the fused-step Pallas kernel."""

    atom_dim: int

    @nn.compact
    def __call__(self):
        D = self.atom_dim
        wz, bz = _DenseParams(2 * D, D, name="dense_z")()
        wr, br = _DenseParams(2 * D, D, name="dense_r")()
        wh, bh = _DenseParams(2 * D, D, name="dense_h")()
        ln_scale, ln_bias = _LayerNormParams(D, name="layernorm")()
        return {
            "wz": wz, "bz": bz, "wr": wr, "br": br, "wh": wh, "bh": bh,
            "ln_scale": ln_scale, "ln_bias": ln_bias,
        }


class GatedUpdate(nn.Module):
    """Reference gated node update (``models/layers.py:128-156``).

    z/r gates over concat([h, agg]); candidate over concat([r·h, agg]);
    blend; LayerNorm (Keras default eps 1e-3); EXTRA residual ``+ h``;
    dropout (rate 0 in every reference config, kept for completeness).

    ``impl="fused"`` computes the same math with the MXU in mind: at
    D=32, each of the reference's three ``(N, 2D) @ (2D, D)`` matmuls
    uses at most 32 of the MXU's 128 output lanes. Splitting the
    candidate kernel ``W_h = [W_h1; W_h2]`` over its two input halves
    gives ``h̃ = tanh(r·h @ W_h1 + agg @ W_h2 + b_h)``, so stage 1 packs
    z | r | (agg @ W_h2 + b_h) into ONE ``(N, 2D) @ (2D, 3D)`` matmul
    (96 lanes) and stage 2 is a single ``(N, D) @ (D, D)``. Identical
    parameters, identical math (mod fp addition order), tested allclose.
    """

    atom_dim: int
    dropout_rate: float = 0.0
    impl: str = "reference"  # "reference" | "fused"
    # Dense matmul compute dtype (param storage stays f32). The default
    # promotes to f32 (flax dtype=None with f32 params); production bf16
    # configs pass the model compute dtype so the 24 GRU matmuls per step
    # run at bf16 MXU rate — LayerNorm stays f32 (f32 params + explicit
    # f32 input cast) for stable mean/var.
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self,
        node_states: jnp.ndarray,  # (N, D)
        agg: jnp.ndarray,  # (N, D)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        D = self.atom_dim
        dt = self.compute_dtype
        concat = jnp.concatenate(
            [node_states.astype(dt) if dt else node_states,
             agg.astype(dt) if dt else agg], axis=-1)
        if self.impl == "fused":
            wz, bz = _DenseParams(2 * D, D, name="dense_z")()
            wr, br = _DenseParams(2 * D, D, name="dense_r")()
            wh, bh = _DenseParams(2 * D, D, name="dense_h")()
            if dt:
                wz, wr, wh = (w.astype(dt) for w in (wz, wr, wh))
            w1 = jnp.concatenate(
                [wz, wr, jnp.concatenate([jnp.zeros_like(wh[:D]), wh[D:]], axis=0)],
                axis=1,
            )  # (2D, 3D)
            b1 = jnp.concatenate([bz, br, bh])
            out1 = jnp.dot(concat, w1, preferred_element_type=jnp.float32) + b1
            z = jax.nn.sigmoid(out1[:, :D])
            r = jax.nn.sigmoid(out1[:, D:2 * D])
            h_tilde = jnp.tanh(
                jnp.dot((r * node_states).astype(dt) if dt else r * node_states,
                        wh[:D], preferred_element_type=jnp.float32)
                + out1[:, 2 * D:]
            )
        else:
            z = jax.nn.sigmoid(
                nn.Dense(D, kernel_init=glorot(), dtype=dt, name="dense_z")(concat)
            )
            r = jax.nn.sigmoid(
                nn.Dense(D, kernel_init=glorot(), dtype=dt, name="dense_r")(concat)
            )
            h_input = jnp.concatenate(
                [(r * node_states).astype(dt) if dt else r * node_states,
                 agg.astype(dt) if dt else agg], axis=-1)
            h_tilde = jnp.tanh(
                nn.Dense(D, kernel_init=glorot(), dtype=dt, name="dense_h")(h_input)
            )
        new_state = (1.0 - z.astype(jnp.float32)) * node_states \
            + z.astype(jnp.float32) * h_tilde.astype(jnp.float32)
        new_state = nn.LayerNorm(epsilon=1e-3, name="layernorm")(new_state)
        new_state = new_state + node_states
        if self.dropout_rate > 0.0:
            new_state = nn.Dropout(self.dropout_rate)(new_state, deterministic=deterministic)
        return new_state


class VFTHead(nn.Module):
    """Physics-constrained viscosity head.

    Dense(3) over the mixed ion representation, then
    ``A = x[:,0:1]``, ``B = clip(softplus(x[:,1:2]), 0, 20)``,
    ``C = clip(softplus(x[:,2:3]), 0.1, 50)``,
    ``log10(eta) = A + B / (T/100 + C + 1e-6)``
    (``models/layers.py:10-42``, ``train_viscosity.py:204-214``).
    """

    b_clip: tuple = (0.0, 20.0)
    c_clip: tuple = (0.1, 50.0)
    eps: float = 1e-6
    t_scale: float = 100.0

    @nn.compact
    def __call__(self, mixed: jnp.ndarray, temperature: jnp.ndarray) -> jnp.ndarray:
        params = nn.Dense(3, kernel_init=glorot(), name="visc_params")(mixed)  # (B, 3)
        a = params[:, 0:1]
        b = jnp.clip(jax.nn.softplus(params[:, 1:2]), self.b_clip[0], self.b_clip[1])
        c = jnp.clip(jax.nn.softplus(params[:, 2:3]), self.c_clip[0], self.c_clip[1])
        t_scaled = temperature / self.t_scale
        log_eta = a + b / (t_scaled + c + self.eps)
        return log_eta[:, 0]
