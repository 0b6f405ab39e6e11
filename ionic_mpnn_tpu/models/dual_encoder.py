"""Ion encoder + shared dual-encoder trunk (the model family's core).

Mirrors the reference assembly (``train_viscosity.py:150-201``,
``train_melting_point.py:151-194``):

  * atom/bond embedding tables are SHARED between the cation and anion
    encoders (``train_viscosity.py:163-164``) — and nothing else is: each
    encoder owns ``num_steps`` FRESH (BondMatrixMessage, GatedUpdate)
    pairs, i.e. no weight sharing across steps either
    (``train_viscosity.py:176-184``; SURVEY §7 quirk 3),
  * readout = masked global sum pool → Dense(fp_size, relu) with L2 on the
    kernel (``train_viscosity.py:187-189``),
  * mixing = Dense(mixing_size, relu) per ion, summed elementwise
    (``train_viscosity.py:197-201``) — the ``mix_cat_an`` tap reused by the
    transfer pipeline (``train_melting_point_transfer.py:95-96``).

Parity mode applies the reference's atom-0 edge-masking quirk
(``models/layers.py:74,114-115``) via :func:`parity_edge_mask`.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import ModelConfig
from ..data.packing import PackedGraphs
from ..ops.message import parity_edge_mask
from ..ops.segment import graph_sum_pool, graph_sum_pool_windowed
from .layers import BondMatrixMessage, GatedUpdate, glorot, keras_embed_init

__all__ = ["IonEncoder", "DualEncoderTrunk"]


class IonEncoder(nn.Module):
    """Encode one packed ion batch into per-graph fingerprints (B, fp)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        graphs: PackedGraphs,
        atom_table: jnp.ndarray,  # (Va, D) shared embedding table
        bond_table: jnp.ndarray,  # (Vb, F) shared embedding table
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        embed = cfg.embed_impl
        if embed == "auto":
            # one-hot on the accelerator (onehot-message) path while the
            # (N, V) one-hot stays small; value-identical to the gather,
            # but the table grad is a (V, N) @ (N, D) matmul instead of an
            # N-row unsorted scatter-add (per-row cost class — the phase
            # probe's backward term, see config.ModelConfig.embed_impl)
            embed = ("onehot" if cfg.message_impl == "onehot"
                     and cfg.atom_vocab_size + 1 <= 128 else "gather")
        if embed == "onehot":
            oh = jax.nn.one_hot(graphs.atom_ids, atom_table.shape[0],
                                dtype=dtype)
            h = jnp.dot(oh, atom_table.astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
        else:
            h = jnp.take(atom_table, graphs.atom_ids, axis=0).astype(dtype)  # (N, D)

        edge_mask = graphs.edge_mask
        if cfg.parity_mode:
            edge_mask = parity_edge_mask(
                graphs.src, graphs.dst, graphs.node_local, graphs.edge_mask
            )

        for step in range(cfg.num_steps):
            if cfg.message_impl == "pallas_step":
                # MEGAKERNEL: message + aggregate + gated update in ONE
                # Pallas launch (ops/pallas/fused_step). Same param tree
                # as the composed path (checkpoint-compatible).
                assert cfg.ep_axis is None, (
                    "pallas_step does not compose with edge partitioning"
                )
                from ..ops.message import bond_type_matrices
                from ..ops.pallas.fused_step import fused_mp_step
                from .layers import BondTransformParams, GatedUpdateParams

                w = BondTransformParams(
                    atom_dim=cfg.atom_dim, bond_dim=cfg.bond_dim,
                    name=f"bmm_{step}",
                )()
                gru_p = GatedUpdateParams(atom_dim=cfg.atom_dim,
                                          name=f"gru_{step}")()
                m_table = bond_type_matrices(
                    bond_table.astype(dtype), w.astype(dtype)
                )
                h = fused_mp_step(
                    h, m_table, gru_p, graphs.bond_ids, graphs.src,
                    graphs.dst, edge_mask, h.shape[0],
                )
                continue
            agg = BondMatrixMessage(
                atom_dim=cfg.atom_dim,
                bond_dim=cfg.bond_dim,
                compute_dtype=dtype,
                impl=cfg.message_impl,
                scatter=cfg.scatter_impl,
                window=cfg.onehot_window,
                # static aux data on the batch: aligned window layout needs
                # no 3-window src halo
                halo=graphs.edge_layout != "window_aligned",
                select=cfg.onehot_select,
                remat=cfg.remat_message,
                ep_axis=cfg.ep_axis,
                name=f"bmm_{step}",
            )(h, bond_table, graphs.bond_ids, graphs.src, graphs.dst, edge_mask)
            h = GatedUpdate(atom_dim=cfg.atom_dim, impl=cfg.gru_impl,
                            # None for f32 keeps the exact legacy promotion
                            compute_dtype=(dtype if dtype != jnp.float32
                                           else None),
                            name=f"gru_{step}")(
                h, agg, deterministic=deterministic
            )

        if graphs.pool_slot is not None and cfg.ep_axis is None:
            # aligned batches: all-MXU windowed one-hot readout (the phase
            # probe put 0.79 ms of the 2.21 ms forward in the two
            # segment-sum pools at batch 2048 — ops/segment.py docstring)
            pooled = graph_sum_pool_windowed(
                h, graphs.node_graph, graphs.node_mask, graphs.pool_slot,
                cfg.onehot_window, graphs.n_graphs,
            )
        else:
            pooled = graph_sum_pool(h, graphs.node_graph, graphs.n_graphs,
                                    graphs.node_mask,
                                    node_sorted=graphs.node_sorted)
        if cfg.ep_axis is not None and cfg.message_impl == "onehot":
            # node-sharded aligned EP (parallel/aligned_partition.py): each
            # shard pooled only its own node rows into the GLOBAL graph
            # slots — one (B, D) psum per forward completes the readout
            # (the message steps above needed zero collectives). This is
            # the ONLY per-forward communication of the aligned EP design.
            pooled = jax.lax.psum(pooled, cfg.ep_axis)
        fp = nn.Dense(cfg.fp_size, kernel_init=glorot(), name="fp_dense")(pooled)
        return nn.relu(fp)


class DualEncoderTrunk(nn.Module):
    """Shared embeddings + two ion encoders + mixing sum → (B, mixing_size).

    The trunk is identical across the viscosity, melting-point, and
    transfer models (up to dims), so transfer learning is a straight
    parameter-subtree copy.

    setup()-style (param tree identical to the earlier compact version —
    attribute names double as submodule names) so :meth:`project_side`
    can expose the per-ion half of the computation: ``mixed`` is an
    elementwise SUM of the two per-ion projections, which lets grid
    screening encode each unique ion ONCE instead of once per candidate
    pair (see ``inference.ScreeningEngine.screen_grid_factorized``).
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        self.atom_table = self.param(
            "atom_embed", keras_embed_init, (cfg.atom_vocab_size + 1, cfg.atom_dim)
        )
        self.bond_table = self.param(
            "bond_embed", keras_embed_init, (cfg.bond_vocab_size + 1, cfg.bond_dim)
        )
        self.cat_encoder = IonEncoder(cfg)
        self.an_encoder = IonEncoder(cfg)
        self.cat_proj = nn.Dense(cfg.mixing_size, kernel_init=glorot())
        self.an_proj = nn.Dense(cfg.mixing_size, kernel_init=glorot())

    def project_side(
        self, graphs: PackedGraphs, side: str, deterministic: bool = True
    ) -> jnp.ndarray:
        """Per-ion relu'd mixing projection (B, mixing_size) for one side
        ("cation" | "anion"); ``mixed == project_side(cat) + project_side(an)``."""
        enc = self.cat_encoder if side == "cation" else self.an_encoder
        proj = self.cat_proj if side == "cation" else self.an_proj
        fp = enc(graphs, self.atom_table, self.bond_table, deterministic)
        return nn.relu(proj(fp))

    def __call__(
        self,
        cation: PackedGraphs,
        anion: PackedGraphs,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        fp_cat = self.cat_encoder(
            cation, self.atom_table, self.bond_table, deterministic
        )
        fp_an = self.an_encoder(
            anion, self.atom_table, self.bond_table, deterministic
        )
        cat_proj = nn.relu(self.cat_proj(fp_cat))
        an_proj = nn.relu(self.an_proj(fp_an))
        mixed = cat_proj + an_proj  # AddTwoTensors / "mix_cat_an"
        return {"mixed": mixed, "fp_cat": fp_cat, "fp_an": fp_an}
