"""Phase-stubbed forwards of the production viscosity step.

The round-3 bench reported ``roofline_headroom: 57.6`` on the 5.39 ms
production train step (BENCH_r03.json) with no per-phase attribution —
battery 25 A/B'd whole-step knobs only. These helpers rebuild the
production forward (onehot message impl, aligned window layout) directly
from the param tree so it can be CUT at any phase boundary:

    embed        atom-table gather only (both ions)
    msgK         embed + the first K message+aggregate ops (no GRU; the
                 aggregate is folded back into ``h`` so the chain stays
                 live)
    gruK         embed + K full (message + gated-update) steps
    enc          full both-ion encoders incl. readout pool + fp dense
    fwd          enc + mixing + VFT head + masked MSE + L2 (the exact
                 ``make_train_step`` loss)

Deltas between consecutive phases attribute the forward's wall time;
``scripts/tpu_phase_probe.py`` times them fetch-synced under the same
scan-of-8-distinct-batches harness as ``bench.py``. The reconstruction is
pinned against ``ViscosityModel.apply`` in ``tests/test_phases.py``
(same promotion behavior: GRU dense matmuls run f32-promoted, message
ops in the compute dtype — matching ``models/dual_encoder.py``).

Reference math covered: ``/root/reference/models/layers.py:87-164`` +
``train_viscosity.py:150-214`` (see SURVEY §3.3).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..data.packing import IonPairBatch, PackedGraphs
from ..ops.gru import gated_update
from ..ops.message import (
    bond_type_matrices,
    message_pass_aggregate_onehot,
    resolve_onehot_select,
)
from ..ops.segment import graph_sum_pool, graph_sum_pool_windowed
from ..training.loop import _data_loss, _l2_penalty

__all__ = ["phase_forward", "PHASES"]

PHASES = ("embed", "msg1", "msg4", "gru4", "enc", "fwd")


def _embed(atom_table: jnp.ndarray, g: PackedGraphs, cfg: ModelConfig):
    """Same resolution as models/dual_encoder.IonEncoder."""
    dtype = jnp.dtype(cfg.compute_dtype)
    embed = cfg.embed_impl
    if embed == "auto":
        embed = ("onehot" if cfg.message_impl == "onehot"
                 and cfg.atom_vocab_size + 1 <= 128 else "gather")
    if embed == "onehot":
        oh = jax.nn.one_hot(g.atom_ids, atom_table.shape[0], dtype=dtype)
        return jnp.dot(oh, atom_table.astype(dtype),
                       preferred_element_type=jnp.float32).astype(dtype)
    return jnp.take(atom_table, g.atom_ids, axis=0).astype(dtype)


def _gru_params(p: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {
        "wz": p["dense_z"]["kernel"], "bz": p["dense_z"]["bias"],
        "wr": p["dense_r"]["kernel"], "br": p["dense_r"]["bias"],
        "wh": p["dense_h"]["kernel"], "bh": p["dense_h"]["bias"],
        "ln_scale": p["layernorm"]["scale"], "ln_bias": p["layernorm"]["bias"],
    }


def _encoder(
    enc_params: Dict[str, Any],
    atom_table: jnp.ndarray,
    bond_table: jnp.ndarray,
    g: PackedGraphs,
    cfg: ModelConfig,
    n_msg: int,
    n_gru: int,
    readout: bool,
):
    dtype = jnp.dtype(cfg.compute_dtype)
    select = resolve_onehot_select(cfg.onehot_select, cfg.bond_vocab_size + 1)
    h = _embed(atom_table, g, cfg)
    for i in range(n_msg):
        w = enc_params[f"bmm_{i}"]["bond_transform"]
        m_table = bond_type_matrices(
            bond_table.astype(dtype), w.astype(dtype)
        )
        agg = message_pass_aggregate_onehot(
            h.astype(dtype), g.bond_ids, g.src, g.dst, m_table, g.edge_mask,
            window=cfg.onehot_window, halo=g.edge_layout != "window_aligned",
            select=select,
            bond_transform=w.astype(dtype),
            bond_embed=bond_table.astype(dtype),
        )
        if i < n_gru:
            # matches the flax module: bf16 configs run the GRU dense
            # matmuls in bf16 (GatedUpdate.compute_dtype), f32 otherwise
            h = gated_update(h, agg, _gru_params(enc_params[f"gru_{i}"]),
                             dtype=None if dtype == jnp.float32 else dtype)
        else:
            h = h + agg  # keep the chain live without the GRU cost
    if not readout:
        return h
    if g.pool_slot is not None and cfg.ep_axis is None:
        pooled = graph_sum_pool_windowed(h, g.node_graph, g.node_mask,
                                         g.pool_slot, cfg.onehot_window,
                                         g.n_graphs)
    else:
        pooled = graph_sum_pool(h, g.node_graph, g.n_graphs, g.node_mask,
                                node_sorted=g.node_sorted)
    fp = (
        jnp.dot(pooled, enc_params["fp_dense"]["kernel"],
                preferred_element_type=jnp.float32)
        + enc_params["fp_dense"]["bias"]
    )
    return jax.nn.relu(fp)


def phase_forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    batch: IonPairBatch,
    upto: str,
) -> jnp.ndarray:
    """Run the production forward up to phase ``upto``; returns a scalar
    that depends on every computed value (so nothing dead-code-eliminates
    under jit)."""
    trunk = params["trunk"]
    atom_table = trunk["atom_embed"]
    bond_table = trunk["bond_embed"]

    if upto == "embed":
        a = _embed(atom_table, batch.cation, cfg)
        b = _embed(atom_table, batch.anion, cfg)
        return jnp.sum(a.astype(jnp.float32)) + jnp.sum(b.astype(jnp.float32))

    n_msg = {"msg1": 1, "msg4": 4}.get(upto, cfg.num_steps)
    n_gru = 0 if upto.startswith("msg") else cfg.num_steps
    readout = upto in ("enc", "fwd")

    sides = []
    for side_name, g in (("cat_encoder", batch.cation), ("an_encoder", batch.anion)):
        sides.append(
            _encoder(trunk[side_name], atom_table, bond_table, g, cfg,
                     n_msg, n_gru, readout)
        )
    if upto != "fwd":
        return sum(jnp.sum(s.astype(jnp.float32)) for s in sides)

    fp_cat, fp_an = sides
    cat_proj = jax.nn.relu(
        jnp.dot(fp_cat, trunk["cat_proj"]["kernel"],
                preferred_element_type=jnp.float32) + trunk["cat_proj"]["bias"]
    )
    an_proj = jax.nn.relu(
        jnp.dot(fp_an, trunk["an_proj"]["kernel"],
                preferred_element_type=jnp.float32) + trunk["an_proj"]["bias"]
    )
    mixed = cat_proj + an_proj
    hp = params["vft_head"]["visc_params"]
    vp = jnp.dot(mixed, hp["kernel"], preferred_element_type=jnp.float32) + hp["bias"]
    a = vp[:, 0:1]
    b = jnp.clip(jax.nn.softplus(vp[:, 1:2]), cfg.vft_b_clip[0], cfg.vft_b_clip[1])
    c = jnp.clip(jax.nn.softplus(vp[:, 2:3]), cfg.vft_c_clip[0], cfg.vft_c_clip[1])
    pred = (a + b / (batch.temperature / cfg.t_scale + c + cfg.vft_eps))[:, 0]
    data = _data_loss(pred, batch.y, batch.sample_mask, "mse", 1.0)
    return data + _l2_penalty(params, cfg.fp_l2)
