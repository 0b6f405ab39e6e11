"""Pallas TPU MEGAKERNEL: one full message-passing step per launch.

Fuses the reference's BondMatrixMessage → Reduce → GatedUpdate chain
(``/root/reference/models/layers.py:87-125`` + ``:52-83`` + ``:128-156``)
into a single kernel: per destination window the edge tiles are
accumulated exactly as in :mod:`.fused_message` (halo one-hot src
gather + lane-stacked typed bond transform + windowed one-hot
aggregate), and on the window's LAST grid step the gated update runs as
an epilogue while the (W, D) block is still in VMEM — the aggregate
tensor never exists in HBM at all:

    z|r   = σ(h·Wzr[:D] + agg·Wzr[D:] + b_zr)        one (W,D)@(D,2D) x2
    h̃     = tanh((r·h)·Wh[:D] + agg·Wh[D:] + b_h)
    h'    = LayerNorm((1−z)·h + z·h̃; eps 1e-3) + h    (extra residual)

Gate matmuls use split-row forms (``cat @ W == h @ W[:D] + agg @ W[D:]``)
so no lane-dim concatenation is needed in Mosaic.

Backward: fast-forward / rematerialized-backward. The custom VJP replays
the mathematically identical XLA composition
(:func:`~ionic_mpnn_tpu.ops.message.message_pass_aggregate_symmetric` +
:func:`~ionic_mpnn_tpu.ops.gru.gated_update`) under ``jax.vjp`` — the
symmetric message VJP keeps the backward scatter SORTED, and gradients
are exact for the shared math. Inference (screening sweeps) never pays
the remat.

Same capacity contracts as the component kernels (checked, never
silent): window tile budget + the |src−dst| < window locality contract.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..gru import gated_update
from ..message import message_pass_aggregate_symmetric
from .fused_message import check_src_locality, message_table_to_lanes
from .segment_sum import (
    DEFAULT_MAX_TILES,
    DEFAULT_TILE,
    DEFAULT_WINDOW,
    PallasCapacityError,
    _GRID,
    dropped_edge_mask,
    window_ptr,
)

__all__ = ["fused_mp_step"]


def _kernel(
    ptr_ref,
    src_ref,
    dst_ref,
    bond_ref,
    mask_ref,
    h_prev_ref,
    h_cur_ref,
    h_next_ref,
    k_ref,
    wzr_ref,  # (2D, 2D): rows [0:D] multiply h, rows [D:2D] multiply agg
    bzr_ref,  # (1, 2D)
    wh_ref,  # (2D, D)
    bh_ref,  # (1, D)
    ln_ref,  # (2, D): row 0 scale, row 1 bias
    out_ref,
    *,
    window,
    tile,
    V,
    D,
    num_windows,
    max_tiles,
    ln_eps,
):
    w = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    first_tile = ptr_ref[w] // tile
    tile_start = (first_tile + k) * tile
    in_range = tile_start < ptr_ref[w + 1]

    @pl.when(in_range)
    def _():
        src = src_ref[:, 0]
        dst = dst_ref[:, 0]
        bond = bond_ref[:, 0]
        real = mask_ref[:, 0] > 0.0

        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)

        def gather_block(h_ref, wb, enabled):
            col = src - wb * window
            valid = (col >= 0) & (col < window) & real & enabled
            onehot = jnp.where(
                valid[:, None] & (col_ids == col[:, None]), 1.0, 0.0
            ).astype(h_ref.dtype)
            return jax.lax.dot_general(
                onehot, h_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        h_src = gather_block(h_prev_ref, w - 1, w > 0)
        h_src += gather_block(h_cur_ref, w, True)
        h_src += gather_block(h_next_ref, w + 1, w < num_windows - 1)

        x = jax.lax.dot_general(
            h_src, k_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, V*D)
        msgs = jnp.zeros((tile, D), jnp.float32)
        for v in range(V):
            sel = (bond == v).astype(jnp.float32)[:, None]
            msgs += sel * x[:, v * D:(v + 1) * D]

        cold = dst - w * window
        validd = (cold >= 0) & (cold < window)
        onehot_d = jnp.where(
            validd[:, None] & (col_ids == cold[:, None]), 1.0, 0.0
        ).astype(msgs.dtype)
        out_ref[:] += jax.lax.dot_general(
            onehot_d, msgs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # ---- gated-update epilogue: this window's aggregate is complete ----
    @pl.when(k == max_tiles - 1)
    def _():
        hw = h_cur_ref[:]  # (W, D) pre-update states
        agg = out_ref[:]  # (W, D) accumulated messages

        def mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        zr = jax.nn.sigmoid(
            mm(hw, wzr_ref[:D, :]) + mm(agg, wzr_ref[D:, :]) + bzr_ref[0:1, :]
        )  # (W, 2D)
        z = zr[:, :D]
        r = zr[:, D:]
        cand = jnp.tanh(
            mm(r * hw, wh_ref[:D, :]) + mm(agg, wh_ref[D:, :]) + bh_ref[0:1, :]
        )
        new = (1.0 - z) * hw + z * cand
        mean = jnp.mean(new, axis=1, keepdims=True)
        var = jnp.mean((new - mean) ** 2, axis=1, keepdims=True)
        normed = (new - mean) * jax.lax.rsqrt(var + ln_eps)
        normed = normed * ln_ref[0:1, :] + ln_ref[1:2, :]
        out_ref[:] = normed + hw


def _fused_step_fwd_impl(
    h, m_table, gru, bond_ids, src, dst, edge_mask,
    num_nodes, window, tile, max_tiles_per_window, ln_eps, interpret,
):
    if not interpret:  # Mosaic needs a real TPU; CPU tests run interpreted
        interpret = jax.default_backend() != "tpu"
    N, D = h.shape
    assert N == num_nodes, (N, num_nodes)
    V = m_table.shape[0]
    K = message_table_to_lanes(m_table)
    mask_f = edge_mask.astype(jnp.float32)

    if not isinstance(dst, jax.core.Tracer) and not isinstance(src, jax.core.Tracer):
        if not isinstance(edge_mask, jax.core.Tracer):
            em = np.asarray(edge_mask).astype(bool)
            check_src_locality(np.asarray(src), np.asarray(dst), em, window)
            dropped = dropped_edge_mask(
                np.asarray(dst), num_nodes, window, tile, max_tiles_per_window
            )
            if (dropped & em).any():
                raise PallasCapacityError(
                    f"fused-step window capacity exceeded: "
                    f"{int((dropped & em).sum())} real edges fall past "
                    f"max_tiles_per_window={max_tiles_per_window}"
                )

    E = src.shape[0]
    if E % tile:
        pad = tile - E % tile
        last = dst[E - 1]
        src = jnp.concatenate([src, jnp.full((pad,), 0, src.dtype) + last])
        dst = jnp.concatenate([dst, jnp.full((pad,), 0, dst.dtype) + last])
        bond_ids = jnp.concatenate([bond_ids, jnp.zeros((pad,), bond_ids.dtype)])
        mask_f = jnp.concatenate([mask_f, jnp.zeros((pad,), mask_f.dtype)])
        E = E + pad
    n_pad_nodes = (-num_nodes) % window
    Np = num_nodes + n_pad_nodes
    if n_pad_nodes:
        h = jnp.pad(h, ((0, n_pad_nodes), (0, 0)))

    ptr, num_windows = window_ptr(dst, Np, window)
    n_edge_tiles = E // tile

    def _edge_block(w, k, ptr):
        return (jnp.minimum(ptr[w] // tile + k, n_edge_tiles - 1), 0)

    def _h_block(delta):
        def f(w, k, ptr):
            return (jnp.clip(w + delta, 0, num_windows - 1), 0)
        return f

    wzr = jnp.concatenate([gru["wz"], gru["wr"]], axis=1)  # (2D, 2D)
    bzr = jnp.concatenate([gru["bz"], gru["br"]])[None, :]  # (1, 2D)
    wh = gru["wh"]  # (2D, D)
    bh = gru["bh"][None, :]  # (1, D)
    ln = jnp.stack([gru["ln_scale"], gru["ln_bias"]])  # (2, D)

    kernel = functools.partial(
        _kernel, window=window, tile=tile, V=V, D=D,
        num_windows=num_windows, max_tiles=max_tiles_per_window,
        ln_eps=ln_eps,
    )
    grid_spec = _GRID(
        num_scalar_prefetch=1,
        grid=(num_windows, max_tiles_per_window),
        in_specs=[
            pl.BlockSpec((tile, 1), _edge_block),  # src
            pl.BlockSpec((tile, 1), _edge_block),  # dst
            pl.BlockSpec((tile, 1), _edge_block),  # bond
            pl.BlockSpec((tile, 1), _edge_block),  # mask
            pl.BlockSpec((window, D), _h_block(-1)),
            pl.BlockSpec((window, D), _h_block(0)),
            pl.BlockSpec((window, D), _h_block(+1)),
            pl.BlockSpec((D, V * D), lambda w, k, ptr: (0, 0)),
            pl.BlockSpec((2 * D, 2 * D), lambda w, k, ptr: (0, 0)),
            pl.BlockSpec((1, 2 * D), lambda w, k, ptr: (0, 0)),
            pl.BlockSpec((2 * D, D), lambda w, k, ptr: (0, 0)),
            pl.BlockSpec((1, D), lambda w, k, ptr: (0, 0)),
            pl.BlockSpec((2, D), lambda w, k, ptr: (0, 0)),
        ],
        out_specs=pl.BlockSpec((window, D), lambda w, k, ptr: (w, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, D), jnp.float32),
        interpret=interpret,
    )(
        ptr, src[:, None], dst[:, None], bond_ids[:, None], mask_f[:, None],
        h, h, h, K, wzr, bzr, wh, bh, ln,
    )
    return out[:num_nodes]


def _reference_compose(h, m_table, gru, bond_ids, src, dst, edge_mask, ln_eps):
    """The mathematically identical XLA composition (sorted backward)."""
    agg = message_pass_aggregate_symmetric(
        h, bond_ids, src, dst, m_table, edge_mask.astype(bool)
    )
    return gated_update(h, agg, gru, ln_eps=ln_eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def fused_mp_step(
    h: jnp.ndarray,  # (N, D) float32
    m_table: jnp.ndarray,  # (V, D, D) per-type message matrices
    gru: Dict[str, jnp.ndarray],  # GATED_UPDATE_PARAM_SHAPES dict
    bond_ids: jnp.ndarray,  # (E,) int32
    src: jnp.ndarray,  # (E,) int32
    dst: jnp.ndarray,  # (E,) int32 sorted
    edge_mask: jnp.ndarray,  # (E,)
    num_nodes: int,
    window: int = DEFAULT_WINDOW,
    tile: int = DEFAULT_TILE,
    max_tiles_per_window: int = DEFAULT_MAX_TILES,
    ln_eps: float = 1e-3,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused message-passing step: ``h' = GatedUpdate(h, Aggregate(
    M[bond] @ h[src] → dst))`` in a single Pallas launch. Differentiable
    in ``h``, ``m_table`` and the GRU params (remat backward)."""
    return _fused_step_fwd_impl(
        h, m_table, gru, bond_ids, src, dst, edge_mask,
        num_nodes, window, tile, max_tiles_per_window, ln_eps, interpret,
    )


def _vjp_fwd(h, m_table, gru, bond_ids, src, dst, edge_mask,
             num_nodes, window, tile, max_tiles_per_window, ln_eps, interpret):
    out = _fused_step_fwd_impl(
        h, m_table, gru, bond_ids, src, dst, edge_mask,
        num_nodes, window, tile, max_tiles_per_window, ln_eps, interpret,
    )
    return out, (h, m_table, gru, bond_ids, src, dst, edge_mask)


def _vjp_bwd(num_nodes, window, tile, max_tiles_per_window, ln_eps, interpret,
             res, g):
    h, m_table, gru, bond_ids, src, dst, edge_mask = res
    _, vjp_fn = jax.vjp(
        lambda h_, mt_, gru_: _reference_compose(
            h_, mt_, gru_, bond_ids, src, dst, edge_mask, ln_eps
        ),
        h, m_table, gru,
    )
    dh, dmt, dgru = vjp_fn(g)
    dmask = (
        None
        if not jnp.issubdtype(edge_mask.dtype, jnp.inexact)
        else jnp.zeros_like(edge_mask)
    )
    return (dh, dmt, dgru, None, None, None, dmask)


fused_mp_step.defvjp(_vjp_fwd, _vjp_bwd)
