"""Pallas TPU kernel: FUSED bond-matrix message + destination aggregate.

This is the SpMM-style kernel SURVEY §2.3 targets: per edge ``e``,
``m_e = M_table[bond_e] @ h[src_e]`` summed into ``out[dst_e]``
(reference math: ``/root/reference/models/layers.py:106-112`` message +
``:142`` reduce), executed without ever materializing the (E, D) message
tensor or the (E, F·D) flattened outer product in HBM.

Everything is MXU work — no scalar gathers or scatters anywhere:

  * **src gather as one-hot matmul over a 3-window halo.** The packer
    lays molecules out contiguously and every edge stays inside one
    molecule, so with molecules capped at ``window`` atoms every source
    of an edge landing in destination window ``w`` lives in node windows
    ``{w-1, w, w+1}``. The kernel receives those three (W, D) blocks of
    ``h`` and gathers ``h[src]`` as three masked one-hot (T, W) @ (W, D)
    matmuls. This "locality contract" (|src - dst| < window) is a
    checked capacity contract, not an assumption — see
    :func:`check_src_locality`.
  * **bond transform as one typed matmul.** The per-edge (D, D) matrix
    is a lookup into the tiny per-bond-TYPE table (V ≈ 7 types), so the
    kernel computes ``X = h_src @ K`` with ``K`` the (D, V·D) stack of
    transposed type matrices — one MXU matmul that fills 224 of 128·2
    lanes instead of E tiny (D,D) matvecs — then selects each edge's
    type slice with V vector multiply-adds.
  * **aggregate as one-hot matmul** into the (W, D) output block, same
    scheme as :mod:`.segment_sum` (dst sorted ⇒ CSR window pointers ⇒
    boundary tiles disambiguated by a dst-range mask).

Backward is SORTED too: by the molecular edge-reversal symmetry (every
bond is stored in both directions with one bond id — the same
precondition as ``message_pass_aggregate_symmetric``),

    dL/dh[m] = Σ_{e: src_e = m} M[b_e]^T g[dst_e]
             = Σ_{e: dst_e = m} M[b_e]^T g[src_e]

which is THIS SAME KERNEL applied to (g, K^T) — no unsorted scatter in
the VJP. The table cotangent is two XLA matmuls.

Measured context (RESULTS round 2): the XLA train step is MXU-bound at
~80-90% of bf16 peak, so this kernel cannot beat it end-to-end on this
chip; additionally the axon remote backend executes programs that MIX
Pallas custom-calls with XLA ops ~1000x slower (fwd-only-pallas
pathology), so it stays behind ``message_impl="pallas_fused"``. It is
the building block for device-bound regimes (large D / local chips).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .segment_sum import (
    DEFAULT_MAX_TILES,
    DEFAULT_TILE,
    DEFAULT_WINDOW,
    PallasCapacityError,
    _GRID,
    dropped_edge_mask,
    window_ptr,
)

__all__ = [
    "fused_message_aggregate",
    "message_table_to_lanes",
    "check_src_locality",
]


def message_table_to_lanes(m_table: jnp.ndarray) -> jnp.ndarray:
    """(V, D, D) type matrices → the (D, V·D) lane-stacked kernel operand.

    ``K[j, v·D + i] = M_v[i, j]`` so that ``(h_src @ K)[e, v·D + i]``
    equals ``(M_v @ h_src[e])[i]`` — the fused kernel's typed matmul.
    """
    V, D, D2 = m_table.shape
    assert D == D2, m_table.shape
    return m_table.transpose(2, 0, 1).reshape(D, V * D)


def transpose_lane_table(K: jnp.ndarray, V: int) -> jnp.ndarray:
    """Lane-stacked table of M_v → lane-stacked table of M_v^T."""
    D = K.shape[0]
    return K.reshape(D, V, D).transpose(2, 1, 0).reshape(D, V * D)


def check_src_locality(
    src: np.ndarray,
    dst: np.ndarray,
    edge_mask: np.ndarray | None = None,
    window: int = DEFAULT_WINDOW,
) -> None:
    """Raise if any REAL edge violates the 3-window locality contract.

    The packer guarantees this for molecular inputs (molecules are
    node-contiguous and smaller than ``window``); anything else must be
    caught loudly, not silently gathered as zeros.
    """
    src = np.asarray(src)
    dst = np.asarray(dst)
    bad = np.abs(src.astype(np.int64) - dst.astype(np.int64)) >= window
    if edge_mask is not None:
        bad = bad & np.asarray(edge_mask).astype(bool)
    n_bad = int(bad.sum())
    if n_bad:
        raise PallasCapacityError(
            f"fused-message locality contract violated: {n_bad} real edges "
            f"have |src - dst| >= window={window} (molecule larger than the "
            f"node window, or non-contiguous molecule layout); raise "
            f"`window` or fall back to message_impl='gather'"
        )


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
    out_ref,
    *,
    window,
    tile,
    V,
    D,
    num_windows,
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
        src = src_ref[:, 0]  # (T,)
        dst = dst_ref[:, 0]
        bond = bond_ref[:, 0]
        real = mask_ref[:, 0] > 0.0  # (T,)

        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)

        # --- gather h[src] over the {w-1, w, w+1} halo (one-hot MXU) ---
        # HIGHEST precision: one-hot entries are exact, but default bf16
        # passes would round the fp32 node states being gathered.
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

        # --- bond transform: one (T, D) @ (D, V*D) typed matmul ---
        x = jax.lax.dot_general(
            h_src, k_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (T, V*D)
        msgs = jnp.zeros((tile, D), jnp.float32)
        for v in range(V):  # V is small & static — unrolled vector selects
            sel = (bond == v).astype(jnp.float32)[:, None]
            msgs += sel * x[:, v * D:(v + 1) * D]

        # --- aggregate into this window's output block (one-hot MXU) ---
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


def _fused_fwd_impl(
    h: jnp.ndarray,  # (N, D) float32
    K: jnp.ndarray,  # (D, V*D) from message_table_to_lanes
    bond_ids: jnp.ndarray,  # (E,) int32
    src: jnp.ndarray,  # (E,) int32
    dst: jnp.ndarray,  # (E,) int32 sorted ascending
    edge_mask: jnp.ndarray,  # (E,) bool/float
    num_nodes: int,
    window: int,
    tile: int,
    max_tiles_per_window: int,
    interpret: bool,
) -> jnp.ndarray:
    if not interpret:  # Mosaic needs a real TPU; CPU tests run interpreted
        interpret = jax.default_backend() != "tpu"
    N, D = h.shape
    assert N == num_nodes, (N, num_nodes)
    VD = K.shape[1]
    assert VD % D == 0, (K.shape, D)
    V = VD // D
    E = src.shape[0]
    mask_f = edge_mask.astype(jnp.float32)

    # Host-side contract validation on concrete inputs (same policy as
    # segment_sum: overflow/violation is NEVER silent from public entry
    # points; traced calls are covered by the pack-path guards).
    if not isinstance(dst, jax.core.Tracer) and not isinstance(src, jax.core.Tracer):
        if not isinstance(edge_mask, jax.core.Tracer):
            em = np.asarray(edge_mask).astype(bool)
            check_src_locality(np.asarray(src), np.asarray(dst), em, window)
            dropped = dropped_edge_mask(
                np.asarray(dst), num_nodes, window, tile, max_tiles_per_window
            )
            if (dropped & em).any():
                raise PallasCapacityError(
                    f"fused-message window capacity exceeded: "
                    f"{int((dropped & em).sum())} real edges fall past "
                    f"max_tiles_per_window={max_tiles_per_window}"
                )

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

    kernel = functools.partial(
        _kernel, window=window, tile=tile, V=V, D=D, num_windows=num_windows
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
            pl.BlockSpec((D, VD), lambda w, k, ptr: (0, 0)),
        ],
        out_specs=pl.BlockSpec((window, D), lambda w, k, ptr: (w, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Np, D), jnp.float32),
        interpret=interpret,
    )(ptr, src[:, None], dst[:, None], bond_ids[:, None], mask_f[:, None], h, h, h, K)
    return out[:num_nodes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10))
def fused_message_aggregate(
    h,
    K,
    bond_ids,
    src,
    dst,
    edge_mask,
    num_nodes,
    window=DEFAULT_WINDOW,
    tile=DEFAULT_TILE,
    max_tiles_per_window=DEFAULT_MAX_TILES,
    interpret=False,
):
    """Fused ``out[n] = Σ_{e: dst_e = n} mask_e · M[bond_e] @ h[src_e]``.

    ``K`` is the lane-stacked table from :func:`message_table_to_lanes`.
    Differentiable in ``h`` and ``K`` (sorted backward via edge-reversal
    symmetry — requires the packer's symmetric edge lists).
    """
    return _fused_fwd_impl(
        h, K, bond_ids, src, dst, edge_mask,
        num_nodes, window, tile, max_tiles_per_window, interpret,
    )


def _vjp_fwd(h, K, bond_ids, src, dst, edge_mask,
             num_nodes, window, tile, max_tiles_per_window, interpret):
    out = _fused_fwd_impl(
        h, K, bond_ids, src, dst, edge_mask,
        num_nodes, window, tile, max_tiles_per_window, interpret,
    )
    return out, (h, K, bond_ids, src, dst, edge_mask)


def _vjp_bwd(num_nodes, window, tile, max_tiles_per_window, interpret,
             res, g):
    h, K, bond_ids, src, dst, edge_mask = res
    D = h.shape[1]
    V = K.shape[1] // D
    mask_f = edge_mask.astype(jnp.float32)

    # dh[m] = Σ_{e: dst_e = m} M[b_e]^T g[src_e]  (edge-reversal symmetry)
    # — the SAME fused kernel on (g, K^T): sorted, no scatter.
    dh = _fused_fwd_impl(
        g, transpose_lane_table(K, V), bond_ids, src, dst, edge_mask,
        num_nodes, window, tile, max_tiles_per_window, interpret,
    )

    # dK[j, v·D+i] = Σ_{e: b_e = v} mask_e · g[dst_e, i] · h[src_e, j]
    # Two XLA gathers + one (D, E) @ (E, V·D) matmul — E-sized but fp32
    # dense MXU work, no scatter.
    gd = jnp.take(g, dst, axis=0) * mask_f[:, None]  # (E, D)
    hs = jnp.take(h, src, axis=0)  # (E, D)
    sel = jax.nn.one_hot(bond_ids, V, dtype=jnp.float32)  # (E, V)
    q = (sel[:, :, None] * gd[:, None, :]).reshape(gd.shape[0], V * D)
    dK = jax.lax.dot_general(
        hs, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (D, V*D)

    dmask = (
        None
        if not jnp.issubdtype(edge_mask.dtype, jnp.inexact)
        else jnp.zeros_like(edge_mask)
    )
    return (dh, dK, None, None, None, dmask)


fused_message_aggregate.defvjp(_vjp_fwd, _vjp_bwd)
