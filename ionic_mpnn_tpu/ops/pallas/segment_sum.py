"""Pallas TPU kernel: segment-sum of sorted edge messages into nodes.

``jax.ops.segment_sum`` lowers to XLA scatter-add, historically the
weakest op on TPU (serialized or sort-based lowering). This kernel
exploits what our packer already guarantees — **edges sorted by
destination** — to turn the scatter into window-aligned MXU one-hot
accumulation:

  * the node axis is cut into windows of ``W`` rows; a scalar-prefetched
    CSR-style pointer array gives each window its edge range
    (``ptr[w] = first edge with dst >= w*W``, via ``searchsorted``),
  * grid = (num_windows, max_tiles_per_window): window ``w`` re-visits its
    (W, D) output block while looping over the edge tiles that overlap
    its range; boundary tiles are read by both neighboring windows and
    disambiguated by a dst-range mask (sortedness ⇒ exactness),
  * each (T, D) message tile becomes a masked one-hot (T, W) and the
    accumulation is one ``(W, T) @ (T, D)`` MXU matmul — no scalar
    scatter loop anywhere.

The backward pass of a segment-sum is a plain gather, so the custom VJP
is one ``jnp.take`` — XLA's gather on TPU is already DMA-efficient.

Measured (TPU v5e, fp32, D=32): XLA's sorted scatter-add is competitive
or faster (0.89× at E=32k/N=16k, 0.48× at E=131k/N=65k vs this kernel),
so the framework default stays ``scatter_impl="xla"``; the kernel remains
available behind the flag and as the base for future fused-step kernels.

Capacity contract (UNCHECKED under jit — exceeding it silently drops
edges): no window's edge count may exceed ``max_tiles_per_window *
tile`` (default 16×128 = 2048). The packer upholds it by construction
for molecular graphs: real per-window load is ≤ window·max_degree
(≈128·16 with duplicated edges at the extreme), and pad edges are spread
uniformly over the node range rather than piled at node 0
(``data/packing.py``). Raise ``max_tiles_per_window`` for denser graphs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU memory spaces; interpret mode works without a TPU backend
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
    _GRID = pltpu.PrefetchScalarGridSpec
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = _SMEM = None
    _GRID = None

__all__ = [
    "sorted_segment_sum",
    "window_ptr",
    "window_overflow",
    "check_window_capacity",
    "PallasCapacityError",
]

DEFAULT_WINDOW = 128  # node rows per output block
DEFAULT_TILE = 128  # edges per tile
DEFAULT_MAX_TILES = 16  # max edge tiles overlapping one window


class PallasCapacityError(ValueError):
    """A window's edge span exceeds the kernel's static tile budget —
    proceeding would silently drop edges."""


def dropped_edge_mask(
    dst: np.ndarray,
    num_nodes: int,
    window: int = DEFAULT_WINDOW,
    tile: int = DEFAULT_TILE,
    max_tiles_per_window: int = DEFAULT_MAX_TILES,
) -> np.ndarray:
    """(E,) bool: edges the kernel would NEVER VISIT for this sorted ``dst``.

    Window ``w`` processes edge tiles ``floor(ptr[w]/tile) + k`` for
    ``k < max_tiles_per_window``; edges of the window past that range are
    skipped. Host-side (numpy) — call before jit boundaries.
    """
    dst = np.asarray(dst)
    num_windows = max(-(-num_nodes // window), 1)
    bounds = np.arange(num_windows + 1, dtype=np.int64) * window
    ptr = np.searchsorted(dst, bounds, side="left")
    w = np.minimum(dst.astype(np.int64) // window, num_windows - 1)
    threshold = (ptr[w] // tile) * tile + max_tiles_per_window * tile
    return np.arange(len(dst), dtype=np.int64) >= threshold


def window_overflow(
    dst: np.ndarray,
    num_nodes: int,
    window: int = DEFAULT_WINDOW,
    tile: int = DEFAULT_TILE,
    max_tiles_per_window: int = DEFAULT_MAX_TILES,
    edge_mask: np.ndarray | None = None,
) -> int:
    """Number of edges the kernel would DROP. With ``edge_mask``, only
    *real* edges count — pad edges carry zero messages, so skipping them
    is harmless (and expected in heavily-underfilled batches, where pads
    can legitimately exceed the per-window tile budget)."""
    dropped = dropped_edge_mask(dst, num_nodes, window, tile, max_tiles_per_window)
    if edge_mask is not None:
        dropped = dropped & np.asarray(edge_mask)
    return int(dropped.sum())


def check_window_capacity(
    dst: np.ndarray,
    num_nodes: int,
    window: int = DEFAULT_WINDOW,
    tile: int = DEFAULT_TILE,
    max_tiles_per_window: int = DEFAULT_MAX_TILES,
    edge_mask: np.ndarray | None = None,
) -> None:
    """Raise :class:`PallasCapacityError` if the sorted-scatter kernel's
    capacity contract is violated (instead of silently dropping edges)."""
    dropped = window_overflow(dst, num_nodes, window, tile, max_tiles_per_window, edge_mask)
    if dropped:
        raise PallasCapacityError(
            f"sorted-scatter capacity exceeded: {dropped} real edges fall past "
            f"max_tiles_per_window={max_tiles_per_window} (window={window}, "
            f"tile={tile}, num_nodes={num_nodes}); raise max_tiles_per_window "
            f"or repack with spread pad edges"
        )


def window_ptr(
    dst: jnp.ndarray, num_nodes: int, window: int = DEFAULT_WINDOW
) -> Tuple[jnp.ndarray, int]:
    """CSR-style window pointers for sorted ``dst``: ``ptr[w]`` = first edge
    index with ``dst >= w*window``. Returns (ptr (NW+1,), num_windows)."""
    num_windows = -(-num_nodes // window)
    bounds = jnp.arange(num_windows + 1, dtype=dst.dtype) * window
    ptr = jnp.searchsorted(dst, bounds, side="left").astype(jnp.int32)
    return ptr, num_windows


def _kernel(ptr_ref, dst_ref, msg_ref, out_ref, *, window, tile, num_edges):
    w = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Edge tile k of window w starts at tile-aligned floor(ptr[w]/T) + k.
    first_tile = ptr_ref[w] // tile
    tile_start = (first_tile + k) * tile
    in_range = tile_start < ptr_ref[w + 1]

    @pl.when(in_range)
    def _():
        dst_tile = dst_ref[:, 0]  # (T,)
        col = dst_tile - w * window
        valid = (col >= 0) & (col < window)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile, window), 1)
        onehot = jnp.where(
            valid[:, None] & (col_ids == col[:, None]), 1.0, 0.0
        ).astype(msg_ref.dtype)
        # (T, W) x (T, D) contracting T -> (W, D), no explicit transpose.
        # HIGHEST precision: the MXU's default bf16 passes would round the
        # fp32 messages (one-hot entries are exact either way).
        out_ref[:] += jax.lax.dot_general(
            onehot, msg_ref[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


def sorted_segment_sum(
    messages: jnp.ndarray,  # (E, D) float32, pad rows zeroed
    dst: jnp.ndarray,  # (E,) int32 sorted ascending
    num_nodes: int,
    window: int = DEFAULT_WINDOW,
    tile: int = DEFAULT_TILE,
    max_tiles_per_window: int = DEFAULT_MAX_TILES,
    interpret: bool = False,
    debug_check: bool = False,
) -> jnp.ndarray:
    """Segment-sum messages into (num_nodes, D) via the Pallas kernel.

    Requirements: ``dst`` sorted; messages already masked (pad rows 0).
    The per-window tile bound is a static capacity. Overflow is NEVER
    silent from public entry points: concrete (non-traced) ``dst`` is
    validated here on the host; traced calls are covered by the pack
    paths (:func:`ionic_mpnn_tpu.data.packing.pack_graphs` and the
    native loader validate every batch they emit) and, belt-and-braces,
    by ``debug_check=True`` which raises from a device callback.
    """
    if not interpret:  # Mosaic needs a real TPU; CPU tests run interpreted
        interpret = jax.default_backend() != "tpu"
    if not isinstance(dst, jax.core.Tracer):
        dropped = dropped_edge_mask(
            np.asarray(dst), num_nodes, window, tile, max_tiles_per_window
        )
        if dropped.any() and not isinstance(messages, jax.core.Tracer):
            # dropping all-zero (pad) rows is harmless; anything else is a
            # correctness bug — fail loudly instead of silently truncating.
            lost = float(np.abs(np.asarray(messages)[dropped]).sum())
            if lost > 0.0:
                raise PallasCapacityError(
                    f"sorted-scatter capacity exceeded: {int(dropped.sum())} "
                    f"dropped edges carry nonzero messages (|sum|={lost:g})"
                )
    E, D = messages.shape
    if E % tile:
        pad = tile - E % tile
        # pad messages with zero rows and dst with the last real value
        # (keeps sortedness; zero messages contribute nothing)
        messages = jnp.pad(messages, ((0, pad), (0, 0)))
        dst = jnp.concatenate([dst, jnp.full((pad,), 0, dst.dtype) + dst[E - 1]])
        E = E + pad
    n_pad_nodes = (-num_nodes) % window
    N = num_nodes + n_pad_nodes

    ptr, num_windows = window_ptr(dst, N, window)
    if debug_check:
        # Traced-safe detection: a dropped edge is only a bug if its message
        # row is nonzero (pad rows are pre-masked to zero). Raises from the
        # host callback instead of silently truncating.
        w_ids = jnp.minimum(dst.astype(jnp.int32) // window, num_windows - 1)
        threshold = (ptr[w_ids] // tile) * tile + max_tiles_per_window * tile
        dropped = jnp.arange(E, dtype=jnp.int32) >= threshold
        lost = jnp.sum(jnp.abs(messages) * dropped[:, None].astype(messages.dtype))
        n_dropped = jnp.sum(dropped)

        def _raise(lost_abs, n):
            if float(lost_abs) > 0.0:
                raise PallasCapacityError(
                    f"sorted-scatter capacity exceeded under jit: {int(n)} dropped "
                    f"edges carry nonzero messages (|sum|={float(lost_abs):g})"
                )

        jax.debug.callback(_raise, lost, n_dropped)
    n_edge_tiles = E // tile

    def _edge_block(w, k, ptr):
        # clamp: OOB tiles are fetched-but-unused (kernel skips via ptr range)
        return (jnp.minimum(ptr[w] // tile + k, n_edge_tiles - 1), 0)

    kernel = functools.partial(_kernel, window=window, tile=tile, num_edges=E)
    grid_spec = _GRID(
        num_scalar_prefetch=1,
        grid=(num_windows, max_tiles_per_window),
        in_specs=[
            pl.BlockSpec((tile, 1), _edge_block),
            pl.BlockSpec((tile, D), _edge_block),
        ],
        out_specs=pl.BlockSpec((window, D), lambda w, k, ptr: (w, 0)),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N, D), jnp.float32),
        interpret=interpret,
    )(ptr, dst[:, None], messages)
    return out[:num_nodes]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_vjp(messages, dst, num_nodes, interpret=False):
    return sorted_segment_sum(messages, dst, num_nodes, interpret=interpret)


def _fwd(messages, dst, num_nodes, interpret=False):
    return sorted_segment_sum(messages, dst, num_nodes, interpret=interpret), dst


def _bwd(num_nodes, interpret, dst, g):
    # d/d(messages) of a segment-sum is a gather of the cotangent.
    return (jnp.take(g, dst, axis=0), None)


segment_sum_vjp.defvjp(_fwd, _bwd)
