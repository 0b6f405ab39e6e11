"""Native (C++) host-side components, loaded via ctypes.

The TPU compute path is JAX/XLA/Pallas; the host-side runtime pieces that
sit on the per-step critical path — batch packing foremost — have C++
implementations here. The library is compiled lazily with g++ on first
use and cached next to the source; everything degrades gracefully to the
pure-Python implementations if no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "get_packer_lib",
    "native_available",
    "pack_graphs_native",
    "pack_graphs_indexed_native",
    "plan_batches_native",
    "window_tile_native",
]

_HERE = Path(__file__).parent
_SRC = _HERE / "packer.cpp"
_LIB = _HERE / "libpacker.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def get_packer_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native packer; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _build_failed = True
            return None
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.pack_graphs.restype = ctypes.c_int
        lib.pack_graphs.argtypes = [
            i32p, i64p, i32p, i32p, i64p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, i32p, i32p, i32p, u8p, u8p,
        ]
        lib.plan_batches.restype = ctypes.c_int
        lib.plan_batches.argtypes = [
            i32p, i32p, i32p, i32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            i32p,
        ]
        lib.plan_batches2.restype = ctypes.c_int
        lib.plan_batches2.argtypes = [
            i32p, i32p, i32p, i32p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            i32p,
        ]
        lib.pack_graphs_indexed.restype = ctypes.c_int
        lib.pack_graphs_indexed.argtypes = [
            i32p, i64p, i32p, i32p, i64p,
            i32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            i32p, i32p, i32p, i32p, i32p, i32p, u8p, u8p,
        ]
        lib.pack_graphs_indexed_at.restype = ctypes.c_int
        lib.pack_graphs_indexed_at.argtypes = [
            i32p, i64p, i32p, i32p, i64p,
            i32p, ctypes.c_int32,
            i32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            i32p, i32p, i32p, i32p, i32p, i32p, u8p, u8p,
        ]
        lib.window_tile.restype = ctypes.c_int
        lib.window_tile.argtypes = [
            i32p, i32p, i32p, u8p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p, i32p, i32p, u8p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_packer_lib() is not None


def _as_u8(mask: np.ndarray) -> np.ndarray:
    """View a bool mask as uint8 in place (same memory, no copy) for the
    C ABI; uint8 arrays pass through."""
    return mask.view(np.uint8) if mask.dtype == np.bool_ else mask


def pack_graphs_native(
    atom_ids_flat: np.ndarray,
    atom_off: np.ndarray,
    bond_ids_flat: np.ndarray,
    edges_flat: np.ndarray,
    edge_off: np.ndarray,
    node_cap: int,
    edge_cap: int,
    duplicate_edges: bool = False,
    sort_by_dst: bool = True,
    node_align: int = 0,
):
    """C++ packing of columnar molecule arrays into one batch's buffers.

    Returns the 8 packed arrays (atom_ids, bond_ids, src, dst, node_graph,
    node_local, node_mask, edge_mask); raises on capacity overflow.
    ``node_align`` mirrors :func:`data.packing.pack_graphs`.
    """
    lib = get_packer_lib()
    if lib is None:
        raise RuntimeError("native packer unavailable (no g++?)")
    num_graphs = len(atom_off) - 1
    atom_ids = np.empty(node_cap, np.int32)
    bond_ids = np.empty(edge_cap, np.int32)
    src = np.empty(edge_cap, np.int32)
    dst = np.empty(edge_cap, np.int32)
    node_graph = np.empty(node_cap, np.int32)
    node_local = np.empty(node_cap, np.int32)
    node_mask = np.empty(node_cap, np.uint8)
    edge_mask = np.empty(edge_cap, np.uint8)
    rc = lib.pack_graphs(
        np.ascontiguousarray(atom_ids_flat, np.int32),
        np.ascontiguousarray(atom_off, np.int64),
        np.ascontiguousarray(bond_ids_flat, np.int32),
        np.ascontiguousarray(edges_flat, np.int32).reshape(-1),
        np.ascontiguousarray(edge_off, np.int64),
        num_graphs, node_cap, edge_cap,
        int(duplicate_edges), int(sort_by_dst), int(node_align),
        atom_ids, bond_ids, src, dst, node_graph, node_local, node_mask, edge_mask,
    )
    if rc == -1:
        raise ValueError(f"node capacity {node_cap} exceeded")
    if rc == -2:
        raise ValueError(f"edge capacity {edge_cap} exceeded")
    if rc != 0:
        raise ValueError(f"native packer error {rc}")
    return (atom_ids, bond_ids, src, dst, node_graph, node_local,
            node_mask.astype(bool), edge_mask.astype(bool))


def plan_batches_native(
    n_nodes_a: np.ndarray, n_edges_a: np.ndarray,
    n_nodes_b: np.ndarray, n_edges_b: np.ndarray,
    batch_size: int, node_cap: int, edge_cap: int,
    node_align: int = 0,
    node_cap_b: int = 0, edge_cap_b: int = 0,
) -> np.ndarray:
    """Greedy batch boundaries; returns starts array of len n_batches+1.
    ``*_b`` caps size side b independently (0 = shared with side a)."""
    lib = get_packer_lib()
    if lib is None:
        raise RuntimeError("native packer unavailable (no g++?)")
    num_graphs = len(n_nodes_a)
    starts = np.empty(num_graphs + 1, np.int32)
    rc = lib.plan_batches2(
        np.ascontiguousarray(n_nodes_a, np.int32),
        np.ascontiguousarray(n_edges_a, np.int32),
        np.ascontiguousarray(n_nodes_b, np.int32),
        np.ascontiguousarray(n_edges_b, np.int32),
        num_graphs, batch_size, node_cap, edge_cap,
        node_cap_b or node_cap, edge_cap_b or edge_cap,
        int(node_align), starts,
    )
    if rc < 0:
        raise ValueError(f"a single graph exceeds capacities (err {rc})")
    return starts[: rc + 1]


def pack_graphs_indexed_native(
    atoms_pool: np.ndarray, atom_off: np.ndarray,
    bonds_pool: np.ndarray, edges_pool: np.ndarray, edge_off: np.ndarray,
    sel: np.ndarray,
    node_cap: int, edge_cap: int,
    duplicate_edges: bool = False, sort_by_dst: bool = True,
    node_align: int = 0,
    out=None,
    node_offsets=None,
):
    """C++ packing of molecules ``sel`` gathered directly from the
    whole-dataset flat pools — shuffling an epoch permutes only the size
    arrays, never the dataset. Same output contract as
    :func:`pack_graphs_native` on the selected molecule sequence.

    ``out``: optional 8-tuple of caller-owned destination arrays
    (atom_ids i32[node_cap], bond_ids/src/dst i32[edge_cap], node_graph/
    node_local i32[node_cap], node_mask bool[node_cap], edge_mask
    bool[edge_cap]) — e.g. rows of pre-stacked (K, cap) group buffers, so
    scan-group assembly needs no np.stack pass. Masks may be bool or
    uint8 (bool arrays are viewed as uint8 in place).

    ``node_offsets``: optional (len(sel),) explicit node placement (the
    LPT window balancing computes it in Python; C++ just writes it).
    """
    lib = get_packer_lib()
    if lib is None:
        raise RuntimeError("native packer unavailable (no g++?)")
    if out is None:
        atom_ids = np.empty(node_cap, np.int32)
        bond_ids = np.empty(edge_cap, np.int32)
        src = np.empty(edge_cap, np.int32)
        dst = np.empty(edge_cap, np.int32)
        node_graph = np.empty(node_cap, np.int32)
        node_local = np.empty(node_cap, np.int32)
        node_mask = np.empty(node_cap, bool)
        edge_mask = np.empty(edge_cap, bool)
    else:
        (atom_ids, bond_ids, src, dst, node_graph, node_local,
         node_mask, edge_mask) = out
    sel = np.ascontiguousarray(sel, np.int32)
    if node_offsets is not None:
        offs = np.ascontiguousarray(node_offsets, np.int32)
        rc = lib.pack_graphs_indexed_at(
            np.ascontiguousarray(atoms_pool, np.int32),
            np.ascontiguousarray(atom_off, np.int64),
            np.ascontiguousarray(bonds_pool, np.int32),
            np.ascontiguousarray(edges_pool, np.int32).reshape(-1),
            np.ascontiguousarray(edge_off, np.int64),
            sel, len(sel), offs, 1, node_cap, edge_cap,
            int(duplicate_edges), int(sort_by_dst), int(node_align),
            atom_ids, bond_ids, src, dst, node_graph, node_local,
            _as_u8(node_mask), _as_u8(edge_mask),
        )
    else:
        rc = lib.pack_graphs_indexed(
            np.ascontiguousarray(atoms_pool, np.int32),
            np.ascontiguousarray(atom_off, np.int64),
            np.ascontiguousarray(bonds_pool, np.int32),
            np.ascontiguousarray(edges_pool, np.int32).reshape(-1),
            np.ascontiguousarray(edge_off, np.int64),
            sel, len(sel), node_cap, edge_cap,
            int(duplicate_edges), int(sort_by_dst), int(node_align),
            atom_ids, bond_ids, src, dst, node_graph, node_local,
            _as_u8(node_mask), _as_u8(edge_mask),
        )
    if rc == -1:
        raise ValueError(f"node capacity {node_cap} exceeded")
    if rc == -2:
        raise ValueError(f"edge capacity {edge_cap} exceeded")
    if rc != 0:
        raise ValueError(f"native packer error {rc}")
    return (atom_ids, bond_ids, src, dst, node_graph, node_local,
            node_mask, edge_mask)


def window_tile_native(
    src: np.ndarray, dst: np.ndarray, bond_ids: np.ndarray,
    edge_mask: np.ndarray, node_cap: int, window: int, tile: int,
    aligned: bool = False,
    out=None,
):
    """C++ window tiling of a dst-sorted packed edge list (mirror of
    ``data.packing.window_tile_edges``, same capacity/locality errors).
    Returns (src, dst, bond_ids, edge_mask) with ``nw*tile`` slots.
    ``out``: optional (src, dst, bond_ids, edge_mask[bool]) destination
    arrays (e.g. group-buffer rows)."""
    lib = get_packer_lib()
    if lib is None:
        raise RuntimeError("native packer unavailable (no g++?)")
    nw = node_cap // window
    e2 = nw * tile
    if out is None:
        src_o = np.empty(e2, np.int32)
        dst_o = np.empty(e2, np.int32)
        bond_o = np.empty(e2, np.int32)
        mask_o = np.empty(e2, bool)
    else:
        src_o, dst_o, bond_o, mask_o = out
    em = edge_mask if edge_mask.dtype in (np.bool_, np.uint8) else \
        np.ascontiguousarray(edge_mask, np.uint8)
    rc = lib.window_tile(
        np.ascontiguousarray(src, np.int32),
        np.ascontiguousarray(dst, np.int32),
        np.ascontiguousarray(bond_ids, np.int32),
        _as_u8(np.ascontiguousarray(em)),
        len(src), node_cap, window, tile, int(aligned),
        src_o, dst_o, bond_o, _as_u8(mask_o),
    )
    if rc == -4:
        raise ValueError(
            f"window tile capacity {tile} exceeded — size the plan's "
            f"edge_tile with the proven bound"
        )
    if rc == -5:
        raise ValueError(
            "edge violates the window locality contract "
            f"(aligned={aligned}, window={window})"
        )
    if rc != 0:
        raise ValueError(f"native window_tile error {rc}")
    return src_o, dst_o, bond_o, mask_o
