"""Columnar ion-pair dataset + native-packed batch iteration.

The record-of-dicts format (reference ``*_id_data.pkl`` rows) is friendly
for interchange but slow to batch from Python. This module flattens a
dataset once into contiguous columnar arrays (ids + offsets per ion) and
then drives the C++ packer (:mod:`ionic_mpnn_tpu.native`) per batch —
the host-side loading path for large-batch TPU training. Falls back to
the Python packer when no native library is available; both paths emit
bit-identical :class:`IonPairBatch` structures (tested).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Sequence

import numpy as np

from .loader import BatchPlan, iter_batches
from .packing import IonPairBatch, PackedGraphs
from .. import native

__all__ = ["ColumnarIonPairs", "iter_batches_fast", "iter_batch_groups_fast"]


@dataclass
class _Side:
    atoms: np.ndarray  # (ΣN,) int32 raw vocab ids
    bonds: np.ndarray  # (ΣE,) int32 raw vocab ids
    edges: np.ndarray  # (ΣE, 2) int32 local pairs
    atom_off: np.ndarray  # (G+1,) int64
    edge_off: np.ndarray  # (G+1,) int64

    def sizes(self) -> tuple:
        return (np.diff(self.atom_off).astype(np.int32),
                np.diff(self.edge_off).astype(np.int32))


@dataclass
class ColumnarIonPairs:
    cation: _Side
    anion: _Side
    temperature: np.ndarray  # (G,) float32
    y: np.ndarray  # (G,) float32
    pair_ids: List[str]

    @classmethod
    def from_records(cls, records: Sequence[Dict[str, Any]],
                     target_key: str = "log_eta") -> "ColumnarIonPairs":
        def side(key: str) -> _Side:
            atoms, bonds, edges = [], [], []
            atom_off, edge_off = [0], [0]
            for r in records:
                g = r[key]
                atoms.extend(g["atom_ids"])
                bonds.extend(g["bond_ids"])
                edges.extend(g["edge_indices"])
                atom_off.append(len(atoms))
                edge_off.append(len(bonds))
            return _Side(
                np.asarray(atoms, np.int32),
                np.asarray(bonds, np.int32),
                np.asarray(edges, np.int32).reshape(-1, 2),
                np.asarray(atom_off, np.int64),
                np.asarray(edge_off, np.int64),
            )

        return cls(
            cation=side("cation"),
            anion=side("anion"),
            temperature=np.asarray([r.get("T", 0.0) for r in records], np.float32),
            y=np.asarray([r.get(target_key, 0.0) for r in records], np.float32),
            pair_ids=[r.get("pair_id", "") for r in records],
        )

    def __len__(self) -> int:
        return len(self.pair_ids)


def _pack_side(
    side: _Side, sel: np.ndarray, plan: BatchPlan, side_name: str = "cation",
    node_out=None, edge_out=None, scratch=None, node_offsets=None,
) -> PackedGraphs:
    """Pack one ion side natively (capacities from
    ``plan.side_caps(side_name)`` — the anion side is typically sized
    much smaller). ``node_out`` (atom_ids, node_graph, node_local,
    node_mask) and ``edge_out`` (bond_ids, src, dst, edge_mask)
    optionally direct the outputs into caller-owned buffers (group-buffer
    rows); for window layouts ``scratch`` holds the pre-tiling edge
    arrays (reused across calls). ``node_offsets`` carries the balanced
    placement when ``plan.balance`` is on."""
    node_cap, edge_cap, edge_tile, _ = plan.side_caps(side_name)
    tiled = plan.edge_layout in ("window", "window_aligned")
    if tiled and scratch is not None:
        # scratch is sized for the larger side; views keep the tiler's
        # edge count correct for this side
        pre_edges = tuple(a[:edge_cap] for a in scratch)
    elif tiled and edge_out is not None:
        pre_edges = None  # allocate below
    else:
        pre_edges = edge_out  # sorted layout: pack straight into edge_out
    pack_out = None
    if node_out is not None:
        if pre_edges is None:
            pre_edges = (np.empty(edge_cap, np.int32),
                         np.empty(edge_cap, np.int32),
                         np.empty(edge_cap, np.int32),
                         np.empty(edge_cap, bool))
        bnd, sr, ds, em = pre_edges
        ai, ng, nl, nm = node_out
        pack_out = (ai, bnd, sr, ds, ng, nl, nm, em)
    arrays = native.pack_graphs_indexed_native(
        side.atoms, side.atom_off, side.bonds, side.edges, side.edge_off,
        sel,
        node_cap,
        edge_cap,
        duplicate_edges=plan.duplicate_edges,
        node_align=plan.node_align,
        out=pack_out,
        node_offsets=node_offsets,
    )
    atom_ids, bond_ids, src, dst, node_graph, node_local, node_mask, edge_mask = arrays
    layout = "sorted"
    if tiled:
        # native window tiling: the Python tiler costs ~4 numpy passes
        # over the edge arrays per batch, which dominates host time at
        # production batch sizes (battery 18). The tiler enforces a
        # per-window capacity STRICTER than the Pallas sorted-scatter
        # contract, so the extra check below is only needed for sorted
        # batches.
        tile_out = None
        if edge_out is not None:
            bnd_o, sr_o, ds_o, em_o = edge_out
            tile_out = (sr_o, ds_o, bnd_o, em_o)
        src, dst, bond_ids, edge_mask = native.window_tile_native(
            src, dst, bond_ids, edge_mask,
            node_cap, plan.window, edge_tile,
            aligned=plan.edge_layout == "window_aligned",
            out=tile_out,
        )
        layout = plan.edge_layout
    else:
        # Same Pallas sorted-scatter capacity guard as the Python packer:
        # the native loader must never emit a batch the kernel would
        # silently truncate (see ops/pallas/segment_sum.py).
        from ..ops.pallas.segment_sum import check_window_capacity

        check_window_capacity(dst, node_cap, edge_mask=edge_mask)
    pool_slot = None
    if layout == "window_aligned" and node_offsets is None:
        # balanced placements (explicit node_offsets) are not row-sorted —
        # the windowed-readout addressing doesn't hold there
        from .packing import compute_pool_slots

        pool_slot = compute_pool_slots(node_graph, node_mask, plan.window,
                                       plan.batch_size)
    return PackedGraphs(
        atom_ids=atom_ids, bond_ids=bond_ids, src=src, dst=dst,
        node_graph=node_graph, node_local=node_local,
        node_mask=node_mask, edge_mask=edge_mask,
        n_graphs=plan.batch_size,
        edge_layout=layout,
        # the C++ packer forward-fills pad ids (sorted readout) except
        # under explicit balanced placement
        node_sorted=node_offsets is None,
        pool_slot=pool_slot,
    )


def _epoch_plan(data: ColumnarIonPairs, plan: BatchPlan, shuffle: bool, seed: int):
    """Shared shuffle + greedy batch planning for the fast iterators.

    Returns (order, temperature, y, bounds) where ``bounds`` yields
    ``(g0, g1, off_c, off_a)`` per batch — offsets are the balanced
    placements (or None), and a batch that cannot balance under the
    simulation-sized tile shrinks until it fits (the dropped records
    lead the next batch; the tail is re-planned natively)."""
    G = len(data)
    # Shuffle permutes ONLY the size/target arrays; the indexed packer
    # gathers molecules straight from the unpermuted flat pools (the
    # per-epoch permuted dataset copy was 69% of host epoch time).
    if shuffle:
        order = np.random.default_rng(seed).permutation(G)
        temperature, y = data.temperature[order], data.y[order]
    else:
        order = np.arange(G)
        temperature, y = data.temperature, data.y

    mult = 2 if plan.duplicate_edges else 1
    cn, ce = data.cation.sizes()
    an_n, an_e = data.anion.sizes()
    an_node_cap, an_edge_cap, _, an_bal = plan.side_caps("anion")

    def plan_from(g0: int):
        return native.plan_batches_native(
            cn[order[g0:]], ce[order[g0:]] * mult,
            an_n[order[g0:]], an_e[order[g0:]] * mult,
            plan.batch_size, plan.node_cap, plan.edge_cap,
            node_align=plan.node_align,
            node_cap_b=an_node_cap, edge_cap_b=an_edge_cap,
        )

    def bounds():
        from .packing import GraphCapacityError, balanced_offsets

        g0 = 0
        starts = plan_from(0)
        idx = 0
        while g0 < G:
            # invariant: g0 == starts[idx] (after a shrink the tail is
            # re-planned with starts[0] == g0)
            g1 = int(starts[idx + 1])
            shrunk = False
            if not plan.balance_tile:
                yield g0, g1, None, None
            else:
                while True:
                    sel = order[g0:g1]
                    try:
                        off_c = balanced_offsets(
                            cn[sel], ce[sel] * mult, plan.node_cap,
                            plan.window, plan.balance_tile)
                        off_a = balanced_offsets(
                            an_n[sel], an_e[sel] * mult, an_node_cap,
                            plan.window, an_bal)
                        break
                    except GraphCapacityError:
                        if g1 - g0 <= 1:
                            raise
                        g1 -= 1
                        shrunk = True
                yield g0, g1, off_c, off_a
            g0 = g1
            idx += 1
            if shrunk:
                # boundaries after a shrink are stale: re-plan the tail
                starts = g0 + plan_from(g0).astype(np.int64)
                idx = 0

    return order, temperature, y, bounds()


def iter_batches_fast(
    data: ColumnarIonPairs,
    plan: BatchPlan,
    shuffle: bool = False,
    seed: int = 0,
) -> Iterator[IonPairBatch]:
    """Native-packed batch iteration over a columnar dataset.

    Same greedy capacity-bounded batching semantics as
    :func:`ionic_mpnn_tpu.data.loader.iter_batches`.
    """
    if not native.native_available():
        raise RuntimeError("native packer unavailable; use data.loader.iter_batches")
    order, temperature, y, bounds = _epoch_plan(data, plan, shuffle, seed)

    B = plan.batch_size
    for g0, g1, off_c, off_a in bounds:
        n_real = g1 - g0
        sel = order[g0:g1]
        temp = np.zeros((B, 1), np.float32)
        yy = np.zeros(B, np.float32)
        mask = np.zeros(B, np.float32)
        if plan.with_temperature:
            temp[:n_real, 0] = temperature[g0:g1]
        yy[:n_real] = y[g0:g1]
        mask[:n_real] = 1.0
        batch = IonPairBatch(
            cation=_pack_side(data.cation, sel, plan, "cation",
                              node_offsets=off_c),
            anion=_pack_side(data.anion, sel, plan, "anion",
                             node_offsets=off_a),
            temperature=temp,
            y=yy,
            sample_mask=mask,
        )
        yield batch  # window tiling already applied natively in _pack_side


def iter_batch_groups_fast(
    data: ColumnarIonPairs,
    plan: BatchPlan,
    group_size: int,
    shuffle: bool = False,
    seed: int = 0,
):
    """Yield ``(stacked_group, n_real)``: an :class:`IonPairBatch` whose
    leaves carry a leading ``group_size`` axis (the scan-of-K train
    step's input) and the number of real samples in it.

    The native packers write every batch STRAIGHT INTO rows of the
    pre-stacked group buffers — no per-batch ``np.stack`` assembly pass
    (the last numpy round-trip on the fit() host path). A short final
    group is padded with natively-packed EMPTY batches (zero sample
    mask), which the scan step already skips.
    """
    if not native.native_available():
        raise RuntimeError("native packer unavailable; use data.loader.iter_batches")
    order, temperature, y, bounds = _epoch_plan(data, plan, shuffle, seed)
    blist = list(bounds)

    B = plan.batch_size
    K = group_size
    tiled = plan.edge_layout in ("window", "window_aligned")
    layout = plan.edge_layout if tiled else "sorted"
    side_dims = {}
    for side in ("cation", "anion"):
        ncap, ecap, tile, _ = plan.side_caps(side)
        side_dims[side] = (
            ncap, (ncap // plan.window) * tile if tiled else ecap
        )
    max_ecap = max(plan.side_caps(s)[1] for s in ("cation", "anion"))
    scratch = (
        (np.empty(max_ecap, np.int32), np.empty(max_ecap, np.int32),
         np.empty(max_ecap, np.int32), np.empty(max_ecap, bool))
        if tiled else None
    )
    empty_sel = np.zeros(0, np.int32)

    n_batches = len(blist)
    for i0 in range(0, n_batches, K):
        bufs = {}
        for side in ("cation", "anion"):
            ncap, e2 = side_dims[side]
            bufs[side] = {
                "atom_ids": np.empty((K, ncap), np.int32),
                "node_graph": np.empty((K, ncap), np.int32),
                "node_local": np.empty((K, ncap), np.int32),
                "node_mask": np.empty((K, ncap), bool),
                "bond_ids": np.empty((K, e2), np.int32),
                "src": np.empty((K, e2), np.int32),
                "dst": np.empty((K, e2), np.int32),
                "edge_mask": np.empty((K, e2), bool),
            }
        temp = np.zeros((K, B, 1), np.float32)
        yy = np.zeros((K, B), np.float32)
        mask = np.zeros((K, B), np.float32)
        n_real_total = 0
        for k in range(K):
            i = i0 + k
            off_c = off_a = None
            if i < n_batches:
                g0, g1, off_c, off_a = blist[i]
                n_real = g1 - g0
                sel = order[g0:g1]
                if plan.with_temperature:
                    temp[k, :n_real, 0] = temperature[g0:g1]
                yy[k, :n_real] = y[g0:g1]
                mask[k, :n_real] = 1.0
                n_real_total += n_real
            else:
                sel = empty_sel  # group padding: natively-packed empty batch
            for side_name, side, offs in (
                ("cation", data.cation, off_c), ("anion", data.anion, off_a)
            ):
                b = bufs[side_name]
                _pack_side(
                    side, sel, plan, side_name,
                    node_out=(b["atom_ids"][k], b["node_graph"][k],
                              b["node_local"][k], b["node_mask"][k]),
                    edge_out=(b["bond_ids"][k], b["src"][k], b["dst"][k],
                              b["edge_mask"][k]),
                    scratch=scratch,
                    node_offsets=offs,
                )

        def graphs(side_name: str) -> PackedGraphs:
            b = bufs[side_name]
            pool_slot = None
            if layout == "window_aligned" and not plan.balance_tile:
                from .packing import compute_pool_slots

                pool_slot = np.stack([
                    compute_pool_slots(b["node_graph"][k], b["node_mask"][k],
                                       plan.window, B)
                    for k in range(K)
                ])
            return PackedGraphs(
                atom_ids=b["atom_ids"], bond_ids=b["bond_ids"],
                src=b["src"], dst=b["dst"], node_graph=b["node_graph"],
                node_local=b["node_local"], node_mask=b["node_mask"],
                edge_mask=b["edge_mask"], n_graphs=B, edge_layout=layout,
                node_sorted=not plan.balance_tile,
                pool_slot=pool_slot,
            )

        yield IonPairBatch(
            cation=graphs("cation"), anion=graphs("anion"),
            temperature=temp, y=yy, sample_mask=mask,
        ), n_real_total
