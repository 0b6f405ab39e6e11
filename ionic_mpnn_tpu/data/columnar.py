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
    side: _Side, sel: np.ndarray, plan: BatchPlan,
    node_out=None, edge_out=None, scratch=None,
) -> PackedGraphs:
    """Pack one ion side natively. ``node_out`` (atom_ids, node_graph,
    node_local, node_mask) and ``edge_out`` (bond_ids, src, dst,
    edge_mask) optionally direct the outputs into caller-owned buffers
    (group-buffer rows); for window layouts ``scratch`` holds the
    pre-tiling edge arrays (reused across calls)."""
    tiled = plan.edge_layout in ("window", "window_aligned")
    if tiled and scratch is not None:
        pre_edges = scratch
    elif tiled and edge_out is not None:
        pre_edges = None  # allocate below
    else:
        pre_edges = edge_out  # sorted layout: pack straight into edge_out
    pack_out = None
    if node_out is not None:
        if pre_edges is None:
            pre_edges = (np.empty(plan.edge_cap, np.int32),
                         np.empty(plan.edge_cap, np.int32),
                         np.empty(plan.edge_cap, np.int32),
                         np.empty(plan.edge_cap, bool))
        bnd, sr, ds, em = pre_edges
        ai, ng, nl, nm = node_out
        pack_out = (ai, bnd, sr, ds, ng, nl, nm, em)
    arrays = native.pack_graphs_indexed_native(
        side.atoms, side.atom_off, side.bonds, side.edges, side.edge_off,
        sel,
        plan.node_cap,
        plan.edge_cap,
        duplicate_edges=plan.duplicate_edges,
        node_align=plan.node_align,
        out=pack_out,
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
            plan.node_cap, plan.window, plan.edge_tile,
            aligned=plan.edge_layout == "window_aligned",
            out=tile_out,
        )
        layout = plan.edge_layout
    else:
        # Same Pallas sorted-scatter capacity guard as the Python packer:
        # the native loader must never emit a batch the kernel would
        # silently truncate (see ops/pallas/segment_sum.py).
        from ..ops.pallas.segment_sum import check_window_capacity

        check_window_capacity(dst, plan.node_cap, edge_mask=edge_mask)
    return PackedGraphs(
        atom_ids=atom_ids, bond_ids=bond_ids, src=src, dst=dst,
        node_graph=node_graph, node_local=node_local,
        node_mask=node_mask, edge_mask=edge_mask,
        n_graphs=plan.batch_size,
        edge_layout=layout,
    )


def _epoch_plan(data: ColumnarIonPairs, plan: BatchPlan, shuffle: bool, seed: int):
    """Shared shuffle + greedy batch planning for the fast iterators."""
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
    starts = native.plan_batches_native(
        cn[order], ce[order] * mult, an_n[order], an_e[order] * mult,
        plan.batch_size, plan.node_cap, plan.edge_cap,
        node_align=plan.node_align,
    )
    return order, temperature, y, starts


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
    order, temperature, y, starts = _epoch_plan(data, plan, shuffle, seed)

    B = plan.batch_size
    for i in range(len(starts) - 1):
        g0, g1 = int(starts[i]), int(starts[i + 1])
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
            cation=_pack_side(data.cation, sel, plan),
            anion=_pack_side(data.anion, sel, plan),
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
    order, temperature, y, starts = _epoch_plan(data, plan, shuffle, seed)

    B = plan.batch_size
    K = group_size
    tiled = plan.edge_layout in ("window", "window_aligned")
    e2 = (plan.node_cap // plan.window) * plan.edge_tile if tiled else plan.edge_cap
    layout = plan.edge_layout if tiled else "sorted"
    scratch = (
        (np.empty(plan.edge_cap, np.int32), np.empty(plan.edge_cap, np.int32),
         np.empty(plan.edge_cap, np.int32), np.empty(plan.edge_cap, bool))
        if tiled else None
    )
    empty_sel = np.zeros(0, np.int32)

    n_batches = len(starts) - 1
    for i0 in range(0, n_batches, K):
        ks = range(i0, min(i0 + K, n_batches))
        bufs = {}
        for side in ("cation", "anion"):
            bufs[side] = {
                "atom_ids": np.empty((K, plan.node_cap), np.int32),
                "node_graph": np.empty((K, plan.node_cap), np.int32),
                "node_local": np.empty((K, plan.node_cap), np.int32),
                "node_mask": np.empty((K, plan.node_cap), bool),
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
            if i < n_batches:
                g0, g1 = int(starts[i]), int(starts[i + 1])
                n_real = g1 - g0
                sel = order[g0:g1]
                if plan.with_temperature:
                    temp[k, :n_real, 0] = temperature[g0:g1]
                yy[k, :n_real] = y[g0:g1]
                mask[k, :n_real] = 1.0
                n_real_total += n_real
            else:
                sel = empty_sel  # group padding: natively-packed empty batch
            for side_name, side in (("cation", data.cation), ("anion", data.anion)):
                b = bufs[side_name]
                _pack_side(
                    side, sel, plan,
                    node_out=(b["atom_ids"][k], b["node_graph"][k],
                              b["node_local"][k], b["node_mask"][k]),
                    edge_out=(b["bond_ids"][k], b["src"][k], b["dst"][k],
                              b["edge_mask"][k]),
                    scratch=scratch,
                )

        def graphs(side_name: str) -> PackedGraphs:
            b = bufs[side_name]
            return PackedGraphs(
                atom_ids=b["atom_ids"], bond_ids=b["bond_ids"],
                src=b["src"], dst=b["dst"], node_graph=b["node_graph"],
                node_local=b["node_local"], node_mask=b["node_mask"],
                edge_mask=b["edge_mask"], n_graphs=B, edge_layout=layout,
            )

        yield IonPairBatch(
            cation=graphs("cation"), anion=graphs("anion"),
            temperature=temp, y=yy, sample_mask=mask,
        ), n_real_total
