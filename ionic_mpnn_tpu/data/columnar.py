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

__all__ = ["ColumnarIonPairs", "iter_batches_fast"]


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


def _pack_side(side: _Side, sel: np.ndarray, plan: BatchPlan) -> PackedGraphs:
    arrays = native.pack_graphs_indexed_native(
        side.atoms, side.atom_off, side.bonds, side.edges, side.edge_off,
        sel,
        plan.node_cap,
        plan.edge_cap,
        duplicate_edges=plan.duplicate_edges,
        node_align=plan.node_align,
    )
    atom_ids, bond_ids, src, dst, node_graph, node_local, node_mask, edge_mask = arrays
    layout = "sorted"
    if plan.edge_layout in ("window", "window_aligned"):
        # native window tiling: the Python tiler costs ~4 numpy passes
        # over the edge arrays per batch, which dominates host time at
        # production batch sizes (battery 18). The tiler enforces a
        # per-window capacity STRICTER than the Pallas sorted-scatter
        # contract, so the extra check below is only needed for sorted
        # batches.
        src, dst, bond_ids, edge_mask = native.window_tile_native(
            src, dst, bond_ids, edge_mask,
            plan.node_cap, plan.window, plan.edge_tile,
            aligned=plan.edge_layout == "window_aligned",
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
