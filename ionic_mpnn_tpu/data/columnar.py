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

    def permuted(self, order: np.ndarray) -> "_Side":
        n_sizes, e_sizes = self.sizes()
        n_sizes, e_sizes = n_sizes[order], e_sizes[order]
        atom_off = np.zeros(len(order) + 1, np.int64)
        edge_off = np.zeros(len(order) + 1, np.int64)
        np.cumsum(n_sizes, out=atom_off[1:])
        np.cumsum(e_sizes, out=edge_off[1:])
        atoms = np.empty_like(self.atoms)
        bonds = np.empty_like(self.bonds)
        edges = np.empty_like(self.edges)
        for new_i, old_i in enumerate(order):
            a0, a1 = self.atom_off[old_i], self.atom_off[old_i + 1]
            e0, e1 = self.edge_off[old_i], self.edge_off[old_i + 1]
            atoms[atom_off[new_i]:atom_off[new_i + 1]] = self.atoms[a0:a1]
            bonds[edge_off[new_i]:edge_off[new_i + 1]] = self.bonds[e0:e1]
            edges[edge_off[new_i]:edge_off[new_i + 1]] = self.edges[e0:e1]
        return _Side(atoms, bonds, edges, atom_off, edge_off)


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


def _pack_side(side: _Side, g0: int, g1: int, plan: BatchPlan) -> PackedGraphs:
    a0, a1 = side.atom_off[g0], side.atom_off[g1]
    e0, e1 = side.edge_off[g0], side.edge_off[g1]
    arrays = native.pack_graphs_native(
        side.atoms[a0:a1],
        side.atom_off[g0:g1 + 1] - a0,
        side.bonds[e0:e1],
        side.edges[e0:e1],
        side.edge_off[g0:g1 + 1] - e0,
        plan.node_cap,
        plan.edge_cap,
        duplicate_edges=plan.duplicate_edges,
        node_align=plan.node_align,
    )
    atom_ids, bond_ids, src, dst, node_graph, node_local, node_mask, edge_mask = arrays
    # Same Pallas sorted-scatter capacity guard as the Python packer: the
    # native loader must never emit a batch the kernel would silently
    # truncate (see ops/pallas/segment_sum.py capacity contract).
    from ..ops.pallas.segment_sum import check_window_capacity

    check_window_capacity(dst, plan.node_cap, edge_mask=edge_mask)
    layout = "sorted"
    if plan.edge_layout in ("window", "window_aligned"):
        # native window tiling: the Python tiler costs ~4 numpy passes
        # over the edge arrays per batch, which dominates host time at
        # production batch sizes (battery 18)
        src, dst, bond_ids, edge_mask = native.window_tile_native(
            src, dst, bond_ids, edge_mask,
            plan.node_cap, plan.window, plan.edge_tile,
            aligned=plan.edge_layout == "window_aligned",
        )
        layout = plan.edge_layout
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
    if shuffle:
        order = np.random.default_rng(seed).permutation(G)
        cat, an = data.cation.permuted(order), data.anion.permuted(order)
        temperature, y = data.temperature[order], data.y[order]
    else:
        cat, an = data.cation, data.anion
        temperature, y = data.temperature, data.y

    mult = 2 if plan.duplicate_edges else 1
    cn, ce = cat.sizes()
    an_n, an_e = an.sizes()
    starts = native.plan_batches_native(
        cn, ce * mult, an_n, an_e * mult,
        plan.batch_size, plan.node_cap, plan.edge_cap,
        node_align=plan.node_align,
    )

    B = plan.batch_size
    for i in range(len(starts) - 1):
        g0, g1 = int(starts[i]), int(starts[i + 1])
        n_real = g1 - g0
        temp = np.zeros((B, 1), np.float32)
        yy = np.zeros(B, np.float32)
        mask = np.zeros(B, np.float32)
        if plan.with_temperature:
            temp[:n_real, 0] = temperature[g0:g1]
        yy[:n_real] = y[g0:g1]
        mask[:n_real] = 1.0
        batch = IonPairBatch(
            cation=_pack_side(cat, g0, g1, plan),
            anion=_pack_side(an, g0, g1, plan),
            temperature=temp,
            y=yy,
            sample_mask=mask,
        )
        yield batch  # window tiling already applied natively in _pack_side
