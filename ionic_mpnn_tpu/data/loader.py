"""Batch loader: shuffle-safe greedy packing into fixed-capacity batches.

Instead of the reference's one-size-fits-all dense padding
(``train_viscosity.py:288-314``), records are greedily packed into batches
bounded by static (graph, node, edge) capacities — every batch compiles to
the same XLA program, and utilization stays high under per-epoch shuffling
because a batch closes whenever *any* capacity would overflow, never by
dropping data.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Iterator, List, Sequence

import numpy as np

from .packing import (
    ONEHOT_WINDOW,
    IonPairBatch,
    pack_ion_pair_batch,
    round_up,
    window_tile_batch,
)

__all__ = ["BatchPlan", "plan_capacities", "iter_batches"]


@dataclass(frozen=True)
class BatchPlan:
    """Static batch shape: the compiled-once contract for the train step."""

    batch_size: int  # graph slots per batch
    node_cap: int
    edge_cap: int
    duplicate_edges: bool = False
    with_temperature: bool = True
    target_key: str = "log_eta"
    # "sorted" (default), "window", or "window_aligned": per-window edge
    # tiles of edge_tile slots (message_impl="onehot" requires a window
    # layout; every impl accepts them). "window_aligned" additionally packs
    # nodes so no molecule straddles a window boundary — the onehot path
    # then skips the 3-window src halo and the tile bound drops its
    # 2×max-molecule straddler term (tighter fill).
    edge_layout: str = "sorted"
    edge_tile: int = 0
    window: int = ONEHOT_WINDOW
    # device-grid sweeps only: fixed node pitch for the closed-form aligned
    # placement (ops/grid_pack.py::pack_side_on_device(pitch=...)); host
    # packing uses greedy node_align instead and ignores this
    pitch: int = 0

    @property
    def node_align(self) -> int:
        return self.window if self.edge_layout == "window_aligned" else 0


def _record_sizes(rec: Dict[str, Any], duplicate_edges: bool) -> tuple:
    mult = 2 if duplicate_edges else 1
    return (
        max(int(rec["cation"]["num_atoms"]), int(rec["anion"]["num_atoms"])),
        max(len(rec["cation"]["edge_indices"]), len(rec["anion"]["edge_indices"])) * mult,
    )


def plan_capacities(
    records: Sequence[Dict[str, Any]],
    batch_size: int,
    duplicate_edges: bool = False,
    with_temperature: bool = True,
    target_key: str = "log_eta",
    node_multiple: int = 8,
    edge_multiple: int = 128,
    headroom: float = 1.0,
    edge_layout: str = "sorted",
    window: int = ONEHOT_WINDOW,
    node_shards: int = 1,
) -> BatchPlan:
    """Choose safe static capacities for ``batch_size`` molecules per batch.

    Capacities are ``batch_size × per-molecule mean + headroom × spread``,
    clamped to the worst case (batch_size × max) and never below
    ``max single molecule`` — any shuffle then packs without overflow
    because batches close early when full (see :func:`iter_batches`).

    With ``edge_layout="window"`` the node capacity is rounded to the
    window size and a per-window edge-tile capacity is derived from a
    proven bound: a window's real edges come from molecules overlapping
    its node range, so ``tile ≤ window·max(edges/atoms) + 2·max_edges``
    (≤ 2 molecules straddle the window boundary). Tiling still validates
    per batch and raises rather than truncates.

    ``node_shards > 1`` rounds the node capacity so the batch folds
    evenly into that many aligned-EP shards cut at window multiples
    (``parallel/aligned_partition.py`` — requires a window layout).
    """
    nodes = np.array([_record_sizes(r, duplicate_edges)[0] for r in records])
    edges = np.array([_record_sizes(r, duplicate_edges)[1] for r in records])

    def _cap(sizes: np.ndarray, multiple: int) -> int:
        worst = int(sizes.max()) * batch_size
        mean_based = int(sizes.mean() * batch_size + headroom * sizes.std() * np.sqrt(batch_size))
        cap = max(int(sizes.max()), min(worst, mean_based))
        return round_up(cap, multiple)

    node_cap = _cap(nodes, node_multiple)
    edge_tile = 0
    if edge_layout in ("window", "window_aligned"):
        mult = 2 if duplicate_edges else 1
        density = max(
            (len(r[ion]["edge_indices"]) * mult) / max(int(r[ion]["num_atoms"]), 1)
            for r in records
            for ion in ("cation", "anion")
        )
        max_mol_edges = int(edges.max())
        if edge_layout == "window_aligned":
            # no molecule straddles a window, so every window's edges come
            # from molecules fully inside it: tile <= window * density.
            # Node capacity must absorb the alignment gaps; estimate them by
            # simulating aligned packing of shuffled size samples (batches
            # still close early on overflow, so a tight cap only trades a
            # little batch fill, never correctness).
            max_mol = int(nodes.max())
            if max_mol > window:
                raise ValueError(
                    f"largest molecule ({max_mol} atoms) exceeds the "
                    f"alignment window ({window})"
                )

            def _aligned_usage(sizes: np.ndarray) -> int:
                off = 0
                for n in sizes:
                    n = int(n)
                    if off % window + n > window:
                        off = round_up(off, window)
                    off += n
                return off

            rng = np.random.default_rng(0)
            sims = [
                _aligned_usage(rng.choice(nodes, size=batch_size))
                for _ in range(3)
            ]
            node_cap = round_up(
                max(node_cap, max(sims)) + max_mol, window * max(node_shards, 1)
            )
            edge_tile = round_up(int(np.ceil(window * density)), 8)
        else:
            node_cap = round_up(node_cap, window * max(node_shards, 1))
            edge_tile = round_up(
                int(np.ceil(window * density)) + 2 * max_mol_edges, 8
            )

    return BatchPlan(
        batch_size=batch_size,
        node_cap=node_cap,
        edge_cap=_cap(edges, edge_multiple),
        duplicate_edges=duplicate_edges,
        with_temperature=with_temperature,
        target_key=target_key,
        edge_layout=edge_layout,
        edge_tile=edge_tile,
        window=window,
    )


def iter_batches(
    records: Sequence[Dict[str, Any]],
    plan: BatchPlan,
    shuffle: bool = False,
    seed: int = 0,
    drop_remainder: bool = False,
) -> Iterator[IonPairBatch]:
    """Yield fixed-shape :class:`IonPairBatch` batches.

    Greedy packing: a batch closes when the next record would overflow any
    of its graph/node/edge capacities. Records too large for an *empty*
    batch raise (no silent truncation — reference contrast:
    ``train_viscosity.py:98-105`` silently truncates edges).
    """
    order = np.arange(len(records))
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(order)

    chunk: List[Dict[str, Any]] = []
    used_nodes_c = used_nodes_a = used_edges_c = used_edges_a = 0
    mult = 2 if plan.duplicate_edges else 1

    align = plan.node_align

    def _place(used: int, n: int) -> int:
        """Node rows used after placing an n-atom molecule (packer mirror)."""
        if align > 1 and n and used % align + n > align:
            used = round_up(used, align)
        return used + n

    def _emit(ch: List[Dict[str, Any]]) -> IonPairBatch:
        batch = pack_ion_pair_batch(
            ch,
            batch_size=plan.batch_size,
            node_cap=plan.node_cap,
            edge_cap=plan.edge_cap,
            target_key=plan.target_key,
            with_temperature=plan.with_temperature,
            duplicate_edges=plan.duplicate_edges,
            node_align=align,
        )
        if plan.edge_layout in ("window", "window_aligned"):
            batch = window_tile_batch(
                batch, plan.edge_tile, plan.window,
                aligned=plan.edge_layout == "window_aligned",
            )
        return batch

    for idx in order:
        rec = records[int(idx)]
        nc = int(rec["cation"]["num_atoms"])
        na = int(rec["anion"]["num_atoms"])
        ec = len(rec["cation"]["edge_indices"]) * mult
        ea = len(rec["anion"]["edge_indices"]) * mult
        if max(nc, na) > plan.node_cap or max(ec, ea) > plan.edge_cap:
            raise ValueError(
                f"record {rec.get('pair_id')} exceeds plan capacities "
                f"(nodes {max(nc, na)}/{plan.node_cap}, edges {max(ec, ea)}/{plan.edge_cap})"
            )
        overflow = (
            len(chunk) >= plan.batch_size
            or _place(used_nodes_c, nc) > plan.node_cap
            or _place(used_nodes_a, na) > plan.node_cap
            or used_edges_c + ec > plan.edge_cap
            or used_edges_a + ea > plan.edge_cap
        )
        if overflow:
            yield _emit(chunk)
            chunk = []
            used_nodes_c = used_nodes_a = used_edges_c = used_edges_a = 0
        chunk.append(rec)
        used_nodes_c = _place(used_nodes_c, nc)
        used_nodes_a = _place(used_nodes_a, na)
        used_edges_c += ec
        used_edges_a += ea

    if chunk and not drop_remainder:
        yield _emit(chunk)
