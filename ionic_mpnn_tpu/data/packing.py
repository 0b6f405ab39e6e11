"""Device-resident packed graph batching (the TPU-native data layout).

The reference batches molecules as padded dense ``(B, max_atoms)`` /
``(B, 2*max_edges, 2)`` tensors (``train_viscosity.py:52-110,288-314``),
wasting O(B·N_max) work. Here molecules are instead *packed*: all atoms of
a batch concatenated into one node axis, all directed edges into one edge
axis (COO with global node indices), plus segment ids mapping nodes →
graph slots. Everything is statically shaped (node/edge capacities) so XLA
compiles once; edges are sorted by destination node for deterministic,
kernel-friendly aggregation.

Two reference quirks are supported for activation-parity testing:

  * ``duplicate_edges=True`` replays the reference's double expansion: the
    featurizer already stores both directions of each bond
    (``featurize.py:54-63``) and the training script *again* emits fwd+rev
    per stored edge (``train_viscosity.py:85-94``), so each chemical bond
    contributes 4 directed messages. Clean mode uses the stored 2.
  * per-node local indices are carried so the model can reproduce the
    "atom 0 never sends/receives" masking bug (``models/layers.py:74,114-115``).

Also provided: :func:`pad_dense_batch`, a bit-faithful re-implementation of
the reference's dense padding (+1 id offsets, fwd/rev interleave, silent
truncation at ``max_edges*2`` — ``train_viscosity.py:76-110,255-262``) used
as the ground-truth for parity tests.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from flax import struct

__all__ = [
    "PackedGraphs",
    "IonPairBatch",
    "assign_windows_balanced",
    "balanced_offsets",
    "pack_graphs",
    "pack_ion_pair_batch",
    "pad_dense_batch",
    "round_up",
    "window_tile_edges",
    "window_tile_batch",
    "ONEHOT_WINDOW",
]


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def assign_windows_balanced(
    n_atoms: np.ndarray,  # (B,) atoms per molecule
    n_edges: np.ndarray,  # (B,) directed edges per molecule (post-dup)
    nw: int,  # number of node windows
    window: int,
    tile: int,  # per-window edge-slot capacity
) -> np.ndarray:
    """LPT assignment of molecules to node windows, balancing EDGES.

    Sequential aligned packing fills windows in molecule order, so a run
    of dense ions overloads one window while others sit near-empty — the
    per-window edge tile must then cover the worst-density window
    (``window × max(edges/atoms)``) and measured tile fill is ~0.5.
    Balancing instead sorts molecules by edge count (desc) and places
    each into the least-edge-loaded window that still has atom room
    (longest-processing-time scheduling): the worst window tracks the
    MEAN edges/window, so the static tile — and every edge-slot-
    proportional cost in the onehot message path — shrinks toward the
    mean. Graph identity is untouched (``node_graph`` keeps batch slot
    order); per-graph math is placement-invariant.

    Returns (B,) window ids. Raises :class:`GraphCapacityError` if some
    molecule cannot be placed under the (atom, tile) capacities — the
    loader treats that as "close the batch earlier and retry".
    """
    import heapq

    B = len(n_atoms)
    order = np.argsort(-np.asarray(n_edges, np.int64), kind="stable")
    # each window appears exactly once in the heap; entries are always
    # authoritative (updated only via pop → push)
    heap = [(0, 0, w) for w in range(nw)]  # (edges_used, atoms_used, w)
    heapq.heapify(heap)
    out = np.zeros(B, np.int32)
    for i in order:
        n = int(n_atoms[i])
        e = int(n_edges[i])
        if n > window:
            raise GraphCapacityError(
                f"molecule of {n} atoms cannot fit a {window}-node window"
            )
        if n == 0:
            continue
        deferred = []
        placed = False
        while heap:
            eu, au, w = heapq.heappop(heap)
            if au + n > window:  # no atom room here; try the next-least
                deferred.append((eu, au, w))
                continue
            if eu + e > tile:
                # true least-edge-loaded window overflows the tile: no
                # other window can do better
                deferred.append((eu, au, w))
                break
            heapq.heappush(heap, (eu + e, au + n, w))
            out[i] = w
            placed = True
            break
        for item in deferred:
            heapq.heappush(heap, item)
        if not placed:
            raise GraphCapacityError(
                f"balanced placement failed for molecule {int(i)} "
                f"({n} atoms, {e} edges) under window={window}, tile={tile}"
            )
    return out


def balanced_offsets(
    n_atoms: np.ndarray,
    n_edges: np.ndarray,
    node_cap: int,
    window: int,
    tile: int,
) -> np.ndarray:
    """Per-molecule node offsets for balanced placement: LPT window
    assignment, then batch-order sequential placement within each window
    (grouped cumsum). Shared by the Python and native packers so both
    loaders stay bit-identical."""
    if node_cap % window:
        raise GraphCapacityError(
            f"node capacity {node_cap} not a multiple of window {window}"
        )
    na = np.asarray(n_atoms, np.int64)
    win = assign_windows_balanced(na, np.asarray(n_edges, np.int64),
                                  node_cap // window, window, tile)
    # stable sort by window keeps batch order within each window; the
    # within-window offset is the cumsum of earlier same-window molecules
    ord_ = np.argsort(win, kind="stable")
    na_o = na[ord_]
    csum = np.cumsum(na_o) - na_o  # exclusive prefix within the sort
    win_o = win[ord_]
    # subtract each window group's starting prefix
    starts = np.zeros(len(ord_), np.int64)
    if len(ord_):
        first = np.ones(len(ord_), bool)
        first[1:] = win_o[1:] != win_o[:-1]
        group_base = np.where(first, csum, 0)
        group_base = np.maximum.accumulate(group_base)
        starts = csum - group_base
    offsets = np.zeros(len(na), np.int64)
    offsets[ord_] = win_o.astype(np.int64) * window + starts
    return offsets


@struct.dataclass
class PackedGraphs:
    """A fixed-capacity batch of packed molecular graphs (a jit-able pytree).

    Shapes: N = node capacity, E = edge capacity, B = graph slots.
    Pad nodes have ``atom_ids == 0`` and ``node_mask == False``; pad edges
    have ``edge_mask == False`` with src/dst spread uniformly over the node
    range (their messages are masked to zero, and spreading keeps the
    Pallas sorted-scatter windows balanced). ``n_graphs`` is static
    (pytree aux data) so it can size ``segment_sum`` outputs under jit.
    """

    atom_ids: np.ndarray  # (N,) int32, vocab id + 1; 0 = pad
    bond_ids: np.ndarray  # (E,) int32, vocab id + 1; 0 = pad
    src: np.ndarray  # (E,) int32 global node index
    dst: np.ndarray  # (E,) int32 global node index (sorted ascending)
    node_graph: np.ndarray  # (N,) int32 graph slot per node
    node_local: np.ndarray  # (N,) int32 local atom index within molecule
    node_mask: np.ndarray  # (N,) bool
    edge_mask: np.ndarray  # (E,) bool
    n_graphs: int = struct.field(pytree_node=False)  # static graph-slot count
    # True when node_graph is non-decreasing along the node axis (pad/gap
    # rows forward-filled with the previous real id — they're masked, so
    # any id < n_graphs is correct): lets the per-graph readout use the
    # sorted segment-sum path. Sequential/aligned packers set it;
    # balanced placement cannot (window loads don't follow slot order).
    node_sorted: bool = struct.field(pytree_node=False, default=False)
    # "sorted": dst-sorted COO (default). "window": additionally tiled so
    # window w's edges (dst in [w*WINDOW, (w+1)*WINDOW)) occupy slots
    # [w*T, (w+1)*T) for T = edge_capacity / (node_capacity / WINDOW) —
    # the layout message_impl="onehot" requires (still valid sorted COO,
    # so every other impl accepts it too).
    edge_layout: str = struct.field(pytree_node=False, default="sorted")
    # Windowed-readout addressing (window_ALIGNED batches only, where no
    # molecule straddles a window): graph g's complete pooled sum lives at
    # row ``pool_slot[g] = w(g)·W + (g − node_graph[w(g)·W])`` of the
    # per-window one-hot pool (ops/segment.graph_sum_pool_windowed) — the
    # all-MXU replacement for the N-row segment-sum readout. −1 marks an
    # empty graph slot (masked to zero on read). None on layouts without
    # the alignment guarantee (callers fall back to segment-sum).
    pool_slot: Optional[np.ndarray] = None  # (B,) int32 or None

    @property
    def node_capacity(self) -> int:
        return int(self.atom_ids.shape[-1])

    @property
    def edge_capacity(self) -> int:
        return int(self.bond_ids.shape[-1])


@struct.dataclass
class IonPairBatch:
    """One training batch for the dual-encoder models."""

    cation: PackedGraphs
    anion: PackedGraphs
    temperature: np.ndarray  # (B, 1) float32 (zeros for MP task)
    y: np.ndarray  # (B,) float32 target
    sample_mask: np.ndarray  # (B,) float32, 0 for padded batch slots


class GraphCapacityError(ValueError):
    """Raised when molecules overflow the packing capacity (no silent drops)."""


def pack_graphs(
    graphs: Sequence[Dict[str, Any]],
    node_cap: int,
    edge_cap: int,
    n_graphs: Optional[int] = None,
    duplicate_edges: bool = False,
    sort_edges_by_dst: bool = True,
    node_align: int = 0,
    balance_tile: int = 0,
) -> PackedGraphs:
    """Pack id-encoded molecule dicts into one fixed-capacity batch.

    Args:
        graphs: records shaped like the reference's per-ion id dicts:
            ``{atom_ids, bond_ids, edge_indices, num_atoms}`` with raw
            (0-based) vocab ids; the +1 pad offset is applied here, matching
            ``train_viscosity.py:255-262``.
        node_cap / edge_cap: static capacities (pad to these).
        n_graphs: number of graph slots (>= len(graphs)); default exactly fits.
        duplicate_edges: reference parity — emit fwd+rev per *stored* edge.
        sort_edges_by_dst: sort the packed edge list by destination node
            (stable), giving deterministic aggregation order and CSR-like
            locality for the Pallas kernels.
        node_align: > 0 forbids molecules from straddling ``node_align``-node
            window boundaries (offsets bump to the next boundary instead) —
            the ``edge_layout="window_aligned"`` contract: every edge's src
            and dst share a window, so the onehot message path needs no
            3-window halo and the per-window edge-tile bound loses its
            2×max-molecule straddler term.
        balance_tile: > 0 (aligned layouts only) places molecules with
            :func:`assign_windows_balanced` instead of sequentially — the
            per-window edge load tracks the MEAN instead of the worst
            density run, so the static tile (= ``balance_tile``) can be
            ~half the density bound. Raises on infeasible placement (the
            loader closes the batch earlier and retries).
    """
    B = len(graphs)
    if n_graphs is None:
        n_graphs = B
    if B > n_graphs:
        raise GraphCapacityError(f"{B} graphs > {n_graphs} slots")

    atom_ids = np.zeros(node_cap, np.int32)
    node_graph = np.zeros(node_cap, np.int32)
    node_local = np.zeros(node_cap, np.int32)
    node_mask = np.zeros(node_cap, bool)

    src_parts: List[np.ndarray] = []
    dst_parts: List[np.ndarray] = []
    bond_parts: List[np.ndarray] = []

    mult = 2 if duplicate_edges else 1
    if balance_tile > 0:
        if node_align <= 1:
            raise ValueError("balance_tile requires node_align (aligned layout)")
        if node_cap % node_align:
            raise GraphCapacityError(
                f"node capacity {node_cap} not a multiple of window {node_align}"
            )
        na = np.asarray([int(g["num_atoms"]) for g in graphs], np.int64)
        ne = np.asarray(
            [len(g["edge_indices"]) * mult for g in graphs], np.int64
        )
        offsets = balanced_offsets(na, ne, node_cap, node_align, balance_tile)
    else:
        offsets = np.zeros(len(graphs), np.int64)
        offset = 0
        for g_idx, g in enumerate(graphs):
            n = int(g["num_atoms"])
            if node_align > 1 and n:
                if n > node_align:
                    raise GraphCapacityError(
                        f"molecule of {n} atoms cannot fit a {node_align}-node "
                        f"aligned window"
                    )
                if offset % node_align + n > node_align:
                    offset = round_up(offset, node_align)
            if offset + n > node_cap:
                raise GraphCapacityError(
                    f"node capacity {node_cap} exceeded at graph {g_idx} ({offset}+{n})"
                )
            offsets[g_idx] = offset
            offset += n

    for g_idx, g in enumerate(graphs):
        n = int(g["num_atoms"])
        offset = int(offsets[g_idx])
        atom_ids[offset : offset + n] = np.asarray(g["atom_ids"], np.int32) + 1
        node_graph[offset : offset + n] = g_idx
        node_local[offset : offset + n] = np.arange(n, dtype=np.int32)
        node_mask[offset : offset + n] = True
        edges = np.asarray(g["edge_indices"], np.int32).reshape(-1, 2)
        bonds_g = np.asarray(g["bond_ids"], np.int32) + 1
        if duplicate_edges and len(edges):
            # fwd+rev per stored edge, interleaved (train_viscosity.py:85-94)
            edges = np.stack([edges, edges[:, ::-1]], axis=1).reshape(-1, 2)
            bonds_g = np.repeat(bonds_g, 2)
        if len(edges):
            src_parts.append(edges[:, 0] + offset)
            dst_parts.append(edges[:, 1] + offset)
            bond_parts.append(bonds_g)

    srcs = np.concatenate(src_parts) if src_parts else np.zeros(0, np.int32)
    dsts = np.concatenate(dst_parts) if dst_parts else np.zeros(0, np.int32)
    bonds = np.concatenate(bond_parts) if bond_parts else np.zeros(0, np.int32)
    E = len(srcs)
    if E > edge_cap:
        raise GraphCapacityError(f"edge capacity {edge_cap} exceeded ({E})")

    src = np.zeros(edge_cap, np.int32)
    dst = np.zeros(edge_cap, np.int32)
    bond_ids = np.zeros(edge_cap, np.int32)
    edge_mask = np.zeros(edge_cap, bool)
    src[:E] = srcs
    dst[:E] = dsts
    bond_ids[:E] = bonds
    edge_mask[:E] = True
    # Spread pad edges uniformly over the node range (they carry zero
    # messages, so placement is free). Concentrating them at node 0 floods
    # the Pallas sorted-scatter kernel's first window past its static
    # tile budget on underfilled batches, silently dropping real edges.
    n_pad = edge_cap - E
    if n_pad:
        spread = (np.arange(n_pad, dtype=np.int64) * node_cap // n_pad).astype(np.int32)
        src[E:] = spread
        dst[E:] = spread

    if sort_edges_by_dst and E:
        # Stable sort over the FULL capacity (pads included, mask permuted)
        # so dst is globally sorted — the Pallas sorted-scatter kernel's
        # window pointers rely on this.
        order = np.argsort(dst, kind="stable")
        src = src[order]
        dst = dst[order]
        bond_ids = bond_ids[order]
        edge_mask = edge_mask[order]
        # Uphold the Pallas sorted-scatter capacity contract at pack time:
        # a batch this function emits can never make the kernel silently
        # drop REAL edges (pad edges carry zero messages — dropping those
        # is harmless). Molecular degree bounds make overflow unreachable
        # in practice; a pathological input fails loudly here instead.
        from ..ops.pallas.segment_sum import PallasCapacityError, check_window_capacity

        try:
            check_window_capacity(dst, node_cap, edge_mask=edge_mask)
        except PallasCapacityError as e:
            raise GraphCapacityError(str(e)) from None

    node_sorted = balance_tile <= 0
    if node_sorted:
        # forward-fill pad/gap rows so node_graph is non-decreasing (the
        # rows are masked; sequential placement keeps real ids ascending)
        # — enables the sorted readout path (ops/segment.graph_sum_pool).
        np.maximum.accumulate(node_graph, out=node_graph)

    return PackedGraphs(
        atom_ids=atom_ids,
        bond_ids=bond_ids,
        src=src,
        dst=dst,
        node_graph=node_graph,
        node_local=node_local,
        node_mask=node_mask,
        edge_mask=edge_mask,
        n_graphs=int(n_graphs),
        node_sorted=node_sorted,
    )


def _empty_graph() -> Dict[str, Any]:
    return {"atom_ids": [], "bond_ids": [], "edge_indices": [], "num_atoms": 0}


def pack_ion_pair_batch(
    records: Sequence[Dict[str, Any]],
    batch_size: int,
    node_cap: int,
    edge_cap: int,
    target_key: str = "log_eta",
    with_temperature: bool = True,
    duplicate_edges: bool = False,
    node_align: int = 0,
    balance_tile: int = 0,
    anion_node_cap: int = 0,
    anion_edge_cap: int = 0,
    anion_balance_tile: int = 0,
) -> IonPairBatch:
    """Pack up to ``batch_size`` id-data records (reference ``*_id_data.pkl``
    row format) into one :class:`IonPairBatch`; short batches are padded
    with empty molecules and ``sample_mask == 0``. The ``anion_*``
    overrides size that side independently (0 = use the shared caps) —
    anions are typically much smaller than cations."""
    B = batch_size
    n_real = len(records)
    if n_real > B:
        raise GraphCapacityError(f"{n_real} records > batch size {B}")
    cat_graphs = [r["cation"] for r in records] + [_empty_graph()] * (B - n_real)
    an_graphs = [r["anion"] for r in records] + [_empty_graph()] * (B - n_real)
    cation = pack_graphs(cat_graphs, node_cap, edge_cap, B, duplicate_edges,
                         node_align=node_align, balance_tile=balance_tile)
    anion = pack_graphs(an_graphs, anion_node_cap or node_cap,
                        anion_edge_cap or edge_cap, B, duplicate_edges,
                        node_align=node_align,
                        balance_tile=anion_balance_tile or balance_tile)
    temperature = np.zeros((B, 1), np.float32)
    y = np.zeros(B, np.float32)
    mask = np.zeros(B, np.float32)
    for i, r in enumerate(records):
        if with_temperature and "T" in r:
            temperature[i, 0] = float(r["T"])
        y[i] = float(r[target_key])
        mask[i] = 1.0
    return IonPairBatch(cation=cation, anion=anion, temperature=temperature, y=y, sample_mask=mask)


# ---------------------------------------------------------------------------
# Window-tiled edge layout (for the all-MXU one-hot message path)
# ---------------------------------------------------------------------------

ONEHOT_WINDOW = 128  # node window for message_impl="onehot" (lane-width)


def compute_pool_slots(
    node_graph: np.ndarray,
    node_mask: np.ndarray,
    window: int,
    n_graphs: int,
) -> np.ndarray:
    """Per-graph windowed-readout row: ``w(g)·W + (g − node_graph[w(g)·W])``.

    Valid ONLY when no molecule straddles a window (window_aligned
    packing): graph ``g``'s complete masked node sum then equals row
    ``pool_slot[g]`` of the per-window one-hot pool
    (:func:`ionic_mpnn_tpu.ops.segment.graph_sum_pool_windowed`), making
    the readout batched MXU matmuls + one B-row gather instead of an
    N-row segment-sum. Empty graph slots get −1 (masked to zero).
    """
    ng = np.asarray(node_graph).astype(np.int64)
    nm = np.asarray(node_mask)
    slots = np.full(n_graphs, -1, np.int32)
    real = np.flatnonzero(nm)
    if not len(real):
        return slots
    gids = ng[real]
    # first real node row per graph (reversed assignment: earliest wins)
    first = np.full(n_graphs, -1, np.int64)
    first[gids[::-1]] = real[::-1]
    has = first >= 0
    w = first[has] // window
    base = ng[w * window]  # first graph id addressed by each window
    local = np.arange(n_graphs, dtype=np.int64)[has] - base
    if len(local) and (local.min() < 0 or local.max() >= window):
        raise GraphCapacityError(
            "windowed readout addressing violated — batch is not "
            "window-aligned (a molecule straddles a window or windows "
            "start with gap rows)"
        )
    slots[has] = (w * window + local).astype(np.int32)
    return slots


def window_tile_edges(
    g: PackedGraphs, tile: int, window: int = ONEHOT_WINDOW,
    aligned: bool = False,
) -> PackedGraphs:
    """Re-lay a dst-sorted packed batch into fixed per-window edge tiles.

    Window ``w`` owns nodes ``[w*window, (w+1)*window)``; its REAL edges
    (``dst`` in that range — contiguous because the input is dst-sorted)
    are moved to slots ``[w*tile, w*tile + count)``, order preserved; the
    remaining slots are masked self-loop pads on the window's last node,
    so the result is STILL globally dst-sorted valid COO (every existing
    impl accepts it). Raises :class:`GraphCapacityError` if any window
    holds more than ``tile`` real edges — never truncates.

    Why: ``message_pass_aggregate_onehot`` evaluates the src gather and
    dst aggregate as batched (window, tile)-shaped one-hot MXU matmuls —
    on backends where per-row gathers/scatters are the bottleneck
    (measured ~100-400 ns/row on the axon TPU relay vs ~80 TFLOP/s for
    matmuls), this layout turns the whole message step into matmul work.
    """
    node_cap = g.node_capacity
    if node_cap % window:
        raise GraphCapacityError(
            f"node capacity {node_cap} not a multiple of window {window}"
        )
    nw = node_cap // window
    dst = np.asarray(g.dst)
    mask = np.asarray(g.edge_mask)
    real = np.flatnonzero(mask)
    w_of = dst[real] // window
    counts = np.bincount(w_of, minlength=nw)
    if len(real):
        if aligned:
            # window_aligned contract: src and dst share a window (packer
            # ran with node_align=window) — the onehot path then needs no
            # halo at all
            if np.any(np.asarray(g.src)[real] // window != w_of):
                raise GraphCapacityError(
                    "edge crosses a window boundary — batch was not packed "
                    "with node_align=window (edge_layout='window_aligned')"
                )
        else:
            # onehot's 3-window halo only sees src within ±window of dst —
            # guaranteed when molecules are node-contiguous and < window
            # atoms; check rather than silently zero out-of-halo messages
            span = int(np.abs(np.asarray(g.src)[real].astype(np.int64)
                              - dst[real].astype(np.int64)).max())
            if span >= window:
                raise GraphCapacityError(
                    f"edge src/dst span {span} >= onehot window {window} — "
                    f"a molecule exceeds the window locality contract"
                )
    if counts.max(initial=0) > tile:
        raise GraphCapacityError(
            f"window tile capacity {tile} exceeded (max {int(counts.max())} "
            f"real edges in one {window}-node window); raise the plan's "
            f"edge_tile"
        )
    starts = np.zeros(nw + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    # real edges are dst-sorted ⇒ already grouped by window in order
    within = np.arange(len(real), dtype=np.int64) - starts[w_of]
    new_pos = w_of * tile + within

    E2 = nw * tile
    # pads: masked self-loops on each window's LAST node — keeps dst
    # globally sorted and |src - dst| = 0 (locality-safe)
    pad_node = (
        np.repeat(np.arange(nw, dtype=np.int32), tile) * window + window - 1
    )
    src = pad_node.copy()
    dst2 = pad_node.copy()
    bond_ids = np.zeros(E2, np.int32)
    edge_mask = np.zeros(E2, bool)
    src[new_pos] = np.asarray(g.src)[real]
    dst2[new_pos] = dst[real]
    bond_ids[new_pos] = np.asarray(g.bond_ids)[real]
    edge_mask[new_pos] = True
    # pads sit AFTER the window's real edges, whose dst ≤ window last node,
    # and before the next window's (≥ (w+1)*window) ⇒ still sorted — but
    # within a window, real dsts ≤ pad dst only holds because pads use the
    # window's last node; interleaving is avoided by placing pads at the
    # tile tail (new_pos is a prefix of each tile by construction).
    return PackedGraphs(
        atom_ids=g.atom_ids,
        bond_ids=bond_ids,
        src=src,
        dst=dst2,
        node_graph=g.node_graph,
        node_local=g.node_local,
        node_mask=g.node_mask,
        edge_mask=edge_mask,
        n_graphs=g.n_graphs,
        edge_layout="window_aligned" if aligned else "window",
        node_sorted=g.node_sorted,
        # aligned ⇒ no molecule straddles a window ⇒ the windowed one-hot
        # readout is exact; halo ("window") batches fall back to
        # segment-sum, as do BALANCED placements (node_sorted=False:
        # window loads don't follow slot order, so the base-graph
        # addressing below doesn't hold)
        pool_slot=(compute_pool_slots(g.node_graph, g.node_mask, window,
                                      g.n_graphs)
                   if aligned and g.node_sorted else None),
    )


def window_tile_batch(
    batch: "IonPairBatch", tile: int, window: int = ONEHOT_WINDOW,
    aligned: bool = False, anion_tile: int = 0,
) -> "IonPairBatch":
    """Apply :func:`window_tile_edges` to both ions of a batch
    (``anion_tile`` sizes that side's tiles independently; 0 = shared)."""
    return IonPairBatch(
        cation=window_tile_edges(batch.cation, tile, window, aligned),
        anion=window_tile_edges(batch.anion, anion_tile or tile, window,
                                aligned),
        temperature=batch.temperature,
        y=batch.y,
        sample_mask=batch.sample_mask,
    )


# ---------------------------------------------------------------------------
# Reference-style dense padded batching (parity ground truth)
# ---------------------------------------------------------------------------


def pad_dense_batch(
    graphs: Sequence[Dict[str, Any]],
    max_atoms: int,
    max_edges: int,
) -> Dict[str, np.ndarray]:
    """Reference-exact dense padding for a list of id-encoded molecules.

    Reproduces ``pad_sequences_1d`` + ``preprocess_edges_and_bonds``
    (``train_viscosity.py:52-59,76-110``) including the +1 id offsets
    applied by the training mains (``:255-262``), the fwd/rev interleave per
    stored edge, zero padding, and the silent truncation at ``max_edges*2``.

    Returns dict with ``atom (B,max_atoms) int32``, ``bond (B,2*max_edges)
    int32``, ``conn (B,2*max_edges,2) int32``.
    """
    B = len(graphs)
    atom = np.zeros((B, max_atoms), np.int32)
    max_len = max_edges * 2
    bond = np.zeros((B, max_len), np.int32)
    conn = np.zeros((B, max_len, 2), np.int32)
    for i, g in enumerate(graphs):
        ids = np.asarray(g["atom_ids"], np.int32) + 1
        atom[i, : len(ids)] = ids
        e2: List[List[int]] = []
        b2: List[int] = []
        for (s, t), bid in zip(g["edge_indices"], g["bond_ids"]):
            e2.append([int(s), int(t)])
            b2.append(int(bid) + 1)
            e2.append([int(t), int(s)])
            b2.append(int(bid) + 1)
        e2 = e2[:max_len]
        b2 = b2[:max_len]
        if e2:
            conn[i, : len(e2)] = np.asarray(e2, np.int32)
            bond[i, : len(b2)] = np.asarray(b2, np.int32)
    return {"atom": atom, "bond": bond, "conn": conn}
