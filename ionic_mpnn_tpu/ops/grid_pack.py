"""Device-resident grid packing for screening sweeps (TPU-native).

The host-side grid path (``ScreeningEngine.screen_grid``) re-materializes
every batch on the host — gathering the same few thousand unique ion
graphs into ~17 MB of packed arrays per batch and pushing them through the
host→device link 2,400+ times for a 10M-pair sweep. Measured round 2: the
link + host packing cap the sweep at ~4.2k pairs/s while the device
forward alone sustains ~2.6M molecules/s.

This module moves the packing ONTO the device: the unique-ion pools
(columnar atom/bond/edge arrays + per-ion offsets, a few hundred KB) are
uploaded ONCE, and each batch is reconstructed inside the jitted program
from nothing but a scalar grid offset ``g0`` — candidate indices, segment
ids, masks and global COO edges are all computed with static-shaped
``cumsum``/``searchsorted``/gather ops. Per-dispatch host→device traffic
drops from ~17 MB to ~8 bytes.

Layout contract matches :func:`ionic_mpnn_tpu.data.packing.pack_graphs`:
ids +1 with 0 = pad, prefix-dense nodes, and — crucially — **globally
dst-sorted edges**. Each ion's stored edge list is stable-sorted by local
destination once at pool build (host side, vectorized); molecule base
offsets increase with graph index, so the packed global ``dst`` is
non-decreasing over the real edges, and pad edges are spread over
``[node_total, node_cap)`` (they carry zero messages; placement only has
to preserve sortedness). This upholds the ``indices_are_sorted=True``
contract of :func:`ionic_mpnn_tpu.ops.segment.aggregate_to_nodes` — an
unsorted edge stream under that flag is undefined behavior on TPU and
measured ~100x slower (round 2, ``scripts/tpu_grid_microbench.py``).

Reference scope: the reference has no screening/serving tier at all
(SURVEY §1 — inference happens inline in its notebook); this is the
BASELINE config-5 production path.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..data.packing import IonPairBatch, PackedGraphs

__all__ = [
    "DevicePool",
    "device_pool",
    "pack_side_on_device",
    "pack_side_padded",
    "pack_side_paired",
    "padded_aligned_tile",
    "paired_tile",
    "grid_batch_on_device",
    "window_tile_on_device",
    "pool_window_tile_bound",
    "pool_pitch",
    "pool_aligned_tile_bound",
]


@struct.dataclass
class DevicePool:
    """Columnar unique-ion pool as device arrays (upload once per sweep).

    ``edges`` hold *local* (within-molecule) atom indices; ``atoms`` /
    ``bonds`` hold raw vocab ids (the +1 pad offset is applied at pack
    time, same as the host packer).

    ``fused_p`` (present when the pool was built with ``pitch > 0``) is
    the MOLECULE-MAJOR padded plane: ion ``i``'s atoms, bonds, edges and
    lengths concatenated into one padded int32 row. Packing a
    pitch-placed batch from it is ONE row-gather per side instead of
    node_cap/edge_cap ELEMENT-gathers — on this backend per-row gather
    cost is the pack bottleneck (battery 30: 91.5 ms/batch element-gather
    pack at batch 4096 vs a ~4 ms forward; separate per-plane row-gathers
    still cost ~25 ms).
    """

    atoms: Any  # (Pa,) int32 raw vocab ids
    bonds: Any  # (Pe,) int32 raw vocab ids
    edges: Any  # (Pe, 2) int32 local atom indices, dst-sorted per ion
    a_start: Any  # (M,) int32
    a_len: Any  # (M,) int32
    e_start: Any  # (M,) int32
    e_len: Any  # (M,) int32 directed edges per ion (post-duplication)
    # single fused plane — columns [atoms(pitch) | bonds(em) |
    # edges(2·em, interleaved src/dst) | a_len | e_len] — so a batch
    # packs with exactly ONE row-gather per side (per-row gather cost
    # dominates; 5 separate plane gathers measured ~25 ms/batch at 4096)
    fused_p: Any = None  # (M, pitch + 3·em + 2) int32
    duplicated: bool = struct.field(pytree_node=False, default=False)
    pitch: int = struct.field(pytree_node=False, default=0)
    em: int = struct.field(pytree_node=False, default=0)


def device_pool(pool, duplicate_edges: bool = False,
                pitch: int = 0, em_multiple: int = 1) -> DevicePool:
    """Convert a host :class:`~ionic_mpnn_tpu.inference.IonPool` (int64
    offsets) into int32 device arrays.

    ``pitch > 0`` additionally builds the molecule-major fused padded
    plane (``fused_p``) that lets pitch-placed aligned batches pack with
    one row-gather per side (see :class:`DevicePool`); ``pitch`` must be
    ≥ every ion (:func:`pool_pitch`).

    Two host-side (numpy, vectorized, once-per-sweep) preprocessing steps:

    * ``duplicate_edges`` — reference-parity fwd+rev duplication per
      stored edge, interleaved (``pack_graphs`` semantics), baked into the
      pool so the per-batch device code needs no interleave arithmetic;
    * per-ion **stable sort by local dst** — makes every batch packed from
      this pool globally dst-sorted (see module docstring). Matches the
      host packer's stable global dst sort exactly on the real-edge
      sequence (equal dst keeps insertion order in both).

    ``em_multiple`` rounds the fused plane's per-molecule edge capacity
    ``em`` up to a multiple (paired-layout tile-alignment experiments;
    the default 1 keeps the tight max).

    Zero-size columns (e.g. an all-single-atom anion pool has no bonds at
    all) are padded with one sentinel row: XLA gathers reject 0-size
    operands at trace time, and every index into the sentinel is already
    masked out by ``edge_mask``/``node_mask`` downstream.
    """
    atoms = np.asarray(pool.atoms, np.int32)
    bonds = np.asarray(pool.bonds, np.int32)
    edges = np.asarray(pool.edges, np.int32).reshape(-1, 2)
    e_start = np.asarray(pool.e_start, np.int64)
    e_len = np.asarray(pool.e_len, np.int64)
    # The per-ion sort below (ion_of_edge) and the fused-plane build index
    # bonds/edges as CONTIGUOUS per-ion blocks in pool order — a gapped or
    # reordered pool would silently corrupt both. Every internal pool
    # (IonPool/_GraphPool) is contiguous; reject anything else outright.
    if len(e_len) and not np.array_equal(
        e_start, np.concatenate([[0], np.cumsum(e_len)[:-1]])
    ):
        raise ValueError(
            "device_pool requires a contiguous edge pool: e_start must "
            "equal the exclusive cumsum of e_len (gapped/reordered pools "
            "are not supported)"
        )
    if duplicate_edges and len(edges):
        edges = np.stack([edges, edges[:, ::-1]], axis=1).reshape(-1, 2)
        bonds = np.repeat(bonds, 2)
        e_start = e_start * 2
        e_len = e_len * 2
    if len(edges):
        # stable per-ion sort by local dst: lexsort with the owning ion as
        # the primary key keeps each ion's block in place
        ion_of_edge = np.repeat(np.arange(len(e_len), dtype=np.int64), e_len)
        order = np.lexsort((edges[:, 1], ion_of_edge))
        edges = edges[order]
        bonds = bonds[order]
    fused_p = None
    em = 0
    if pitch > 0:
        M = len(e_len)
        a_len_arr = np.asarray(pool.a_len, np.int64)
        if a_len_arr.max(initial=0) > pitch:
            raise ValueError(
                f"pitch {pitch} < largest ion ({int(a_len_arr.max())} atoms)"
            )
        em = max(int(e_len.max(initial=0)), 1)
        em = ((em + em_multiple - 1) // em_multiple) * em_multiple
        atoms_np = np.zeros((M, pitch), np.int32)
        ai = np.repeat(np.arange(M, dtype=np.int64), a_len_arr)
        aj = np.arange(a_len_arr.sum(), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(a_len_arr)[:-1]]), a_len_arr)
        a_start_arr = np.asarray(pool.a_start, np.int64)
        if len(ai):
            atoms_np[ai, aj] = atoms[np.repeat(a_start_arr, a_len_arr) + aj]
        bonds_np = np.zeros((M, em), np.int32)
        edges_np = np.zeros((M, em, 2), np.int32)
        ei = np.repeat(np.arange(M, dtype=np.int64), e_len)
        ej = np.arange(e_len.sum(), dtype=np.int64) - np.repeat(
            np.concatenate([[0], np.cumsum(e_len)[:-1]]), e_len)
        if len(ei):
            bonds_np[ei, ej] = bonds[: len(ei)]
            edges_np[ei, ej] = edges[: len(ei)]
        fused_p = jnp.asarray(np.concatenate([
            atoms_np,
            bonds_np,
            edges_np.reshape(M, 2 * em),
            np.asarray(pool.a_len, np.int32)[:, None],
            np.asarray(e_len, np.int32)[:, None],
        ], axis=1))
    if atoms.size == 0:
        atoms = np.zeros(1, np.int32)
    if bonds.size == 0:
        bonds = np.zeros(1, np.int32)
    if edges.size == 0:
        edges = np.zeros((1, 2), np.int32)
    return DevicePool(
        atoms=jnp.asarray(atoms),
        bonds=jnp.asarray(bonds),
        edges=jnp.asarray(edges),
        a_start=jnp.asarray(pool.a_start, jnp.int32),
        a_len=jnp.asarray(pool.a_len, jnp.int32),
        e_start=jnp.asarray(e_start, jnp.int32),
        e_len=jnp.asarray(e_len, jnp.int32),
        fused_p=fused_p,
        duplicated=bool(duplicate_edges),
        pitch=int(pitch),
        em=em,
    )


def _prefix_offsets(lens: jnp.ndarray) -> jnp.ndarray:
    """(B,) lengths → (B+1,) exclusive prefix offsets."""
    return jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(lens, dtype=jnp.int32)])


def _slot_to_graph(off: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Graph index per flat slot: ``g[i] = #{j >= 1 : off[j] <= i}``.

    Equivalent to ``searchsorted(off[1:], arange(cap), side="right")`` but
    O(cap) streaming — scatter a bump at each graph boundary, cumsum. The
    binary-search formulation lowers to log(B) dependent gather rounds,
    which the TPU backend handles far worse than one scan (round-2
    microbench). Empty graphs stack bumps on one slot; cumsum handles it.
    """
    bumps = jnp.zeros(cap + 1, jnp.int32).at[off[1:]].add(
        1, mode="drop", indices_are_sorted=True
    )
    return jnp.cumsum(bumps[:cap])


def pack_side_on_device(
    pool: DevicePool,
    sel: jnp.ndarray,  # (B,) int32 ion indices into the pool
    node_cap: int,
    edge_cap: int,
    duplicate_edges: bool = False,
    pitch: int = 0,
) -> PackedGraphs:
    """Pack ``pool[sel[i]]`` for i in 0..B-1 into one fixed-capacity batch,
    entirely with static-shaped device ops (jit/scan-safe).

    Semantics match :func:`data.packing.pack_graphs` on the same molecule
    sequence: identical ``atom_ids``/``node_graph``/``node_local``/
    ``node_mask`` AND the identical real-edge sequence (both are stable
    dst-sorts); only pad-edge placement differs (tail here, interleaved
    there — masked either way). ``duplicate_edges`` must match the flag
    the pool was built with (duplication happens at pool build).

    ``pitch > 0`` switches to FIXED-PITCH placement: molecule ``i`` starts
    at node ``i·pitch`` (gap rows masked). With ``pitch`` a divisor of the
    onehot window and ≥ every pool molecule (:func:`pool_pitch`), no
    molecule ever straddles a window boundary — the closed-form device
    analogue of the host packer's greedy ``node_align`` placement (the
    greedy recurrence is inherently sequential; constant pitch keeps the
    offsets data-independent, which is what lets the whole batch build
    from one scalar). Requires ``node_cap == B·pitch``.
    """
    B = int(sel.shape[0])
    sel = sel.astype(jnp.int32)
    if bool(duplicate_edges) != bool(pool.duplicated):
        raise ValueError(
            f"duplicate_edges={duplicate_edges} but the pool was built with "
            f"device_pool(duplicate_edges={pool.duplicated}); duplication is "
            "baked into the pool at build time"
        )

    # ---- nodes ---------------------------------------------------------
    lens = pool.a_len[sel]  # (B,)
    i = jnp.arange(node_cap, dtype=jnp.int32)
    if pitch > 0:
        # fixed-pitch placement: offsets are data-independent
        if node_cap != B * pitch:
            raise ValueError(
                f"pitch packing needs node_cap == B*pitch "
                f"({node_cap} != {B}*{pitch})"
            )
        off = jnp.arange(B + 1, dtype=jnp.int32) * pitch
        total = off[B]  # == node_cap; pad edges collapse onto the last row
        gc = jnp.clip(i // pitch, 0, B - 1)
        local = i - gc * pitch
        valid = local < lens[gc]
    else:
        # prefix-dense layout
        off = _prefix_offsets(lens)  # (B+1,)
        total = off[B]
        g = _slot_to_graph(off, node_cap)  # [0..B]
        valid = i < total
        gc = jnp.clip(g, 0, B - 1)
        local = jnp.clip(i - off[gc], 0, None)
    a_idx = jnp.clip(pool.a_start[sel[gc]] + local, 0, pool.atoms.shape[0] - 1)
    atom_ids = jnp.where(valid, pool.atoms[a_idx] + 1, 0).astype(jnp.int32)
    # pad/gap rows keep the clipped running graph id (they're masked, and
    # non-decreasing ids enable the sorted readout — node_sorted below)
    node_graph = gc.astype(jnp.int32)
    node_local = jnp.where(valid, local, 0).astype(jnp.int32)

    # ---- edges: COO with global node indices (globally dst-sorted) -----
    elens = pool.e_len[sel]  # post-duplication lengths
    eoff = _prefix_offsets(elens)
    etotal = eoff[B]
    j = jnp.arange(edge_cap, dtype=jnp.int32)
    eg = _slot_to_graph(eoff, edge_cap)
    evalid = j < etotal
    egc = jnp.clip(eg, 0, B - 1)
    k = jnp.clip(j - eoff[egc], 0, None)  # local directed-edge index
    e_idx = jnp.clip(pool.e_start[sel[egc]] + k, 0, pool.edges.shape[0] - 1)
    e = pool.edges[e_idx]  # (E, 2) local endpoints, dst-sorted per ion
    s_loc, d_loc = e[:, 0], e[:, 1]
    base = off[egc]
    # Pad edges spread over [node_total, node_cap): zero messages, so
    # placement only has to keep the global dst stream NON-DECREASING
    # (real edges end below node_total). float32 math (x64 is off and
    # int32 would overflow at pos*node_cap).
    n_pad = jnp.maximum(edge_cap - etotal, 1)
    pos = jnp.clip(j - etotal, 0, None).astype(jnp.float32)
    lo = total.astype(jnp.float32)
    spread = lo + pos * ((np.float32(node_cap) - lo) / n_pad.astype(jnp.float32))
    spread = jnp.clip(spread.astype(jnp.int32), 0, node_cap - 1)
    src = jnp.where(evalid, s_loc + base, spread).astype(jnp.int32)
    dst = jnp.where(evalid, d_loc + base, spread).astype(jnp.int32)
    bond_ids = jnp.where(evalid, pool.bonds[e_idx] + 1, 0).astype(jnp.int32)

    return PackedGraphs(
        atom_ids=atom_ids,
        bond_ids=bond_ids,
        src=src,
        dst=dst,
        node_graph=node_graph,
        node_local=node_local,
        node_mask=valid,
        edge_mask=evalid,
        n_graphs=B,
        node_sorted=True,
    )


# one-hot row-pick cap for pack_side_padded: above this pool size the
# (B, M) one-hot operand outgrows its win over the per-row gather
# (B=4096, M=4096 f32 → 67 MB operand, ~11 GFLOP — still fine; beyond,
# fall back). Unique-ION pools are typically 10s-1000s of rows.
ONEHOT_GATHER_MAX_ROWS = 4096


def _fused_rows(pool: DevicePool, sel: jnp.ndarray):
    """Row-pick of the fused padded plane: ``(fused, valid)`` for ``sel``
    (B,) int32 ion indices, where ``sel < 0`` is the empty-slot sentinel
    (row 0 is gathered but ``valid`` is False — callers zero the lengths).

    Small pools take the (B, M) one-hot f32 matmul pick: per-ROW gather
    cost is this backend's weak op (battery 30), while small-pool matmuls
    are ~free. Every fused-plane value (vocab ids, local edge indices
    < pitch, lengths <= em) is far below 2^24, so the f32 one-hot pick is
    EXACT; bf16 would not be (8-bit mantissa).
    """
    valid = sel >= 0
    safe = jnp.where(valid, sel, 0).astype(jnp.int32)
    M = int(pool.fused_p.shape[0])
    if M <= ONEHOT_GATHER_MAX_ROWS:
        oh = (safe[:, None] == jnp.arange(M, dtype=jnp.int32)[None, :])
        fused = jnp.dot(oh.astype(jnp.float32),
                        pool.fused_p.astype(jnp.float32),
                        preferred_element_type=jnp.float32).astype(jnp.int32)
    else:
        fused = pool.fused_p[safe]  # (B, pitch+3·em+2) — ONE row gather
    return fused, valid


def device_pool_slots(
    node_graph: jnp.ndarray, window: int, n_graphs: int
) -> jnp.ndarray:
    """Device analogue of ``data.packing.compute_pool_slots`` for ALIGNED
    device packs (no molecule straddles a window, node_graph
    non-decreasing with forward-filled pads): graph ``g`` lives in the
    first window whose last id ≥ g (binary search — no scatter), and its
    windowed-readout row is ``w·W + (g − node_graph[w·W])``. Graph slots
    beyond the last real graph id get the ``-1`` sentinel (same contract
    as the host ``compute_pool_slots``), so ``graph_sum_pool_windowed``'s
    ``pool_slot >= 0`` mask zeroes empty trailing slots instead of
    aliasing a real graph's pooled row."""
    N = int(node_graph.shape[0])
    nw = N // window
    ngw = node_graph.reshape(nw, window)
    g = jnp.arange(n_graphs, dtype=node_graph.dtype)
    w = jnp.clip(jnp.searchsorted(ngw[:, -1], g, side="left"), 0, nw - 1)
    local = jnp.clip(g - ngw[w, 0], 0, window - 1)
    slot = (w * window + local).astype(jnp.int32)
    return jnp.where(g > ngw[-1, -1], jnp.int32(-1), slot)


def pack_side_padded(
    pool: DevicePool,
    sel: jnp.ndarray,  # (B,) int32 ion indices into the pool
    window: int,
) -> PackedGraphs:
    """Molecule-major pitched pack: the window_ALIGNED analogue of
    ``pack_side_on_device(pitch=...)`` + ``window_tile_on_device`` in ONE
    step built from B ROW-gathers of the pool's padded planes.

    Requires a pool built with ``device_pool(pitch=...)`` and
    ``pitch | window``. Molecule ``i`` occupies node slots
    ``[i·pitch, (i+1)·pitch)`` and edge slots ``[i·em, (i+1)·em)``;
    window ``w`` therefore holds exactly ``window//pitch`` whole molecules
    and its edges live at positions ``[w·tile, (w+1)·tile)`` with
    ``tile = (window//pitch)·em`` — the implicit per-window edge tile, so
    no re-tiling pass is needed. Within-tile edge ORDER interleaves each
    molecule's (dst-sorted) edges with its pad slots; the onehot message
    op is order-independent inside a tile (its gather/aggregate are
    one-hot matmul SUMS), which is the only consumer of this layout.

    Why: on this backend gather cost is per ROW, nearly independent of
    row width (RESULTS battery 30: the element-gather device pack costs
    91.5 ms/batch at batch 4096 — ~20× the model forward it feeds). This
    formulation gathers ``4·B`` rows instead of ``2·(node_cap+edge_cap)``
    elements.
    """
    if pool.pitch <= 0 or pool.fused_p is None:
        raise ValueError("pack_side_padded needs a pool built with "
                         "device_pool(pitch=...)")
    if window % pool.pitch != 0:
        raise ValueError(f"pitch {pool.pitch} must divide window {window}")
    B = int(sel.shape[0])
    pitch, em = pool.pitch, pool.em
    fused, _ = _fused_rows(pool, sel)
    atoms = fused[:, :pitch]  # (B, pitch)
    bonds = fused[:, pitch:pitch + em]  # (B, em)
    e = fused[:, pitch + em:pitch + 3 * em].reshape(B, em, 2)
    alen = fused[:, -2]  # (B,)
    elen = fused[:, -1]
    nmask = jnp.arange(pitch, dtype=jnp.int32)[None, :] < alen[:, None]
    atom_ids = jnp.where(nmask, atoms + 1, 0).reshape(B * pitch)
    slot = jnp.arange(B, dtype=jnp.int32)
    node_graph = jnp.broadcast_to(slot[:, None], (B, pitch)).reshape(-1)
    local = jnp.broadcast_to(
        jnp.arange(pitch, dtype=jnp.int32)[None, :], (B, pitch))
    node_local = jnp.where(nmask, local, 0).reshape(-1)

    emask = jnp.arange(em, dtype=jnp.int32)[None, :] < elen[:, None]
    base = (slot * pitch)[:, None]
    # pad edges collapse onto their own molecule's slot base: in-window
    # (locality contract holds) and masked
    src = jnp.where(emask, e[..., 0] + base, base).reshape(-1).astype(jnp.int32)
    dst = jnp.where(emask, e[..., 1] + base, base).reshape(-1).astype(jnp.int32)
    bond_ids = jnp.where(emask, bonds + 1, 0).reshape(-1).astype(jnp.int32)

    # pitch | window ⇒ closed-form windowed-readout addressing
    gpw = window // pitch
    pool_slot = ((slot // gpw) * window + slot % gpw).astype(jnp.int32)

    return PackedGraphs(
        atom_ids=atom_ids.astype(jnp.int32),
        bond_ids=bond_ids,
        src=src,
        dst=dst,
        node_graph=node_graph,
        node_local=node_local,
        node_mask=nmask.reshape(-1),
        edge_mask=emask.reshape(-1),
        n_graphs=B,
        edge_layout="window_aligned",
        node_sorted=True,
        pool_slot=pool_slot,
    )


def padded_aligned_tile(window: int, pitch: int, em: int) -> int:
    """The implicit per-window edge tile of :func:`pack_side_padded`."""
    return (window // pitch) * em


def paired_tile(window: int, region: int, em: int,
                edge_budget: int = 0) -> int:
    """The implicit per-window edge tile of :func:`pack_side_paired`."""
    return (window // region) * (edge_budget or 2 * em)


def pack_side_paired(
    pool: DevicePool,
    sel_a: jnp.ndarray,  # (R,) int32 ion indices; -1 = empty slot
    sel_b: jnp.ndarray,  # (R,) int32 ion indices; -1 = empty slot
    window: int,
    region: int,
    edge_budget: int = 0,
) -> PackedGraphs:
    """PITCH-SLOT PAIRED pack: each ``region``-node slot holds TWO
    molecules — slot ``r``'s A molecule ascending from the region start,
    its B molecule REVERSED and right-aligned at the region end — so the
    node plane is ``R·region`` rows for ``2R`` graphs. This is the
    battery-40 fix for the device-epoch step: fixed-pitch single-occupancy
    placement inflated the cation node plane to B·pitch rows (nw = 2048
    windows at batch 2048) and the nw efficiency cliff (AXON findings 4d)
    priced that at ~3× the greedy-packed bench step; pairing a large
    molecule with a small one (``la + lb ≤ region``, the host perm
    builder's contract) halves the plane — DENSER than the host greedy
    packer for typical mixes (synthetic IL stats: mean cation 28.7 atoms,
    max 47 → pitch 64; fold-pairing fits 100%% of records, 1024 windows
    at 2048 records vs greedy's ~1246).

    Why reversal instead of shifting B to offset ``la``: a per-region
    dynamic shift is an element-gather (the ~µs/row op class battery 30
    measured) or a (R, region, region) one-hot matmul; REVERSING B makes
    its placement data-independent — ``flip`` of the pool's padded row is
    exactly "right-aligned reversed", and graph message passing is
    invariant to within-molecule node order as long as edge endpoints use
    the same indexing (``u → region-1-u``, pure arithmetic on the gathered
    edge values). ``node_local`` stores the ORIGINAL local index
    (``region-1-j``), so the reference parity quirk (atom-0 masking,
    reference models/layers.py:74) still identifies atom 0.

    Layout contract (the aligned onehot message path's requirements):

    * ``region % pool.pitch == 0`` is NOT needed — only
      ``pool.pitch ≤ region ≤ window`` and ``window % region == 0``
      (regions never straddle windows). ``R`` must be a multiple of
      ``window // region`` so the node plane is whole windows.
    * A occupies node rows ``[r·region, r·region + la)``; B occupies
      ``[r·region + region − lb, (r+1)·region)``. The HOST pairing must
      guarantee ``la + lb ≤ region``; the device cannot check under jit
      (overlap would silently corrupt both molecules). Single-record
      regions must ride in slot A (``sel_b = -1``): the closed-form
      windowed-readout addressing below needs every window's FIRST node
      row to carry the window's first graph id, which holds whenever
      ``lb < region``.
    * Graph ids: ``2r`` for A, ``2r + 1`` for B (gap rows forward-fill
      with ``2r`` — ids stay non-decreasing). Edge slots: A at
      ``[2r·em, (2r+1)·em)``, B at ``[(2r+1)·em, (2r+2)·em)`` — window
      ``w`` holds ``window//region`` regions, so its edges tile at
      ``paired_tile(window, region, em)`` slots, order-free within the
      tile (the onehot op's gather/aggregate are one-hot matmul sums).
    * ``pool_slot[2r+p] = (r // gpw)·window + (r %% gpw)·2 + p`` with
      ``gpw = window // region`` — matches ``graph_sum_pool_windowed``'s
      ``w·W + (g − node_graph[w·W])`` addressing; ``-1`` for empty slots.

    ``edge_budget`` (Eb > 0) switches the edge plane from per-molecule-
    slot capacity (``2·em`` per region) to a SHARED per-region budget:
    A's edges ascend from the region's first edge slot, B's descend
    (reversed) from its last — the same flip trick as the node plane —
    under the host contract ``ea + eb ≤ Eb`` (and ``Eb ≥ em`` so singles
    always fit). Why: ``em`` is the pool MAX (~1.6× the mean here), so
    the per-slot layout carries a 184-slot window tile at window=region
    — lane-misaligned AND bigger than the host layout's 128. A shared
    budget chosen as a lane multiple (e.g. 128) makes the tile both
    aligned and smaller than the host plan's (battery 41: the paired
    backward ran 2.7× the host backward on the 184-tile layout).

    Reference scope: layout optimization with no reference counterpart
    (the reference pads every molecule to the batch max —
    train_viscosity.py:255-262); semantics match ``pack_graphs`` on the
    interleaved record list [A_0, B_0, A_1, B_1, ...] minus placement.
    """
    if pool.pitch <= 0 or pool.fused_p is None:
        raise ValueError("pack_side_paired needs a pool built with "
                         "device_pool(pitch=...)")
    pitch, em = pool.pitch, pool.em
    if region < pitch:
        raise ValueError(f"region {region} < pool pitch {pitch}")
    if window % region != 0:
        raise ValueError(f"region {region} must divide window {window}")
    R = int(sel_a.shape[0])
    gpw = window // region
    if R % gpw != 0:
        raise ValueError(f"R={R} must be a multiple of window//region={gpw}")
    S = region
    pad = S - pitch

    fused_a, valid_a = _fused_rows(pool, sel_a)
    fused_b, valid_b = _fused_rows(pool, sel_b)
    la = jnp.where(valid_a, fused_a[:, -2], 0)  # (R,)
    lb = jnp.where(valid_b, fused_b[:, -2], 0)
    ea_len = jnp.where(valid_a, fused_a[:, -1], 0)
    eb_len = jnp.where(valid_b, fused_b[:, -1], 0)

    # ---- nodes: A ascending at the region start, B reversed at the end
    jj = jnp.arange(S, dtype=jnp.int32)[None, :]  # (1, S)
    a_plane = jnp.pad(fused_a[:, :pitch], ((0, 0), (0, pad)))
    b_plane = jnp.pad(jnp.flip(fused_b[:, :pitch], axis=1),
                      ((0, 0), (pad, 0)))
    mask_a = jj < la[:, None]  # (R, S)
    mask_b = jj >= (S - lb)[:, None]
    # disjoint by the host contract la + lb <= S
    atom_ids = (jnp.where(mask_a, a_plane + 1, 0)
                + jnp.where(mask_b, b_plane + 1, 0))
    slot2 = 2 * jnp.arange(R, dtype=jnp.int32)[:, None]  # (R, 1)
    node_graph = slot2 + mask_b.astype(jnp.int32)
    node_local = (jnp.where(mask_a, jj, 0)
                  + jnp.where(mask_b, (S - 1) - jj, 0))
    node_mask = mask_a | mask_b

    # ---- edges: A forward, B with endpoints reflected (u -> S-1-u)
    base = (jnp.arange(R, dtype=jnp.int32) * S)[:, None]  # (R, 1)
    e_a = fused_a[:, pitch + em:pitch + 3 * em].reshape(R, em, 2)
    e_b = fused_b[:, pitch + em:pitch + 3 * em].reshape(R, em, 2)
    if edge_budget:
        # SHARED region budget: A's edges at the front, B's reversed at
        # the tail (disjoint by the host contract ea + eb <= Eb)
        Eb = edge_budget
        if Eb < em:
            raise ValueError(f"edge_budget {Eb} < pool em {em} — a single "
                             "molecule would overflow its region")
        tt = jnp.arange(Eb, dtype=jnp.int32)[None, :]
        padE = Eb - em
        emask_a = tt < ea_len[:, None]
        emask_b = tt >= (Eb - eb_len)[:, None]

        def front(x):  # (R, em) -> (R, Eb), A ascending from slot 0
            return jnp.pad(x, ((0, 0), (0, padE)))

        def tail(x):  # (R, em) -> (R, Eb), B reversed at the region end
            return jnp.pad(jnp.flip(x, axis=1), ((0, 0), (padE, 0)))

        src = jnp.where(
            emask_a, front(e_a[..., 0]) + base,
            jnp.where(emask_b, (S - 1) - tail(e_b[..., 0]) + base, base))
        dst = jnp.where(
            emask_a, front(e_a[..., 1]) + base,
            jnp.where(emask_b, (S - 1) - tail(e_b[..., 1]) + base, base))
        bond_ids = jnp.where(
            emask_a, front(fused_a[:, pitch:pitch + em]) + 1,
            jnp.where(emask_b, tail(fused_b[:, pitch:pitch + em]) + 1, 0))
        edge_mask = (emask_a | emask_b).reshape(-1)
        src = src.reshape(-1).astype(jnp.int32)
        dst = dst.reshape(-1).astype(jnp.int32)
        bond_ids = bond_ids.reshape(-1).astype(jnp.int32)
    else:
        tt = jnp.arange(em, dtype=jnp.int32)[None, :]  # (1, em)
        emask_a = tt < ea_len[:, None]
        emask_b = tt < eb_len[:, None]
        src_a = jnp.where(emask_a, e_a[..., 0] + base, base)
        dst_a = jnp.where(emask_a, e_a[..., 1] + base, base)
        src_b = jnp.where(emask_b, (S - 1) - e_b[..., 0] + base, base)
        dst_b = jnp.where(emask_b, (S - 1) - e_b[..., 1] + base, base)
        bonds_a = jnp.where(emask_a, fused_a[:, pitch:pitch + em] + 1, 0)
        bonds_b = jnp.where(emask_b, fused_b[:, pitch:pitch + em] + 1, 0)
        # region r's edge slots: [A's em | B's em] — (R, 2, em) row-major
        src = jnp.stack([src_a, src_b], axis=1).reshape(-1).astype(jnp.int32)
        dst = jnp.stack([dst_a, dst_b], axis=1).reshape(-1).astype(jnp.int32)
        bond_ids = jnp.stack([bonds_a, bonds_b], axis=1).reshape(-1).astype(jnp.int32)
        edge_mask = jnp.stack([emask_a, emask_b], axis=1).reshape(-1)

    # ---- windowed-readout addressing (closed form; -1 = empty slot)
    r = jnp.arange(R, dtype=jnp.int32)
    row0 = (r // gpw) * window + (r % gpw) * 2
    slot_a = jnp.where(valid_a, row0, -1)
    slot_b = jnp.where(valid_b, row0 + 1, -1)
    pool_slot = jnp.stack([slot_a, slot_b], axis=1).reshape(-1).astype(jnp.int32)

    return PackedGraphs(
        atom_ids=atom_ids.reshape(-1).astype(jnp.int32),
        bond_ids=bond_ids,
        src=src,
        dst=dst,
        node_graph=node_graph.reshape(-1).astype(jnp.int32),
        node_local=node_local.reshape(-1).astype(jnp.int32),
        node_mask=node_mask.reshape(-1),
        edge_mask=edge_mask,
        n_graphs=2 * R,
        edge_layout="window_aligned",
        node_sorted=True,
        pool_slot=pool_slot,
    )


def window_tile_on_device(
    g: PackedGraphs, tile: int, window: int = 128, aligned: bool = False
) -> PackedGraphs:
    """Device analogue of :func:`data.packing.window_tile_edges` — re-lay a
    dst-sorted packed batch into fixed per-window edge tiles so
    ``message_impl="onehot"`` (all-MXU one-hot matmuls) can consume
    device-packed screening batches.

    Pure GATHER formulation (no scatter — the expensive op on this
    backend): real edges are a dst-sorted PREFIX of the edge arrays
    (:func:`pack_side_on_device`'s layout), hence grouped contiguously by
    node window, so window ``w``'s edges live at input positions
    ``[starts[w], starts[w] + counts[w])`` and output slot ``(w, t)`` reads
    input ``starts[w] + t`` when ``t < counts[w]`` (else a masked
    self-loop pad on the window's last node — still sorted valid COO).

    CAPACITY CONTRACT: callers must size ``tile`` with a proven bound
    (:func:`pool_window_tile_bound` for grid sweeps — same bound
    ``plan_capacities`` uses); a window with more than ``tile`` real edges
    would silently drop the excess under jit, exactly the footgun the
    host path raises on.
    """
    node_cap = g.node_capacity
    assert node_cap % window == 0, (node_cap, window)
    nw = node_cap // window
    E = int(g.src.shape[0])
    w_of = (g.dst // window).astype(jnp.int32)
    # per-window real-edge counts: real edges are a window-grouped prefix
    # and pads (idx nw) are the tail, so indices are sorted
    idx = jnp.where(g.edge_mask, w_of, nw)
    counts = jnp.zeros(nw + 1, jnp.int32).at[idx].add(
        1, mode="drop", indices_are_sorted=True
    )[:nw]
    if not isinstance(counts, jax.core.Tracer):
        # eager calls verify the capacity contract outright (same pattern
        # as ops/pallas/segment_sum); under jit callers must size `tile`
        # with the proven pool bound
        worst = int(jax.device_get(counts.max()))
        if worst > tile:
            raise ValueError(
                f"window tile capacity {tile} exceeded ({worst} real edges "
                f"in one {window}-node window) — size tile with "
                f"pool_window_tile_bound"
            )
    starts = _prefix_offsets(counts)[:nw]
    s = jnp.arange(nw * tile, dtype=jnp.int32)
    w = s // tile
    t = s % tile
    src_idx = jnp.clip(starts[w] + t, 0, E - 1)
    valid = t < counts[w]
    pad_node = w * window + (window - 1)
    return PackedGraphs(
        atom_ids=g.atom_ids,
        bond_ids=jnp.where(valid, g.bond_ids[src_idx], 0).astype(jnp.int32),
        src=jnp.where(valid, g.src[src_idx], pad_node).astype(jnp.int32),
        dst=jnp.where(valid, g.dst[src_idx], pad_node).astype(jnp.int32),
        node_graph=g.node_graph,
        node_local=g.node_local,
        node_mask=g.node_mask,
        edge_mask=valid,
        n_graphs=g.n_graphs,
        # aligned: the caller guarantees no molecule straddles a window
        # (fixed-pitch placement with pitch | window and pitch >= every
        # molecule) — the onehot op then runs halo-free
        edge_layout="window_aligned" if aligned else "window",
        node_sorted=g.node_sorted,
        pool_slot=(device_pool_slots(g.node_graph, window, g.n_graphs)
                   if aligned else None),
    )


def pool_window_tile_bound(
    a_lens, e_lens, window: int = 128, multiple: int = 8
) -> int:
    """Proven per-window edge-tile bound for batches packed from ion pools
    (same argument as ``plan_capacities(edge_layout="window")``): a
    window's real edges come from molecules overlapping its node range —
    fully-contained molecules contribute at most ``window · max(edges per
    atom)`` and at most 2 molecules straddle the boundaries, each bounded
    by the pool's largest edge count. ``e_lens`` must already include any
    parity edge duplication (``DevicePool.e_len`` does)."""
    a = np.maximum(np.asarray(a_lens, np.int64), 1)
    e = np.asarray(e_lens, np.int64)
    if e.size == 0:
        return multiple
    density = float((e / a).max())
    tile = int(np.ceil(window * density)) + 2 * int(e.max())
    return ((tile + multiple - 1) // multiple) * multiple


def pool_pitch(a_lens, window: int = 128) -> int:
    """Fixed node pitch for aligned device packing: the smallest
    power-of-two ≥ every pool molecule (so it divides ``window``).
    Raises if any ion exceeds the window (locality contract)."""
    m = int(np.asarray(a_lens, np.int64).max(initial=1))
    if m > window:
        raise ValueError(
            f"largest ion ({m} atoms) exceeds the onehot window ({window}) "
            f"— aligned layout impossible"
        )
    pitch = 1
    while pitch < m:
        pitch *= 2
    return pitch


def pool_aligned_tile_bound(
    e_lens, window: int = 128, pitch: int = 128, multiple: int = 8
) -> int:
    """Per-window edge-tile bound for PITCH-placed aligned batches: a
    window holds exactly ``window // pitch`` molecule slots, each bounded
    by the pool's largest edge count (``e_lens`` post-duplication)."""
    e = np.asarray(e_lens, np.int64)
    emax = int(e.max(initial=0))
    tile = max((window // pitch) * emax, 1)
    return ((tile + multiple - 1) // multiple) * multiple


def grid_batch_on_device(
    cat_pool: DevicePool,
    an_pool: DevicePool,
    temps: jnp.ndarray,  # (T,) float32 temperature grid
    g0: jnp.ndarray,  # scalar int32: first global candidate id of the batch
    *,
    n_cations: int,
    n_anions: int,
    total: int,
    batch_size: int,
    node_cap: int,
    edge_cap: int,
    duplicate_edges: bool = False,
    with_temperature: bool = True,
    edge_layout: str = "sorted",
    edge_tile: int = 0,
    window: int = 128,
    pitch: int = 0,
    anion_node_cap: int = 0,
    anion_edge_cap: int = 0,
    anion_edge_tile: int = 0,
    anion_pitch: int = 0,
) -> IonPairBatch:
    """Materialize candidates ``[g0, g0+B)`` of the cation-fastest grid
    enumeration as a full :class:`IonPairBatch`, on device, from the
    scalar ``g0`` alone.

    With ``edge_layout="window"`` both sides are re-laid into per-window
    edge tiles of ``edge_tile`` slots (:func:`window_tile_on_device`) for
    ``message_impl="onehot"`` — size ``edge_tile`` with
    :func:`pool_window_tile_bound`.

    With ``edge_layout="window_aligned"`` (requires ``pitch`` from
    :func:`pool_pitch` and ``node_cap == batch_size·pitch``) nodes are
    placed at fixed pitch so no molecule straddles a window, and tiles
    are sized by :func:`pool_aligned_tile_bound` — the onehot message
    path then runs HALO-FREE (src context 3× narrower), the device
    analogue of the host packer's ``node_align`` contract.

    Enumeration order matches ``ScreeningEngine.screen_grid``:
    ``gid = ti * (C*A) + ai * C + ci`` (cation index cycles fastest so
    consecutive candidates mix molecule sizes). Out-of-range slots
    (``gid >= total``) get ion 0 and ``sample_mask == 0`` — the last
    partial batch reuses the same compiled program.

    ``n_cations``/``n_anions``/``total`` may be python ints OR traced
    int32 scalars: passing them as jit ARGUMENTS keeps the compiled
    executable independent of grid size (cold remote compiles cost
    minutes through the axon tunnel; baking the grid shape into the
    program forced a fresh compile per sweep size — battery 30).

    The ``anion_*`` overrides size that side INDEPENDENTLY (0 = shared):
    anions are typically ~3x smaller than cations, so a per-side pitch /
    node_cap / edge_tile shrinks the anion forward's node and edge planes
    by the same argument that took the train step 11.88 → 7.26 ms/step
    (per-side batch capacities, RESULTS battery 27).
    """
    B = batch_size
    C, A = n_cations, n_anions
    gids = g0.astype(jnp.int32) + jnp.arange(B, dtype=jnp.int32)
    in_range = gids < total
    safe = jnp.where(in_range, gids, 0)
    ci = safe % C
    ai = (safe // C) % A
    ti = safe // (C * A)
    aligned = edge_layout == "window_aligned"
    an_node_cap = anion_node_cap or node_cap
    an_edge_cap = anion_edge_cap or edge_cap
    an_tile = anion_edge_tile or edge_tile
    an_pitch = anion_pitch or pitch
    if aligned and (pitch <= 0 or an_pitch <= 0):
        raise ValueError("edge_layout='window_aligned' needs pitch > 0 "
                         "(use pool_pitch)")

    def one_side(pool, sel_ids, ncap, ecap, tile, p):
        if aligned and pool.pitch > 0:
            # molecule-major fast path (see pack_side_padded): pools built
            # with padded planes pack in B row-gathers, tile is implicit
            if pool.pitch != p:
                raise ValueError(f"pool built with pitch {pool.pitch} but "
                                 f"plan pitch is {p}")
            if ncap != B * p:
                raise ValueError(f"aligned padded pack needs node_cap == "
                                 f"B*pitch ({ncap} != {B}*{p})")
            return pack_side_padded(pool, sel_ids, window)
        g = pack_side_on_device(pool, sel_ids, ncap, ecap, duplicate_edges,
                                pitch=p if aligned else 0)
        if edge_layout in ("window", "window_aligned"):
            if tile <= 0:
                raise ValueError(
                    f"edge_layout={edge_layout!r} needs edge_tile > 0 "
                    "(use pool_window_tile_bound / pool_aligned_tile_bound)")
            g = window_tile_on_device(g, tile, window, aligned)
        return g

    cation = one_side(cat_pool, ci, node_cap, edge_cap, edge_tile, pitch)
    anion = one_side(an_pool, ai, an_node_cap, an_edge_cap, an_tile, an_pitch)
    temperature = jnp.zeros((B, 1), jnp.float32)
    if with_temperature:
        Tn = int(temps.shape[0])
        if Tn <= ONEHOT_GATHER_MAX_ROWS:
            # B-row scalar gather → (B, Tn) one-hot matvec (exact: one
            # nonzero per row) — same per-row-cost avoidance as the pool
            # row pick
            oh_t = (ti[:, None] == jnp.arange(Tn, dtype=jnp.int32))
            tvals = jnp.dot(oh_t.astype(jnp.float32),
                            temps.astype(jnp.float32)[:, None],
                            preferred_element_type=jnp.float32)
        else:
            tvals = temps[ti][:, None]
        temperature = jnp.where(in_range[:, None], tvals, 0.0)
    return IonPairBatch(
        cation=cation,
        anion=anion,
        temperature=temperature,
        y=jnp.zeros(B, jnp.float32),
        sample_mask=in_range.astype(jnp.float32),
    )
