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

Layout contract matches :func:`ionic_mpnn_tpu.data.packing.pack_graphs`
(ids +1 with 0 = pad, prefix-dense nodes, pad edges spread over the node
range) EXCEPT that edges are left in pool order rather than dst-sorted —
fine for the XLA scatter path the screening forward uses, but these
batches must NOT be fed to the Pallas sorted-scatter kernel
(``scatter_impl="pallas"`` requires dst-sorted edges).

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

__all__ = ["DevicePool", "device_pool", "pack_side_on_device", "grid_batch_on_device"]


@struct.dataclass
class DevicePool:
    """Columnar unique-ion pool as device arrays (upload once per sweep).

    ``edges`` hold *local* (within-molecule) atom indices; ``atoms`` /
    ``bonds`` hold raw vocab ids (the +1 pad offset is applied at pack
    time, same as the host packer).
    """

    atoms: Any  # (Pa,) int32 raw vocab ids
    bonds: Any  # (Pe,) int32 raw vocab ids
    edges: Any  # (Pe, 2) int32 local atom indices
    a_start: Any  # (M,) int32
    a_len: Any  # (M,) int32
    e_start: Any  # (M,) int32
    e_len: Any  # (M,) int32 stored directed edges per ion


def device_pool(pool) -> DevicePool:
    """Convert a host :class:`~ionic_mpnn_tpu.inference.IonPool` (int64
    offsets) into int32 device arrays.

    Zero-size columns (e.g. an all-single-atom anion pool has no bonds at
    all) are padded with one sentinel row: XLA gathers reject 0-size
    operands at trace time, and every index into the sentinel is already
    masked out by ``edge_mask``/``node_mask`` downstream.
    """
    atoms = np.asarray(pool.atoms, np.int32)
    bonds = np.asarray(pool.bonds, np.int32)
    edges = np.asarray(pool.edges, np.int32).reshape(-1, 2)
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
        e_start=jnp.asarray(pool.e_start, jnp.int32),
        e_len=jnp.asarray(pool.e_len, jnp.int32),
    )


def _prefix_offsets(lens: jnp.ndarray) -> jnp.ndarray:
    """(B,) lengths → (B+1,) exclusive prefix offsets."""
    return jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(lens, dtype=jnp.int32)])


def pack_side_on_device(
    pool: DevicePool,
    sel: jnp.ndarray,  # (B,) int32 ion indices into the pool
    node_cap: int,
    edge_cap: int,
    duplicate_edges: bool = False,
) -> PackedGraphs:
    """Pack ``pool[sel[i]]`` for i in 0..B-1 into one fixed-capacity batch,
    entirely with static-shaped device ops (jit/scan-safe).

    Semantics match :func:`data.packing.pack_graphs` on the same molecule
    sequence — identical ``atom_ids``/``node_graph``/``node_local``/
    ``node_mask`` and the same real-edge multiset per graph — except edge
    ORDER (pool order here, dst-sorted there; see module docstring).
    """
    B = int(sel.shape[0])
    sel = sel.astype(jnp.int32)

    # ---- nodes: prefix-dense layout ------------------------------------
    lens = pool.a_len[sel]  # (B,)
    off = _prefix_offsets(lens)  # (B+1,)
    total = off[B]
    i = jnp.arange(node_cap, dtype=jnp.int32)
    g = jnp.searchsorted(off[1:], i, side="right").astype(jnp.int32)  # [0..B]
    valid = i < total
    gc = jnp.clip(g, 0, B - 1)
    local = jnp.clip(i - off[gc], 0, None)
    a_idx = jnp.clip(pool.a_start[sel[gc]] + local, 0, pool.atoms.shape[0] - 1)
    atom_ids = jnp.where(valid, pool.atoms[a_idx] + 1, 0).astype(jnp.int32)
    node_graph = jnp.where(valid, gc, 0).astype(jnp.int32)
    node_local = jnp.where(valid, local, 0).astype(jnp.int32)

    # ---- edges: COO with global node indices ---------------------------
    dup = 2 if duplicate_edges else 1
    elens = pool.e_len[sel] * dup
    eoff = _prefix_offsets(elens)
    etotal = eoff[B]
    j = jnp.arange(edge_cap, dtype=jnp.int32)
    eg = jnp.searchsorted(eoff[1:], j, side="right").astype(jnp.int32)
    evalid = j < etotal
    egc = jnp.clip(eg, 0, B - 1)
    k = jnp.clip(j - eoff[egc], 0, None)  # local directed-edge index
    stored = k // dup
    e_idx = jnp.clip(pool.e_start[sel[egc]] + stored, 0, pool.edges.shape[0] - 1)
    e = pool.edges[e_idx]  # (E, 2) local endpoints
    if duplicate_edges:
        # fwd+rev interleave per stored edge (pack_graphs parity)
        rev = (k % 2).astype(bool)
        s_loc = jnp.where(rev, e[:, 1], e[:, 0])
        d_loc = jnp.where(rev, e[:, 0], e[:, 1])
    else:
        s_loc, d_loc = e[:, 0], e[:, 1]
    base = off[egc]
    # pad edges spread uniformly over the node range (packing.py:170-178);
    # float32 math (x64 is off and int32 would overflow at pos*node_cap) —
    # pad edges carry zero messages, placement only needs to be spread out
    n_pad = jnp.maximum(edge_cap - etotal, 1)
    pos = jnp.clip(j - etotal, 0, None).astype(jnp.float32)
    spread = (pos * (np.float32(node_cap) / n_pad.astype(jnp.float32)))
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
    )


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
) -> IonPairBatch:
    """Materialize candidates ``[g0, g0+B)`` of the cation-fastest grid
    enumeration as a full :class:`IonPairBatch`, on device, from the
    scalar ``g0`` alone.

    Enumeration order matches ``ScreeningEngine.screen_grid``:
    ``gid = ti * (C*A) + ai * C + ci`` (cation index cycles fastest so
    consecutive candidates mix molecule sizes). Out-of-range slots
    (``gid >= total``) get ion 0 and ``sample_mask == 0`` — the last
    partial batch reuses the same compiled program.
    """
    B = batch_size
    C, A = n_cations, n_anions
    gids = g0.astype(jnp.int32) + jnp.arange(B, dtype=jnp.int32)
    in_range = gids < total
    safe = jnp.where(in_range, gids, 0)
    ci = safe % C
    ai = (safe // C) % A
    ti = safe // (C * A)
    cation = pack_side_on_device(cat_pool, ci, node_cap, edge_cap, duplicate_edges)
    anion = pack_side_on_device(an_pool, ai, node_cap, edge_cap, duplicate_edges)
    temperature = jnp.zeros((B, 1), jnp.float32)
    if with_temperature:
        temperature = jnp.where(in_range[:, None], temps[ti][:, None], 0.0)
    return IonPairBatch(
        cation=cation,
        anion=anion,
        temperature=temperature,
        y=jnp.zeros(B, jnp.float32),
        sample_mask=in_range.astype(jnp.float32),
    )
