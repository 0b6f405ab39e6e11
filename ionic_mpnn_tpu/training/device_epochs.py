"""Device-resident training epochs: the dataset lives on the device.

fit()'s host group loader re-packs the shuffled epoch on the host and
re-transfers ~150 MB of batch arrays per epoch through the axon tunnel —
measured LINK-bound (RESULTS battery 29: 2.2 s/epoch at 100k×2048 vs
0.26 s device compute + 0.20 s host packing). This mode uploads the
encoded dataset ONCE as deduplicated molecule-major padded ion pools
(:func:`ionic_mpnn_tpu.ops.grid_pack.device_pool` with ``pitch``) plus
per-record index/target arrays, and per epoch ships only a shuffled
permutation (~0.4 MB at 100k records). Each train step then packs its
batch ON DEVICE with B row-gathers (:func:`pack_side_padded`) inside the
jitted scan — the screening sweeps' battery-30 fast pack, reused for
training.

Trade-off vs the host loader: fixed-pitch placement pads every molecule
slot to the pool pitch (vs greedy aligned packing), costing ~1.2-1.7×
more node/edge slots per batch; transfer drops ~400× and the host does
no per-epoch packing at all. Batches hold exactly ``batch_size`` records
(the host loader may close batches early), so loss trajectories are
statistically equivalent but not bit-identical to the host path.

Requires: single device, ``message_impl="onehot"`` with the
``window_aligned`` layout (the only consumer of pitch-placed batches),
and every molecule ≤ the onehot window.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.packing import IonPairBatch
from ..ops.grid_pack import DevicePool, device_pool, pack_side_padded, pool_pitch

__all__ = ["DeviceDataset", "build_device_dataset", "make_device_epoch_call",
           "make_dp_device_epoch_call"]


class _GraphPool:
    """Minimal host pool (IonPool's array interface) from encoded graphs."""

    def __init__(self, graphs: List[Dict[str, Any]]):
        self.a_len = np.array([g["num_atoms"] for g in graphs], np.int64)
        self.e_len = np.array([len(g["bond_ids"]) for g in graphs], np.int64)
        self.a_start = np.concatenate([[0], np.cumsum(self.a_len)[:-1]]
                                      ) if len(graphs) else np.zeros(0, np.int64)
        self.e_start = np.concatenate([[0], np.cumsum(self.e_len)[:-1]]
                                      ) if len(graphs) else np.zeros(0, np.int64)
        self.atoms = (np.concatenate([np.asarray(g["atom_ids"], np.int32)
                                      for g in graphs])
                      if len(graphs) else np.zeros(0, np.int32))
        self.bonds = (np.concatenate([np.asarray(g["bond_ids"], np.int32)
                                      for g in graphs])
                      if len(graphs) else np.zeros(0, np.int32))
        edges = [np.asarray(g["edge_indices"], np.int32).reshape(-1, 2)
                 for g in graphs]
        self.edges = (np.concatenate(edges)
                      if len(graphs) else np.zeros((0, 2), np.int32))


class DeviceDataset:
    """Encoded dataset as device-resident padded pools + record arrays."""

    def __init__(self, cat_pool: DevicePool, an_pool: DevicePool,
                 cat_idx, an_idx, temperature, y, n: int, window: int,
                 with_temperature: bool):
        self.cat_pool = cat_pool
        self.an_pool = an_pool
        self.cat_idx = cat_idx  # (n,) int32 record -> unique-cation row
        self.an_idx = an_idx
        self.temperature = temperature  # (n,) float32
        self.y = y  # (n,) float32 (post-normalization)
        self.n = n
        self.window = window
        self.with_temperature = with_temperature

    def arrays(self):
        """The device-array pytree (for passing as a jit ARGUMENT — e.g.
        through shard_map in_specs — instead of closing over it)."""
        return (self.cat_pool, self.an_pool, self.cat_idx, self.an_idx,
                self.temperature, self.y)

    def with_arrays(self, arrays) -> "DeviceDataset":
        """View of this dataset with the array pytree replaced (static
        metadata n/window/with_temperature preserved)."""
        cat_pool, an_pool, cat_idx, an_idx, temperature, y = arrays
        return DeviceDataset(cat_pool, an_pool, cat_idx, an_idx,
                             temperature, y, self.n, self.window,
                             self.with_temperature)


def _dedupe(records: Sequence[Dict[str, Any]], side: str):
    """Unique graphs (content-keyed) + per-record row index."""
    rows: List[Dict[str, Any]] = []
    keys: Dict[bytes, int] = {}
    idx = np.zeros(len(records), np.int32)
    for i, r in enumerate(records):
        g = r[side]
        a = np.asarray(g["atom_ids"], np.int32).tobytes()
        b = np.asarray(g["bond_ids"], np.int32).tobytes()
        e = np.asarray(g["edge_indices"], np.int32).tobytes()
        # length-prefixed framing: raw int32 bytes can contain any
        # separator byte, so a bare b"|" join could alias two distinct
        # (atom_ids, bond_ids, edge_indices) splits into one key
        key = b"%d|%d|%d|" % (len(a), len(b), len(e)) + a + b + e
        j = keys.get(key)
        if j is None:
            j = len(rows)
            keys[key] = j
            rows.append(g)
        idx[i] = j
    return rows, idx


def build_device_dataset(
    records: Sequence[Dict[str, Any]],
    window: int,
    target_key: str,
    with_temperature: bool = True,
    duplicate_edges: bool = False,
) -> DeviceDataset:
    """Upload the encoded dataset once. Raises ``ValueError`` if any
    molecule exceeds ``window`` (locality contract — callers fall back to
    the host loader)."""
    cat_rows, cat_idx = _dedupe(records, "cation")
    an_rows, an_idx = _dedupe(records, "anion")
    cat_host, an_host = _GraphPool(cat_rows), _GraphPool(an_rows)
    p_c = pool_pitch(cat_host.a_len, window)  # raises if molecule > window
    p_a = pool_pitch(an_host.a_len, window)
    return DeviceDataset(
        cat_pool=device_pool(cat_host, duplicate_edges, pitch=p_c),
        an_pool=device_pool(an_host, duplicate_edges, pitch=p_a),
        cat_idx=jnp.asarray(cat_idx),
        an_idx=jnp.asarray(an_idx),
        temperature=jnp.asarray(
            np.array([float(r.get("T", 0.0)) for r in records], np.float32)),
        y=jnp.asarray(
            np.array([float(r[target_key]) for r in records], np.float32)),
        n=len(records),
        window=window,
        with_temperature=with_temperature,
    )


def _device_batch(ds: DeviceDataset, idx: jnp.ndarray) -> IonPairBatch:
    """Pack one batch ON DEVICE from permutation indices (sentinel ds.n ⇒
    masked slot cloning record 0)."""
    valid = idx < ds.n
    safe = jnp.where(valid, idx, 0)
    B = int(idx.shape[0])
    return IonPairBatch(
        cation=pack_side_padded(ds.cat_pool, ds.cat_idx[safe], ds.window),
        anion=pack_side_padded(ds.an_pool, ds.an_idx[safe], ds.window),
        temperature=(jnp.where(valid, ds.temperature[safe], 0.0)[:, None]
                     if ds.with_temperature
                     else jnp.zeros((B, 1), jnp.float32)),
        y=jnp.where(valid, ds.y[safe], 0.0),
        sample_mask=valid.astype(jnp.float32),
    )


def make_dp_device_epoch_call(
    model, model_cfg, train_cfg, optimizer, mesh, ds: DeviceDataset,
    batch_size: int, steps_per_call: int,
    data_axis: str = "data", has_batch_stats: bool = False,
):
    """Data-parallel device-resident epochs (round-4 VERDICT item 3).

    The dataset pools upload once (replicated — they're read-only);
    each epoch ships one shuffled permutation. INSIDE the shard_map body
    device ``d`` slices its own ``B`` indices at
    ``g0 + (k·n_dev + d)·B`` and packs its batch on device, then runs the
    shared DP step (grad psum over ``data_axis`` —
    ``parallel/data_parallel.make_per_device_step``), under the same
    all-empty-slot ``lax.cond`` skip as the host DP group path (the
    predicate is a psum ⇒ uniform across shards).

    Signature: ``call(state, ds_arrays, perm, g0) -> (state,
    {"loss_sum", "n"})`` — ``ds_arrays`` is ``ds.arrays()``, passed as an
    ARGUMENT (never closed over: host-constant closures poison this
    backend, CLAUDE.md) and replicated; ``perm`` must be padded to a
    multiple of ``n_dev·B·K`` with the sentinel ``ds.n``.
    """
    import jax.sharding as shd
    from jax import shard_map

    from ..parallel.data_parallel import make_per_device_step

    P = shd.PartitionSpec
    n_dev = int(mesh.shape[data_axis])
    B, K = batch_size, steps_per_call
    inner = make_per_device_step(model, model_cfg, train_cfg, optimizer,
                                 n_dev, data_axis, has_batch_stats)

    def per_device(state, ds_arrays, perm, g0):
        d = jax.lax.axis_index(data_axis)
        local = ds.with_arrays(ds_arrays)

        def body(s, k):
            start = g0 + (k * n_dev + d) * B
            idx = jax.lax.dynamic_slice(perm, (start,), (B,))
            batch = _device_batch(local, idx)
            n_global = jax.lax.psum(jnp.sum(batch.sample_mask), data_axis)

            def run(s_):
                s2, m = inner(s_, batch)
                return s2, (m["loss"], m["n"])

            def skip(s_):
                return s_, (jnp.float32(0.0), jnp.float32(0.0))

            return jax.lax.cond(n_global > 0, run, skip, s)

        state, (losses, ns) = jax.lax.scan(
            body, state, jnp.arange(K, dtype=jnp.int32))
        return state, {"loss_sum": jnp.sum(losses * ns), "n": jnp.sum(ns)}

    sharded = shard_map(
        per_device,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),  # state + dataset + perm replicated
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_device_epoch_call(inner_step, ds: DeviceDataset, batch_size: int,
                           steps_per_call: int):
    """Jitted K-step scan that PACKS each batch on device from a shuffled
    permutation: ``call(state, ds_arrays, perm, g0) -> (state,
    {"loss_sum", "n"})`` with ``ds_arrays = ds.arrays()``.

    ``perm`` is the epoch permutation padded to a multiple of ``B·K`` with
    the out-of-range sentinel ``ds.n`` (those slots get ``sample_mask 0``
    — they clone record 0's molecules, whose loss rows are masked).
    ``g0``/``perm`` are traced, so every group of every epoch reuses ONE
    compiled program.

    The dataset arrays are an ARGUMENT, never closed over: beyond the
    closure-poison speed rule (CLAUDE.md), the round-4 quality bisect
    found that on the axon backend a dataset CLOSED OVER by a
    state-donating jit gets silently corrupted after the first few calls
    — single-call outputs were bitwise-correct while 400-epoch training
    plateaued 20× above the reachable loss; threading the pools through
    the signature (exactly like the screening sweeps and the DP variant)
    restores convergence (RESULTS round 4, battery 36).
    """
    B, K = batch_size, steps_per_call

    def call(state, ds_arrays, perm, g0):
        local = ds.with_arrays(ds_arrays)

        def body(s, k):
            idx = jax.lax.dynamic_slice(perm, (g0 + k * B,), (B,))
            batch = _device_batch(local, idx)
            nk = jnp.sum(batch.sample_mask)

            # all-sentinel scan slots (epoch tail padding) must be true
            # no-ops — without the cond they'd still apply an optimizer
            # update from the L2 penalty + Adam momentum (same guard as
            # make_scan_train_step; measured to visibly degrade
            # convergence at small dataset sizes, RESULTS round 4)
            def run(s_):
                s2, m = inner_step(s_, batch)
                return s2, m["loss"] * nk

            def skip(s_):
                return s_, jnp.float32(0.0)

            s2, weighted = jax.lax.cond(nk > 0, run, skip, s)
            return s2, (weighted, nk)

        state, (losses, nks) = jax.lax.scan(
            body, state, jnp.arange(K, dtype=jnp.int32))
        return state, {"loss_sum": jnp.sum(losses), "n": jnp.sum(nks)}

    return jax.jit(call, donate_argnums=(0,))
