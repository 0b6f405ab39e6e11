"""Halo-exchange edge partitioning — SURVEY §7 step 7's multi-host design.

The v1 edge-partitioned step (:mod:`.edge_partition`) replicates all node
states and all-reduces a full ``(N, D)`` aggregate per message step; exact
but O(N·D) comm per step. This module implements the scalable variant:

  * **node ownership**: the packed node axis is cut contiguously into
    ``n_shards`` ranges; shard ``k`` owns rows ``[k·Ns, (k+1)·Ns)`` (node
    arrays simply reshape to ``(S, Ns)`` — the packer already lays
    molecules out contiguously),
  * **edge ownership by destination**: each shard aggregates exactly the
    edges whose dst it owns; because edges never leave a molecule and
    molecules are contiguous, a non-owned *source* can only live in the
    adjacent shard, within ``halo`` rows of the boundary,
  * **fixed-capacity halo buffers**: per message step each shard ships its
    first/last ``halo`` rows of node state to its right/left neighbor with
    two ``ppermute`` collectives — O(halo·D) per step, independent of N,
  * **comm/compute overlap**: edges are split at partition time into
    *interior* (source owned — computable before any halo arrives) and
    *boundary* (source in a neighbor's halo) groups; XLA's latency-hiding
    scheduler can run the interior message matmuls + segment-sum while the
    permutes are in flight, because nothing in that chain depends on them,
  * the per-graph readout pool still needs one small ``psum`` of the
    ``(B, D)`` per-graph partials (molecules may straddle a boundary), and
    gradients merge with the usual ``psum/S`` (exactness argument identical
    to :mod:`.edge_partition` — every sharded-path cotangent crosses
    exactly one forward psum).

Parameter pytrees are the SAME as the flax models' (``ViscosityModel`` /
``MeltingPointModel``), so states, checkpoints, and tests interchange.

Reference scope: the reference has no distributed code at all (SURVEY
§2.3); this is the TPU-native equivalent of context parallelism for the
graph domain (SURVEY §5.7).

ROLE AFTER EP v3 (:mod:`.aligned_partition`): this tier computes messages
with the gather formulation — exact, but ~16× slower per chip than the
all-MXU onehot path on the measured backend (RESULTS.md battery 9). It is
KEPT (not retired) as the fallback for molecules larger than the
alignment window (>window atoms can't use the window_aligned layout, so
halo exchange is the only node-sharded option for them); for everything
the packer's aligned contract admits — all real ionic-liquid ions — use
the aligned EP v3 tier, which shards the production onehot math with zero
per-message-step communication.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig, TrainConfig
from ..data.packing import GraphCapacityError, IonPairBatch, PackedGraphs, round_up
from ..ops.gru import gated_update
from ..ops.message import bond_type_matrices, edge_messages_from_table, parity_edge_mask

__all__ = [
    "HaloGraphs",
    "HaloIonPairBatch",
    "partition_graphs_halo",
    "partition_halo_batch",
    "make_halo_ep_train_step",
    "halo_forward",
    "collective_stats",
]


@struct.dataclass
class HaloGraphs:
    """A packed batch partitioned for halo-exchange execution.

    Leading axis S = shards. Shard k owns node rows [k·Ns, (k+1)·Ns) of
    the original packed layout. ``b_src_ext`` indexes the extended node
    array ``concat([left_halo(H), own(Ns), right_halo(H)])``.
    """

    atom_ids: np.ndarray  # (S, Ns) int32
    node_graph: np.ndarray  # (S, Ns) int32 global graph slot
    node_mask: np.ndarray  # (S, Ns) bool
    i_bond: np.ndarray  # (S, Ei) int32
    i_src: np.ndarray  # (S, Ei) int32 local [0, Ns)
    i_dst: np.ndarray  # (S, Ei) int32 local [0, Ns), sorted per shard
    i_mask: np.ndarray  # (S, Ei) bool
    b_bond: np.ndarray  # (S, Eb) int32
    b_src_ext: np.ndarray  # (S, Eb) int32 in [0, Ns + 2·halo)
    b_dst: np.ndarray  # (S, Eb) int32 local, sorted per shard
    b_mask: np.ndarray  # (S, Eb) bool
    halo: int = struct.field(pytree_node=False)
    n_graphs: int = struct.field(pytree_node=False)
    n_shards: int = struct.field(pytree_node=False)


@struct.dataclass
class HaloIonPairBatch:
    cation: HaloGraphs
    anion: HaloGraphs
    temperature: np.ndarray  # (B, 1)
    y: np.ndarray  # (B,)
    sample_mask: np.ndarray  # (B,)


def _fill_sorted(
    idx: np.ndarray, cap: int, ns: int, cols: Dict[str, np.ndarray], ext_off: int = 0
) -> Dict[str, np.ndarray]:
    """Select edges ``idx`` into fixed-cap arrays, pad with spread masked
    self-loops, re-sort by dst (stable) to keep the sortedness contract."""
    n = len(idx)
    if n > cap:
        raise GraphCapacityError(f"halo partition: {n} edges > capacity {cap}")
    out = {k: np.zeros(cap, v.dtype) for k, v in cols.items()}
    for k, v in cols.items():
        out[k][:n] = v[idx]
    n_pad = cap - n
    if n_pad:
        spread = (np.arange(n_pad, dtype=np.int64) * ns // max(n_pad, 1)).astype(np.int32)
        out["dst"][n:] = spread
        out["src"][n:] = spread + ext_off
    order = np.argsort(out["dst"], kind="stable")
    return {k: v[order] for k, v in out.items()}


def partition_graphs_halo(
    g: PackedGraphs,
    n_shards: int,
    halo: int | None = None,
    interior_cap: int | None = None,
    boundary_cap: int | None = None,
    parity_mode: bool = False,
) -> HaloGraphs:
    """Repartition a packed batch for halo-exchange execution (host-side).

    ``halo`` defaults to the smallest multiple of 8 covering the worst
    source offset actually present (bounded by the largest molecule).
    ``interior_cap``/``boundary_cap`` are static per-shard capacities —
    pass dataset-wide values for shape-stable training; defaults fit this
    batch exactly (rounded up to 128/8).
    """
    N, E, S = g.node_capacity, g.edge_capacity, n_shards
    if N % S:
        raise ValueError(f"node capacity {N} not divisible by {S} shards")
    ns = N // S

    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    bond = np.asarray(g.bond_ids)
    mask = np.asarray(g.edge_mask)
    if parity_mode:
        node_local = np.asarray(g.node_local)
        mask = mask & (node_local[src] > 0) & (node_local[dst] > 0)

    shard = dst // ns
    off = src - shard * ns
    interior = (off >= 0) & (off < ns)

    # halo requirement from the edges actually present (real edges only —
    # pad edges are self-loops, always interior)
    left_need = np.where(~interior & mask, shard * ns - src, 0).max(initial=0)
    right_need = np.where(~interior & mask, src - ((shard + 1) * ns - 1), 0).max(initial=0)
    need = int(max(left_need, right_need, 0))
    if halo is None:
        halo = max(round_up(need, 8), 8)
    elif need > halo:
        raise GraphCapacityError(
            f"halo {halo} too small: a boundary edge reaches {need} rows past "
            f"its shard (largest straddling molecule)"
        )
    if halo > ns:
        raise GraphCapacityError(f"halo {halo} exceeds shard width {ns}")

    # drop masked-out non-interior pad edges into the interior group, as
    # harmless self-loops (their src may be arbitrary only for real edges)
    boundary = ~interior & mask

    counts_i = np.bincount(shard[interior | ~mask], minlength=S)
    counts_b = np.bincount(shard[boundary], minlength=S)
    ei = interior_cap or round_up(int(counts_i.max(initial=1)), 128)
    eb = boundary_cap or max(round_up(int(counts_b.max(initial=0)), 8), 8)

    fields_i = {k: np.zeros((S, ei), np.int32) for k in ("bond", "src", "dst")}
    fields_i["mask"] = np.zeros((S, ei), bool)
    fields_b = {k: np.zeros((S, eb), np.int32) for k in ("bond", "src", "dst")}
    fields_b["mask"] = np.zeros((S, eb), bool)

    for k in range(S):
        sel_i = np.nonzero((shard == k) & (interior | ~mask))[0]
        # pad edges that landed non-interior: remap to local self-loops
        cols = {
            "bond": np.where(mask[sel_i], bond[sel_i], 0).astype(np.int32),
            "src": np.where(
                mask[sel_i], src[sel_i] - k * ns, (dst[sel_i] - k * ns)
            ).astype(np.int32),
            "dst": (dst[sel_i] - k * ns).astype(np.int32),
            "mask": mask[sel_i],
        }
        packed_i = _fill_sorted(np.arange(len(sel_i)), ei, ns,
                                {kk: vv for kk, vv in cols.items()})
        for kk in fields_i:
            fields_i[kk][k] = packed_i[kk]

        sel_b = np.nonzero((shard == k) & boundary)[0]
        cols_b = {
            "bond": bond[sel_b].astype(np.int32),
            "src": (src[sel_b] - k * ns + halo).astype(np.int32),
            "dst": (dst[sel_b] - k * ns).astype(np.int32),
            "mask": mask[sel_b],
        }
        packed_b = _fill_sorted(np.arange(len(sel_b)), eb, ns, cols_b, ext_off=halo)
        for kk in fields_b:
            fields_b[kk][k] = packed_b[kk]

    return HaloGraphs(
        atom_ids=np.asarray(g.atom_ids).reshape(S, ns),
        node_graph=np.asarray(g.node_graph).reshape(S, ns),
        node_mask=np.asarray(g.node_mask).reshape(S, ns),
        i_bond=fields_i["bond"], i_src=fields_i["src"],
        i_dst=fields_i["dst"], i_mask=fields_i["mask"],
        b_bond=fields_b["bond"], b_src_ext=fields_b["src"],
        b_dst=fields_b["dst"], b_mask=fields_b["mask"],
        halo=int(halo), n_graphs=g.n_graphs, n_shards=S,
    )


def partition_halo_batch(
    batch: IonPairBatch,
    n_shards: int,
    parity_mode: bool = False,
    **kw,
) -> HaloIonPairBatch:
    return HaloIonPairBatch(
        cation=partition_graphs_halo(batch.cation, n_shards, parity_mode=parity_mode, **kw),
        anion=partition_graphs_halo(batch.anion, n_shards, parity_mode=parity_mode, **kw),
        temperature=np.asarray(batch.temperature),
        y=np.asarray(batch.y),
        sample_mask=np.asarray(batch.sample_mask),
    )


# ---------------------------------------------------------------------------
# Functional forward over halo-partitioned batches (flax param pytrees)
# ---------------------------------------------------------------------------


def _gru_params(p: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    return {
        "wz": p["dense_z"]["kernel"], "bz": p["dense_z"]["bias"],
        "wr": p["dense_r"]["kernel"], "br": p["dense_r"]["bias"],
        "wh": p["dense_h"]["kernel"], "bh": p["dense_h"]["bias"],
        "ln_scale": p["layernorm"]["scale"], "ln_bias": p["layernorm"]["bias"],
    }


def _dense(p: Dict[str, jnp.ndarray], x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32) + p["bias"]


def _sq(x):
    return x[0]


def _squeeze_graphs(g: HaloGraphs) -> HaloGraphs:
    """Strip the shard_map-sharded leading axis (size 1 inside the body)."""
    return g.replace(
        atom_ids=_sq(g.atom_ids), node_graph=_sq(g.node_graph),
        node_mask=_sq(g.node_mask),
        i_bond=_sq(g.i_bond), i_src=_sq(g.i_src), i_dst=_sq(g.i_dst),
        i_mask=_sq(g.i_mask),
        b_bond=_sq(g.b_bond), b_src_ext=_sq(g.b_src_ext), b_dst=_sq(g.b_dst),
        b_mask=_sq(g.b_mask),
    )


def _halo_encoder(
    enc: Dict[str, Any],
    atom_table: jnp.ndarray,
    bond_table: jnp.ndarray,
    g: HaloGraphs,  # squeezed: per-shard views
    cfg: ModelConfig,
    axis: str,
    n_shards: int,
) -> jnp.ndarray:
    H = g.halo
    ns = g.atom_ids.shape[0]
    h = jnp.take(atom_table, g.atom_ids, axis=0)  # (Ns, D)
    fwd = [(i, i + 1) for i in range(n_shards - 1)]  # k receives from k-1
    bwd = [(i + 1, i) for i in range(n_shards - 1)]  # k receives from k+1

    for step in range(cfg.num_steps):
        w = enc[f"bmm_{step}"]["bond_transform"]
        m_table = bond_type_matrices(bond_table, w)
        # kick off the halo exchange (left_halo = neighbor k-1's last H rows)
        left_halo = jax.lax.ppermute(h[ns - H:], axis, fwd)
        right_halo = jax.lax.ppermute(h[:H], axis, bwd)
        # interior work is independent of the permutes → overlappable
        msg_i = edge_messages_from_table(h, g.i_bond, g.i_src, m_table)
        msg_i = msg_i * g.i_mask[:, None].astype(msg_i.dtype)
        agg = jax.ops.segment_sum(msg_i, g.i_dst, num_segments=ns,
                                  indices_are_sorted=True)
        # boundary edges read the extended array once the halos land
        h_ext = jnp.concatenate([left_halo, h, right_halo], axis=0)
        msg_b = edge_messages_from_table(h_ext, g.b_bond, g.b_src_ext, m_table)
        msg_b = msg_b * g.b_mask[:, None].astype(msg_b.dtype)
        agg = agg + jax.ops.segment_sum(msg_b, g.b_dst, num_segments=ns,
                                        indices_are_sorted=True)
        h = gated_update(h, agg, _gru_params(enc[f"gru_{step}"]))

    weighted = h * g.node_mask[:, None].astype(h.dtype)
    pooled_local = jax.ops.segment_sum(weighted, g.node_graph,
                                       num_segments=g.n_graphs)
    pooled = jax.lax.psum(pooled_local, axis)  # (B, D): straddling molecules
    return jax.nn.relu(_dense(enc["fp_dense"], pooled))


def halo_forward(
    params: Dict[str, Any],
    cfg: ModelConfig,
    batch: HaloIonPairBatch,  # squeezed shard views
    axis: str,
    n_shards: int,
) -> jnp.ndarray:
    """Per-shard forward of the full dual-encoder model; returns (B,) pred
    (replicated — everything after the pooled psums is shard-invariant)."""
    trunk = params["trunk"]
    fp_cat = _halo_encoder(trunk["cat_encoder"], trunk["atom_embed"],
                           trunk["bond_embed"], batch.cation, cfg, axis, n_shards)
    fp_an = _halo_encoder(trunk["an_encoder"], trunk["atom_embed"],
                          trunk["bond_embed"], batch.anion, cfg, axis, n_shards)
    mixed = jax.nn.relu(_dense(trunk["cat_proj"], fp_cat)) + jax.nn.relu(
        _dense(trunk["an_proj"], fp_an)
    )
    if cfg.head == "vft":
        p = _dense(params["vft_head"]["visc_params"], mixed)
        a = p[:, 0:1]
        b = jnp.clip(jax.nn.softplus(p[:, 1:2]), *cfg.vft_b_clip)
        c = jnp.clip(jax.nn.softplus(p[:, 2:3]), *cfg.vft_c_clip)
        t = batch.temperature / cfg.t_scale
        return (a + b / (t + c + cfg.vft_eps))[:, 0]
    if cfg.head == "mlp":
        x = jax.nn.relu(_dense(params["head_dense"], mixed))
        return _dense(params["head_out"], x)[:, 0]
    raise ValueError(f"halo forward: unsupported head {cfg.head!r}")


_SHARDED_FIELDS = (
    "atom_ids", "node_graph", "node_mask",
    "i_bond", "i_src", "i_dst", "i_mask",
    "b_bond", "b_src_ext", "b_dst", "b_mask",
)


def _halo_batch_specs(batch: HaloIonPairBatch, axis: str):
    def spec_for(path, _leaf):
        names = [getattr(p, "name", "") for p in path]
        return P(axis) if names and names[-1] in _SHARDED_FIELDS else P()

    return jax.tree_util.tree_map_with_path(spec_for, batch)


def make_halo_ep_train_step(
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
):
    """Full halo-exchange edge-partitioned training step.

    Comm per message step per ion: two (halo, D) ppermutes — O(boundary),
    not the v1 design's O(N·D) psum. Parameter updates exactly match the
    single-device step (tested in tests/test_ep_train.py); comm volume is
    asserted from the compiled HLO (:func:`collective_stats`).
    """
    from ..training.loop import TrainState, _data_loss, _l2_penalty

    loss_kind, delta, l2 = train_cfg.loss, train_cfg.huber_delta, model_cfg.fp_l2
    n_shards = mesh.shape[axis]

    def per_device(state: TrainState, batch: HaloIonPairBatch):
        local = batch.replace(
            cation=_squeeze_graphs(batch.cation),
            anion=_squeeze_graphs(batch.anion),
        )
        rng, _ = jax.random.split(state.rng)

        def loss_fn(params):
            pred = halo_forward(params, model_cfg, local, axis, n_shards)
            data = _data_loss(pred, local.y, local.sample_mask, loss_kind, delta)
            return data + _l2_penalty(params, l2), data

        (loss, data), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # every sharded-path cotangent crossed exactly one forward psum
        # (the pooled readout), so psum(local)/S is the exact global grad
        # for sharded AND replicated paths alike (cf. edge_partition.py).
        grads = jax.tree.map(lambda gr: jax.lax.psum(gr / n_shards, axis), grads)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=new_params,
                          opt_state=new_opt, rng=rng),
            {"loss": loss, "data_loss": data},
        )

    def step(state, batch: HaloIonPairBatch):
        return shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), _halo_batch_specs(batch, axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )(state, batch)

    return jax.jit(step, donate_argnums=(0,))


def collective_stats(jitted_fn, *args) -> Dict[str, Any]:
    """Lower + compile, then tally collective ops and their operand bytes
    from the optimized HLO — the comm-volume evidence for the halo design."""
    import re

    compiled = jitted_fn.lower(*args).compile()
    text = compiled.as_text()
    stats: Dict[str, Any] = {"all-reduce": [], "collective-permute": [],
                             "all-gather": [], "all-to-all": [],
                             "reduce-scatter": []}
    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "f64": 8, "s8": 1, "pred": 1, "s64": 8, "u8": 1}
    for m in re.finditer(
        r"(\w[\w-]*) = \(?((?:\w+\[[\d,]*\][^)=]*?)+)\)? (all-reduce|collective-permute|all-gather|all-to-all|reduce-scatter)\(",
        text,
    ):
        shapes = re.findall(r"(\w+)\[([\d,]*)\]", m.group(2))
        total = 0
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * dtype_bytes.get(dt, 4)
        stats[m.group(3)].append(total)
    stats["total_bytes"] = sum(sum(v) for k, v in stats.items()
                               if isinstance(v, list))
    return stats
