"""Aligned edge partitioning (EP v3) — multi-chip scaling for the
PRODUCTION message path (onehot + window_aligned).

The halo-exchange tier (:mod:`.halo_partition`) scales the gather message
formulation — correct, but ~16× slower per chip than the all-MXU onehot
path on the measured backend (RESULTS.md battery 9). This module scales
the onehot path itself, exploiting a property the aligned packer already
guarantees (``data/packing.py::pack_graphs(node_align=window)``): **no
molecule straddles a window boundary**. Cut node ownership at window
multiples and shard boundaries are a subset of window boundaries, so:

  * **zero cross-shard edges** — every edge's src and dst share a window,
    hence a shard. The partition is a PURE RESHAPE: node arrays fold to
    ``(S, Ns)``, the window-tiled edge arrays fold to ``(S, Es)`` along
    whole window groups (``window_tile_edges`` puts window ``w``'s edges
    in slots ``[w·T, (w+1)·T)``), and src/dst just shift to shard-local
    indices,
  * **zero per-message-step communication** — each shard runs the
    UNMODIFIED halo-free onehot math (``ops/message.py::
    message_pass_aggregate_onehot(halo=False)``) on its own windows; the
    per-shard aggregate is complete because no message leaves a shard,
  * **one (B, D) psum per ion per forward** — the per-graph sum pool: a
    shard pools only its own node rows into the global graph slots, and
    the psum (inserted by ``IonEncoder`` when ``cfg.ep_axis`` is set with
    ``message_impl="onehot"``) completes the readout. Everything after is
    replicated,
  * **gradient exactness** — the standard argument (cf.
    ``edge_partition.py``): every sharded-path cotangent crosses exactly
    one forward psum, every replicated path computes the true gradient on
    each shard, so ``psum(local_grads)/S`` is exact for both
    (verified vs the single-device step in tests/test_ep_train.py).

When to use which EP tier:

  * molecules ≤ window atoms (every real ionic-liquid ion — the packer
    enforces it): THIS tier. Fast math, O(B·D) comm per forward.
  * molecules > window atoms (no aligned layout possible): the halo tier,
    which pays ppermute halos + the gather math but has no size limit.

Parameter pytrees are the flax models' own — states, checkpoints, and
tests interchange with every other tier.

Reference scope: the reference has no parallelism at all (SURVEY §2.3);
this is the TPU-native SP/CP analogue (SURVEY §5.7, §7 step 7) composed
with the production message formulation.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ModelConfig, TrainConfig
from ..data.packing import GraphCapacityError, IonPairBatch, PackedGraphs

__all__ = [
    "shard_graphs_aligned",
    "shard_aligned_batch",
    "stack_aligned_dp_batches",
    "make_aligned_ep_train_step",
]

_GRAPH_FIELDS = (
    "atom_ids", "bond_ids", "src", "dst",
    "node_graph", "node_local", "node_mask", "edge_mask",
)


def shard_graphs_aligned(
    g: PackedGraphs, n_shards: int, window: int = 128
) -> PackedGraphs:
    """Fold a window_aligned packed batch into per-shard views (host-side).

    Node arrays become ``(S, Ns)``, edge arrays ``(S, Es)`` with src/dst
    localized to ``[0, Ns)``. ``node_graph`` keeps GLOBAL graph slot ids
    (the pooled psum needs them); ``edge_layout`` stays
    ``"window_aligned"`` so the model picks the halo-free onehot path.
    """
    if g.edge_layout != "window_aligned":
        raise GraphCapacityError(
            f"aligned EP needs edge_layout='window_aligned' "
            f"(got {g.edge_layout!r}) — pack with "
            f"BatchPlan(edge_layout='window_aligned')"
        )
    N, E = g.node_capacity, g.edge_capacity
    if N % (n_shards * window):
        raise GraphCapacityError(
            f"node capacity {N} not divisible by n_shards·window = "
            f"{n_shards}·{window} — plan with node_shards={n_shards}"
        )
    ns = N // n_shards
    if E % n_shards:  # unreachable given N % (S·window) == 0 (E = nw·T)
        raise GraphCapacityError(f"edge capacity {E} not divisible by {n_shards}")
    es = E // n_shards

    src = np.asarray(g.src)
    dst = np.asarray(g.dst)
    mask = np.asarray(g.edge_mask)
    # Belt and braces: the aligned-layout contract (no molecule straddles
    # a window ⇒ no edge crosses a shard cut at window multiples) is
    # re-verified here rather than trusted.
    if mask.any():
        real = np.flatnonzero(mask)
        if np.any(src[real] // ns != dst[real] // ns):
            raise GraphCapacityError(
                "edge crosses a shard boundary — batch violates the "
                "window_aligned contract"
            )

    offs = (np.arange(n_shards, dtype=np.int32) * ns)[:, None]
    return g.replace(
        atom_ids=np.asarray(g.atom_ids).reshape(n_shards, ns),
        node_graph=np.asarray(g.node_graph).reshape(n_shards, ns),
        node_local=np.asarray(g.node_local).reshape(n_shards, ns),
        node_mask=np.asarray(g.node_mask).reshape(n_shards, ns),
        bond_ids=np.asarray(g.bond_ids).reshape(n_shards, es),
        src=src.reshape(n_shards, es) - offs,
        dst=dst.reshape(n_shards, es) - offs,
        edge_mask=mask.reshape(n_shards, es),
        # windowed-readout addressing is whole-batch; per shard it is
        # meaningless (and the EP encoder pools via segment-sum + psum)
        pool_slot=None,
    )


def shard_aligned_batch(
    batch: IonPairBatch, n_shards: int, window: int = 128
) -> IonPairBatch:
    """Per-shard views of both ions; labels/temperature stay replicated."""
    return batch.replace(
        cation=shard_graphs_aligned(batch.cation, n_shards, window),
        anion=shard_graphs_aligned(batch.anion, n_shards, window),
    )


def stack_aligned_dp_batches(
    batches, n_shards: int, window: int = 128
) -> IonPairBatch:
    """Stack per-DP-group aligned-sharded batches: graph leaves become
    ``(n_dp, S, ...)``, batch-level leaves ``(n_dp, ...)`` — the input of
    the DP×EP composed step (``make_aligned_ep_train_step(dp_axis=...)``)."""
    sharded = [shard_aligned_batch(b, n_shards, window) for b in batches]
    return jax.tree.map(lambda *xs: np.stack(xs, axis=0), *sharded)


def _squeeze_graphs(g: PackedGraphs, ndim: int = 1) -> PackedGraphs:
    """Strip the shard_map-sharded leading axes (size 1 inside the body)."""

    def sq(x):
        for _ in range(ndim):
            x = x[0]
        return x

    return g.replace(**{f: sq(getattr(g, f)) for f in _GRAPH_FIELDS})


def _batch_specs(batch: IonPairBatch, axis: str, dp_axis: str | None) -> IonPairBatch:
    def spec_for(path, _leaf):
        names = [getattr(p, "name", "") for p in path]
        graph = names and names[-1] in _GRAPH_FIELDS
        if dp_axis is None:
            return P(axis) if graph else P()
        return P(dp_axis, axis) if graph else P(dp_axis)

    return jax.tree_util.tree_map_with_path(spec_for, batch)


def make_aligned_ep_train_step(
    model,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "data",
    dp_axis: str | None = None,
):
    """Full aligned-EP training step over the production onehot path.

    Per-forward communication: one (B, D) psum per ion (pooled readout)
    + the loss/grad psums — NOTHING per message step and nothing
    node-axis-sized (asserted from compiled HLO in tests/test_ep_train.py).
    Input batches come from :func:`shard_aligned_batch`.

    ``dp_axis`` composes DP×EP on a 2-D mesh ``(dp_axis, axis)``: each DP
    group holds one aligned-sharded batch (input from
    :func:`stack_aligned_dp_batches`), the loss is sample-weighted across
    groups exactly like the plain DP step, and gradients all-reduce over
    both axes (``psum_ep(local)/S`` for EP exactness, then ``psum_dp``
    of the already-globally-weighted per-group gradients).
    """
    assert model_cfg.ep_axis == axis, (
        f"ModelConfig.ep_axis={model_cfg.ep_axis!r} must equal mesh axis {axis!r}"
    )
    assert model_cfg.message_impl == "onehot", (
        "aligned EP is the onehot tier; use make_ep_train_step / "
        "make_halo_ep_train_step for gather-family impls"
    )
    from ..training.loop import TrainState, _data_loss, _l2_penalty

    loss_kind, delta, l2 = train_cfg.loss, train_cfg.huber_delta, model_cfg.fp_l2
    n_shards = mesh.shape[axis]
    n_dp = mesh.shape[dp_axis] if dp_axis is not None else 1
    lead = 2 if dp_axis is not None else 1

    def per_device(state: TrainState, batch: IonPairBatch):
        local = batch.replace(
            cation=_squeeze_graphs(batch.cation, lead),
            anion=_squeeze_graphs(batch.anion, lead),
            temperature=batch.temperature[0] if dp_axis else batch.temperature,
            y=batch.y[0] if dp_axis else batch.y,
            sample_mask=batch.sample_mask[0] if dp_axis else batch.sample_mask,
        )
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            out = model.apply({"params": params}, local, deterministic=False,
                              rngs={"dropout": dropout_rng})
            # pred is replicated WITHIN an EP group (everything after the
            # pooled psums is shard-invariant), so each group's data term
            # is its true loss.
            if dp_axis is None:
                data = _data_loss(out["pred"], local.y, local.sample_mask,
                                  loss_kind, delta)
                return data + _l2_penalty(params, l2), data
            # DP weighting (cf. data_parallel.py): local weighted sum /
            # global sample count, L2 added once globally after the psum.
            local_sum = _data_loss(out["pred"], local.y, local.sample_mask,
                                   loss_kind, delta) * jnp.sum(local.sample_mask)
            global_n = jax.lax.psum(jnp.sum(local.sample_mask), dp_axis)
            data = local_sum / jnp.maximum(global_n, 1.0)
            return data + _l2_penalty(params, l2) / n_dp, data

        (loss, data), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        # EP exactness: psum(local)/S — sharded-path cotangents crossed
        # exactly one forward psum (the pooled readout), replicated paths
        # computed the true per-group gradient on every shard.
        grads = jax.tree.map(lambda gr: jax.lax.psum(gr / n_shards, axis), grads)
        if dp_axis is not None:
            # per-group gradients are already globally sample-weighted —
            # the DP all-reduce just sums them (and recovers the full L2).
            grads = jax.tree.map(lambda gr: jax.lax.psum(gr, dp_axis), grads)
            loss = jax.lax.psum(loss, dp_axis)
            data = jax.lax.psum(data, dp_axis)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=new_params,
                          opt_state=new_opt, rng=rng),
            {"loss": loss, "data_loss": data},
        )

    def step(state: TrainState, batch: IonPairBatch):
        return shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), _batch_specs(batch, axis, dp_axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )(state, batch)

    return jax.jit(step, donate_argnums=(0,))
