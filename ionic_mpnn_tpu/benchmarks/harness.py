"""Throughput benchmark harness: message-edges/s on MPNN fwd+bwd.

North-star metric (BASELINE.json): edges/s/chip on the flagship viscosity
MPNN's full training step. One "message edge" = one directed edge
processed by one BondMatrixMessage step; a train step processes
``(E_cat + E_an) * num_steps`` of them, forward and backward.

``vs_baseline`` is the speedup over the *reference design* — the same
weights and math evaluated with dense padded per-molecule batching and
per-edge tensordot matrices (see :mod:`.dense_model`) on the same chip —
i.e. how much the packed-COO + bond-type-table TPU-native design buys.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TrainConfig, melting_point_config, viscosity_config
from ..data import build_vocab, encode_dataset, iter_batches, plan_capacities, smiles_to_graph
from ..data.packing import pad_dense_batch
from ..data.synthetic import ANION_SMILES, CATION_TEMPLATES
from ..models import MeltingPointModel, ViscosityModel
from ..training.loop import TrainState, make_train_step
from ..training.optim import make_optimizer
from .dense_model import dense_mp_forward, dense_viscosity_forward

__all__ = ["make_bench_dataset", "bench_packed_train_step",
           "bench_paired_epoch_step", "bench_dense_reference"]


def make_bench_dataset(n_records: int = 512, seed: int = 0):
    """Synthetic ionic-liquid id-records for benchmarking (in-memory)."""
    rng = np.random.default_rng(seed)
    cation_smiles = []
    for kind, fn in CATION_TEMPLATES:
        for n1 in (1, 2, 4, 6, 8):
            cation_smiles.append(fn(n1, 1) if kind == "im" else fn(n1))
    anion_smiles = [s for _, s, _ in ANION_SMILES]

    cation_graphs = [smiles_to_graph(s) for s in cation_smiles]
    anion_graphs = [smiles_to_graph(s) for s in anion_smiles]

    graph_records = []
    for i in range(n_records):
        graph_records.append(
            {
                "pair_id": f"B{i}",
                "cation_graph": cation_graphs[int(rng.integers(len(cation_graphs)))],
                "anion_graph": anion_graphs[int(rng.integers(len(anion_graphs)))],
                "T": float(rng.uniform(280, 360)),
                "log_eta": float(rng.normal(1.5, 0.5)),
            }
        )
    vocab = build_vocab([graph_records])
    records, report = encode_dataset(graph_records, vocab)
    assert not report.skipped
    return records, vocab


@dataclass
class BenchResult:
    edges_per_s: float
    steps_per_s: float
    molecules_per_s: float
    message_edges_per_step: int
    wall_s: float
    flops_per_step: float = 0.0  # analytic model (see .roofline)
    hbm_bytes_per_step: float = 0.0


def _count_message_edges(batch, num_steps: int) -> int:
    e = int(np.asarray(batch.cation.edge_mask).sum() + np.asarray(batch.anion.edge_mask).sum())
    return e * num_steps


def bench_packed_train_step(
    records,
    vocab,
    batch_size: int = 512,
    num_steps: int = 4,
    iters: int = 30,
    warmup: int = 5,
    compute_dtype: str = "float32",
    message_impl: str = "gather",
    inner: int = 1,
    model_kind: str = "viscosity",
    donate: bool = True,
    gru_impl: str = "reference",
    distinct_batches: bool = True,
    scatter_impl: str = "xla",
    edge_layout: str = "",
    onehot_select: str = "auto",  # resolve_onehot_select: vloop at real vocab sizes
    window: int = 0,  # onehot node window (0 = ONEHOT_WINDOW default)
    unroll: int = 1,  # lax.scan unroll of the inner step loop
    tight_tile: bool = False,  # re-plan edge_tile at the batches' true max
    tile_override: int = 0,  # force edge_tile (>= plan's is always safe)
    balanced: bool = False,  # LPT window balancing (window_aligned only)
    remat: bool = False,  # jax.checkpoint the message op (A/B knob)
    atom_dim: int = 0,  # 0 = family default (32); the D-scaling arm
    fp_size: int = 0,  # 0 = atom_dim when atom_dim overridden, else default
    mixing_size: int = 0,
) -> BenchResult:
    from ..data.packing import ONEHOT_WINDOW

    window = window or ONEHOT_WINDOW
    kw = dict(
        num_steps=num_steps, compute_dtype=compute_dtype,
        message_impl=message_impl, gru_impl=gru_impl,
        scatter_impl=scatter_impl, onehot_select=onehot_select,
        onehot_window=window, remat_message=remat,
    )
    if atom_dim:
        # large-dim scaling arm (VERDICT r4 item 3): the D=32 family uses
        # <=32 of the 128 MXU lanes; these overrides let the same harness
        # demonstrate saturation as the model grows
        kw.update(atom_dim=atom_dim, fp_size=fp_size or atom_dim,
                  mixing_size=mixing_size or max(20, atom_dim // 2))
    if model_kind == "mp":
        cfg = melting_point_config(vocab.atom_vocab_size, vocab.bond_vocab_size, **kw)
    else:
        cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, **kw)
    tcfg = TrainConfig()
    if not edge_layout:
        from ..config import edge_layout_for

        edge_layout = edge_layout_for(message_impl)
    plan = plan_capacities(records, batch_size=batch_size,
                           edge_layout=edge_layout, window=window,
                           balance=balanced)
    if tile_override and plan.edge_tile:
        # tile-scaling probe: does step time track edge SLOTS? (premise
        # check for window-balanced packing)
        import dataclasses

        plan = dataclasses.replace(plan, edge_tile=tile_override)
    if tight_tile and plan.edge_tile:
        # A/B probe for the tile-fill headroom: size the per-window edge
        # tile at the OBSERVED max over this bench's batches instead of
        # the proven worst-case bound (fill ~0.86 at bench shapes). Not a
        # production mode — a pathological batch would raise.
        import dataclasses

        # probe the EXACT batch sequence measured below (the unshuffled
        # warmup batch + the per-seed shuffles of the distinct-batch scan)
        probes = [next(iter_batches(records[:batch_size], plan))]
        if inner > 1 and distinct_batches:
            probes += [
                next(iter_batches(records[:batch_size], plan, shuffle=True,
                                  seed=s))
                for s in range(inner)
            ]
        worst = 0
        for b in probes:
            for g in (b.cation, b.anion):
                em = np.asarray(g.edge_mask).reshape(-1, plan.edge_tile)
                worst = max(worst, int(em.sum(axis=1).max()))
        from ..data.packing import round_up as _ru

        plan = dataclasses.replace(plan, edge_tile=_ru(max(worst, 8), 8))
    batch = next(iter_batches(records[:batch_size], plan))
    batch = jax.tree.map(jnp.asarray, batch)
    if inner > 1 and distinct_batches:
        # Scan over `inner` DIFFERENT packings (per-epoch reshuffles), like
        # real training does. Scanning one batch repeatedly lets XLA hoist
        # the batch-dependent gather/scatter index preprocessing out of the
        # loop and OVERSTATES throughput (measured: batch 4096 "ran" 2x the
        # work of 2048 in +6% time — impossible — with the same-batch scan).
        stacked = [
            next(iter_batches(records[:batch_size], plan, shuffle=True, seed=s))
            for s in range(inner)
        ]
        me_per_step = int(
            np.mean([_count_message_edges(b, num_steps) for b in stacked])
        )
        batches = jax.tree.map(lambda *xs: jnp.asarray(np.stack(xs)), *stacked)
    else:
        me_per_step = _count_message_edges(batch, num_steps)

    model = MeltingPointModel(cfg) if model_kind == "mp" else ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    state = TrainState(
        step=jnp.int32(0),
        params=variables["params"],
        batch_stats={},
        opt_state=optimizer.init(variables["params"]),
        rng=jax.random.PRNGKey(0),
    )

    # Fold `inner` train steps into one jitted lax.scan so host dispatch
    # (which can dominate through remote tunnels) amortizes away and the
    # measurement reflects device throughput. inner=1 keeps the plain step
    # (fastest to compile).
    inner_step = make_train_step(model, cfg, tcfg, optimizer, jit_compile=False)
    if inner == 1:
        def multi(state, batch):
            state, m = inner_step(state, batch)
            return state, m["loss"]
    elif distinct_batches:
        def multi(state, stacked):
            def body(s, b):
                s, m = inner_step(s, b)
                return s, m["loss"]
            state, losses = jax.lax.scan(body, state, stacked, unroll=unroll)
            return state, losses[-1]

        batch = batches
    else:
        def multi(state, batch):
            def body(s, _):
                s, m = inner_step(s, batch)
                return s, m["loss"]
            state, losses = jax.lax.scan(body, state, None, length=inner,
                                         unroll=unroll)
            return state, losses[-1]

    multi_fn = jax.jit(multi, donate_argnums=(0,) if donate else ())

    # Synchronize by FETCHING the final loss to the host, never by
    # jax.block_until_ready: on the axon relay backend block_until_ready
    # returns before execution completes (measured round 2: 0.4 ms
    # "block-synced" vs 2146 ms fetch-synced for the identical dispatch),
    # so only bytes-on-host proves the work ran. `last` is the loss of the
    # final dispatch and the TrainState threads through every dispatch, so
    # one fetch forces the entire chain.
    last = None
    for _ in range(warmup):
        state, last = multi_fn(state, batch)
    if last is not None:
        np.asarray(last)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, last = multi_fn(state, batch)
    np.asarray(last)
    dt = time.perf_counter() - t0

    total_steps = iters * inner
    me = me_per_step
    n_mol = batch_size * 2  # both ions
    from .roofline import train_step_cost

    # per-side costs: the anion side is sized independently (per-side caps)
    cost = {"flops": 0.0, "hbm_bytes": 0.0}
    for g in (batch.cation, batch.anion):
        c = train_step_cost(
            node_cap=g.node_capacity,
            edge_cap=g.edge_capacity,
            n_graphs=g.n_graphs,
            atom_dim=cfg.atom_dim,
            bond_dim=cfg.bond_dim,
            bond_vocab=vocab.bond_vocab_size,
            num_steps=num_steps,
            n_ions=1,
        )
        cost = {k: cost[k] + c[k] for k in cost}
    return BenchResult(
        edges_per_s=me * total_steps / dt,
        steps_per_s=total_steps / dt,
        molecules_per_s=n_mol * total_steps / dt,
        message_edges_per_step=me,
        wall_s=dt,
        flops_per_step=cost["flops"],
        hbm_bytes_per_step=cost["hbm_bytes"],
    )


def bench_paired_epoch_step(
    records,
    vocab,
    batch_size: int = 2048,
    num_steps: int = 4,
    iters: int = 20,
    warmup: int = 3,
    compute_dtype: str = "bfloat16",
    inner: int = 8,
    window: int = 64,
    atom_dim: int = 0,
) -> BenchResult:
    """The PRODUCTION train-step harness (round 5): the paired
    device-resident epoch scan — on-device pitch-slot paired packing
    (``ops.grid_pack.pack_side_paired``, reversed-B layout + shared
    lane-aligned edge budgets) + the full fwd/bwd/Adam step, exactly what
    ``fit()`` dispatches on accelerators. Differences vs
    :func:`bench_packed_train_step`: batches are packed ON DEVICE inside
    the scan (pack cost included, ~0.18 ms at batch 2048 — battery 41)
    and the layout is the paired plan the dataset statistics choose
    (denser than the host greedy packer: 1052 vs ~1235 cation windows at
    batch 2048).

    Requires enough ``records`` for ``inner`` distinct steps
    (``len(records) >= inner * batch_size`` recommended).
    """
    from ..training.device_epochs import (
        build_device_dataset,
        build_paired_perm,
        choose_paired_plan,
        make_paired_epoch_call,
    )

    kw = dict(num_steps=num_steps, compute_dtype=compute_dtype,
              message_impl="onehot", onehot_window=window)
    if atom_dim:
        kw.update(atom_dim=atom_dim, fp_size=atom_dim,
                  mixing_size=max(20, atom_dim // 2))
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, **kw)
    tcfg = TrainConfig(batch_size=batch_size)
    plan = plan_capacities(records, batch_size=batch_size,
                           edge_layout="window_aligned", window=window)
    ds = build_device_dataset(records, window, plan.target_key)
    pplan = choose_paired_plan(ds, batch_size)
    if pplan is None:  # stats reject pairing: fall back to the host harness
        return bench_packed_train_step(
            records, vocab, batch_size=batch_size, num_steps=num_steps,
            iters=iters, warmup=warmup, compute_dtype=compute_dtype,
            message_impl="onehot", inner=inner, window=window,
            atom_dim=atom_dim)
    R = pplan.regions
    rng = np.random.default_rng(0)
    order = np.concatenate([rng.permutation(ds.n) for _ in
                            range(-(-inner * 2 * R // max(ds.n, 1)) + 1)])
    perm = build_paired_perm(ds, order.astype(np.int32), pplan)[
        : inner * 2 * R]
    # honest work accounting: REAL message edges per step from the packed
    # records (mean over the `inner` distinct steps)
    ec, ea = ds.rec_cat_elen, ds.rec_an_elen
    real = perm[perm >= 0]
    me_per_step = int((ec[real].sum() + ea[real].sum()) * num_steps / inner)
    records_per_step = len(real) / inner

    model = ViscosityModel(cfg)
    first = next(iter_batches(records[:min(batch_size, len(records))], plan))
    variables = model.init(jax.random.PRNGKey(0), first)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    state = TrainState(
        step=jnp.int32(0), params=variables["params"], batch_stats={},
        opt_state=optimizer.init(variables["params"]),
        rng=jax.random.PRNGKey(0),
    )
    inner_step = make_train_step(model, cfg, tcfg, optimizer,
                                 jit_compile=False)
    call = make_paired_epoch_call(inner_step, ds, pplan, inner)
    ds_arrays = ds.arrays()
    perm_dev = jnp.asarray(perm)

    last = None
    for _ in range(warmup):
        state, last = call(state, ds_arrays, perm_dev, jnp.int32(0))
    jax.tree.map(np.asarray, last)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, last = call(state, ds_arrays, perm_dev, jnp.int32(0))
    jax.tree.map(np.asarray, last)
    dt = time.perf_counter() - t0

    total_steps = iters * inner
    from .roofline import train_step_cost

    cost = {"flops": 0.0, "hbm_bytes": 0.0}
    sides = (
        (R * pplan.region_c, R * (pplan.edge_budget_c or 2 * ds.cat_pool.em)),
        (R * pplan.region_a, R * (pplan.edge_budget_a or 2 * ds.an_pool.em)),
    )
    for node_cap, edge_cap in sides:
        c = train_step_cost(
            node_cap=node_cap, edge_cap=edge_cap, n_graphs=2 * R,
            atom_dim=cfg.atom_dim, bond_dim=cfg.bond_dim,
            bond_vocab=vocab.bond_vocab_size, num_steps=num_steps, n_ions=1,
        )
        cost = {k: cost[k] + c[k] for k in cost}
    return BenchResult(
        edges_per_s=me_per_step * total_steps / dt,
        steps_per_s=total_steps / dt,
        molecules_per_s=2 * records_per_step * total_steps / dt,
        message_edges_per_step=me_per_step,
        wall_s=dt,
        flops_per_step=cost["flops"],
        hbm_bytes_per_step=cost["hbm_bytes"],
    )


def bench_dense_reference(
    records,
    vocab,
    batch_size: int = 512,
    num_steps: int = 4,
    iters: int = 10,
    warmup: int = 3,
    model_kind: str = "viscosity",
) -> BenchResult:
    """Reference-design baseline: dense padded batching + per-edge tensordot."""
    if model_kind == "mp":
        cfg = melting_point_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                                   num_steps=num_steps)
    else:
        cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                               num_steps=num_steps)
    subset = records[:batch_size]
    max_atoms = max(
        max(r["cation"]["num_atoms"] for r in subset),
        max(r["anion"]["num_atoms"] for r in subset),
    )
    max_edges = max(
        max(len(r["cation"]["edge_indices"]) for r in subset),
        max(len(r["anion"]["edge_indices"]) for r in subset),
    )
    cat = pad_dense_batch([r["cation"] for r in subset], max_atoms, max_edges)
    an = pad_dense_batch([r["anion"] for r in subset], max_atoms, max_edges)
    dense_inputs = {
        "cat_atom": jnp.asarray(cat["atom"]), "cat_bond": jnp.asarray(cat["bond"]),
        "cat_conn": jnp.asarray(cat["conn"]),
        "an_atom": jnp.asarray(an["atom"]), "an_bond": jnp.asarray(an["bond"]),
        "an_conn": jnp.asarray(an["conn"]),
        "temperature": jnp.asarray(
            np.array([[r["T"]] for r in subset], np.float32)
        ),
    }
    y = jnp.asarray(np.array([r["log_eta"] for r in subset], np.float32))

    # identical weights to the packed model
    plan = plan_capacities(subset, batch_size=batch_size)
    packed_batch = next(iter_batches(subset, plan))
    model = MeltingPointModel(cfg) if model_kind == "mp" else ViscosityModel(cfg)
    params = model.init(jax.random.PRNGKey(0), packed_batch)["params"]
    dense_fwd = dense_mp_forward if model_kind == "mp" else dense_viscosity_forward

    # inputs/targets are jit ARGUMENTS, never closed over: on this backend
    # closed-over device arrays embed as HLO constants and execute their
    # gathers/matmuls ~100-1000x slower (CLAUDE.md) — closing over them
    # would UNDERSTATE the baseline and inflate vs_baseline.
    def loss_fn(p, inputs, targets):
        pred = dense_fwd(p, cfg, inputs)
        return jnp.mean((pred - targets) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))

    # Fetch-synced like bench_packed_train_step (block_until_ready lies on
    # this backend). The calls are independent (no state threads through),
    # so fetch EVERY iteration's loss after the loop — device execution is
    # FIFO, so the final wall clock is the honest total.
    for _ in range(warmup):
        loss, grads = grad_fn(params, dense_inputs, y)
    np.asarray(loss)
    t0 = time.perf_counter()
    losses = []
    for _ in range(iters):
        loss, grads = grad_fn(params, dense_inputs, y)
        losses.append(loss)
    for l in losses:
        np.asarray(l)
    dt = time.perf_counter() - t0

    # count REAL message edges (the useful work) — the dense design also
    # grinds through padding, which is exactly why it loses.
    real_edges = sum(
        2 * len(r[side]["edge_indices"]) for r in subset for side in ("cation", "anion")
    )
    me = real_edges * num_steps
    return BenchResult(
        edges_per_s=me * iters / dt,
        steps_per_s=iters / dt,
        molecules_per_s=2 * batch_size * iters / dt,
        message_edges_per_step=me,
        wall_s=dt,
    )
