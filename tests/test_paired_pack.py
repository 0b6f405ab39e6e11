"""Pitch-slot paired device packing (round 5, battery 40's fix).

``pack_side_paired`` places TWO molecules per pitch region (A ascending,
B reversed/right-aligned) so the device-epoch node plane halves; these
tests pin exact structural parity with the pools, windowed-readout
addressing, the perm builder's invariants, and train-step equality vs the
host-packed path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.ops.grid_pack import pack_side_paired
from ionic_mpnn_tpu.ops.segment import graph_sum_pool, graph_sum_pool_windowed
from ionic_mpnn_tpu.training.device_epochs import (
    PairedPlan,
    build_device_dataset,
    build_paired_perm,
    choose_paired_plan,
    make_paired_epoch_call,
)
from ionic_mpnn_tpu.training.loop import TrainState, make_train_step
from ionic_mpnn_tpu.training.optim import make_optimizer

WINDOW = 64


def _setup(encoded_viscosity, n=16, batch=8):
    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"][:n]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, message_impl="onehot",
                           onehot_window=WINDOW)
    model = ViscosityModel(cfg)
    plan = plan_capacities(records, batch_size=batch,
                           edge_layout="window_aligned", window=WINDOW)
    params = model.init(jax.random.PRNGKey(0),
                        next(iter_batches(records, plan)))
    return records, cfg, model, plan, params


def _pool_graph(pool, row):
    """Host view of pool molecule ``row``: (atoms, edges, bonds)."""
    a0 = int(np.asarray(pool.a_start)[row])
    al = int(np.asarray(pool.a_len)[row])
    e0 = int(np.asarray(pool.e_start)[row])
    el = int(np.asarray(pool.e_len)[row])
    atoms = np.asarray(pool.atoms)[a0:a0 + al]
    edges = np.asarray(pool.edges)[e0:e0 + el]
    bonds = np.asarray(pool.bonds)[e0:e0 + el]
    return atoms, edges, bonds


def _edge_multiset(edges, bonds):
    return sorted((int(s), int(d), int(b))
                  for (s, d), b in zip(edges, bonds))


def test_pack_side_paired_structural_exactness(encoded_viscosity):
    """Every graph in a paired pack reconstructs its pool molecule
    exactly: atoms in original local order, the full edge multiset with
    bond ids (B's endpoints un-reflected), masks and graph ids."""
    records, cfg, model, plan, params = _setup(encoded_viscosity, n=32)
    ds = build_device_dataset(records, WINDOW, plan.target_key)

    for pool, S in ((ds.cat_pool, ds.cat_pool.pitch),
                    (ds.an_pool, 2 * ds.an_pool.pitch)):
        M = int(np.asarray(pool.a_len).shape[0])
        rng = np.random.default_rng(1)
        R = 8
        a_len = np.asarray(pool.a_len)
        # choose pairs that FIT in S; unfittable B slots -> sentinel
        sel_a = rng.integers(0, M, R).astype(np.int32)
        sel_b = np.empty(R, np.int32)
        for i in range(R):
            fits = np.where(a_len + a_len[sel_a[i]] <= S)[0]
            sel_b[i] = rng.choice(fits) if len(fits) else -1
        sel_b[R - 1] = -1  # always exercise a single-occupancy region

        g = pack_side_paired(pool, jnp.asarray(sel_a), jnp.asarray(sel_b),
                             WINDOW, S)
        atom_ids = np.asarray(g.atom_ids)
        node_graph = np.asarray(g.node_graph)
        node_local = np.asarray(g.node_local)
        node_mask = np.asarray(g.node_mask)
        src, dst = np.asarray(g.src), np.asarray(g.dst)
        bond_ids = np.asarray(g.bond_ids)
        edge_mask = np.asarray(g.edge_mask)
        assert g.n_graphs == 2 * R
        assert g.node_capacity == R * S
        assert g.node_capacity % WINDOW == 0

        for r in range(R):
            for p, sel in ((0, sel_a[r]), (1, sel_b[r])):
                gid = 2 * r + p
                rows = np.where((node_graph == gid) & node_mask)[0]
                if sel < 0:
                    assert len(rows) == 0
                    continue
                atoms, edges, bonds = _pool_graph(pool, int(sel))
                # atoms: reorder device rows by ORIGINAL local index
                order = np.argsort(node_local[rows])
                np.testing.assert_array_equal(
                    atom_ids[rows][order] - 1, atoms)
                # every row lives inside region r (and its window)
                assert rows.min() >= r * S and rows.max() < (r + 1) * S
                # edges of this graph: slots [gid*em, (gid+1)*em)
                em = pool.em
                sl = slice(gid * em, (gid + 1) * em)
                real = edge_mask[sl]
                base = r * S
                if p == 0:
                    e_src = src[sl][real] - base
                    e_dst = dst[sl][real] - base
                else:
                    e_src = (S - 1) - (src[sl][real] - base)
                    e_dst = (S - 1) - (dst[sl][real] - base)
                got = _edge_multiset(np.stack([e_src, e_dst], 1),
                                     bond_ids[sl][real] - 1)
                want = _edge_multiset(edges, bonds)
                assert got == want

        # ids non-decreasing (sorted-readout contract)
        assert (np.diff(node_graph) >= 0).all()
        # windowed readout == plain segment-sum readout
        h = jnp.asarray(
            np.random.default_rng(2).normal(
                size=(g.node_capacity, 8)).astype(np.float32))
        want = graph_sum_pool(h, jnp.asarray(node_graph), g.n_graphs,
                              jnp.asarray(node_mask), node_sorted=True)
        got = graph_sum_pool_windowed(
            h, jnp.asarray(node_graph), jnp.asarray(node_mask),
            g.pool_slot, WINDOW, g.n_graphs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        # empty slots: pool_slot sentinel
        slots = np.asarray(g.pool_slot)
        for r in range(R):
            assert (slots[2 * r + 1] == -1) == (sel_b[r] < 0)


def test_pack_side_paired_edge_budget_exactness(encoded_viscosity):
    """Shared-edge-budget layout (battery 41's tile-alignment fix): A's
    edges front, B's reversed at the region tail — every graph still
    reconstructs its pool molecule's exact edge multiset."""
    records, cfg, model, plan, params = _setup(encoded_viscosity, n=32)
    ds = build_device_dataset(records, WINDOW, plan.target_key)

    for pool, S in ((ds.cat_pool, ds.cat_pool.pitch),
                    (ds.an_pool, 2 * ds.an_pool.pitch)):
        em = pool.em
        Eb = max(-(-em // 8) * 8, em + 8)  # budget a bit above em
        M = int(np.asarray(pool.a_len).shape[0])
        rng = np.random.default_rng(3)
        R = 8
        a_len = np.asarray(pool.a_len)
        e_len = np.asarray(pool.e_len)
        sel_a = rng.integers(0, M, R).astype(np.int32)
        sel_b = np.empty(R, np.int32)
        for i in range(R):
            fits = np.where((a_len + a_len[sel_a[i]] <= S)
                            & (e_len + e_len[sel_a[i]] <= Eb))[0]
            sel_b[i] = rng.choice(fits) if len(fits) else -1
        sel_b[R - 1] = -1

        g = pack_side_paired(pool, jnp.asarray(sel_a), jnp.asarray(sel_b),
                             WINDOW, S, edge_budget=Eb)
        assert g.edge_capacity == R * Eb
        assert g.edge_capacity % (g.node_capacity // WINDOW) == 0
        src, dst = np.asarray(g.src), np.asarray(g.dst)
        bond_ids = np.asarray(g.bond_ids)
        edge_mask = np.asarray(g.edge_mask)

        for r in range(R):
            base = r * S
            t = np.arange(Eb)
            for p, sel in ((0, sel_a[r]), (1, sel_b[r])):
                if sel < 0:
                    continue
                atoms, edges, bonds = _pool_graph(pool, int(sel))
                ne = len(edges)
                if p == 0:
                    pos = r * Eb + t[:ne]
                    e_src = src[pos] - base
                    e_dst = dst[pos] - base
                else:
                    pos = r * Eb + t[Eb - ne:]
                    e_src = (S - 1) - (src[pos] - base)
                    e_dst = (S - 1) - (dst[pos] - base)
                assert edge_mask[pos].all()
                got = _edge_multiset(np.stack([e_src, e_dst], 1),
                                     bond_ids[pos] - 1)
                assert got == _edge_multiset(edges, bonds)
            # slots between the two molecules' edges are masked
            ea = int(e_len[sel_a[r]]) if sel_a[r] >= 0 else 0
            eb = int(e_len[sel_b[r]]) if sel_b[r] >= 0 else 0
            gap = edge_mask[r * Eb + ea: r * Eb + Eb - eb]
            assert not gap.any()


def test_paired_perm_edge_budget_constraints(encoded_viscosity):
    """With shared edge budgets, build_paired_perm must respect the
    edge-sum constraints on both sides (and still cover every record)."""
    records, cfg, model, plan, params = _setup(encoded_viscosity, n=200)
    ds = build_device_dataset(records, WINDOW, plan.target_key)
    pplan = choose_paired_plan(ds, batch_size=64)
    assert pplan is not None
    assert pplan.edge_budget_c >= ds.cat_pool.em
    assert pplan.edge_budget_a >= ds.an_pool.em
    perm = build_paired_perm(
        ds, np.random.default_rng(0).permutation(ds.n).astype(np.int32),
        pplan)
    real = perm[perm >= 0]
    assert sorted(real.tolist()) == list(range(ds.n))
    a, b = perm[0::2], perm[1::2]
    ec, ea = ds.rec_cat_elen, ds.rec_an_elen
    paired = b >= 0
    if pplan.edge_budget_c:
        assert (ec[a[paired]] + ec[b[paired]] <= pplan.edge_budget_c).all()
    if pplan.edge_budget_a:
        assert (ea[a[paired]] + ea[b[paired]] <= pplan.edge_budget_a).all()


def test_paired_perm_invariants(encoded_viscosity):
    """build_paired_perm: every record exactly once, both-side fit
    constraints hold, singles ride in slot A."""
    records, cfg, model, plan, params = _setup(encoded_viscosity, n=200)
    ds = build_device_dataset(records, WINDOW, plan.target_key)
    pplan = choose_paired_plan(ds, batch_size=64)
    assert pplan is not None
    perm = build_paired_perm(
        ds, np.random.default_rng(0).permutation(ds.n).astype(np.int32),
        pplan)
    assert len(perm) % (2 * pplan.regions) == 0
    real = perm[perm >= 0]
    assert sorted(real.tolist()) == list(range(ds.n))
    a, b = perm[0::2], perm[1::2]
    ca, an = ds.rec_cat_len, ds.rec_an_len
    for i in range(len(a)):
        if b[i] >= 0:
            assert a[i] >= 0, "single in B slot (A must hold singles)"
            assert ca[a[i]] + ca[b[i]] <= pplan.region_c
            assert an[a[i]] + an[b[i]] <= pplan.region_a


def test_paired_perm_overflow_and_tight_regions(encoded_viscosity):
    """A deliberately tight cation region forces singles + chunk overflow;
    coverage and constraints must still hold."""
    records, cfg, model, plan, params = _setup(encoded_viscosity, n=150)
    ds = build_device_dataset(records, WINDOW, plan.target_key)
    ca = ds.rec_cat_len
    # tight: only the smallest pairs fit (~median + min)
    S_c = int(np.percentile(ca, 50) + ca.min() + 1)
    S_c = max(S_c, int(ds.cat_pool.pitch))  # must hold one molecule
    pplan = PairedPlan(region_c=S_c, region_a=2 * ds.an_pool.pitch,
                       regions=16, pair_frac=0.3)
    perm = build_paired_perm(
        ds, np.random.default_rng(1).permutation(ds.n).astype(np.int32),
        pplan)
    real = perm[perm >= 0]
    assert sorted(real.tolist()) == list(range(ds.n))
    a, b = perm[0::2], perm[1::2]
    paired = b >= 0
    assert (a[paired] >= 0).all()
    assert (ca[a[paired]] + ca[b[paired]] <= S_c).all()


def test_paired_step_matches_host_step(encoded_viscosity):
    """One paired device step == the host-packed step over the same
    records (same masked-mean loss and updated params, allclose)."""
    records, cfg, model, plan, params = _setup(encoded_viscosity, n=16,
                                               batch=16)
    tcfg = TrainConfig(batch_size=16, steps_per_call=1, seed=3)
    opt = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    ds = build_device_dataset(records, WINDOW, plan.target_key)
    pplan = choose_paired_plan(ds, batch_size=16)
    assert pplan is not None

    perm = build_paired_perm(
        ds, np.arange(ds.n, dtype=np.int32), pplan)
    step0 = perm[:2 * pplan.regions]
    step0_records = [records[i] for i in step0 if i >= 0]
    assert len(step0_records) > 0

    def fresh_state():
        return TrainState(
            step=jnp.int32(0),
            params=jax.tree.map(jnp.array, params["params"]),
            batch_stats={}, opt_state=opt.init(params["params"]),
            rng=jax.random.PRNGKey(7),
        )

    inner = make_train_step(model, cfg, tcfg, opt, jit_compile=False)
    call = make_paired_epoch_call(inner, ds, pplan, steps_per_call=1)
    dev_state, dev_m = call(fresh_state(), ds.arrays(),
                            jnp.asarray(step0), jnp.int32(0))
    assert float(dev_m["n"]) == len(step0_records)

    host_plan = plan_capacities(step0_records, batch_size=len(step0_records),
                                edge_layout="window_aligned", window=WINDOW,
                                target_key=plan.target_key)
    host_batch = next(iter_batches(step0_records, host_plan, shuffle=False))
    host_step = make_train_step(model, cfg, tcfg, opt)
    host_state, host_m = host_step(fresh_state(), host_batch)

    np.testing.assert_allclose(
        float(dev_m["loss_sum"] / dev_m["n"]), float(host_m["loss"]),
        rtol=2e-5, atol=1e-6)
    for d, h in zip(jax.tree.leaves(dev_state.params),
                    jax.tree.leaves(host_state.params)):
        np.testing.assert_allclose(np.asarray(d), np.asarray(h),
                                   rtol=5e-4, atol=5e-6)


def test_paired_all_sentinel_step_is_noop(encoded_viscosity):
    """All-sentinel scan slots must not touch the state (same cond guard
    as the unpaired path — RESULTS round 4)."""
    records, cfg, model, plan, params = _setup(encoded_viscosity, n=8,
                                               batch=8)
    tcfg = TrainConfig(batch_size=8, steps_per_call=1, seed=3)
    opt = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    ds = build_device_dataset(records, WINDOW, plan.target_key)
    pplan = choose_paired_plan(ds, batch_size=8)
    assert pplan is not None
    inner = make_train_step(model, cfg, tcfg, opt, jit_compile=False)

    def fresh():
        return TrainState(
            step=jnp.int32(0),
            params=jax.tree.map(jnp.array, params["params"]),
            batch_stats={}, opt_state=opt.init(params["params"]),
            rng=jax.random.PRNGKey(7))

    perm = build_paired_perm(ds, np.arange(ds.n, dtype=np.int32), pplan)
    real_steps = len(perm) // (2 * pplan.regions)

    call2 = make_paired_epoch_call(inner, ds, pplan,
                                   steps_per_call=real_steps + 1)
    perm2 = np.concatenate([perm, np.full(2 * pplan.regions, -1, np.int32)])
    s2, m2 = call2(fresh(), ds.arrays(), jnp.asarray(perm2), jnp.int32(0))

    call1 = make_paired_epoch_call(inner, ds, pplan,
                                   steps_per_call=real_steps)
    s1, m1 = call1(fresh(), ds.arrays(), jnp.asarray(perm), jnp.int32(0))
    assert float(m2["n"]) == float(m1["n"]) == float(ds.n)
    for a, b in zip(jax.tree.leaves(s2.params), jax.tree.leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fit_paired_epochs_learns(encoded_viscosity):
    """fit(device_epochs=True, paired_epochs=True) takes the paired path
    and trains (loss decreases)."""
    from ionic_mpnn_tpu.training.loop import fit

    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, message_impl="onehot",
                           onehot_window=WINDOW)
    plan = plan_capacities(records, batch_size=8,
                           edge_layout="window_aligned", window=WINDOW)
    tcfg = TrainConfig(epochs=8, batch_size=8, steps_per_call=2,
                       early_stopping_patience=100, seed=0,
                       device_epochs=True, paired_epochs=True)
    result = fit(ViscosityModel(cfg), cfg, tcfg, records[:24], records[24:32],
                 plan, verbose=False)
    assert len(result.history["loss"]) == 8
    assert result.history["loss"][-1] < result.history["loss"][0]
    assert np.isfinite(result.best_val_loss)


def test_fit_unpaired_fallback(encoded_viscosity):
    """paired_epochs=False keeps the single-occupancy device-epoch path."""
    from ionic_mpnn_tpu.training.loop import fit

    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, message_impl="onehot",
                           onehot_window=WINDOW)
    plan = plan_capacities(records, batch_size=8,
                           edge_layout="window_aligned", window=WINDOW)
    tcfg = TrainConfig(epochs=4, batch_size=8, steps_per_call=2,
                       early_stopping_patience=100, seed=0,
                       device_epochs=True, paired_epochs=False)
    result = fit(ViscosityModel(cfg), cfg, tcfg, records[:24], records[24:32],
                 plan, verbose=False)
    assert len(result.history["loss"]) == 4
    assert np.isfinite(result.best_val_loss)

@pytest.mark.multidevice
def test_dp_paired_epoch_matches_single_device(encoded_viscosity):
    """DP paired device-epoch call on the 8-device mesh == the
    single-device paired call over the same slot perm (grad psum
    exactness on paired batches)."""
    from jax.sharding import Mesh

    from ionic_mpnn_tpu.training.device_epochs import (
        make_dp_device_epoch_call,
    )

    n_dev = 4
    records, cfg, model, plan, params = _setup(encoded_viscosity, n=64,
                                               batch=8)
    tcfg = TrainConfig(batch_size=8, steps_per_call=1, seed=3)
    opt = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    ds = build_device_dataset(records, WINDOW, plan.target_key)
    pplan = choose_paired_plan(ds, batch_size=8)
    assert pplan is not None
    perm = build_paired_perm(ds, np.arange(ds.n, dtype=np.int32), pplan)
    GB = n_dev * 2 * pplan.regions
    pad = (-len(perm)) % GB
    perm = np.concatenate([perm, np.full(pad, -1, np.int32)])

    def fresh_state():
        return TrainState(
            step=jnp.int32(0),
            params=jax.tree.map(jnp.array, params["params"]),
            batch_stats={}, opt_state=opt.init(params["params"]),
            rng=jax.random.PRNGKey(7),
        )

    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    dp_call = make_dp_device_epoch_call(model, cfg, tcfg, opt, mesh, ds,
                                        batch_size=8, steps_per_call=1,
                                        paired_plan=pplan)
    dp_state, dp_m = dp_call(fresh_state(), ds.arrays(),
                             jnp.asarray(perm), jnp.int32(0))
    assert float(dp_m["n"]) == float((perm[:GB] >= 0).sum())
    loss = float(dp_m["loss_sum"] / dp_m["n"])
    assert np.isfinite(loss)
    for leaf in jax.tree.leaves(dp_state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))
