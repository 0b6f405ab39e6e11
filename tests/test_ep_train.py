"""Edge-partitioned FULL training step: exactness vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.config import MeshConfig, TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.parallel import make_mesh
from ionic_mpnn_tpu.parallel.edge_partition import (
    make_ep_train_step,
    partition_batch_edges,
)
from ionic_mpnn_tpu.training.loop import TrainState, make_train_step
from ionic_mpnn_tpu.training.optim import make_optimizer

pytestmark = pytest.mark.multidevice


def _setup(encoded_viscosity, n_dev):
    records = encoded_viscosity["viscosity"][:24]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=24, edge_multiple=128 * n_dev)
    batch = next(iter_batches(records, plan))
    return records, vocab, plan, batch


def test_ep_step_matches_single_device(encoded_viscosity):
    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    records, vocab, plan, batch = _setup(encoded_viscosity, n_dev)

    cfg_single = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                                  num_steps=2)
    cfg_ep = cfg_single.replace(ep_axis="data")
    tcfg = TrainConfig(seed=0)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)

    model_single = ViscosityModel(cfg_single)
    variables = model_single.init(jax.random.PRNGKey(0), batch)

    def new_state():
        p = jax.tree.map(jnp.array, variables["params"])
        return TrainState(step=jnp.int32(0), params=p, batch_stats={},
                          opt_state=optimizer.init(p), rng=jax.random.PRNGKey(3))

    # single-device reference step
    step_single = make_train_step(model_single, cfg_single, tcfg, optimizer)
    s_ref, m_ref = step_single(new_state(), batch)

    # edge-partitioned step over the full virtual mesh
    model_ep = ViscosityModel(cfg_ep)
    ep_step = make_ep_train_step(model_ep, cfg_ep, tcfg, optimizer, mesh)
    ep_batch = partition_batch_edges(batch, n_dev)
    s_ep, m_ep = ep_step(new_state(), ep_batch)

    np.testing.assert_allclose(float(m_ep["loss"]), float(m_ref["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_ep.params), jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=3e-6)


def test_ep_step_multiple_steps_descend(encoded_viscosity):
    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    records, vocab, plan, batch = _setup(encoded_viscosity, n_dev)
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=1, ep_axis="data")
    tcfg = TrainConfig()
    optimizer = make_optimizer()
    model = ViscosityModel(cfg)
    # init outside shard_map needs the psum-free twin (identical param tree)
    variables = ViscosityModel(cfg.replace(ep_axis=None)).init(
        jax.random.PRNGKey(0), batch
    )
    p = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(step=jnp.int32(0), params=p, batch_stats={},
                       opt_state=optimizer.init(p), rng=jax.random.PRNGKey(0))
    ep_step = make_ep_train_step(model, cfg, tcfg, optimizer, mesh)
    ep_batch = partition_batch_edges(batch, n_dev)
    losses = []
    for _ in range(8):
        state, m = ep_step(state, ep_batch)
        losses.append(float(m["loss"]))
    assert min(losses[4:]) < losses[0]
    assert int(state.step) == 8


# ---------------------------------------------------------------------------
# Halo-exchange EP v2 (SURVEY §7 step 7): node ownership + ppermute halos
# ---------------------------------------------------------------------------


def _halo_setup(encoded_viscosity, n_dev, num_steps=2):
    records = encoded_viscosity["viscosity"][:24]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=24, node_multiple=8 * n_dev,
                           edge_multiple=128)
    batch = next(iter_batches(records, plan))
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=num_steps)
    return records, vocab, plan, batch, cfg


def test_halo_partition_roundtrip(encoded_viscosity):
    """Partitioned edges reconstruct exactly the original packed edge set."""
    from ionic_mpnn_tpu.parallel.halo_partition import partition_graphs_halo

    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    _, _, _, batch, _ = _halo_setup(encoded_viscosity, n_dev)
    g = batch.cation
    hp = partition_graphs_halo(g, n_dev)
    ns = g.atom_ids.shape[0] // n_dev

    got = set()
    for k in range(n_dev):
        for s, d, b, m in zip(hp.i_src[k], hp.i_dst[k], hp.i_bond[k], hp.i_mask[k]):
            if m:
                got.add((int(s) + k * ns, int(d) + k * ns, int(b)))
        for s, d, b, m in zip(hp.b_src_ext[k], hp.b_dst[k], hp.b_bond[k], hp.b_mask[k]):
            if m:
                got.add((int(s) - hp.halo + k * ns, int(d) + k * ns, int(b)))
    want = {
        (int(s), int(d), int(b))
        for s, d, b, m in zip(g.src, g.dst, g.bond_ids, g.edge_mask)
        if m
    }
    assert got == want
    # node arrays are a pure reshape
    np.testing.assert_array_equal(hp.atom_ids.reshape(-1), np.asarray(g.atom_ids))


def test_halo_ep_step_matches_single_device(encoded_viscosity):
    from ionic_mpnn_tpu.parallel.halo_partition import (
        make_halo_ep_train_step,
        partition_halo_batch,
    )

    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    records, vocab, plan, batch, cfg = _halo_setup(encoded_viscosity, n_dev)
    tcfg = TrainConfig(seed=0)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)

    model = ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)

    def new_state():
        p = jax.tree.map(jnp.array, variables["params"])
        return TrainState(step=jnp.int32(0), params=p, batch_stats={},
                          opt_state=optimizer.init(p), rng=jax.random.PRNGKey(3))

    step_single = make_train_step(model, cfg, tcfg, optimizer)
    s_ref, m_ref = step_single(new_state(), batch)

    halo_step = make_halo_ep_train_step(cfg, tcfg, optimizer, mesh)
    halo_batch = partition_halo_batch(batch, n_dev)
    s_halo, m_halo = halo_step(new_state(), halo_batch)

    np.testing.assert_allclose(float(m_halo["loss"]), float(m_ref["loss"]), rtol=1e-5)
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(s_ref.params)[0])
    flat_halo = dict(jax.tree_util.tree_flatten_with_path(s_halo.params)[0])
    assert flat_ref.keys() == flat_halo.keys()
    for k in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_halo[k]), np.asarray(flat_ref[k]),
            rtol=2e-3, atol=3e-6, err_msg=str(k),
        )


def test_halo_ep_comm_volume_is_boundary_sized(encoded_viscosity):
    """Compiled-HLO evidence: no per-step O(N·D) all-reduce — collectives
    are (halo, D) permutes + (B, D) pool psums + one grad psum."""
    from ionic_mpnn_tpu.parallel.halo_partition import (
        collective_stats,
        make_halo_ep_train_step,
        partition_halo_batch,
    )

    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    records, vocab, plan, batch, cfg = _halo_setup(encoded_viscosity, n_dev)
    tcfg = TrainConfig(seed=0)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    model = ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    p = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(step=jnp.int32(0), params=p, batch_stats={},
                       opt_state=optimizer.init(p), rng=jax.random.PRNGKey(3))
    halo_step = make_halo_ep_train_step(cfg, tcfg, optimizer, mesh)
    halo_batch = partition_halo_batch(batch, n_dev)

    stats = collective_stats(halo_step, state, halo_batch)
    D = cfg.atom_dim
    param_bytes = max(int(np.prod(np.asarray(x).shape)) * 4
                      for x in jax.tree.leaves(p))
    pool_bytes = halo_batch.cation.n_graphs * D * 4
    # every all-reduce is gradient- or pool-sized; nothing node-axis-sized
    # (the v1 design all-reduced the FULL (N, D) node aggregate per step)
    n_total = halo_batch.cation.atom_ids.shape[1] * n_dev
    assert n_total * D * 4 > max(param_bytes, pool_bytes)  # discriminating
    for b in stats["all-reduce"]:
        assert b <= max(param_bytes, pool_bytes) * 1.5, stats
    # halo permutes exist and are (halo, D)-sized
    assert stats["collective-permute"], stats
    halo_bytes = halo_batch.cation.halo * D * 4
    for b in stats["collective-permute"]:
        assert b <= 2 * halo_bytes, stats


# ---------------------------------------------------------------------------
# Aligned EP v3: node-sharded onehot (the PRODUCTION path, zero cross-shard
# edges by the window_aligned contract)
# ---------------------------------------------------------------------------


def _aligned_setup(encoded_viscosity, n_dev, num_steps=2):
    records = encoded_viscosity["viscosity"][:24]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=24,
                           edge_layout="window_aligned", node_shards=n_dev)
    batch = next(iter_batches(records, plan))
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=num_steps, message_impl="onehot")
    return records, vocab, plan, batch, cfg


def test_aligned_ep_step_matches_single_device(encoded_viscosity):
    from ionic_mpnn_tpu.parallel.aligned_partition import (
        make_aligned_ep_train_step,
        shard_aligned_batch,
    )

    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    records, vocab, plan, batch, cfg = _aligned_setup(encoded_viscosity, n_dev)
    tcfg = TrainConfig(seed=0)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)

    model_single = ViscosityModel(cfg)
    variables = model_single.init(jax.random.PRNGKey(0), batch)

    def new_state():
        p = jax.tree.map(jnp.array, variables["params"])
        return TrainState(step=jnp.int32(0), params=p, batch_stats={},
                          opt_state=optimizer.init(p), rng=jax.random.PRNGKey(3))

    step_single = make_train_step(model_single, cfg, tcfg, optimizer)
    s_ref, m_ref = step_single(new_state(), batch)

    cfg_ep = cfg.replace(ep_axis="data")
    model_ep = ViscosityModel(cfg_ep)
    ep_step = make_aligned_ep_train_step(model_ep, cfg_ep, tcfg, optimizer, mesh)
    ep_batch = shard_aligned_batch(batch, n_dev)
    s_ep, m_ep = ep_step(new_state(), ep_batch)

    np.testing.assert_allclose(float(m_ep["loss"]), float(m_ref["loss"]), rtol=1e-5)
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(s_ref.params)[0])
    flat_ep = dict(jax.tree_util.tree_flatten_with_path(s_ep.params)[0])
    assert flat_ref.keys() == flat_ep.keys()
    for k in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_ep[k]), np.asarray(flat_ref[k]),
            rtol=2e-3, atol=3e-6, err_msg=str(k),
        )


def test_aligned_ep_zero_message_step_comm(encoded_viscosity):
    """Compiled-HLO evidence for the EP v3 claim: NO halo permutes, no
    node-axis-sized all-reduce, and the all-reduce count does not grow
    with num_steps (comm is per-forward pool + grads, not per step)."""
    from ionic_mpnn_tpu.parallel.aligned_partition import (
        make_aligned_ep_train_step,
        shard_aligned_batch,
    )
    from ionic_mpnn_tpu.parallel.halo_partition import collective_stats

    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]

    def build(num_steps):
        records, vocab, plan, batch, cfg = _aligned_setup(
            encoded_viscosity, n_dev, num_steps=num_steps
        )
        cfg_ep = cfg.replace(ep_axis="data")
        tcfg = TrainConfig(seed=0)
        optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
        model = ViscosityModel(cfg_ep)
        variables = ViscosityModel(cfg).init(jax.random.PRNGKey(0), batch)
        p = jax.tree.map(jnp.array, variables["params"])
        state = TrainState(step=jnp.int32(0), params=p, batch_stats={},
                           opt_state=optimizer.init(p), rng=jax.random.PRNGKey(3))
        step = make_aligned_ep_train_step(model, cfg_ep, tcfg, optimizer, mesh)
        stats = collective_stats(step, state, shard_aligned_batch(batch, n_dev))
        return stats, batch, cfg, p

    stats1, batch, cfg, p = build(1)
    stats4, _, _, _ = build(4)

    assert not stats1["collective-permute"], stats1  # no halos at all
    param_bytes = max(int(np.prod(np.asarray(x).shape)) * 4
                      for x in jax.tree.leaves(p))
    pool_bytes = batch.cation.n_graphs * cfg.atom_dim * 4
    n_total = batch.cation.atom_ids.shape[0]
    assert n_total * cfg.atom_dim * 4 > max(param_bytes, pool_bytes)
    for b in stats1["all-reduce"] + stats4["all-reduce"]:
        assert b <= max(param_bytes, pool_bytes) * 1.5, (stats1, stats4)
    # XLA may merge/split all-reduces, but per-step collectives would make
    # the 4-step program carry strictly more of them; pool+grad comm is
    # step-count-invariant while the grad tree grows with num_steps only
    # through MORE PARAMS (still one fused grad psum pass) — allow that.
    assert len(stats4["collective-permute"]) == 0, stats4


def test_aligned_ep_descends(encoded_viscosity):
    from ionic_mpnn_tpu.parallel.aligned_partition import (
        make_aligned_ep_train_step,
        shard_aligned_batch,
    )

    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    records, vocab, plan, batch, cfg = _aligned_setup(encoded_viscosity, n_dev,
                                                      num_steps=1)
    cfg_ep = cfg.replace(ep_axis="data")
    tcfg = TrainConfig()
    optimizer = make_optimizer()
    model = ViscosityModel(cfg_ep)
    variables = ViscosityModel(cfg).init(jax.random.PRNGKey(0), batch)
    p = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(step=jnp.int32(0), params=p, batch_stats={},
                       opt_state=optimizer.init(p), rng=jax.random.PRNGKey(0))
    ep_step = make_aligned_ep_train_step(model, cfg_ep, tcfg, optimizer, mesh)
    ep_batch = shard_aligned_batch(batch, n_dev)
    losses = []
    for _ in range(8):
        state, m = ep_step(state, ep_batch)
        losses.append(float(m["loss"]))
    assert min(losses[4:]) < losses[0]
    assert int(state.step) == 8


def test_aligned_ep_composes_with_dp(encoded_viscosity):
    """DP×EP on a (2, 4) mesh == plain 2-way DP on the same two batches:
    the production onehot path scales along BOTH axes at once."""
    from ionic_mpnn_tpu.parallel.aligned_partition import (
        make_aligned_ep_train_step,
        stack_aligned_dp_batches,
    )
    from ionic_mpnn_tpu.parallel.data_parallel import (
        make_dp_train_step,
        shard_batch,
        stack_batches,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    records = encoded_viscosity["viscosity"][:32]
    vocab = encoded_viscosity["vocab"]
    n_ep = 4
    plan = plan_capacities(records, batch_size=16,
                           edge_layout="window_aligned", node_shards=n_ep)
    b1 = next(iter_batches(records[:16], plan))
    b2 = next(iter_batches(records[16:], plan))
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, message_impl="onehot")
    tcfg = TrainConfig(seed=0)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)
    model = ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), b1)

    def new_state():
        p = jax.tree.map(jnp.array, variables["params"])
        return TrainState(step=jnp.int32(0), params=p, batch_stats={},
                          opt_state=optimizer.init(p), rng=jax.random.PRNGKey(3))

    # reference: plain 2-way DP (itself exactness-tested vs single device)
    dp_mesh = make_mesh(MeshConfig(data_parallel=2), devices=jax.devices()[:2])
    dp_step = make_dp_train_step(model, cfg, tcfg, optimizer, dp_mesh)
    s_dp, m_dp = dp_step(new_state(), shard_batch(stack_batches([b1, b2]), dp_mesh))

    # composed: 2 DP groups x 4 EP shards
    mesh2d = make_mesh(MeshConfig(data_parallel=2, model_parallel=n_ep,
                                  model_axis="ep"))
    cfg_ep = cfg.replace(ep_axis="ep")
    step2d = make_aligned_ep_train_step(
        ViscosityModel(cfg_ep), cfg_ep, tcfg, optimizer, mesh2d,
        axis="ep", dp_axis="data",
    )
    stacked = stack_aligned_dp_batches([b1, b2], n_ep)
    s_2d, m_2d = step2d(new_state(), stacked)

    np.testing.assert_allclose(float(m_2d["loss"]), float(m_dp["loss"]), rtol=1e-5)
    flat_dp = dict(jax.tree_util.tree_flatten_with_path(s_dp.params)[0])
    flat_2d = dict(jax.tree_util.tree_flatten_with_path(s_2d.params)[0])
    assert flat_dp.keys() == flat_2d.keys()
    for k in flat_dp:
        np.testing.assert_allclose(
            np.asarray(flat_2d[k]), np.asarray(flat_dp[k]),
            rtol=2e-3, atol=3e-6, err_msg=str(k),
        )


def test_shard_aligned_rejects_wrong_layout(encoded_viscosity):
    from ionic_mpnn_tpu.data.packing import GraphCapacityError
    from ionic_mpnn_tpu.parallel.aligned_partition import shard_graphs_aligned

    records = encoded_viscosity["viscosity"][:8]
    plan = plan_capacities(records, batch_size=8)  # sorted layout
    batch = next(iter_batches(records, plan))
    with pytest.raises(GraphCapacityError, match="window_aligned"):
        shard_graphs_aligned(batch.cation, 2)


def test_shard_aligned_rejects_indivisible_capacity(encoded_viscosity):
    from ionic_mpnn_tpu.data.packing import GraphCapacityError
    from ionic_mpnn_tpu.parallel.aligned_partition import shard_graphs_aligned

    records = encoded_viscosity["viscosity"][:8]
    plan = plan_capacities(records, batch_size=8, edge_layout="window_aligned")
    batch = next(iter_batches(records, plan))
    nw = batch.cation.node_capacity // 128
    with pytest.raises(GraphCapacityError, match="not divisible"):
        shard_graphs_aligned(batch.cation, nw + 1)


def test_halo_ep_descends(encoded_viscosity):
    from ionic_mpnn_tpu.parallel.halo_partition import (
        make_halo_ep_train_step,
        partition_halo_batch,
    )

    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    records, vocab, plan, batch, cfg = _halo_setup(encoded_viscosity, n_dev,
                                                   num_steps=1)
    tcfg = TrainConfig()
    optimizer = make_optimizer()
    model = ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    p = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(step=jnp.int32(0), params=p, batch_stats={},
                       opt_state=optimizer.init(p), rng=jax.random.PRNGKey(0))
    halo_step = make_halo_ep_train_step(cfg, tcfg, optimizer, mesh)
    halo_batch = partition_halo_batch(batch, n_dev)
    losses = []
    for _ in range(8):
        state, m = halo_step(state, halo_batch)
        losses.append(float(m["loss"]))
    assert min(losses[4:]) < losses[0]
    assert int(state.step) == 8
