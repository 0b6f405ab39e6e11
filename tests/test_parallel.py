"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionic_mpnn_tpu.config import MeshConfig, TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.data.packing import pack_graphs
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.ops import bond_type_matrices, message_pass_aggregate
from ionic_mpnn_tpu.parallel import (
    edge_partitioned_aggregate,
    make_dp_train_step,
    make_mesh,
    partition_edges,
    shard_batch,
    split_for_devices,
    stack_batches,
)
from ionic_mpnn_tpu.training.loop import TrainState, make_train_step
from ionic_mpnn_tpu.training.optim import make_optimizer


pytestmark = pytest.mark.multidevice


def test_mesh_construction():
    mesh = make_mesh(MeshConfig())
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1
    mesh2 = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def _dp_setup(encoded_viscosity, n_dev):
    records = encoded_viscosity["viscosity"][: n_dev * 8]
    vocab = encoded_viscosity["vocab"]
    plan = plan_capacities(records, batch_size=8)
    shards = split_for_devices(records, n_dev)
    batches = [next(iter_batches(s, plan)) for s in shards]
    stacked = stack_batches(batches)
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=2)
    return records, plan, stacked, batches, cfg


def test_dp_step_matches_single_device_gradients(encoded_viscosity):
    """DP over 8 devices must produce the same update as one big batch."""
    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    records, plan, stacked, batches, cfg = _dp_setup(encoded_viscosity, n_dev)
    tcfg = TrainConfig(seed=3)
    model = ViscosityModel(cfg)

    first = batches[0]
    variables = model.init(jax.random.PRNGKey(0), first)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)

    def new_state():
        # deep-copy: the DP step donates its state buffers
        params_copy = jax.tree.map(jnp.array, variables["params"])
        return TrainState(
            step=jnp.int32(0),
            params=params_copy,
            batch_stats={},
            opt_state=optimizer.init(params_copy),
            rng=jax.random.PRNGKey(9),
        )

    dp_step = make_dp_train_step(model, cfg, tcfg, optimizer, mesh)
    stacked_dev = shard_batch(stacked, mesh)
    dp_state, dp_metrics = dp_step(new_state(), stacked_dev)

    # single-device equivalent: concatenate all per-device records into one
    # batch sequence and accumulate the same global weighted loss
    import optax

    def single_loss(params):
        total, n = 0.0, 0.0
        for b in batches:
            out = model.apply({"params": params}, b, deterministic=True)
            total = total + jnp.sum((out["pred"] - b.y) ** 2 * b.sample_mask)
            n = n + jnp.sum(b.sample_mask)
        from ionic_mpnn_tpu.training.loop import _l2_penalty

        return total / n + _l2_penalty(params, cfg.fp_l2)

    ref_loss, ref_grads = jax.value_and_grad(single_loss)(variables["params"])
    updates, _ = optimizer.update(ref_grads, optimizer.init(variables["params"]),
                                  variables["params"])
    ref_params = optax.apply_updates(variables["params"], updates)

    np.testing.assert_allclose(float(dp_metrics["loss"]), float(ref_loss), rtol=1e-4)
    flat_dp = jax.tree.leaves(dp_state.params)
    flat_ref = jax.tree.leaves(ref_params)
    for a, b in zip(flat_dp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_dp_multiple_steps_run(encoded_viscosity):
    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    records, plan, stacked, batches, cfg = _dp_setup(encoded_viscosity, n_dev)
    tcfg = TrainConfig()
    model = ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batches[0])
    optimizer = make_optimizer()
    params = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(
        step=jnp.int32(0), params=params, batch_stats={},
        opt_state=optimizer.init(params), rng=jax.random.PRNGKey(0),
    )
    dp_step = make_dp_train_step(model, cfg, tcfg, optimizer, mesh)
    sb = shard_batch(stacked, mesh)
    losses = []
    for _ in range(8):
        state, m = dp_step(state, sb)
        losses.append(float(m["loss"]))
    assert min(losses[4:]) < losses[0]  # optimizing the same batch must descend
    assert int(state.step) == 8


def _toy_graph(rng, n_atoms, n_edges, atom_vocab=5, bond_vocab=3):
    edges, bonds = [], []
    for _ in range(n_edges // 2):
        i, j = rng.integers(0, n_atoms, 2)
        b = int(rng.integers(0, bond_vocab))
        edges += [(int(i), int(j)), (int(j), int(i))]
        bonds += [b, b]
    return {
        "atom_ids": rng.integers(0, atom_vocab, n_atoms).tolist(),
        "bond_ids": bonds,
        "edge_indices": edges,
        "num_atoms": n_atoms,
    }


def test_edge_partitioned_aggregate_matches_single_device():
    mesh = make_mesh(MeshConfig())
    n_dev = mesh.shape["data"]
    rng = np.random.default_rng(0)
    graphs = [_toy_graph(rng, 40, 120) for _ in range(4)]
    packed = pack_graphs(graphs, node_cap=160, edge_cap=512)

    D, V = 16, 4
    atom_table = rng.normal(size=(6, D)).astype(np.float32)
    bond_table = rng.normal(size=(V, 8)).astype(np.float32)
    W = rng.normal(size=(8, D, D)).astype(np.float32) * 0.1
    h = jnp.array(atom_table[packed.atom_ids])
    m_table = bond_type_matrices(jnp.array(bond_table), jnp.array(W))

    expected = message_pass_aggregate(
        h, jnp.array(packed.bond_ids), jnp.array(packed.src),
        jnp.array(packed.dst), m_table, jnp.array(packed.edge_mask),
    )

    sharded_graphs = partition_edges(packed, n_dev)
    agg_fn = edge_partitioned_aggregate(mesh)
    got = agg_fn(
        h, m_table,
        jnp.array(sharded_graphs.bond_ids), jnp.array(sharded_graphs.src),
        jnp.array(sharded_graphs.dst), jnp.array(sharded_graphs.edge_mask),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-4, atol=1e-5)


def test_partition_edges_shape_checks():
    rng = np.random.default_rng(1)
    packed = pack_graphs([_toy_graph(rng, 10, 20)], node_cap=16, edge_cap=24)
    with pytest.raises(ValueError):
        partition_edges(packed, 7)
    sharded = partition_edges(packed, 8)
    assert sharded.src.shape == (8, 3)
    assert sharded.atom_ids.shape == (16,)  # nodes untouched
