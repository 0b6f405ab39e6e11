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
