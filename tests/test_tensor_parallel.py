"""TP sharding: model-axis parameter partitioning preserves outputs."""

import jax
import numpy as np
import pytest

from ionic_mpnn_tpu.config import MeshConfig, viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.parallel import make_mesh
from ionic_mpnn_tpu.parallel.tensor_parallel import param_specs, shard_params

pytestmark = pytest.mark.multidevice


def test_tp_sharded_forward_matches_replicated(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:8]
    vocab = encoded_viscosity["vocab"]
    # widths divisible by the 2-way model axis
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, atom_dim=16, fp_size=16)
    plan = plan_capacities(records, batch_size=8)
    batch = next(iter_batches(records, plan))
    model = ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)

    baseline = np.asarray(model.apply(variables, batch)["pred"])

    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2),
                     devices=jax.devices()[:8])
    sharded = shard_params(variables["params"], mesh)

    # check the big tensors actually got partitioned over "model"
    bt = sharded["trunk"]["cat_encoder"]["bmm_0"]["bond_transform"]
    assert len(bt.sharding.device_set) == 8
    spec = bt.sharding.spec
    assert spec[-1] == "model"

    with mesh:
        out = jax.jit(lambda p, b: model.apply({"params": p}, b)["pred"])(sharded, batch)
    np.testing.assert_allclose(np.asarray(out), baseline, rtol=1e-5, atol=1e-5)


def test_tp_train_step_matches_replicated(encoded_viscosity):
    """Sharded params + grads + Adam moments over the model axis update
    identically to the single-device step (SURVEY §2.3 TP row, now with
    TRAINING, not just the forward)."""
    import jax.numpy as jnp

    from ionic_mpnn_tpu.config import TrainConfig
    from ionic_mpnn_tpu.parallel.tensor_parallel import make_tp_train_step
    from ionic_mpnn_tpu.training.loop import TrainState, make_train_step
    from ionic_mpnn_tpu.training.optim import make_optimizer

    records = encoded_viscosity["viscosity"][:16]
    vocab = encoded_viscosity["vocab"]
    # widths divisible by the 8-way model axis
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, atom_dim=16, fp_size=16)
    plan = plan_capacities(records, batch_size=16)
    batch = next(iter_batches(records, plan))
    model = ViscosityModel(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch)
    tcfg = TrainConfig(seed=0)
    optimizer = make_optimizer(tcfg.learning_rate, tcfg.clipnorm)

    def new_state():
        p = jax.tree.map(jnp.array, variables["params"])
        return TrainState(step=jnp.int32(0), params=p, batch_stats={},
                          opt_state=optimizer.init(p), rng=jax.random.PRNGKey(3))

    step_single = make_train_step(model, cfg, tcfg, optimizer)
    s_ref = new_state()

    mesh = make_mesh(MeshConfig(data_parallel=1, model_parallel=8),
                     devices=jax.devices()[:8])
    tp_step, s_tp = make_tp_train_step(model, cfg, tcfg, optimizer, mesh,
                                       new_state())
    for _ in range(3):
        s_tp, m_tp = tp_step(s_tp, batch)
        s_ref, m_ref = step_single(s_ref, batch)
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(s_ref.params)[0])
    flat_tp = dict(jax.tree_util.tree_flatten_with_path(s_tp.params)[0])
    assert flat_ref.keys() == flat_tp.keys()
    for k in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_tp[k]), np.asarray(flat_ref[k]),
            rtol=2e-3, atol=3e-6, err_msg=str(k),
        )


def test_tp_state_shardings_cover_adam_moments(encoded_viscosity):
    import jax.numpy as jnp

    from ionic_mpnn_tpu.config import TrainConfig
    from ionic_mpnn_tpu.parallel.tensor_parallel import shard_train_state
    from ionic_mpnn_tpu.training.loop import TrainState
    from ionic_mpnn_tpu.training.optim import make_optimizer

    records = encoded_viscosity["viscosity"][:4]
    vocab = encoded_viscosity["vocab"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=1, atom_dim=16, fp_size=16)
    plan = plan_capacities(records, batch_size=4)
    batch = next(iter_batches(records, plan))
    variables = ViscosityModel(cfg).init(jax.random.PRNGKey(0), batch)
    optimizer = make_optimizer()
    p = jax.tree.map(jnp.array, variables["params"])
    state = TrainState(step=jnp.int32(0), params=p, batch_stats={},
                       opt_state=optimizer.init(p), rng=jax.random.PRNGKey(0))
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2),
                     devices=jax.devices()[:8])
    sharded, _ = shard_train_state(state, mesh)
    # find the bond_transform moment leaves and check their placement
    found = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(sharded.opt_state)[0]:
        name = jax.tree_util.keystr(path)
        if "bond_transform" in name:
            assert leaf.sharding.spec[-1] == "model", name
            found += 1
    assert found >= 2  # mu and nu for at least one bmm


def test_param_specs_rules(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:4]
    vocab = encoded_viscosity["vocab"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    plan = plan_capacities(records, batch_size=4)
    batch = next(iter_batches(records, plan))
    variables = ViscosityModel(cfg).init(jax.random.PRNGKey(0), batch)
    specs = param_specs(variables["params"])
    assert specs["trunk"]["cat_encoder"]["bmm_0"]["bond_transform"][-1] == "model"
    assert specs["trunk"]["cat_encoder"]["fp_dense"]["kernel"][-1] == "model"
    # biases replicated
    assert specs["trunk"]["cat_encoder"]["fp_dense"]["bias"] == ()
