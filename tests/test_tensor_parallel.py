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
