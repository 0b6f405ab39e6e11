"""fit() with a mesh: data-parallel training over the virtual device mesh."""

import pytest

from ionic_mpnn_tpu.config import MeshConfig, TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.parallel import make_mesh
from ionic_mpnn_tpu.training import fit


@pytest.mark.multidevice
@pytest.mark.slow
def test_fit_data_parallel(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:160]
    vocab = encoded_viscosity["vocab"]
    train, dev = records[:128], records[128:]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    tcfg = TrainConfig(epochs=6, batch_size=8, early_stopping_patience=10, seed=0)
    plan = plan_capacities(train, batch_size=8)
    import jax

    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=1),
                     devices=jax.devices()[:4])
    model = ViscosityModel(cfg)
    result = fit(model, cfg, tcfg, train, dev, plan, verbose=False, mesh=mesh)
    assert len(result.history["loss"]) == 6
    assert result.history["loss"][-1] < result.history["loss"][0]
