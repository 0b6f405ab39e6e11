"""fit() with the native loader matches the Python-loader trajectory."""

import numpy as np
import pytest

from ionic_mpnn_tpu import native
from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.training import fit


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
def test_fit_native_loader_matches_python(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:96]
    vocab = encoded_viscosity["vocab"]
    train, dev = records[:80], records[80:]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    plan = plan_capacities(train, batch_size=16)
    model = ViscosityModel(cfg)

    base = TrainConfig(epochs=3, early_stopping_patience=10, seed=2)
    r_native = fit(model, cfg, base, train, dev, plan, verbose=False)
    r_python = fit(model, cfg, base.replace(use_native_loader=False),
                   train, dev, plan, verbose=False)

    # bit-identical batches (tested at the packer level) -> identical losses
    np.testing.assert_allclose(r_native.history["loss"], r_python.history["loss"],
                               rtol=1e-6)
    np.testing.assert_allclose(r_native.history["val_loss"],
                               r_python.history["val_loss"], rtol=1e-6)
