"""steps_per_call: scanned multi-step training matches per-step training."""

import numpy as np
import pytest

from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.training import fit


@pytest.mark.slow
def test_scan_steps_equivalent_to_per_step(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:96]
    vocab = encoded_viscosity["vocab"]
    train, dev = records[:80], records[80:]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    plan = plan_capacities(train, batch_size=16)
    model = ViscosityModel(cfg)

    base = TrainConfig(epochs=3, early_stopping_patience=10, seed=4)
    r1 = fit(model, cfg, base, train, dev, plan, verbose=False)
    r2 = fit(model, cfg, base.replace(steps_per_call=4), train, dev, plan, verbose=False)

    # same parameter trajectory (identical batches/seed; scan is just fewer
    # dispatches) -> same epoch losses to float tolerance
    np.testing.assert_allclose(r1.history["loss"], r2.history["loss"], rtol=1e-4)
    np.testing.assert_allclose(r1.history["val_loss"], r2.history["val_loss"], rtol=1e-4)


@pytest.mark.slow
def test_scan_steps_with_remainder_group(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:50]
    vocab = encoded_viscosity["vocab"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    plan = plan_capacities(records[:40], batch_size=8)  # ~5 batches -> K=3 pads
    model = ViscosityModel(cfg)
    tcfg = TrainConfig(epochs=2, early_stopping_patience=10, seed=0, steps_per_call=3)
    r = fit(model, cfg, tcfg, records[:40], records[40:], plan, verbose=False)
    assert len(r.history["loss"]) == 2
    assert np.isfinite(r.history["loss"]).all()
