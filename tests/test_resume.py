"""Checkpoint-resume: interrupted training continues equivalently."""

import numpy as np

from ionic_mpnn_tpu.config import TrainConfig, viscosity_config
from ionic_mpnn_tpu.data import plan_capacities
from ionic_mpnn_tpu.models import ViscosityModel
from ionic_mpnn_tpu.training import fit


def test_fit_resumes_from_checkpoint(tmp_path, encoded_viscosity):
    records = encoded_viscosity["viscosity"][:96]
    vocab = encoded_viscosity["vocab"]
    train, dev = records[:80], records[80:]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    plan = plan_capacities(train, batch_size=32)
    model = ViscosityModel(cfg)

    ckpt_dir = str(tmp_path / "ckpt")

    # Phase 1: 4 epochs, checkpoint every 2
    tcfg1 = TrainConfig(epochs=4, early_stopping_patience=100, seed=5,
                        checkpoint_dir=ckpt_dir, checkpoint_every=2)
    r1 = fit(model, cfg, tcfg1, train, dev, plan, verbose=False)
    assert len(r1.history["loss"]) == 4

    # Phase 2: resume same dir, extend to 8 epochs
    tcfg2 = tcfg1.replace(epochs=8)
    r2 = fit(model, cfg, tcfg2, train, dev, plan, verbose=False)

    # resumed from epoch 4 -> history spans all 8 epochs, first 4 identical
    assert len(r2.history["loss"]) == 8
    np.testing.assert_allclose(r2.history["loss"][:4], r1.history["loss"], rtol=1e-6)
    # and training continued descending on average
    assert np.mean(r2.history["loss"][4:]) < np.mean(r2.history["loss"][:4])


def test_fit_without_checkpoint_dir_untouched(tmp_path, encoded_viscosity):
    records = encoded_viscosity["viscosity"][:32]
    vocab = encoded_viscosity["vocab"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    plan = plan_capacities(records, batch_size=16)
    tcfg = TrainConfig(epochs=2, early_stopping_patience=10, seed=0)
    r = fit(ViscosityModel(cfg), cfg, tcfg, records[:24], records[24:], plan, verbose=False)
    assert len(r.history["loss"]) == 2
    assert not list(tmp_path.iterdir())
