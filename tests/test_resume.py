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


def test_async_save_does_not_block(tmp_path):
    """save() on the async writer returns well before the commit: the
    epoch loop never waits on the array flush (SURVEY §2.3 elasticity)."""
    import time

    import numpy as np

    from ionic_mpnn_tpu.training import checkpoint as ckpt

    rng = np.random.default_rng(0)
    payload = {"w": rng.standard_normal((4_000_000,)).astype(np.float32)}  # 16 MB

    # synchronous reference wall time for the same payload
    t0 = time.perf_counter()
    ckpt.save_checkpoint(tmp_path / "sync", 1, payload)
    t_sync = time.perf_counter() - t0

    with ckpt.CheckpointWriter() as w:
        t0 = time.perf_counter()
        w.save(tmp_path / "async", 1, payload)
        t_return = time.perf_counter() - t0
        w.wait()
    # generous margin: the async return skips the serialization+fsync that
    # dominates the sync save
    assert t_return < max(0.6 * t_sync, 0.15), (t_return, t_sync)

    restored = ckpt.restore_checkpoint(tmp_path / "async")
    np.testing.assert_array_equal(restored["params"]["w"], payload["w"])


def test_latest_step_ignores_uncommitted(tmp_path):
    """An in-flight (or crashed) save — step dir + meta but no committed
    state — must never be offered for resume."""
    from ionic_mpnn_tpu.training import checkpoint as ckpt

    ckpt.save_checkpoint(tmp_path, 3, {"w": np.zeros(4, np.float32)})
    partial = tmp_path / "step_00000007"
    partial.mkdir()
    (partial / "meta.json").write_text('{"step": 7}')
    assert ckpt.latest_step(tmp_path) == 3


def test_fit_without_checkpoint_dir_untouched(tmp_path, encoded_viscosity):
    records = encoded_viscosity["viscosity"][:32]
    vocab = encoded_viscosity["vocab"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    plan = plan_capacities(records, batch_size=16)
    tcfg = TrainConfig(epochs=2, early_stopping_patience=10, seed=0)
    r = fit(ViscosityModel(cfg), cfg, tcfg, records[:24], records[24:], plan, verbose=False)
    assert len(r.history["loss"]) == 2
    assert not list(tmp_path.iterdir())
