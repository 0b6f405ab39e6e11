"""Training tier tests: metrics, splits, normalizer, end-to-end fits."""

import numpy as np
import pytest

from ionic_mpnn_tpu.config import TrainConfig, melting_point_config, viscosity_config
from ionic_mpnn_tpu.data import plan_capacities
from ionic_mpnn_tpu.models import MeltingPointModel, ViscosityModel
from ionic_mpnn_tpu.training import (
    Normalizer,
    evaluate_splits,
    fit,
    mae,
    pair_level_split,
    predict,
    r2_score,
    random_split,
    restore_checkpoint,
    save_checkpoint,
)


def test_r2_and_mae():
    y = np.array([1.0, 2.0, 3.0, 4.0])
    assert r2_score(y, y) == pytest.approx(1.0, abs=1e-5)
    assert mae(y, y + 0.5) == pytest.approx(0.5)
    assert r2_score(y, np.full_like(y, y.mean())) == pytest.approx(0.0, abs=1e-5)


def test_random_split_is_80_10_10_and_deterministic():
    a1, d1, t1 = random_split(1000, seed=42)
    a2, d2, t2 = random_split(1000, seed=42)
    assert len(a1) == 800 and len(d1) == 100 and len(t1) == 100
    np.testing.assert_array_equal(a1, a2)
    assert set(a1) | set(d1) | set(t1) == set(range(1000))
    assert not (set(a1) & set(d1))


def test_pair_level_split_no_leakage():
    pair_ids = [f"P{i % 17}" for i in range(200)]
    tr, dv, te = pair_level_split(pair_ids)
    tr_pairs = {pair_ids[i] for i in tr}
    dv_pairs = {pair_ids[i] for i in dv}
    te_pairs = {pair_ids[i] for i in te}
    assert not (tr_pairs & dv_pairs)
    assert not (tr_pairs & te_pairs)
    assert not (dv_pairs & te_pairs)
    assert len(tr) + len(dv) + len(te) == 200


def test_normalizer_guards():
    n = Normalizer.fit(np.array([5.0, 5.0, 5.0]))
    assert n.std == 1.0  # std=0 -> 1.0 guard (train_melting_point.py:256)
    n2 = Normalizer.fit(np.array([1.0, 3.0]), guard="eps")
    assert n2.std == pytest.approx(1.0 + 1e-6)
    y = np.array([2.0, 4.0])
    np.testing.assert_allclose(n2.inverse(n2.transform(y)), y, rtol=1e-5)


@pytest.mark.slow
def test_viscosity_training_learns(encoded_viscosity):
    """A short fit on synthetic VFT data must reach good dev R²."""
    records = encoded_viscosity["viscosity"]
    vocab = encoded_viscosity["vocab"]
    idx_train, idx_dev, idx_test = random_split(len(records))
    train = [records[i] for i in idx_train]
    dev = [records[i] for i in idx_dev]

    # 3 message steps: with RDKit-exact features the H-count signal lives
    # only in the H nodes, so substitution patterns need >=2 hops to reach
    # heavy atoms (the reference has the same property).
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=3)
    # 120 epochs: at 60 the outcome is fp-roll-sensitive (any benign
    # change to batch shapes/summation order can land a 0.38 or a 0.85
    # dev R2 — measured across seeds in round 3); by 120 every
    # configuration tried converges well past the threshold.
    tcfg = TrainConfig(epochs=120, batch_size=32, early_stopping_patience=120, seed=0)
    plan = plan_capacities(train, batch_size=tcfg.batch_size)
    model = ViscosityModel(cfg)
    result = fit(model, cfg, tcfg, train, dev, plan, verbose=False)

    assert result.history["loss"][-1] < result.history["loss"][0] * 0.5
    metrics = evaluate_splits(
        model, result.params, result.batch_stats,
        {"train": train, "dev": dev}, plan, result.normalizer,
    )
    assert metrics["dev"]["r2"] > 0.5, metrics


@pytest.mark.slow
def test_mp_training_with_normalization(encoded_viscosity):
    records = encoded_viscosity["mp"]
    vocab = encoded_viscosity["vocab"]
    idx_train, idx_dev, _ = random_split(len(records))
    train = [records[i] for i in idx_train]
    dev = [records[i] for i in idx_dev]

    cfg = melting_point_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                               atom_dim=16, num_steps=2)
    tcfg = TrainConfig(epochs=25, batch_size=32, normalize_y=True,
                       early_stopping_patience=25, seed=0)
    plan = plan_capacities(train, batch_size=tcfg.batch_size,
                           with_temperature=False, target_key="mp")
    model = MeltingPointModel(cfg)
    result = fit(model, cfg, tcfg, train, dev, plan, verbose=False)

    # normalizer fitted on train stats only
    y_train = np.array([r["mp"] for r in train])
    assert result.normalizer.mean == pytest.approx(float(y_train.mean()), rel=1e-5)
    # predictions come back de-normalized in K
    metrics = evaluate_splits(
        model, result.params, result.batch_stats, {"dev": dev}, plan, result.normalizer
    )
    assert metrics["dev"]["mae"] < 60.0  # synthetic mp spread is ~±40 K
    assert result.history["loss"][-1] < result.history["loss"][0]


def test_bf16_quality_gate(encoded_viscosity):
    """bf16 (the accelerator default, config.resolve_compute_dtype) must
    track f32 training: same data/seed/epochs on the production onehot
    path, bf16's final train loss within a fixed factor of f32's.

    Loss (not dev R²) is the gated quantity: at short-epoch budgets dev
    R² is fp-roll-sensitive (see test_viscosity_training_learns note)
    while the loss trajectory is smooth — a bf16 numerics regression
    (bad cast, overflow, accumulation in low precision) blows the loss
    visibly. Quality-at-convergence evidence lives in RESULTS batteries
    15/28 (Test R² 0.9734 bf16 vs 0.9739 f32 at full dims on TPU).
    """
    records = encoded_viscosity["viscosity"]
    vocab = encoded_viscosity["vocab"]
    idx_train, idx_dev, _ = random_split(len(records))
    train = [records[i] for i in idx_train]
    dev = [records[i] for i in idx_dev]
    tcfg = TrainConfig(epochs=15, batch_size=64, early_stopping_patience=15,
                       seed=0)
    finals = {}
    for dtype in ("float32", "bfloat16"):
        cfg = viscosity_config(
            vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=2,
            compute_dtype=dtype, message_impl="onehot", onehot_window=64,
        )
        plan = plan_capacities(train, batch_size=tcfg.batch_size,
                               edge_layout="window_aligned", window=64)
        result = fit(ViscosityModel(cfg), cfg, tcfg, train, dev, plan,
                     verbose=False)
        assert result.history["loss"][-1] < result.history["loss"][0] * 0.5, dtype
        finals[dtype] = result.history["loss"][-1]
    assert finals["bfloat16"] < max(1.5 * finals["float32"],
                                    finals["float32"] + 0.05), finals


def test_early_stopping_restores_best(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:64]
    vocab = encoded_viscosity["vocab"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    # patience 2 with lr high enough to bounce around
    tcfg = TrainConfig(epochs=30, batch_size=32, early_stopping_patience=2,
                       learning_rate=5e-2, seed=1)
    plan = plan_capacities(records, batch_size=32)
    model = ViscosityModel(cfg)
    result = fit(model, cfg, tcfg, records[:48], records[48:], plan, verbose=False)
    assert result.best_val_loss <= min(result.history["val_loss"]) + 1e-9
    if result.stopped_early:
        assert result.epochs_run < 30


def test_checkpoint_roundtrip(tmp_path, encoded_viscosity):
    records = encoded_viscosity["viscosity"][:16]
    vocab = encoded_viscosity["vocab"]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=1)
    plan = plan_capacities(records, batch_size=16)
    model = ViscosityModel(cfg)
    import jax
    from ionic_mpnn_tpu.data import iter_batches

    batch = next(iter_batches(records, plan))
    variables = model.init(jax.random.PRNGKey(0), batch)
    norm = Normalizer(mean=3.0, std=2.0)
    save_checkpoint(tmp_path, 7, variables["params"], normalizer=norm)
    restored = restore_checkpoint(tmp_path)
    assert restored["step"] == 7
    assert restored["normalizer"] == norm
    # predictions identical with restored params
    p0 = np.asarray(model.apply(variables, batch)["pred"])
    p1 = np.asarray(model.apply({"params": restored["params"]}, batch)["pred"])
    np.testing.assert_allclose(p0, p1, rtol=1e-6)

@pytest.mark.slow
def test_quality_protocol_escapes_collapse_basin(encoded_viscosity):
    """Regression canary for the relu-collapse basin (RESULTS battery 36,
    VERDICT r4 item 5): the seed-0 quality protocol — device epochs +
    warmup — must escape the temperature-only plateau (dev R² ≈ 0.42-0.53
    on this data class) AND the dead-unit telemetry must show live cation
    fp units. A change that re-opens the basin (warmup regression, an
    optimizer-guard bug, a pack-path corruption) fails loudly here
    instead of presenting as a mysterious low-R² run."""
    records = encoded_viscosity["viscosity"]
    vocab = encoded_viscosity["vocab"]
    idx_train, idx_dev, _ = random_split(len(records))
    train = [records[i] for i in idx_train]
    dev = [records[i] for i in idx_dev]

    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=3, message_impl="onehot",
                           onehot_window=64)
    # the production protocol in miniature: device-resident epochs (the
    # battery-36 trigger path), warmup spanning the first ~8 epochs
    # (warmup ending inside epoch 1 was battery 36's too-short failure)
    tcfg = TrainConfig(epochs=120, batch_size=32, warmup_steps=60,
                       early_stopping_patience=120, seed=0,
                       device_epochs=True)
    plan = plan_capacities(train, batch_size=tcfg.batch_size,
                           edge_layout="window_aligned", window=64)
    model = ViscosityModel(cfg)
    result = fit(model, cfg, tcfg, train, dev, plan, verbose=False)

    metrics = evaluate_splits(
        model, result.params, result.batch_stats,
        {"dev": dev}, plan, result.normalizer,
    )
    assert metrics["dev"]["r2"] > 0.6, (metrics,
                                        result.history.get(
                                            "dead_fp_cat_frac", [])[-3:])
    # telemetry present + units alive: benign relu die-off at convergence
    # sits around half the columns on this small run; the basin kills
    # 31/32 (0.97) — gate well between the two
    dead = result.history["dead_fp_cat_frac"]
    assert len(dead) == len(result.history["loss"])
    assert dead[-1] < 0.85, dead[-5:]
