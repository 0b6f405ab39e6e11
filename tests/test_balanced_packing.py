"""LPT window-balanced packing: validity, loader parity, retry, tile win."""

import jax
import numpy as np
import pytest

from ionic_mpnn_tpu import native
from ionic_mpnn_tpu.benchmarks import make_bench_dataset
from ionic_mpnn_tpu.config import viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.data.packing import (
    GraphCapacityError,
    assign_windows_balanced,
    balanced_offsets,
)
from ionic_mpnn_tpu.models import ViscosityModel


@pytest.fixture(scope="module")
def data():
    return make_bench_dataset(192, seed=5)


def _plans(records, batch_size=64):
    plain = plan_capacities(records, batch_size=batch_size,
                            edge_layout="window_aligned")
    bal = plan_capacities(records, batch_size=batch_size,
                          edge_layout="window_aligned", balance=True)
    return plain, bal


def test_balanced_tile_is_tighter(data):
    records, _ = data
    plain, bal = _plans(records)
    assert bal.balance and bal.balance_tile == bal.edge_tile
    assert bal.edge_tile <= plain.edge_tile
    # at mixed-density synthetic data the win should be real, not epsilon
    assert bal.edge_tile < plain.edge_tile


def test_assignment_validity(data):
    records, _ = data
    rng = np.random.default_rng(0)
    na = rng.integers(5, 40, 200)
    ne = na * rng.integers(1, 3, 200)
    nw, window, tile = 80, 128, 160
    win = assign_windows_balanced(na, ne, nw, window, tile)
    atoms = np.bincount(win, weights=na, minlength=nw)
    edges = np.bincount(win, weights=ne, minlength=nw)
    assert atoms.max() <= window
    assert edges.max() <= tile
    offs = balanced_offsets(na, ne, nw * window, window, tile)
    # placements don't overlap and stay inside the assigned window
    spans = sorted((int(o), int(o + n)) for o, n in zip(offs, na))
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert a1 <= b0
    assert all(o // window == (o + n - 1) // window for o, n in zip(offs, na)
               if n > 0)


def test_balanced_batches_match_model_outputs(data):
    """Placement is math-invariant: per-sample predictions on balanced
    batches equal the sequential-aligned ones exactly (same graphs, same
    params; only node placement differs)."""
    records, vocab = data
    plain, bal = _plans(records, batch_size=48)
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=2, message_impl="onehot")
    model = ViscosityModel(cfg)
    b_plain = next(iter_batches(records[:48], plain))
    b_bal = next(iter_batches(records[:48], bal))
    assert b_bal.cation.edge_layout == "window_aligned"
    variables = model.init(jax.random.PRNGKey(0), b_plain)
    p1 = np.asarray(model.apply(variables, b_plain)["pred"])
    p2 = np.asarray(model.apply(variables, b_bal)["pred"])
    n = int(np.asarray(b_plain.sample_mask).sum())
    np.testing.assert_allclose(p2[:n], p1[:n], rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
def test_balanced_native_loader_bit_identical(data):
    from ionic_mpnn_tpu.data.columnar import ColumnarIonPairs, iter_batches_fast

    records, _ = data
    _, bal = _plans(records, batch_size=48)
    cdata = ColumnarIonPairs.from_records(records)
    py = list(iter_batches(records, bal, shuffle=True, seed=11))
    nat = list(iter_batches_fast(cdata, bal, shuffle=True, seed=11))
    assert len(py) == len(nat)
    for bp, bn in zip(py, nat):
        for a, b in zip(jax.tree.leaves(bp), jax.tree.leaves(bn)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not native.native_available(), reason="g++ unavailable")
def test_balanced_retry_on_tiny_tile(data):
    """A deliberately undersized tile forces the shrink-and-retry path in
    BOTH loaders; every record still comes out exactly once."""
    import dataclasses

    from ionic_mpnn_tpu.data.columnar import ColumnarIonPairs, iter_batches_fast

    records, _ = data
    _, bal = _plans(records, batch_size=48)
    # tile just above the largest single molecule: batches must shrink
    mx = max(len(r[i]["edge_indices"]) for r in records for i in ("cation", "anion"))
    tiny = dataclasses.replace(bal, edge_tile=((mx + 8) // 8) * 8)
    py = list(iter_batches(records, tiny, shuffle=True, seed=3))
    nat = list(iter_batches_fast(ColumnarIonPairs.from_records(records), tiny,
                                 shuffle=True, seed=3))
    n_py = sum(int(np.asarray(b.sample_mask).sum()) for b in py)
    n_nat = sum(int(np.asarray(b.sample_mask).sum()) for b in nat)
    assert n_py == len(records)
    assert n_nat == len(records)
    assert len(py) > len(list(iter_batches(records, bal, shuffle=True, seed=3)))
    for bp, bn in zip(py, nat):
        for a, b in zip(jax.tree.leaves(bp), jax.tree.leaves(bn)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_balanced_fit_trajectory_matches_python(data):
    """fit() on balanced plans: native group mode == python loader."""
    if not native.native_available():
        pytest.skip("g++ unavailable")
    from ionic_mpnn_tpu.config import TrainConfig
    from ionic_mpnn_tpu.training import fit

    records, vocab = data
    train, dev = records[:96], records[96:128]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size,
                           num_steps=1, message_impl="onehot")
    plan = plan_capacities(train, batch_size=16, edge_layout="window_aligned",
                           balance=True)
    model = ViscosityModel(cfg)
    base = TrainConfig(epochs=2, early_stopping_patience=10, seed=2,
                       steps_per_call=3)
    r_native = fit(model, cfg, base, train, dev, plan, verbose=False)
    r_python = fit(model, cfg, base.replace(use_native_loader=False),
                   train, dev, plan, verbose=False)
    np.testing.assert_allclose(r_native.history["loss"], r_python.history["loss"],
                               rtol=1e-6)
