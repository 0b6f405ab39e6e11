"""Screening engine tests."""

import jax
import numpy as np

from ionic_mpnn_tpu.config import viscosity_config
from ionic_mpnn_tpu.data import iter_batches, plan_capacities
from ionic_mpnn_tpu.data.loader import BatchPlan
from ionic_mpnn_tpu.inference import ScreeningEngine
from ionic_mpnn_tpu.models import ViscosityModel


def _engine(encoded_viscosity, batch_size=8):
    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"][:batch_size]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=2)
    model = ViscosityModel(cfg)
    plan = BatchPlan(batch_size=batch_size, node_cap=batch_size * 64,
                     edge_cap=batch_size * 192)
    init_plan = plan_capacities(records, batch_size=batch_size)
    params = model.init(jax.random.PRNGKey(0), next(iter_batches(records, init_plan)))
    return ScreeningEngine(model, params["params"], vocab, plan), model


def test_screen_stream_and_topk(encoded_viscosity):
    engine, _ = _engine(encoded_viscosity)
    cands = [
        ("C[N+](C)(C)C", "[Cl-]", 300.0),
        ("CCn1cc[n+](C)c1", "[B-](F)(F)(F)F", 310.0),
        ("CC[n+]1ccccc1", "CC(=O)[O-]", 320.0),
        ("C[N+](C)(C)C", "N#C[N-]C#N", 330.0),
        ("CCn1cc[n+](C)c1", "[Cl-]", 340.0),
    ] * 4  # 20 candidates across 3 batches of 8
    all_results = list(engine.screen(iter(cands)))
    assert len(all_results) == 20
    assert all(np.isfinite(r.prediction) for r in all_results)

    top3 = list(engine.screen(iter(cands), top_k=3, minimize=True))
    assert len(top3) == 3
    preds = sorted(r.prediction for r in all_results)
    np.testing.assert_allclose([r.prediction for r in top3], preds[:3], rtol=1e-5)


def test_screen_skips_invalid_smiles(encoded_viscosity):
    engine, _ = _engine(encoded_viscosity)
    cands = [
        ("C[N+](C)(C)C", "[Cl-]", 300.0),
        ("((garbage", "[Cl-]", 300.0),  # invalid SMILES
        ("C[N+](C)(C)C", "[Xx]", 300.0),  # parse ok? no — unknown elem in brackets is fine, but OOV
    ]
    results = list(engine.screen(iter(cands)))
    assert 1 <= len(results) <= 2


def test_screen_caches_featurization(encoded_viscosity):
    engine, _ = _engine(encoded_viscosity)
    list(engine.screen(iter([("C[N+](C)(C)C", "[Cl-]", 300.0)] * 10)))
    assert len(engine._graph_cache) == 2  # one cation + one anion


def test_predictions_depend_on_temperature(encoded_viscosity):
    engine, _ = _engine(encoded_viscosity)
    p1, p2 = engine.predict_batch(
        [("C[N+](C)(C)C", "[Cl-]", 280.0), ("C[N+](C)(C)C", "[Cl-]", 360.0)]
    )
    assert p1 != p2  # VFT head uses T
