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


def test_ion_pool_gather_matches_per_molecule(encoded_viscosity):
    from ionic_mpnn_tpu.data import encode_graph, smiles_to_graph
    from ionic_mpnn_tpu.inference import IonPool

    vocab = encoded_viscosity["vocab"]
    smiles = ["C[N+](C)(C)C", "CCn1cc[n+](C)c1", "CC[n+]1ccccc1", "[Cl-]"]
    pool = IonPool(smiles, vocab)
    assert len(pool) == 4 and not pool.skipped

    idx = np.array([2, 0, 2, 3, 1])
    atoms, a_off, bonds, edges, e_off = pool.gather(idx)
    ref = [encode_graph(smiles_to_graph(smiles[i]), vocab) for i in idx]
    exp_atoms = np.concatenate([np.asarray(r["atom_ids"], np.int32) for r in ref])
    exp_bonds = np.concatenate([np.asarray(r["bond_ids"], np.int32) for r in ref])
    exp_edges = np.concatenate(
        [np.asarray(r["edge_indices"], np.int32).reshape(-1, 2) for r in ref]
    )
    np.testing.assert_array_equal(atoms, exp_atoms)
    np.testing.assert_array_equal(bonds, exp_bonds)
    np.testing.assert_array_equal(edges, exp_edges)
    np.testing.assert_array_equal(
        np.diff(a_off), [len(r["atom_ids"]) for r in ref]
    )
    np.testing.assert_array_equal(
        np.diff(e_off), [len(r["bond_ids"]) for r in ref]
    )


def test_ion_pool_skips_invalid():
    from ionic_mpnn_tpu.data import build_vocab
    from ionic_mpnn_tpu.inference import IonPool

    # tiny vocab from one molecule; the pool must drop garbage + OOV ions
    from ionic_mpnn_tpu.data import smiles_to_graph

    g = {"pair_id": "x", "cation_graph": smiles_to_graph("C[N+](C)(C)C"),
         "anion_graph": smiles_to_graph("[Cl-]"), "log_eta": 0.0, "T": 300.0}
    vocab = build_vocab([[g]])
    pool = IonPool(["C[N+](C)(C)C", "((garbage", "[Br-]"], vocab)
    assert pool.smiles == ["C[N+](C)(C)C"]
    assert len(pool.skipped) == 2


def test_screen_grid_matches_bruteforce(encoded_viscosity):
    from ionic_mpnn_tpu import native

    if not native.native_available():
        import pytest

        pytest.skip("native packer not built")
    engine, _ = _engine(encoded_viscosity)
    cations = ["C[N+](C)(C)C", "CCn1cc[n+](C)c1", "CC[n+]1ccccc1"]
    anions = ["[Cl-]", "CC(=O)[O-]"]
    temps = [300.0, 350.0]
    report = engine.screen_grid(cations, anions, temps, top_k=5)
    assert report.n_screened == 12
    assert len(report.results) == 5
    assert report.pairs_per_s > 0

    # brute force over the same grid through the plain path
    import itertools

    cands = [(c, a, t) for c in cations for a in anions for t in temps]
    brute = []
    for i in range(0, len(cands), 8):
        brute.extend(engine.predict_batch(cands[i:i + 8]))
    brute = np.asarray(brute)
    order = np.argsort(brute)[:5]
    np.testing.assert_allclose(
        [r.prediction for r in report.results], brute[order], rtol=1e-5, atol=1e-6
    )
    exp_pairs = [cands[i][:2] for i in order]
    got_pairs = [(r.cation, r.anion) for r in report.results]
    assert got_pairs == exp_pairs


def test_screen_grid_with_invalid_ions(encoded_viscosity):
    from ionic_mpnn_tpu import native

    if not native.native_available():
        import pytest

        pytest.skip("native packer not built")
    engine, _ = _engine(encoded_viscosity)
    report = engine.screen_grid(
        ["C[N+](C)(C)C", "((bad"], ["[Cl-]"], [300.0], top_k=3
    )
    assert report.n_screened == 1  # bad cation dropped at pool build
    assert len(report.skipped) == 1
    assert len(report.results) == 1


def test_predict_batch_mesh_fanout_matches_single(encoded_viscosity):
    import pytest

    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device")
    from ionic_mpnn_tpu.config import MeshConfig
    from ionic_mpnn_tpu.parallel import make_mesh

    vocab = encoded_viscosity["vocab"]
    records = encoded_viscosity["viscosity"][:8]
    cfg = viscosity_config(vocab.atom_vocab_size, vocab.bond_vocab_size, num_steps=2)
    model = ViscosityModel(cfg)
    plan = BatchPlan(batch_size=4, node_cap=256, edge_cap=768)
    init_plan = plan_capacities(records, batch_size=4)
    params = model.init(jax.random.PRNGKey(0),
                        next(iter_batches(records[:4], init_plan)))
    single = ScreeningEngine(model, params["params"], vocab, plan)
    mesh = make_mesh(MeshConfig(data_parallel=4), devices=jax.devices()[:4])
    fan = ScreeningEngine(model, params["params"], vocab, plan, mesh=mesh)

    cands = [
        ("C[N+](C)(C)C", "[Cl-]", 300.0),
        ("CCn1cc[n+](C)c1", "[B-](F)(F)(F)F", 310.0),
        ("CC[n+]1ccccc1", "CC(=O)[O-]", 320.0),
        ("C[N+](C)(C)C", "N#C[N-]C#N", 330.0),
        ("CCn1cc[n+](C)c1", "[Cl-]", 340.0),
    ] * 2  # 10 candidates > one 4-batch
    got = fan.predict_batch(cands)
    exp = []
    for i in range(0, len(cands), 4):
        exp.extend(single.predict_batch(cands[i:i + 4]))
    np.testing.assert_allclose(got, np.asarray(exp), rtol=2e-5, atol=1e-6)


def test_enumerate_cations_unique_and_parseable():
    from ionic_mpnn_tpu.data import smiles_to_graph
    from ionic_mpnn_tpu.data.synthetic import enumerate_cations

    cs = enumerate_cations(500)
    assert len(cs) == 500 and len(set(cs)) == 500
    for s in cs[::37]:  # spot-check across the family space
        g = smiles_to_graph(s)
        assert g["num_atoms"] > 4
