"""End-to-end data tier tests: featurize → parse → vocab → encode → pack."""

import numpy as np
import pytest

from ionic_mpnn_tpu.data import (
    BatchPlan,
    Vocab,
    build_vocab,
    encode_dataset,
    encode_graph,
    iter_batches,
    pack_graphs,
    pad_dense_batch,
    plan_capacities,
    smiles_to_graph,
)
from ionic_mpnn_tpu.data.encode import EncodeReport
from ionic_mpnn_tpu.data.packing import GraphCapacityError, pack_ion_pair_batch
from ionic_mpnn_tpu.data import parse, reference_io


# ---------------------------------------------------------------------------
# featurize
# ---------------------------------------------------------------------------


def test_featurize_contract_acetate():
    g = smiles_to_graph("CC(=O)[O-]")
    assert g["smiles"] == "CC(=O)[O-]"
    assert g["num_atoms"] == 7  # 4 heavy + 3 H
    # both directions stored back-to-back with duplicated feature
    assert len(g["edge_indices"]) == 2 * 6  # 3 heavy bonds + 3 C-H
    assert len(g["bond_features"]) == len(g["edge_indices"])
    for k in range(0, len(g["edge_indices"]), 2):
        i, j = g["edge_indices"][k]
        j2, i2 = g["edge_indices"][k + 1]
        assert (i, j) == (i2, j2)
        assert g["bond_features"][k] == g["bond_features"][k + 1]
    # atom feature tuple layout: (symbol, charge, numHs, aromatic, hybridization)
    # numHs is 0 for every atom post-AddHs (RDKit GetTotalNumHs semantics)
    sym, charge, hs, arom, hyb = g["atom_features"][0]
    assert sym == "C" and hs == 0 and arom == 0 and hyb == "SP3"
    assert all(f[2] == 0 for f in g["atom_features"])


def test_featurize_invalid_raises_valueerror():
    with pytest.raises(ValueError):
        smiles_to_graph("not_a_smiles((")


def test_featurize_hydrogens_are_atoms():
    g = smiles_to_graph("C")
    assert g["num_atoms"] == 5
    h_feats = [f for f in g["atom_features"] if f[0] == "H"]
    assert len(h_feats) == 4


# ---------------------------------------------------------------------------
# parse (reference text formats)
# ---------------------------------------------------------------------------


def test_parse_raw_files(synthetic_raw):
    cations, anions = parse.load_ca_smiles(synthetic_raw["ca"])
    assert cations and anions
    assert all(k.startswith("C") for k in cations)
    assert all(k.startswith("A") for k in anions)
    vis = parse.parse_viscosity(synthetic_raw["viscosity"], cations, anions)
    assert len(vis) == 300
    assert {"pair_id", "cation_smiles", "anion_smiles", "T", "log_eta"} <= set(vis[0])
    mp = parse.parse_melting_point(synthetic_raw["mp"], cations, anions)
    assert len(mp) == 120
    assert "mp" in mp[0]


def test_parse_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        parse.load_ca_smiles(tmp_path / "nope.smi")


def test_convert_records_skips_bad_smiles():
    records = [
        {"pair_id": "C1_A1", "cation_smiles": "C", "anion_smiles": "[Cl-]", "mp": 300.0},
        {"pair_id": "C2_A1", "cation_smiles": "((bad", "anion_smiles": "[Cl-]", "mp": 300.0},
    ]
    graphs, report = parse.convert_records_to_graphs(records, "mp")
    assert len(graphs) == 1
    assert report.converted == 1
    assert report.skipped[0]["pair_id"] == "C2_A1"


# ---------------------------------------------------------------------------
# vocab + encode
# ---------------------------------------------------------------------------


def test_vocab_sorted_and_dense(encoded_viscosity):
    vocab = encoded_viscosity["vocab"]
    feats = list(vocab.atom_vocab)
    assert feats == sorted(feats)
    assert sorted(vocab.atom_vocab.values()) == list(range(vocab.atom_vocab_size))
    assert sorted(vocab.bond_vocab.values()) == list(range(vocab.bond_vocab_size))


def test_vocab_roundtrip_reference_format(tmp_path, encoded_viscosity):
    vocab = encoded_viscosity["vocab"]
    p = tmp_path / "vocab.pkl"
    vocab.save(p)
    loaded = Vocab.load(p)
    assert loaded.atom_vocab == vocab.atom_vocab
    d = reference_io.load_pickle(p)
    assert set(d) == {"atom_vocab", "bond_vocab", "atom_vocab_size", "bond_vocab_size"}


def test_encode_skips_oov_records():
    g_known = smiles_to_graph("C")
    vocab = build_vocab([[{"pair_id": "x", "cation_graph": g_known, "anion_graph": g_known}]])
    g_oov = smiles_to_graph("[Cl-]")
    records = [
        {"pair_id": "ok", "cation_graph": g_known, "anion_graph": g_known, "mp": 1.0},
        {"pair_id": "bad", "cation_graph": g_known, "anion_graph": g_oov, "mp": 2.0},
    ]
    out, report = encode_dataset(records, vocab)
    assert [r["pair_id"] for r in out] == ["ok"]
    assert report.skipped[0]["pair_id"] == "bad"


def test_encoded_record_layout(encoded_viscosity):
    rec = encoded_viscosity["viscosity"][0]
    assert set(rec) == {"pair_id", "cation", "anion", "T", "log_eta"}
    for side in ("cation", "anion"):
        g = rec[side]
        assert set(g) == {"atom_ids", "bond_ids", "edge_indices", "num_atoms"}
        assert len(g["bond_ids"]) == len(g["edge_indices"])
        assert g["num_atoms"] == len(g["atom_ids"])
        assert all(0 <= s < g["num_atoms"] and 0 <= t < g["num_atoms"]
                   for s, t in g["edge_indices"])


# ---------------------------------------------------------------------------
# packing
# ---------------------------------------------------------------------------


def _toy_graph(n_atoms, edges, atom_base=0, bond_base=0):
    return {
        "atom_ids": [atom_base + i for i in range(n_atoms)],
        "bond_ids": [bond_base + k for k in range(len(edges))],
        "edge_indices": edges,
        "num_atoms": n_atoms,
    }


def test_pack_graphs_layout():
    g1 = _toy_graph(3, [(0, 1), (1, 0), (1, 2), (2, 1)])
    g2 = _toy_graph(2, [(0, 1), (1, 0)])
    packed = pack_graphs([g1, g2], node_cap=8, edge_cap=8, n_graphs=2)
    assert packed.atom_ids.tolist()[:5] == [1, 2, 3, 1, 2]  # +1 offsets
    assert packed.node_graph.tolist()[:5] == [0, 0, 0, 1, 1]
    assert packed.node_local.tolist()[:5] == [0, 1, 2, 0, 1]
    assert packed.node_mask.sum() == 5
    assert packed.edge_mask.sum() == 6
    # second molecule's edges offset by 3
    real = packed.edge_mask
    assert set(zip(packed.src[real].tolist(), packed.dst[real].tolist())) == {
        (0, 1), (1, 0), (1, 2), (2, 1), (3, 4), (4, 3)
    }
    # edges sorted by destination
    assert list(packed.dst[real]) == sorted(packed.dst[real])


def test_pack_graphs_duplicate_edges_parity_mode():
    g = _toy_graph(2, [(0, 1), (1, 0)])
    packed = pack_graphs([g], node_cap=4, edge_cap=8, duplicate_edges=True)
    assert packed.edge_mask.sum() == 4  # each stored edge emitted fwd+rev


def test_pack_overflow_raises():
    g = _toy_graph(5, [(0, 1)])
    with pytest.raises(GraphCapacityError):
        pack_graphs([g], node_cap=4, edge_cap=8)
    with pytest.raises(GraphCapacityError):
        pack_graphs([g, g], node_cap=16, edge_cap=1)


def test_pad_dense_batch_reference_semantics():
    g = _toy_graph(2, [(0, 1), (1, 0)])
    out = pad_dense_batch([g], max_atoms=4, max_edges=3)
    assert out["atom"].shape == (1, 4)
    assert out["atom"][0].tolist() == [1, 2, 0, 0]
    assert out["conn"].shape == (1, 6, 2)
    # fwd/rev interleave per stored edge: (0,1),(1,0) then (1,0),(0,1)
    assert out["conn"][0, :4].tolist() == [[0, 1], [1, 0], [1, 0], [0, 1]]
    assert out["bond"][0, :4].tolist() == [1, 1, 2, 2]
    # silent truncation at max_edges*2
    out2 = pad_dense_batch([g], max_atoms=4, max_edges=1)
    assert out2["conn"].shape == (1, 2, 2)


def test_ion_pair_batch_and_loader(encoded_viscosity):
    records = encoded_viscosity["viscosity"]
    plan = plan_capacities(records, batch_size=16)
    batches = list(iter_batches(records, plan, shuffle=True, seed=1))
    total = sum(int(b.sample_mask.sum()) for b in batches)
    assert total == len(records)
    for b in batches:
        assert b.cation.atom_ids.shape == (plan.node_cap,)
        assert b.cation.bond_ids.shape == (plan.edge_cap,)
        assert b.temperature.shape == (plan.batch_size, 1)
        assert b.y.shape == (plan.batch_size,)
    # temperatures flow through
    assert any((b.temperature[b.sample_mask > 0] > 0).all() for b in batches)


def test_loader_deterministic_given_seed(encoded_viscosity):
    records = encoded_viscosity["viscosity"][:50]
    plan = plan_capacities(records, batch_size=8)
    a = [b.y[b.sample_mask > 0].tolist() for b in iter_batches(records, plan, shuffle=True, seed=7)]
    b = [b.y[b.sample_mask > 0].tolist() for b in iter_batches(records, plan, shuffle=True, seed=7)]
    assert a == b


def test_npz_roundtrip(tmp_path, encoded_viscosity):
    records = encoded_viscosity["viscosity"][:20]
    p = tmp_path / "shard.npz"
    reference_io.save_id_data_npz(records, p)
    loaded = reference_io.load_id_data_npz(p)
    assert len(loaded) == 20
    assert loaded[0]["pair_id"] == records[0]["pair_id"]
    assert loaded[0]["cation"]["atom_ids"] == records[0]["cation"]["atom_ids"]
    assert loaded[0]["cation"]["edge_indices"] == records[0]["cation"]["edge_indices"]
    np.testing.assert_allclose(loaded[3]["log_eta"], records[3]["log_eta"], rtol=1e-6)


def test_reference_pickle_roundtrip(tmp_path, encoded_viscosity):
    records = encoded_viscosity["viscosity"][:5]
    p = tmp_path / "viscosity_id_data.pkl"
    reference_io.save_pickle(records, p)
    loaded = reference_io.load_pickle(p)
    assert loaded == records
