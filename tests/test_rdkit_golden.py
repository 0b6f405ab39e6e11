"""Golden-fixture pinning of the pure-Python featurizer's RDKit contract.

The fixtures (tests/fixtures/rdkit_golden.json) pin atom/bond feature
tuples for 60 diverse ionic-liquid-domain molecules — fused/kekulized
aromatics, charged N/P/S/B, hypervalent centers — against RDKit's
documented perception algorithms (see the file's provenance note; this
machine has no RDKit, so genuinely-ambiguous conjugation flags are null
and skipped). Any behavioral drift in data/chem/smiles.py now fails
loudly here instead of silently shifting vocabularies.
"""

import json
from pathlib import Path

import pytest

from ionic_mpnn_tpu.data import smiles_to_graph

FIXTURES = json.loads(
    (Path(__file__).parent / "fixtures" / "rdkit_golden.json").read_text()
)["fixtures"]


@pytest.mark.parametrize("fx", FIXTURES, ids=[f["smiles"] for f in FIXTURES])
def test_featurizer_matches_golden(fx):
    g = smiles_to_graph(fx["smiles"], backend="python")
    assert g["num_atoms"] == fx["num_atoms_with_h"], "AddHs atom count"
    heavy = [list(a) for a in g["atom_features"][: fx["num_heavy"]]]
    assert heavy == fx["atoms"], "atom feature tuples"
    # H atoms appended by AddHs: symbol H, charge 0, 0 aromatic, S
    for a in g["atom_features"][fx["num_heavy"]:]:
        assert a[0] == "H" and a[1] == 0 and a[3] == 0 and a[4] == "S"

    seen = set()
    got = {}
    for (i, j), b in zip(g["edge_indices"], g["bond_features"]):
        key = (min(i, j), max(i, j))
        if key in seen:
            continue
        seen.add(key)
        if max(i, j) < fx["num_heavy"]:
            got[key] = b
    want = {(b[0], b[1]): (b[2], b[3], b[4]) for b in fx["bonds"]}
    assert set(got) == set(want), "bond connectivity"
    for key, (btype, conj, ring) in want.items():
        gtype, gconj, gring = got[key]
        assert gtype == btype, (fx["smiles"], key, "bond type")
        assert bool(gring) == ring, (fx["smiles"], key, "ring flag")
        if conj is not None:  # null = unpinned (offline ambiguity)
            assert bool(gconj) == conj, (fx["smiles"], key, "conjugation")


def test_fixture_coverage_is_broad():
    smiles = [f["smiles"] for f in FIXTURES]
    assert len(smiles) >= 50
    joined = " ".join(smiles)
    # charged N/P/S/B, hypervalent centers, kekulized + fused aromatics
    for marker in ("[n+]", "[N+]", "[P+]", "[S+]", "[B-]", "[P-]", "[N-]",
                   "[S-]", "C1=CC=", "c1ccc2", "S(=O)(=O)"):
        assert marker in joined, marker
