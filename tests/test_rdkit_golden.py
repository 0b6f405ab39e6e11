"""Golden-fixture pinning of the pure-Python featurizer's RDKit contract.

The fixtures (tests/fixtures/rdkit_golden.json) pin atom/bond feature
tuples for 100+ diverse ionic-liquid-domain molecules — fused/kekulized
aromatics, stereo SMILES, charged N/P/S/B, hypervalent centers — against
RDKit's documented perception algorithms (see the file's provenance
note). Round 4 resolved every formerly-null conjugation flag by
certainty class (offline_golden_tools.py) and fixed two implicit-H bugs
the round-2 goldens had baked in (aromatic S and 3-connected aromatic N
each gained a spurious H — thiophene was 10 atoms, EMIM 20). Any
behavioral drift in data/chem/smiles.py now fails loudly here instead of
silently shifting vocabularies.
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
        assert conj is not None, (fx["smiles"], key, "unresolved null flag")
        assert bool(gconj) == conj, (fx["smiles"], key, "conjugation")


def test_fixture_coverage_is_broad():
    smiles = [f["smiles"] for f in FIXTURES]
    assert len(smiles) >= 100
    joined = " ".join(smiles)
    # charged N/P/S/B, hypervalent centers, kekulized + fused aromatics,
    # stereo markers
    for marker in ("[n+]", "[N+]", "[P+]", "[S+]", "[B-]", "[P-]", "[N-]",
                   "[S-]", "C1=CC=", "c1ccc2", "S(=O)(=O)", "/C=C", "[C@"):
        assert marker in joined, marker


def test_no_null_conjugation_flags_remain():
    for fx in FIXTURES:
        for b in fx["bonds"]:
            assert b[3] is not None, (fx["smiles"], b)


def test_featurizer_invariants_over_corpus():
    """Property invariants independent of the golden values: edge
    reversal closure with matched features, H atoms appended after the
    heavy block with exactly one heavy neighbor, and valence sums for
    neutral C/halogen atoms (offline_golden_tools._audit)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent / "fixtures"))
    from offline_golden_tools import _audit

    for fx in FIXTURES:
        g = smiles_to_graph(fx["smiles"], backend="python")
        heavy_n = sum(1 for a in g["atom_features"] if a[0] != "H")
        errs = _audit(fx["smiles"], g, heavy_n)
        assert not errs, (fx["smiles"], errs)


def test_aromatic_heteroatom_h_counts():
    """Formula-pinned regression for the round-4 implicit-H fixes:
    aromatic S and 3-connected neutral aromatic N carry NO implicit H
    (SMILES spec: aromatic-heteroatom hydrogens must be explicit)."""
    cases = {
        "c1ccsc1": 9,              # thiophene C4H4S
        "CCn1cc[n+](C)c1": 19,     # EMIM C6H11N2+
        "Cn1ccnc1": 12,            # 1-methylimidazole C4H6N2
        "Cn1cnc2ccccc21": 18,      # N-methylbenzimidazole C8H8N2
        "c1ccncc1": 11,            # pyridine C5H5N (unchanged control)
        "c1cc[nH]c1": 10,          # pyrrole C4H5N (explicit [nH] control)
        "c1ccoc1": 9,              # furan C4H4O (control)
    }
    for smi, want in cases.items():
        g = smiles_to_graph(smi, backend="python")
        assert g["num_atoms"] == want, (smi, g["num_atoms"], want)
