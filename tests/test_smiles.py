"""Unit tests for the pure-Python SMILES parser (golden molecular graphs)."""

import pytest

from ionic_mpnn_tpu.data.chem.smiles import (
    SmilesParseError,
    add_hs,
    mol_from_smiles,
)


def _counts(mol):
    from collections import Counter

    return Counter(a.element for a in mol.atoms)


def test_methane():
    mol = mol_from_smiles("C")
    assert mol.num_atoms == 1
    assert mol.atoms[0].num_hs == 4
    full = add_hs(mol)
    assert full.num_atoms == 5
    assert len(full.bonds) == 4


def test_tetramethylammonium():
    # reference featurizer smoke molecule #1 (featurize.py:79)
    mol = mol_from_smiles("C[N+](C)(C)C")
    assert _counts(mol) == {"C": 4, "N": 1}
    n = next(a for a in mol.atoms if a.element == "N")
    assert n.formal_charge == 1
    assert n.num_hs == 0  # bracket atom: explicit H only
    full = add_hs(mol)
    assert full.num_atoms == 5 + 12  # 4 CH3


def test_acetate():
    # reference featurizer smoke molecule #2 (featurize.py:79)
    mol = mol_from_smiles("CC(=O)[O-]")
    assert _counts(mol) == {"C": 2, "O": 2}
    o_minus = next(a for a in mol.atoms if a.formal_charge == -1)
    assert o_minus.element == "O"
    assert o_minus.num_hs == 0
    orders = sorted(b.order for b in mol.bonds)
    assert orders == ["DOUBLE", "SINGLE", "SINGLE"]
    # C=O conjugated with the charged O lone pair
    c_o_single = [b for b in mol.bonds if b.order == "SINGLE" and mol.atoms[b.a2].element == "O"]
    assert any(b.conjugated for b in c_o_single)
    full = add_hs(mol)
    assert full.num_atoms == 4 + 3


def test_benzene_aromatic_form():
    mol = mol_from_smiles("c1ccccc1")
    assert mol.num_atoms == 6
    assert all(a.aromatic for a in mol.atoms)
    assert all(b.order == "AROMATIC" and b.in_ring for b in mol.bonds)
    assert all(a.num_hs == 1 for a in mol.atoms)
    assert all(a.hybridization == "SP2" for a in mol.atoms)
    assert len(mol.bonds) == 6


def test_benzene_kekulized_promoted():
    mol = mol_from_smiles("C1=CC=CC=C1")
    assert all(a.aromatic for a in mol.atoms)
    assert all(b.order == "AROMATIC" for b in mol.bonds)
    assert all(a.num_hs == 1 for a in mol.atoms)


def test_cyclohexane_not_aromatic():
    mol = mol_from_smiles("C1CCCCC1")
    assert not any(a.aromatic for a in mol.atoms)
    assert all(b.in_ring for b in mol.bonds)
    assert all(a.num_hs == 2 for a in mol.atoms)


def test_pyridinium_cation():
    mol = mol_from_smiles("CC[n+]1ccccc1")
    n = next(a for a in mol.atoms if a.element == "N")
    assert n.formal_charge == 1 and n.aromatic
    ring_bonds = [b for b in mol.bonds if b.in_ring]
    assert len(ring_bonds) == 6
    assert all(b.order == "AROMATIC" for b in ring_bonds)


def test_imidazolium():
    mol = mol_from_smiles("CCn1cc[n+](C)c1")
    ns = [a for a in mol.atoms if a.element == "N"]
    assert len(ns) == 2
    assert sum(a.formal_charge for a in ns) == 1
    assert all(a.aromatic for a in ns)


def test_bf4_anion():
    mol = mol_from_smiles("[B-](F)(F)(F)F")
    b = mol.atoms[0]
    assert b.element == "B" and b.formal_charge == -1
    assert len(mol.bonds) == 4
    assert b.num_hs == 0


def test_pf6_anion():
    mol = mol_from_smiles("F[P-](F)(F)(F)(F)F")
    p = next(a for a in mol.atoms if a.element == "P")
    assert p.formal_charge == -1
    assert len(mol.bonds) == 6


def test_triflate():
    mol = mol_from_smiles("C(F)(F)(F)S(=O)(=O)[O-]")
    s = next(a for a in mol.atoms if a.element == "S")
    assert s.num_hs == 0
    assert _counts(mol)["F"] == 3 and _counts(mol)["O"] == 3


def test_dicyanamide():
    mol = mol_from_smiles("N#C[N-]C#N")
    center = mol.atoms[2]
    assert center.formal_charge == -1
    triples = [b for b in mol.bonds if b.order == "TRIPLE"]
    assert len(triples) == 2
    sp_atoms = [a for a in mol.atoms if a.hybridization == "SP"]
    assert len(sp_atoms) == 4  # both C and both terminal N


def test_dot_separated_pair_stays_one_mol():
    mol = mol_from_smiles("C[N+](C)(C)C.[Cl-]")
    assert _counts(mol) == {"C": 4, "N": 1, "Cl": 1}
    cl = next(a for a in mol.atoms if a.element == "Cl")
    assert cl.formal_charge == -1
    # no bond crosses the dot
    cl_bonds = [b for b in mol.bonds if cl.idx in (b.a1, b.a2)]
    assert cl_bonds == []


def test_branch_and_ring_interplay():
    mol = mol_from_smiles("CC1(C)CC1")  # gem-dimethyl cyclopropane
    ring_bonds = [b for b in mol.bonds if b.in_ring]
    assert len(ring_bonds) == 3


def test_two_digit_ring_closure():
    mol = mol_from_smiles("C%10CC%10")
    assert len([b for b in mol.bonds if b.in_ring]) == 3


def test_explicit_h_in_brackets():
    mol = mol_from_smiles("[NH4+]")
    assert mol.atoms[0].num_hs == 4
    full = add_hs(mol)
    assert full.num_atoms == 5


def test_addhs_ordering_matches_rdkit_convention():
    # Hs appended after heavy atoms, grouped by parent in index order.
    mol = add_hs(mol_from_smiles("CO"))
    assert [a.element for a in mol.atoms[:2]] == ["C", "O"]
    h_parents = []
    for b in mol.bonds:
        if mol.atoms[b.a2].element == "H":
            h_parents.append(b.a1)
    assert h_parents == [0, 0, 0, 1]


@pytest.mark.parametrize(
    "bad",
    ["", "C(", "C)", "C1CC", "C#=C", "[Xx", "C..", "1CC", "%1C"],
)
def test_malformed_smiles_raise(bad):
    with pytest.raises(SmilesParseError):
        mol_from_smiles(bad)


def test_ring_bond_exactness_biphenyl():
    mol = mol_from_smiles("c1ccccc1-c1ccccc1")
    connecting = [b for b in mol.bonds if not b.in_ring]
    assert len(connecting) == 1
    assert connecting[0].order == "SINGLE"  # aromatic atoms but acyclic bond
