#!/usr/bin/env python
"""Offline golden-fixture maintenance (no-RDKit machines).

Round-4 hardening of ``rdkit_golden.json`` (VERDICT r3 item 5):

1. ``fill-nulls`` — resolve the conjugation flags the round-2 offline
   audit left null, by certainty class:

   * **nopi**: the molecule contains no DOUBLE/TRIPLE/AROMATIC bond at
     all → conjugation is False for every bond under ANY definition
     (RDKit's included) — pinned False, certain.
   * **aromatic**: the bond itself is AROMATIC → RDKit marks every
     aromatic bond conjugated (``setConjugation``; empirically stable
     across releases) — pinned True, certain.
   * **featurizer**: remaining bonds (hypervalent S=O/P=O neighborhoods
     etc.) — pinned to the pure-Python featurizer's documented
     rule (π-resonance adjacency, ``data/chem/smiles.py::
     _assign_conjugation``), which for sulfonate/sulfate S-O systems
     says True by resonance. RDKit's exact verdict on these depends on
     internal candidacy rules not reproducible offline; the pin makes
     drift in OUR featurizer loud, and ``regen_rdkit_golden.py``
     overwrites all flags with RDKit ground truth when available.

2. ``extend`` — append new golden molecules (stereo SMILES, polycyclic
   fused aromatics, charged hypervalent centers, IL workhorses) whose
   fixture values are computed by the featurizer and then audited by
   independent invariants (H-count vs valence model, edge reversal
   closure, aromatic-ring consistency) before being accepted.

Usage: python tests/fixtures/offline_golden_tools.py fill-nulls|extend|all
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ionic_mpnn_tpu.data import smiles_to_graph

HERE = Path(__file__).parent
PATH = HERE / "rdkit_golden.json"

# New corpus (round 4): parse-audited additions. Classes annotated for
# the human reviewer; values are featurizer-computed + invariant-audited.
NEW_SMILES = [
    # --- stereo markers (must parse; features are stereo-independent) ---
    "C/C=C\\C",                      # cis-2-butene
    "CC/C=C/CC",                     # trans-3-hexene
    "C[C@H](N)C(=O)O",               # L-alanine (tetrahedral tag)
    "C[C@@H](O)CC",                  # chiral butanol
    "F/C=C/F",                       # trans-difluoroethene
    # --- polycyclic / fused aromatics ---
    "c1ccc2cc3ccccc3cc2c1",          # anthracene
    "Cc1ccc2ccccc2c1",               # 2-methylnaphthalene
    "C[n+]1ccc2ccccc2c1",            # N-methylquinolinium
]


def _clean_new_smiles():
    out = list(NEW_SMILES)
    out += [
        "c1ccc2cnccc2c1",            # isoquinoline
        "c1ccc2[nH]c3ccccc3c2c1",    # carbazole
        "Cn1cnc2ccccc21",            # N-methylbenzimidazole
        # --- IL cations ---
        "CCCCn1cc[n+](C)c1",         # BMIM
        "CCCCCCCCn1cc[n+](C)c1",     # OMIM (long chain)
        "CCCC[N+]1(C)CCCC1",         # butyl-methylpyrrolidinium
        "CCCC[P+](CCCC)(CCCC)CCCC",  # tetrabutylphosphonium
        "C[N+]1(C)CCOCC1",           # dimethylmorpholinium
        "C[n+]1ccc(C)cc1",           # 1,4-dimethylpyridinium
        "OCC[N+](C)(C)C",            # choline
        "CC[N+](CC)(CC)CC",          # tetraethylammonium
        "C[S+](C)CC",                # ethyldimethylsulfonium
        "CCCCn1cc[n+](C)c1C",        # BMMIM (C2-methylated)
        # --- anions ---
        "FC(F)(F)C(=O)[O-]",         # trifluoroacetate
        "CS(=O)(=O)[O-]",            # mesylate
        "CCOS(=O)(=O)[O-]",          # ethylsulfate
        "CCCCCCCCOS(=O)(=O)[O-]",    # octylsulfate
        "FS(=O)(=O)[O-]",            # fluorosulfonate
        "[N-]=[N+]=[N-]",            # azide (charged cumulene)
        "P(=O)(O)([O-])O",           # dihydrogenphosphate
        "OC(=O)C(=O)[O-]",           # hydrogenoxalate
        "CCCC(=O)[O-]",              # butanoate
        "[O-]c1ccccc1",              # phenolate
        # --- neutral stress / functional groups ---
        "O=[N+]([O-])c1ccccc1",      # nitrobenzene (charged hypervalent N)
        "N#Cc1ccccc1",               # benzonitrile
        "CN(C)C=O",                  # DMF (amide conjugation)
        "CCOC(=O)C",                 # ethyl acetate
        "CS(=O)(=O)C",               # dimethylsulfone
        "O=C1CCCCC1",                # cyclohexanone (ring + exo C=O)
        "C1CCOC1",                   # THF
        "C1CCCCC1",                  # cyclohexane
        "OCCO",                      # ethylene glycol
        "ClC(Cl)(Cl)Cl",             # carbon tetrachloride
        "BrCCBr",                    # 1,2-dibromoethane
        "CCI",                       # iodoethane
        "FC(F)(F)c1ccccc1",          # benzotrifluoride
        "[NH3+]CC(=O)[O-]",          # glycine zwitterion
        "CC(C)=CC",                  # 2-methyl-2-butene
        "Cc1cccc(C)c1",              # m-xylene
        "CCCCCCCCCCCC",              # dodecane (long chain)
        "C1=CC2=CC=CC=C2C=C1",       # kekulized naphthalene
    ]
    return out


_VALENCE_H_MODEL = {
    # element -> expected (sigma+pi) valence for the neutral atom in its
    # common organic state; used ONLY as an audit (bond orders + H == v)
    "C": 4, "N": 3, "O": 2, "F": 1, "Cl": 1, "Br": 1, "I": 1, "H": 1,
}
_ORDER = {"SINGLE": 1, "DOUBLE": 2, "TRIPLE": 3, "AROMATIC": 1.5}


def _audit(smiles: str, g: dict, heavy_n: int) -> list:
    """Independent invariants; returns a list of violation strings."""
    errs = []
    n = g["num_atoms"]
    # edge reversal closure with equal bond features
    pairs = {}
    for (i, j), b in zip(g["edge_indices"], g["bond_features"]):
        if not (0 <= i < n and 0 <= j < n):
            errs.append(f"edge index out of range: {(i, j)}")
        pairs.setdefault((min(i, j), max(i, j)), []).append(tuple(b))
    for key, feats in pairs.items():
        if len(feats) != 2 or feats[0] != feats[1]:
            errs.append(f"edge {key} not stored as a matched fwd+rev pair")
    # H atoms: appended after heavy atoms, each with exactly one bond to
    # a heavy atom
    for idx in range(heavy_n, n):
        sym = g["atom_features"][idx][0]
        if sym != "H":
            errs.append(f"atom {idx} after heavy block is {sym}, not H")
        nbrs = [j for (i, j) in g["edge_indices"] if i == idx]
        if len(nbrs) != 1 or nbrs[0] >= heavy_n:
            errs.append(f"H atom {idx} has neighbors {nbrs}")
    # valence audit on neutral unbracketed-model atoms: sum of bond
    # orders (counting each undirected bond once) must equal the model
    # valence; aromatic atoms use the 1.5-order sum rounded to int
    order_sum = [0.0] * n
    for (i, j), b in zip(g["edge_indices"], g["bond_features"]):
        if i < j:
            continue  # count each undirected bond once via the rev copy
        o = _ORDER[b[0]]
        order_sum[i] += o
        order_sum[j] += o
    for idx in range(n):
        sym, charge = g["atom_features"][idx][0], g["atom_features"][idx][1]
        if charge != 0 or sym not in _VALENCE_H_MODEL:
            continue
        v = order_sum[idx]
        want = _VALENCE_H_MODEL[sym]
        # aromatic ring sums come out at k*1.5 (+ substituent); accept
        # within 0.5 of the model (benzene C: 2*1.5+1 = 4.0 exactly)
        if sym in ("N", "O", "S", "P"):
            continue  # multivalent/lone-pair cases — skip, not certain
        if abs(v - want) > 0.51:
            errs.append(f"valence audit: atom {idx} ({sym}) order-sum {v} != {want}")
    return errs


def fixture_from_smiles(smiles: str) -> dict:
    g = smiles_to_graph(smiles, backend="python")
    heavy_n = sum(1 for a in g["atom_features"] if a[0] != "H")
    errs = _audit(smiles, g, heavy_n)
    if errs:
        raise ValueError(f"{smiles}: " + "; ".join(errs))
    seen = set()
    bonds = []
    for (i, j), b in zip(g["edge_indices"], g["bond_features"]):
        key = (min(i, j), max(i, j))
        if key in seen or max(i, j) >= heavy_n:
            continue
        seen.add(key)
        bonds.append([key[0], key[1], b[0], bool(b[1]), bool(b[2])])
    return {
        "smiles": smiles,
        "num_heavy": heavy_n,
        "num_atoms_with_h": g["num_atoms"],
        "atoms": [list(a) for a in g["atom_features"][:heavy_n]],
        "bonds": sorted(bonds),
    }


def fill_nulls(doc: dict) -> dict:
    counts = {"nopi": 0, "aromatic": 0, "featurizer": 0}
    for fx in doc["fixtures"]:
        has_pi = any(b[2] in ("DOUBLE", "TRIPLE", "AROMATIC")
                     for b in fx["bonds"])
        computed = None
        for b in fx["bonds"]:
            if b[3] is not None:
                continue
            if not has_pi:
                b[3] = False
                counts["nopi"] += 1
            elif b[2] == "AROMATIC":
                b[3] = True
                counts["aromatic"] += 1
            else:
                if computed is None:
                    computed = fixture_from_smiles(fx["smiles"])
                match = [cb for cb in computed["bonds"]
                         if cb[0] == b[0] and cb[1] == b[1]]
                assert len(match) == 1, (fx["smiles"], b)
                b[3] = match[0][3]
                counts["featurizer"] += 1
    print("filled nulls:", counts)
    return doc


def extend(doc: dict) -> dict:
    existing = {fx["smiles"] for fx in doc["fixtures"]}
    added, failed = 0, []
    for smi in _clean_new_smiles():
        if smi in existing:
            continue
        try:
            fx = fixture_from_smiles(smi)
        except Exception as e:  # parse/audit failure: report, don't add
            failed.append((smi, str(e)))
            continue
        doc["fixtures"].append(fx)
        added += 1
        n_arom = sum(1 for b in fx["bonds"] if b[2] == "AROMATIC")
        print(f"  + {smi}: heavy={fx['num_heavy']} "
              f"withH={fx['num_atoms_with_h']} bonds={len(fx['bonds'])} "
              f"aromatic={n_arom}")
    print(f"added {added}; total {len(doc['fixtures'])}")
    for smi, err in failed:
        print(f"  FAILED {smi}: {err}")
    return doc


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    doc = json.loads(PATH.read_text())
    if mode in ("fill-nulls", "all"):
        doc = fill_nulls(doc)
    if mode in ("extend", "all"):
        doc = extend(doc)
    doc["_provenance"] = (
        doc["_provenance"].split(" [r4]")[0]
        + " [r4] Null conjugation flags resolved offline by certainty "
        "class: molecules with no pi bonds pinned False (certain under "
        "any definition); aromatic bonds pinned True (RDKit marks every "
        "aromatic bond conjugated); remaining hypervalent S=O/P=O "
        "neighborhoods pinned to the pure-Python featurizer's resonance "
        "rule (True for sulfonate/sulfate S-O systems) — these last are "
        "a featurizer contract, not RDKit-certain; regen_rdkit_golden.py "
        "overwrites everything with RDKit ground truth when available. "
        "Corpus extended to 100+ molecules (stereo SMILES, fused "
        "polycyclics, charged hypervalent centers); new entries are "
        "featurizer-computed and audited by independent invariants "
        "(reversal closure, H placement, valence sums) in "
        "offline_golden_tools.py."
    )
    PATH.write_text(json.dumps(doc, indent=1))
    print(f"wrote {PATH}")


if __name__ == "__main__":
    main()
