#!/usr/bin/env python
"""Regenerate rdkit_golden.json from a REAL RDKit install.

Run on any machine with rdkit (reference pin: rdkit 2022.09,
/root/reference/environment.yml:7). Overwrites every value — including
the conjugation flags the offline audit left null — with RDKit ground
truth, making the fixture test a true cross-implementation check.

    python tests/fixtures/regen_rdkit_golden.py
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from ionic_mpnn_tpu.data.featurize import have_rdkit, smiles_to_graph

HERE = Path(__file__).parent
PATH = HERE / "rdkit_golden.json"


def main():
    if not have_rdkit():
        raise SystemExit("rdkit not importable — run on a machine with rdkit")
    doc = json.loads(PATH.read_text())
    for fx in doc["fixtures"]:
        g = smiles_to_graph(fx["smiles"], backend="rdkit")
        heavy_n = sum(1 for a in g["atom_features"] if a[0] != "H")
        fx["num_heavy"] = heavy_n
        fx["num_atoms_with_h"] = g["num_atoms"]
        fx["atoms"] = [list(a) for a in g["atom_features"][:heavy_n]]
        seen = set()
        bonds = []
        for (i, j), b in zip(g["edge_indices"], g["bond_features"]):
            key = (min(i, j), max(i, j))
            if key in seen or max(i, j) >= heavy_n:
                continue
            seen.add(key)
            bonds.append([key[0], key[1], b[0], bool(b[1]), bool(b[2])])
        fx["bonds"] = sorted(bonds)
    doc["_provenance"] = (
        "Generated from a live RDKit run by regen_rdkit_golden.py — all "
        "fields are RDKit ground truth (no unpinned nulls)."
    )
    PATH.write_text(json.dumps(doc, indent=1))
    print(f"regenerated {len(doc['fixtures'])} fixtures from live RDKit")


if __name__ == "__main__":
    main()
