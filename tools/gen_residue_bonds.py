"""Generate standard-residue bond definitions (data/residue_bonds.json) from
converted force-field templates (amber14-all.json + amber14-tip3p.json).

Heavy-atom connectivity comes from the force-field residue templates; PDB
hydrogen naming varies between sources, so hydrogens are deliberately left
out here — PDBFile attaches unbonded hydrogens to the nearest heavy atom in
the same residue (chemically unambiguous). Inter-residue linkages use the
"-" previous-residue prefix convention of Topology.createStandardBonds.
"""
from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "openmm_tpu", "app", "data")


def main():
    bonds_by_res = {}
    for src in ("amber14-all.json", "amber14-tip3p.json"):
        with open(os.path.join(DATA, src)) as f:
            data = json.load(f)
        for name, r in data["residues"].items():
            if name.startswith(("N", "C")) and name[1:] in data["residues"]:
                continue    # terminal variants: same heavy skeleton
            atoms = [a[0] for a in r["atoms"]]
            elements = []
            for aname, tname, _extra in r["atoms"]:
                # element from the atom type table
                el = None
                for t in data["atom_types"]:
                    if t[0] == tname:
                        el = t[3]
                        break
                elements.append(el)
            heavy = [el is not None and el != "H" for el in elements]
            out = []
            for i, j in r["bonds"]:
                if heavy[i] and heavy[j]:
                    out.append([atoms[i], atoms[j]])
            names = set(atoms)
            external = {atoms[i] for i in r["external"]}
            if "N" in external:
                out.append(["-C", "N"])      # peptide linkage
            if {"N", "CA", "C", "O"} <= names:
                out.append(["C", "OXT"])     # C-terminal carboxylate
            if "P" in external and "O3'" in names:
                out.append(["-O3'", "P"])    # phosphodiester linkage
            if out:
                bonds_by_res.setdefault(name, out)
    # water (all common PDB names)
    for w in ("HOH", "WAT", "H2O", "TIP3"):
        bonds_by_res[w] = [["O", "H1"], ["O", "H2"]]
    out_path = os.path.join(DATA, "residue_bonds.json")
    with open(out_path, "w") as f:
        json.dump(bonds_by_res, f, indent=0, sort_keys=True)
    print("wrote %s (%d residues)" % (out_path, len(bonds_by_res)))


if __name__ == "__main__":
    main()
