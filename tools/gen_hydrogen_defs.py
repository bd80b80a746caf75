"""Generate data/hydrogen_defs.json for Modeller.addHydrogens from the
converted amber14 templates (role of the reference's data/hydrogens.xml):
for each residue (and its protonation variants / terminal forms), the list
of hydrogens with their parent heavy atoms."""
from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
DATA = os.path.join(HERE, "..", "openmm_tpu", "app", "data")


def hydrogens_of(data, resname):
    r = data["residues"].get(resname)
    if r is None:
        return None
    types = {t[0]: t[3] for t in data["atom_types"]}
    atoms = [a[0] for a in r["atoms"]]
    els = [types.get(a[1]) for a in r["atoms"]]
    parent = {}
    for i, j in r["bonds"]:
        if els[i] == "H" and els[j] != "H":
            parent[atoms[i]] = atoms[j]
        elif els[j] == "H" and els[i] != "H":
            parent[atoms[j]] = atoms[i]
    return [[h, p] for h, p in parent.items()]


def main():
    out = {}
    for src in ("amber14-all.json", "amber14-tip3p.json"):
        with open(os.path.join(DATA, src)) as f:
            data = json.load(f)
        for name in data["residues"]:
            hs = hydrogens_of(data, name)
            if hs:
                out.setdefault(name, hs)
    out["HOH"] = [["H1", "O"], ["H2", "O"]]
    path = os.path.join(DATA, "hydrogen_defs.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print("wrote %s (%d residues)" % (path, len(out)))


if __name__ == "__main__":
    main()
