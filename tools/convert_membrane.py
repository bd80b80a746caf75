"""Convert a pre-equilibrated membrane patch PDB (reference
app/data/POPC.pdb etc.) into the compact .npz the repo ships: positions,
per-atom name/element/residue indices, box, and intra-residue bonds.
Coordinate DATA, not code — same policy as the converted force-field JSON.
"""
import sys

import numpy as np


def convert(pdb_path, out_path):
    names, elems, resnames, resids, chains = [], [], [], [], []
    pos = []
    conects = []
    for line in open(pdb_path):
        if line.startswith(("ATOM", "HETATM")):
            names.append(line[12:16].strip())
            resnames.append(line[17:21].strip())
            chains.append(line[21])
            resids.append(line[22:26].strip())
            pos.append([float(line[30:38]), float(line[38:46]),
                        float(line[46:54])])
            el = line[76:78].strip()
            if not el:
                nm = names[-1]
                el = nm[0] if not nm[0].isdigit() else nm[1]
            elems.append(el)
        elif line.startswith("CONECT"):
            # fixed 5-char serial columns (they merge above 9999)
            cols = [line[6 + 5 * k:11 + 5 * k].strip() for k in range(5)]
            cols = [c for c in cols if c]
            a = int(cols[0]) - 1
            for b in cols[1:]:
                b = int(b) - 1
                conects.append((min(a, b), max(a, b)))
        elif line.startswith("CRYST1"):
            box = [float(line[6:15]), float(line[15:24]), float(line[24:33])]
    uniq_names = sorted(set(names))
    uniq_res = sorted(set(resnames))
    uniq_el = sorted(set(elems))
    np.savez_compressed(
        out_path,
        positions=np.asarray(pos, np.float32) * 0.1,        # A -> nm
        name_idx=np.asarray([uniq_names.index(n) for n in names], np.int32),
        names=np.asarray(uniq_names),
        res_idx=np.asarray([uniq_res.index(r) for r in resnames], np.int32),
        resnames=np.asarray(uniq_res),
        elem_idx=np.asarray([uniq_el.index(e) for e in elems], np.int32),
        elements=np.asarray(uniq_el),
        resid=np.asarray(resids),
        chain=np.asarray(chains),
        box_nm=np.asarray(box, np.float64) * 0.1,
        bonds=np.asarray(sorted(set(conects)), np.int32).reshape(-1, 2)
        if conects else np.zeros((0, 2), np.int32),
    )


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
