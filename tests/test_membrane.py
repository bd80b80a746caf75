"""Modeller.addMembrane and 4/5-site convertWater (reference
modeller.py:1189 addMembrane, :189 convertWater)."""
import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import app
from openmm_tpu import unit as u
from openmm_tpu.app.modeller import Modeller, _load_membrane_patch
from openmm_tpu.vec3 import Vec3


class _CroppedPatch(object):
    """Quarter-tile crop of the shipped POPC patch: keeps the test's
    membrane system small while exercising the full pipeline."""

    def __init__(self, fx=0.55, fy=0.55):
        top, pos, box = _load_membrane_patch("POPC")
        keep = []
        for res in top.residues():
            idx = [a.index for a in res.atoms()]
            com = pos[idx].mean(axis=0)
            if com[0] < box[0] * fx and com[1] < box[1] * fy:
                keep.append(res)
        # cropping breaks the patch's periodicity: prune residues that clash
        # with another residue through the NEW (smaller) periodic box, so
        # the relax dynamics start from a sane configuration
        nbox = np.array([box[0] * fx, box[1] * fy, box[2]])
        kept_idx = [np.array([a.index for a in r.atoms()]) for r in keep]
        coms = np.array([pos[i].mean(axis=0) for i in kept_idx])
        bad = set()
        for i in range(len(keep)):
            if i in bad:
                continue
            for j in range(i + 1, len(keep)):
                if j in bad:
                    continue
                d = coms[i] - coms[j]
                d -= np.round(d / nbox) * nbox
                if np.linalg.norm(d[:2]) > 1.2:
                    continue
                pi = pos[kept_idx[i]][:, None, :] - pos[kept_idx[j]][None]
                pi -= np.round(pi / nbox) * nbox
                if (np.sum(pi * pi, axis=-1) < 0.14 ** 2).any():
                    bad.add(j)
        keep = [r for k, r in enumerate(keep) if k not in bad]
        new_top = app.Topology()
        new_top.setPeriodicBoxVectors(u.Quantity(
            (Vec3(box[0] * fx, 0, 0), Vec3(0, box[1] * fy, 0),
             Vec3(0, 0, box[2])), u.nanometer))
        new_pos = []
        amap = {}
        ch = new_top.addChain("A")
        for res in keep:
            nr = new_top.addResidue(res.name, ch, res.id)
            for a in res.atoms():
                amap[a] = new_top.addAtom(a.name, a.element, nr)
                new_pos.append(Vec3(*pos[a.index]))
        for b in top.bonds():
            if b[0] in amap and b[1] in amap:
                new_top.addBond(amap[b[0]], amap[b[1]])
        self.topology = new_top
        self.positions = u.Quantity(new_pos, u.nanometer)


def small_peptide():
    pdb = app.PDBFile("/root/reference/examples/ala_ala_ala.pdb")
    m = Modeller(pdb.topology, pdb.positions)
    return m


def test_add_membrane_builds_and_relaxes():
    ff = app.ForceField("amber14-all.json", "amber14-lipid.json",
                        "amber14-tip3p.json")
    m = small_peptide()
    n_before = m.topology.getNumAtoms()
    patch = _CroppedPatch()
    m.addMembrane(ff, lipidType=patch, minimumPadding=0.3,
                  neutralize=False, _relax_iterations=8)
    names = set(r.name for r in m.topology.residues())
    assert "POP" in names and "HOH" in names
    n_after = m.topology.getNumAtoms()
    assert n_after > n_before + 1000
    # both leaflets kept lipids
    pos = np.asarray(u.strip(m.getPositions(), u.nanometer), float)
    lip_z = [pos[[a.index for a in r.atoms()]].mean(axis=0)[2]
             for r in m.topology.residues() if r.name == "POP"]
    lip_z = np.asarray(lip_z)
    assert (lip_z < np.median(lip_z)).any() and \
           (lip_z > np.median(lip_z)).any()
    assert np.isfinite(pos).all()
    # the merged system is simulatable
    system = ff.createSystem(m.topology, nonbondedMethod=app.PME,
                             nonbondedCutoff=0.85 * u.nanometer,
                             constraints=app.HBonds)
    assert system.getNumParticles() == n_after


def test_all_shipped_lipid_patches_load():
    """Every reference lipid patch ships converted (app/data/DLPC.pdb etc.):
    topology parses, coordinates are finite, both leaflets populated."""
    for name in ("DLPC", "DLPE", "DMPC", "DOPC", "DPPC", "POPC", "POPE"):
        top, pos, box = _load_membrane_patch(name)
        assert top.getNumAtoms() == len(pos), name
        assert np.isfinite(pos).all(), name
        assert top.getNumBonds() > top.getNumAtoms() // 2, name
        lip_res = [r for r in top.residues() if r.name != "HOH"]
        assert len(lip_res) >= 30, name
        lip_z = np.asarray([pos[[a.index for a in r.atoms()]].mean(axis=0)[2]
                            for r in lip_res])
        mid = np.median(lip_z)
        assert (lip_z < mid - 0.3).any() and (lip_z > mid + 0.3).any(), name


def test_convert_water_tip4pew_tip5p():
    m = Modeller(app.Topology(), u.Quantity([], u.nanometer))
    top = app.Topology()
    ch = top.addChain("A")
    pos = []
    for i in range(3):
        r = top.addResidue("HOH", ch, str(i + 1))
        o = top.addAtom("O", app.element.oxygen, r)
        h1 = top.addAtom("H1", app.element.hydrogen, r)
        h2 = top.addAtom("H2", app.element.hydrogen, r)
        top.addBond(o, h1)
        top.addBond(o, h2)
        base = np.array([i * 0.5, 0.0, 0.0])
        pos += [Vec3(*(base)), Vec3(*(base + [0.09572, 0, 0])),
                Vec3(*(base + [-0.024, 0.0927, 0]))]
    m = Modeller(top, u.Quantity(pos, u.nanometer))
    m.convertWater("tip4pew")
    assert m.topology.getNumAtoms() == 12
    p = np.asarray(u.strip(m.getPositions(), u.nanometer), float)
    # M site sits near the oxygen, between the hydrogens
    for i in range(3):
        o, h1, h2, msite = p[4 * i:4 * i + 4]
        assert np.linalg.norm(msite - o) < 0.05
        ref = 0.786646558 * o + 0.106676721 * h1 + 0.106676721 * h2
        assert np.linalg.norm(msite - ref) < 1e-6

    m2 = Modeller(top, u.Quantity(pos, u.nanometer))
    m2.convertWater("tip5p")
    assert m2.topology.getNumAtoms() == 15
    p5 = np.asarray(u.strip(m2.getPositions(), u.nanometer), float)
    for i in range(3):
        o = p5[5 * i]
        m1s, m2s = p5[5 * i + 3], p5[5 * i + 4]
        # lone pairs symmetric about the molecular plane, ~0.07 nm from O
        assert 0.05 < np.linalg.norm(m1s - o) < 0.09
        assert 0.05 < np.linalg.norm(m2s - o) < 0.09
        assert not np.allclose(m1s, m2s)
