"""Amber force-field JSON data validation: systems built from the converted
parameter sets must match systems built by the (independently validated)
AmberPrmtopFile reader on the reference fixture
alanine-dipeptide-explicit.{pdb,prmtop,inpcrd} (TestForceField.py patterns)."""
import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.app import (AmberInpcrdFile, AmberPrmtopFile, ForceField,
                            PDBFile)

from helpers import reference_platform

SYS = "/root/reference/wrappers/python/tests/systems/"


@pytest.fixture(scope="module")
def dipeptide():
    pdb = PDBFile(SYS + "alanine-dipeptide-explicit.pdb")
    inpcrd = AmberInpcrdFile(SYS + "alanine-dipeptide-explicit.inpcrd")
    return pdb, inpcrd


def component_energies(system, positions, box):
    if box is not None:
        system.setDefaultPeriodicBoxVectors(
            *[v for v in u.strip(box, u.nanometer)])
    for i, f in enumerate(system.getForces()):
        f.setForceGroup(i)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    out = {}
    for i, f in enumerate(system.getForces()):
        e = ctx.getState(getEnergy=True,
                         groups=1 << i).getPotentialEnergy()._value
        out[type(f).__name__] = out.get(type(f).__name__, 0.0) + e
    return out


def test_ff_matches_prmtop_nonbonded(dipeptide):
    """Charges/LJ/exceptions/PME from the converted JSON force field must
    reproduce the prmtop-built system's nonbonded energy exactly."""
    pdb, inpcrd = dipeptide
    ff = ForceField("amber99sbildn.json", "tip3p.xml")
    sys_ff = ff.createSystem(pdb.topology, nonbondedMethod=mm.app.PME,
                             nonbondedCutoff=0.9, constraints=None,
                             rigidWater=False)
    prm = AmberPrmtopFile(SYS + "alanine-dipeptide-explicit.prmtop")
    sys_am = prm.createSystem(nonbondedMethod=mm.app.PME,
                              nonbondedCutoff=0.9, constraints=None,
                              rigidWater=False)
    assert sys_ff.getNumParticles() == sys_am.getNumParticles()
    pos = inpcrd.getPositions()
    box = inpcrd.getBoxVectors()
    e_ff = component_energies(sys_ff, pos, box)
    e_am = component_energies(sys_am, pos, box)
    assert abs(e_ff["NonbondedForce"] - e_am["NonbondedForce"]) \
        < 1e-4 * abs(e_am["NonbondedForce"])
    # angle energies agree (water angle vs amber H-H bond differ by model)
    assert abs(e_ff["HarmonicAngleForce"] - e_am["HarmonicAngleForce"]) < 0.01


def test_amber14_builds_protein(dipeptide):
    pdb, inpcrd = dipeptide
    ff = ForceField("amber14-protein.json", "amber14-tip3p.json")
    system = ff.createSystem(pdb.topology, nonbondedMethod=mm.app.PME,
                             nonbondedCutoff=0.9,
                             constraints=mm.app.HBonds)
    assert system.getNumParticles() == 2269
    assert system.getNumConstraints() >= 3 * 749   # rigid waters
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     reference_platform())
    ctx.setPositions(inpcrd.getPositions())
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert np.isfinite(e)


def test_amber14_all_loads():
    ff = ForceField("amber14-all.json")
    assert "ALA" in ff._templates and "DA" in ff._templates \
        and "G" in ff._templates


def test_modeller_add_hydrogens():
    """Strip and rebuild hydrogens (TestModeller.py addHydrogens pattern)."""
    from openmm_tpu.app import Modeller
    pdb = PDBFile(SYS + "alanine-dipeptide-implicit.pdb")
    mod = Modeller(pdb.topology, pdb.getPositions())
    mod.delete([a for a in mod.topology.atoms()
                if a.element and a.element.symbol == "H"])
    assert mod.topology.getNumAtoms() == 10
    ff = ForceField("amber99sbildn.json", "tip3p.xml")
    mod.addHydrogens(ff)
    assert mod.topology.getNumAtoms() == 22
    system = ff.createSystem(mod.topology)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     reference_platform())
    ctx.setPositions(mod.getPositions())
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert np.isfinite(e) and e < 1e5


def test_real_protein_builds_with_amber14():
    """1T2Y miniprotein: PDB -> addHydrogens -> amber14 system, finite
    energy (terminal templates, disulfide handling, all 7 residue types)."""
    from openmm_tpu.app import Modeller
    pdb = PDBFile(SYS + "1T2Y.pdb")
    ff = ForceField("amber14-protein.json", "amber14-tip3p.json")
    mod = Modeller(pdb.topology, pdb.getPositions())
    mod.addHydrogens(ff)
    assert mod.topology.getNumAtoms() == 271
    system = ff.createSystem(mod.topology)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     reference_platform())
    ctx.setPositions(mod.getPositions())
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert np.isfinite(e) and abs(e) < 1e6


def test_multisite_water_extra_particles():
    """addExtraParticles + tip4pew/tip5p templates with virtual sites:
    self-water site-hydrogen pairs must be excluded (excludeWith)."""
    from openmm_tpu.app import Modeller, Topology
    from openmm_tpu.app.element import Element
    for model, n_atoms, n_vsites in (("tip4pew", 8, 2), ("tip5p", 10, 4)):
        top = Topology()
        c = top.addChain()
        pos = []
        for k in range(2):
            r = top.addResidue("HOH", c)
            o = top.addAtom("O", Element.getBySymbol("O"), r)
            h1 = top.addAtom("H1", Element.getBySymbol("H"), r)
            h2 = top.addAtom("H2", Element.getBySymbol("H"), r)
            top.addBond(o, h1)
            top.addBond(o, h2)
            base = np.array([0.0, 0.0, 0.35 * k])
            pos += [mm.Vec3(*base), mm.Vec3(*(base + [0.09572, 0, 0])),
                    mm.Vec3(*(base + [-0.0239, 0.0927, 0]))]
        ff = ForceField(model + ".json")
        mod = Modeller(top, u.Quantity(pos, u.nanometer))
        mod.addExtraParticles(ff)
        assert mod.topology.getNumAtoms() == n_atoms
        system = ff.createSystem(mod.topology)
        assert sum(1 for i in range(n_atoms)
                   if system.isVirtualSite(i)) == n_vsites
        ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                         reference_platform())
        ctx.setPositions(mod.getPositions())
        ctx.computeVirtualSites()
        e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
        # a ~0.35 nm dimer is mildly repulsive; unexcluded self-water pairs
        # would show up as thousands of kJ/mol
        assert 0 < e < 100, (model, e)
