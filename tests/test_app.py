"""App-layer tests: Topology, PDBFile round-trip, ForceField.createSystem,
Simulation + reporters, Modeller (patterns of wrappers/python/tests/
TestForceField.py, TestSimulation.py, TestPdbFile.py, TestModeller.py)."""
import io
import math
import os

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.app import (DCDReporter, ForceField, Modeller, PDBFile,
                            PDBReporter, Simulation, StateDataReporter,
                            CheckpointReporter, Topology, Element, PME,
                            NoCutoff, CutoffPeriodic, HBonds)


def water_topology(n=3, spacing=0.5):
    top = Topology()
    chain = top.addChain()
    positions = []
    d_oh = 0.09572
    theta = 104.52 * math.pi / 180
    o_el = Element.getBySymbol("O")
    h_el = Element.getBySymbol("H")
    for i in range(n):
        res = top.addResidue("HOH", chain)
        o = top.addAtom("O", o_el, res)
        h1 = top.addAtom("H1", h_el, res)
        h2 = top.addAtom("H2", h_el, res)
        top.addBond(o, h1)
        top.addBond(o, h2)
        base = np.array([i * spacing, 0.1 * i, 0.0])
        positions.append(mm.Vec3(*base))
        positions.append(mm.Vec3(*(base + [d_oh, 0, 0])))
        positions.append(mm.Vec3(*(base + [d_oh * math.cos(theta),
                                           d_oh * math.sin(theta), 0])))
    return top, positions


def test_forcefield_water():
    top, positions = water_topology(4)
    ff = ForceField("tip3p.xml")
    system = ff.createSystem(top, nonbondedMethod=NoCutoff, rigidWater=True)
    assert system.getNumParticles() == 12
    assert system.getNumConstraints() == 12  # 3 per rigid water
    # masses
    assert abs(system.getParticleMass(0)._value - 15.99943) < 1e-6
    # charges from the NonbondedForce
    nb = [f for f in system.getForces()
          if isinstance(f, mm.NonbondedForce)][0]
    q, s, e = nb.getParticleParameters(0)
    assert abs(q._value + 0.834) < 1e-10
    assert nb.getNumExceptions() == 12  # 3 exclusions per water


def test_forcefield_flexible_water():
    top, positions = water_topology(2)
    ff = ForceField("tip3p.xml")
    system = ff.createSystem(top, nonbondedMethod=NoCutoff, rigidWater=False,
                             removeCMMotion=False)
    kinds = {type(f).__name__ for f in system.getForces()}
    assert "HarmonicBondForce" in kinds
    assert "HarmonicAngleForce" in kinds
    assert system.getNumConstraints() == 0


def test_simulation_water():
    top, positions = water_topology(4)
    ff = ForceField("tip3p.xml")
    system = ff.createSystem(top, nonbondedMethod=NoCutoff, rigidWater=True)
    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, 0.001)
    sim = Simulation(top, system, integ,
                     mm.Platform.getPlatformByName("Reference"))
    sim.context.setPositions(positions)
    sim.context.applyConstraints()
    sim.minimizeEnergy(maxIterations=20)
    out = io.StringIO()
    sim.reporters.append(StateDataReporter(out, 10, step=True, time=True,
                                           potentialEnergy=True,
                                           temperature=True))
    sim.step(30)
    assert sim.currentStep == 30
    lines = out.getvalue().strip().splitlines()
    assert len(lines) == 4  # header + 3 reports
    assert lines[0].startswith("#")


def test_pdb_roundtrip(tmp_path):
    top, positions = water_topology(3)
    top.setUnitCellDimensions(mm.Vec3(3.0, 3.0, 3.0))
    path = str(tmp_path / "water.pdb")
    PDBFile.writeFile(top, u.Quantity(positions, u.nanometer), path)
    pdb = PDBFile(path)
    assert pdb.topology.getNumAtoms() == 9
    assert pdb.topology.getNumResidues() == 3
    # standard bonds inferred for HOH
    assert pdb.topology.getNumBonds() == 6
    pos2 = pdb.getPositions(asNumpy=True).value_in_unit(u.nanometer)
    pos1 = np.array([[v.x, v.y, v.z] for v in positions])
    assert np.max(np.abs(pos1 - pos2)) < 1.1e-4  # PDB has 3 decimal A digits
    box = pdb.topology.getPeriodicBoxVectors().value_in_unit(u.nanometer)
    assert abs(box[0][0] - 3.0) < 1e-6


def test_dcd_reporter(tmp_path):
    top, positions = water_topology(2)
    ff = ForceField("tip3p.xml")
    system = ff.createSystem(top, nonbondedMethod=NoCutoff)
    sim = Simulation(top, system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    sim.context.setPositions(positions)
    path = str(tmp_path / "traj.dcd")
    sim.reporters.append(DCDReporter(path, 5))
    sim.step(20)
    del sim.reporters[:]
    size = os.path.getsize(path)
    assert size > 0
    with open(path, "rb") as f:
        data = f.read(8)
    assert data[4:8] == b"CORD"


def test_checkpoint_reporter(tmp_path):
    top, positions = water_topology(2)
    ff = ForceField("tip3p.xml")
    system = ff.createSystem(top, nonbondedMethod=NoCutoff)
    sim = Simulation(top, system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    sim.context.setPositions(positions)
    path = str(tmp_path / "checkpoint.chk")
    sim.reporters.append(CheckpointReporter(path, 10))
    sim.step(10)
    assert os.path.exists(path)
    sim.loadCheckpoint(path)
    assert sim.context.getStepCount() == 10


def test_modeller_add_solvent():
    top = Topology()
    mod = Modeller(top, [])
    mod.addSolvent(boxSize=mm.Vec3(2.0, 2.0, 2.0))
    n_res = mod.topology.getNumResidues()
    # ~ 33.37 * 8 = 267 waters fit a 2 nm cube
    assert 150 < n_res < 300
    ff = ForceField("tip3p.xml")
    system = ff.createSystem(mod.topology, nonbondedMethod=CutoffPeriodic,
                             nonbondedCutoff=0.9, rigidWater=True)
    assert system.getNumParticles() == 3 * n_res
    assert system.usesPeriodicBoundaryConditions()


def test_modeller_delete_water():
    top, positions = water_topology(5)
    mod = Modeller(top, u.Quantity(positions, u.nanometer))
    mod.deleteWater()
    assert mod.topology.getNumAtoms() == 0
