"""Amber prmtop/inpcrd reader tests (pattern of
wrappers/python/tests/TestAmberPrmtopFile.py). Uses the reference tree's
test fixtures when present; skips otherwise (the fixtures are not vendored)."""
import os

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.app import (AmberInpcrdFile, AmberPrmtopFile, HBonds, PME,
                            NoCutoff)

from helpers import check_energy_force_consistency, reference_platform

FIXTURES = "/root/reference/wrappers/python/tests/systems/"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not available")


def test_implicit_dipeptide():
    prmtop = AmberPrmtopFile(FIXTURES + "alanine-dipeptide-implicit.prmtop")
    inpcrd = AmberInpcrdFile(FIXTURES + "alanine-dipeptide-implicit.inpcrd")
    assert prmtop.topology.getNumAtoms() == 22
    system = prmtop.createSystem(implicitSolvent=True)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(inpcrd.getPositions())
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert np.isfinite(e)
    assert -400 < e < 0  # folded dipeptide in GB solvent
    check_energy_force_consistency(ctx, tol=1e-3)


def test_explicit_dipeptide_pme():
    prmtop = AmberPrmtopFile(FIXTURES + "alanine-dipeptide-explicit.prmtop")
    inpcrd = AmberInpcrdFile(FIXTURES + "alanine-dipeptide-explicit.inpcrd")
    system = prmtop.createSystem(nonbondedMethod=PME, nonbondedCutoff=0.9,
                                 constraints=HBonds, rigidWater=True)
    ctx = mm.Context(system, mm.VerletIntegrator(0.002), reference_platform())
    ctx.setPeriodicBoxVectors(*inpcrd.getBoxVectors().value_in_unit(u.nanometer))
    ctx.setPositions(inpcrd.getPositions())
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    n = system.getNumParticles()
    # TIP3P-dominated box: expect roughly -30 to -50 kJ/mol per water
    n_waters = sum(1 for r in prmtop.topology.residues()
                   if r.name in ("WAT", "HOH"))
    assert -60 < e / n_waters < -20, e / n_waters
    # short NVE run stays finite and conserves reasonably
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
    integ = ctx.getIntegrator()
    st0 = ctx.getState(getEnergy=True)
    e0 = st0.getPotentialEnergy()._value + st0.getKineticEnergy()._value
    integ.step(50)
    st1 = ctx.getState(getEnergy=True)
    e1 = st1.getPotentialEnergy()._value + st1.getKineticEnergy()._value
    assert abs(e1 - e0) / abs(e0) < 0.02


def test_mass_and_charge_parsing():
    prmtop = AmberPrmtopFile(FIXTURES + "alanine-dipeptide-implicit.prmtop")
    system = prmtop.createSystem()
    total_mass = sum(system.getParticleMass(i)._value
                     for i in range(system.getNumParticles()))
    assert abs(total_mass - 144.18) < 1.0  # ACE-ALA-NME
    nb = [f for f in system.getForces()
          if isinstance(f, mm.NonbondedForce)][0]
    total_q = sum(nb.getParticleParameters(i)[0]._value
                  for i in range(nb.getNumParticles()))
    assert abs(total_q) < 1e-4
