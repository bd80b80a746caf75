"""CHARMM PSF + GROMACS gro reader tests (patterns of
wrappers/python/tests/TestCharmmFiles.py and TestGromacsTopFile.py). Golden
energy: the CHARMM-computed ala_ala_ala total (TestCharmmFiles.py:419)."""
import os

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.app import (CharmmCrdFile, CharmmParameterSet, CharmmPsfFile,
                            GromacsGroFile, NoCutoff)

from helpers import check_energy_force_consistency, reference_platform

FIXTURES = "/root/reference/wrappers/python/tests/systems/"
KCAL = 4.184

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not available")


def test_charmm_ala_ala_ala_golden():
    """Total energy matches CHARMM's own value to 0.1%."""
    psf = CharmmPsfFile(FIXTURES + "ala_ala_ala.psf")
    params = CharmmParameterSet(FIXTURES + "charmm22.rtf",
                                FIXTURES + "charmm22.par")
    crd = CharmmCrdFile(FIXTURES + "ala_ala_ala.crd")
    system = psf.createSystem(params, nonbondedMethod=NoCutoff,
                              removeCMMotion=False)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(crd.getPositions())
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value / KCAL
    assert abs(e - 39.13169) < 1e-3 * abs(39.13169) + 0.02, e
    check_energy_force_consistency(ctx, tol=1e-3)


def test_charmm_dynamics():
    psf = CharmmPsfFile(FIXTURES + "ala_ala_ala.psf")
    params = CharmmParameterSet(FIXTURES + "charmm22.rtf",
                                FIXTURES + "charmm22.par")
    crd = CharmmCrdFile(FIXTURES + "ala_ala_ala.crd")
    system = psf.createSystem(params, nonbondedMethod=NoCutoff)
    integ = mm.LangevinMiddleIntegrator(300.0, 5.0, 0.001)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(crd.getPositions())
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
    integ.step(100)
    assert np.isfinite(
        ctx.getState(getEnergy=True).getPotentialEnergy()._value)


def test_gromacs_gro():
    gro = GromacsGroFile(FIXTURES + "aidilnaaaaa.gro")
    assert gro.topology.getNumAtoms() > 0
    pos = gro.getPositions(asNumpy=True)._value
    assert np.isfinite(pos).all()
    box = gro.getPeriodicBoxVectors()
    assert box is not None
