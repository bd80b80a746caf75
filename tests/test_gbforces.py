"""Implicit-solvent GB models validated against the reference's stored
golden forces (systems/alanine-dipeptide-implicit-forces/*.xml, protocol of
TestAmberPrmtopFile.py test_ImplicitSolventForces) and the CHARMM analog."""
import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.app import AmberPrmtopFile, CharmmCrdFile, CharmmParameterSet, \
    CharmmPsfFile, PDBFile
from openmm_tpu.app import forcefield as ffm
from openmm_tpu.serialization import XmlSerializer

from helpers import reference_platform

SYS = "/root/reference/wrappers/python/tests/systems/"

CASES = [
    (ffm.HCT, ffm.NoCutoff, 0.0, "HCT_NoCutoff"),
    (ffm.OBC1, ffm.CutoffNonPeriodic, 0.0, "OBC1_NonPeriodic"),
    (ffm.OBC2, ffm.CutoffNonPeriodic, 0.5, "OBC2_NonPeriodic_Salt"),
    (ffm.GBn, ffm.NoCutoff, 0.5, "GBn_NoCutoff_Salt"),
    (ffm.GBn2, ffm.NoCutoff, 0.0, "GBn2_NoCutoff"),
]


def check_golden(system, positions, fname):
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     reference_platform())
    ctx.setPositions(positions)
    f1 = ctx.getState(getForces=True).getForces(asNumpy=True)._value
    with open(SYS + fname) as fh:
        golden = XmlSerializer.deserialize(fh.read())
    f2 = golden.getForces(asNumpy=True)._value
    diff = np.linalg.norm(f1 - f2, axis=1)
    rel = diff / np.maximum(np.linalg.norm(f1, axis=1), 1e-10)
    assert np.all((diff < 0.1) | (rel < 1e-4)), \
        (fname, float(diff.max()), float(rel.max()))


@pytest.mark.parametrize("solvent,method,salt,fname", CASES,
                         ids=[c[3] for c in CASES])
def test_amber_implicit_golden_forces(solvent, method, salt, fname):
    prm = AmberPrmtopFile(SYS + "alanine-dipeptide-implicit.prmtop")
    pdb = PDBFile(SYS + "alanine-dipeptide-implicit.pdb")
    system = prm.createSystem(implicitSolvent=solvent,
                              nonbondedMethod=method,
                              implicitSolventSaltConc=salt)
    check_golden(system, pdb.getPositions(),
                 "alanine-dipeptide-implicit-forces/" + fname + ".xml")


@pytest.mark.parametrize("solvent,method,salt,fname", CASES,
                         ids=[c[3] for c in CASES])
def test_charmm_implicit_golden_forces(solvent, method, salt, fname):
    psf = CharmmPsfFile(SYS + "ala_ala_ala.psf")
    pdb = PDBFile(SYS + "ala_ala_ala.pdb")
    params = CharmmParameterSet(SYS + "charmm22.rtf", SYS + "charmm22.par")
    system = psf.createSystem(params, implicitSolvent=solvent,
                              nonbondedMethod=method,
                              implicitSolventSaltConc=salt)
    check_golden(system, pdb.getPositions(),
                 "ala-ala-ala-implicit-forces/" + fname + ".xml")
