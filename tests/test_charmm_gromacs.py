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


def test_gromacs_top_spce(tmp_path):
    """Self-contained SPC/E top: energy matches a hand computation exactly."""
    top_text = """
[ defaults ]
1 2 yes 0.5 0.8333

[ atomtypes ]
OW  15.9994 -0.8476 A 0.316557 0.650194
HW  1.008    0.4238 A 0.0      0.0

[ moleculetype ]
SOL 2

[ atoms ]
1 OW 1 SOL OW 1 -0.8476 15.9994
2 HW 1 SOL HW1 1 0.4238 1.008
3 HW 1 SOL HW2 1 0.4238 1.008

[ settles ]
1 1 0.1 0.16330

[ exclusions ]
1 2 3
2 1 3
3 1 2

[ system ]
water

[ molecules ]
SOL 2
"""
    from openmm_tpu.app import GromacsTopFile
    from openmm_tpu.constants import ONE_4PI_EPS0
    path = str(tmp_path / "w.top")
    with open(path, "w") as f:
        f.write(top_text)
    gmx = GromacsTopFile(path)
    system = gmx.createSystem(nonbondedMethod=NoCutoff, removeCMMotion=False)
    assert system.getNumParticles() == 6
    assert system.getNumConstraints() == 6
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    pos = [mm.Vec3(0, 0, 0), mm.Vec3(0.1, 0, 0), mm.Vec3(-0.033, 0.094, 0),
           mm.Vec3(0.5, 0, 0), mm.Vec3(0.6, 0, 0), mm.Vec3(0.467, 0.094, 0)]
    ctx.setPositions(pos)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    p = np.array([[v.x, v.y, v.z] for v in pos])
    qs = [-0.8476, 0.4238, 0.4238] * 2
    expected = sum(ONE_4PI_EPS0 * qs[i] * qs[j] / np.linalg.norm(p[i] - p[j])
                   for i in range(3) for j in range(3, 6))
    s, eps = 0.316557, 0.650194
    r = np.linalg.norm(p[0] - p[3])
    expected += 4 * eps * ((s / r) ** 12 - (s / r) ** 6)
    assert abs(e - expected) < 1e-9


def test_charmm_nbfix():
    """NBFIX overrides the Lorentz-Berthelot combination for one type pair
    (charmmpsffile.py:1224-1306 semantics)."""
    import io
    prm = io.StringIO("""
ATOMS
MASS 1 AR 39.948
MASS 2 KR 83.798

BONDS
ANGLES
DIHEDRALS
NONBONDED
AR 0.0 -0.2 1.9
KR 0.0 -0.3 2.1

NBFIX
AR KR -0.5 4.5

END
""")
    # hand-built PSF-less check: use the parameter set directly through a
    # tiny synthetic psf
    psf_text = """PSF

       1 !NTITLE
 REMARKS test

       2 !NATOM
       1 A    1    AR   AR   AR     0.000000       39.9480           0
       2 A    1    KR   KR   KR     0.000000       83.7980           0

       0 !NBOND: bonds


"""
    import tempfile, os
    from openmm_tpu.app import CharmmPsfFile, CharmmParameterSet
    with tempfile.TemporaryDirectory() as d:
        prm_path = os.path.join(d, "test.prm")
        psf_path = os.path.join(d, "test.psf")
        open(prm_path, "w").write(prm.getvalue())
        open(psf_path, "w").write(psf_text)
        params = CharmmParameterSet(prm_path)
        assert ("AR", "KR") in params.nbfix_types
        psf = CharmmPsfFile(psf_path)
        system = psf.createSystem(params)
        ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                         reference_platform())
        r = 0.5
        ctx.setPositions([mm.Vec3(0, 0, 0), mm.Vec3(r, 0, 0)])
        e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
        # NBFIX: emin=0.5 kcal, rmin=4.5 A -> LJ at r
        emin = 0.5 * 4.184
        rmin = 0.45
        q = (rmin / r) ** 6
        expected = emin * (q * q - 2 * q)
        assert abs(e - expected) < 1e-4 * abs(expected), (e, expected)
