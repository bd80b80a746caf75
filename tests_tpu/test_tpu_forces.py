"""On-device force/integration correctness tier.

The reference runs its entire shared test suite once per platform
(platforms/cuda/tests/*.cpp wrappers; docs-source/usersguide/library/
07_testing_validation.rst:12-110).  This module is that per-platform pass
for the TPU: each test exercises the REAL Mosaic/pallas lowering and
compares against the in-repo float64 Reference oracle, mirroring a specific
reference test:

  bonded + PME protein system   TestCudaNonbondedForce / bonded Test*.h
  PME vs Ewald cross-check      TestNonbondedForce.h testEwaldExact
  SETTLE constraints in step    TestVerletIntegrator.h:126
  LangevinMiddle KE statistics  TestLangevinMiddleIntegrator.h:126
  virtual sites (TIP4P-EW)      TestVirtualSites.h
  exclusions across block edges TestNonbondedForce.h testExclusions
  GBSA-OBC implicit forces      TestGBSAOBCForce.h
  NPT barostat smoke            TestMonteCarloBarostat.h
  updateParametersInContext     TestNonbondedForce.h testParameterUpdates
  force groups                  TestForceGroups
"""
import os

import numpy as np
import pytest

FIXTURES = "/root/reference/wrappers/python/tests/systems/"


def _forces_energy(system, positions, platform, seed=None):
    import openmm_tpu as mm
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName(platform))
    ctx.setPositions(positions)
    st = ctx.getState(getForces=True, getEnergy=True)
    return (np.asarray(st.getForces(asNumpy=True)._value, np.float64),
            float(st.getPotentialEnergy()._value))


def _assert_matches_reference(system, positions, e_tol=2e-4, f_tol=2e-4):
    """TPU-platform forces/energy vs the f64 Reference oracle.

    f_tol gates the MEDIAN relative per-atom force error (the
    testInstallation.py:38-79 statistic) and 50x that for the max."""
    f_tpu, e_tpu = _forces_energy(system, positions, "TPU")
    f_ref, e_ref = _forces_energy(system, positions, "Reference")
    assert np.all(np.isfinite(f_tpu))
    assert abs(e_tpu - e_ref) < e_tol * max(1.0, abs(e_ref)), (e_tpu, e_ref)
    norm = np.linalg.norm(f_ref, axis=1)
    norm = np.where(norm == 0.0, 1.0, norm)
    rel = np.linalg.norm(f_tpu - f_ref, axis=1) / norm
    assert np.median(rel) < f_tol, np.median(rel)
    assert rel.max() < 50 * f_tol, rel.max()


@pytest.fixture(scope="module")
def water512():
    from openmm_tpu.models import tip3p_water_box
    return tip3p_water_box(n_waters=512)


# ---------------------------------------------------------------- forces
@pytest.mark.skipif(not os.path.isdir(FIXTURES),
                    reason="reference fixtures not available")
def test_protein_bonded_pme_forces_on_device():
    """Solvated dipeptide: bonds/angles/torsions/1-4 exceptions + PME direct
    + reciprocal, all through the pallas/z-slab path, vs the f64 oracle."""
    from openmm_tpu import app, unit as u
    prmtop = app.AmberPrmtopFile(FIXTURES + "alanine-dipeptide-explicit.prmtop")
    inpcrd = app.AmberInpcrdFile(FIXTURES + "alanine-dipeptide-explicit.inpcrd")
    system = prmtop.createSystem(nonbondedMethod=app.PME,
                                 nonbondedCutoff=0.9 * u.nanometer,
                                 constraints=app.HBonds)
    if inpcrd.boxVectors is not None:
        system.setDefaultPeriodicBoxVectors(*inpcrd.boxVectors)
    _assert_matches_reference(system, inpcrd.positions)


def test_pme_vs_ewald_energy_on_device(water512):
    """PME and exact Ewald must agree at the configured tolerance on the
    device path (TestNonbondedForce.h testEwald* pattern)."""
    import copy
    from openmm_tpu.forces.nonbonded import NonbondedForce
    system, positions = water512
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    nb.setEwaldErrorTolerance(1e-5)
    nb.setNonbondedMethod(NonbondedForce.PME)
    _, e_pme = _forces_energy(system, positions, "TPU")
    sys2 = copy.deepcopy(system)
    nb2 = [f for f in sys2.getForces() if isinstance(f, NonbondedForce)][0]
    nb2.setNonbondedMethod(NonbondedForce.Ewald)
    _, e_ew = _forces_energy(sys2, positions, "TPU")
    assert abs(e_pme - e_ew) < 5e-4 * abs(e_ew), (e_pme, e_ew)


def test_exclusions_across_block_boundaries_on_device(water512):
    """Every water carries 3 exclusions; the spatial sort scatters molecules
    across 64-atom blocks and 16-atom bricks, so agreement with the oracle
    proves the packed bitmask path handles boundary-straddling exclusions."""
    system, positions = water512
    _assert_matches_reference(system, positions)


def test_tip4pew_virtual_sites_on_device():
    """4-site water: virtual-site force redistribution on the device path."""
    from openmm_tpu import app, unit as u
    from openmm_tpu.models import tip3p_water_box
    from openmm_tpu.app import Modeller, ForceField, Topology
    # build a tip4pew box via the force field from a tip3p lattice
    system3, positions = tip3p_water_box(n_waters=400)
    # construct topology for the waters
    top = Topology()
    chain = top.addChain()
    import openmm_tpu as mm
    for i in range(400):
        res = top.addResidue("HOH", chain)
        o = top.addAtom("O", app.element.oxygen, res)
        h1 = top.addAtom("H1", app.element.hydrogen, res)
        h2 = top.addAtom("H2", app.element.hydrogen, res)
        top.addBond(o, h1)
        top.addBond(o, h2)
    box = system3.getDefaultPeriodicBoxVectors()
    top.setPeriodicBoxVectors(box)
    ff = ForceField("tip4pew.json")
    mod = Modeller(top, positions)
    mod.addExtraParticles(ff)
    system = ff.createSystem(mod.topology, nonbondedMethod=app.PME,
                             nonbondedCutoff=0.85 * u.nanometer,
                             rigidWater=True)
    _assert_matches_reference(system, mod.positions)


@pytest.mark.skipif(not os.path.isdir(FIXTURES),
                    reason="reference fixtures not available")
def test_gbsa_obc_forces_on_device():
    from openmm_tpu import app, unit as u
    prmtop = app.AmberPrmtopFile(FIXTURES + "alanine-dipeptide-implicit.prmtop")
    inpcrd = app.AmberInpcrdFile(FIXTURES + "alanine-dipeptide-implicit.inpcrd")
    system = prmtop.createSystem(implicitSolvent=app.OBC2,
                                 nonbondedMethod=app.NoCutoff)
    _assert_matches_reference(system, inpcrd.positions)


# ------------------------------------------------------------ integration
def test_settle_holds_in_device_steps(water512):
    """Constraint residuals after real dynamics on the chip
    (TestVerletIntegrator.h:126: tol 1e-4)."""
    import openmm_tpu as mm
    system, positions = water512
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=3)
    integ.step(200)
    pos = np.asarray(ctx.getState(getPositions=True)
                     .getPositions(asNumpy=True)._value, np.float64)
    viol = 0.0
    for (i, j, d0) in system._constraints[:300]:
        d = np.linalg.norm(pos[i] - pos[j])
        viol = max(viol, abs(d - d0) / d0)
    assert viol < 1e-4, viol


def test_langevin_middle_ke_statistics_on_device(water512):
    """Mean temperature within the reference's statistical gate
    (TestLangevinMiddleIntegrator.h:126: ~1% at this sample size)."""
    import openmm_tpu as mm
    from openmm_tpu.constants import BOLTZ
    system, positions = water512
    integ = mm.LangevinMiddleIntegrator(300.0, 5.0, 0.001)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=11)
    integ.step(1000)   # thermalize
    dof = 3 * system.getNumParticles() - system.getNumConstraints() - 3
    kes = []
    for _ in range(30):
        integ.step(50)
        kes.append(float(ctx.getState(getEnergy=True)
                         .getKineticEnergy()._value))
    t_mean = 2.0 * np.mean(kes) / (dof * BOLTZ)
    assert abs(t_mean - 300.0) < 12.0, t_mean


def test_npt_barostat_runs_on_device(water512):
    """MC barostat accept/reject inside the device step loop: box moves,
    energies stay finite (TestMonteCarloBarostat.h smoke level)."""
    import copy
    import openmm_tpu as mm
    system, positions = water512
    system = copy.deepcopy(system)
    system.addForce(mm.MonteCarloBarostat(1.0, 300.0, 10))
    integ = mm.LangevinMiddleIntegrator(300.0, 5.0, 0.001)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=5)
    v0 = float(np.linalg.det(np.asarray(
        ctx.getState().getPeriodicBoxVectors(asNumpy=True)._value)))
    integ.step(300)
    st = ctx.getState(getEnergy=True)
    v1 = float(np.linalg.det(np.asarray(
        ctx.getState().getPeriodicBoxVectors(asNumpy=True)._value)))
    assert np.isfinite(float(st.getPotentialEnergy()._value))
    assert v1 != v0  # at least one accepted volume move in 30 attempts


# ------------------------------------------------------------ API semantics
def test_update_parameters_in_context_on_device(water512):
    """updateParametersInContext: scaling all charges must scale the
    reciprocal+direct electrostatic energy on the live device context."""
    import copy
    import openmm_tpu as mm
    from openmm_tpu.forces.nonbonded import NonbondedForce
    system, positions = water512
    system = copy.deepcopy(system)
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    nb.setUseDispersionCorrection(False)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    e1 = float(ctx.getState(getEnergy=True).getPotentialEnergy()._value)
    for i in range(system.getNumParticles()):
        q, s, e = nb.getParticleParameters(i)
        nb.setParticleParameters(i, 0.0, s, e)
    for i in range(nb.getNumExceptions()):
        a, b, qq, s, e = nb.getExceptionParameters(i)
        nb.setExceptionParameters(i, a, b, 0.0, s, e)
    nb.updateParametersInContext(ctx)
    e2 = float(ctx.getState(getEnergy=True).getPotentialEnergy()._value)
    # with charges off, only LJ remains; energies must differ by the full
    # electrostatic component (large for water)
    assert abs(e1 - e2) > 0.1 * abs(e1)
    ctx2 = mm.Context(system, mm.VerletIntegrator(0.001),
                      mm.Platform.getPlatformByName("Reference"))
    ctx2.setPositions(positions)
    e2_ref = float(ctx2.getState(getEnergy=True).getPotentialEnergy()._value)
    assert abs(e2 - e2_ref) < 2e-4 * max(1.0, abs(e2_ref))


def test_force_groups_on_device(water512):
    """getState(groups=...) isolates the reciprocal-space group on device."""
    import copy
    import openmm_tpu as mm
    from openmm_tpu.forces.nonbonded import NonbondedForce
    system, positions = water512
    system = copy.deepcopy(system)
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    nb.setForceGroup(1)
    nb.setReciprocalSpaceForceGroup(2)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    e_all = float(ctx.getState(getEnergy=True).getPotentialEnergy()._value)
    e_dir = float(ctx.getState(getEnergy=True, groups={1})
                  .getPotentialEnergy()._value)
    e_rec = float(ctx.getState(getEnergy=True, groups={2})
                  .getPotentialEnergy()._value)
    assert abs((e_dir + e_rec) - e_all) < 5e-4 * max(1.0, abs(e_all))
