"""Integrator tests: NVE energy conservation, thermostat temperature,
constraint invariants — pattern of tests/TestVerletIntegrator.h:78-132 and
TestLangevinMiddleIntegrator.h:126,290 (ASSERT_USUALLY_EQUAL_TOL gates)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.constants import BOLTZ

from helpers import assert_equal_tol, reference_platform


def lj_cluster_system(n=8, spacing=0.45):
    """A small LJ cluster (argon-ish) for NVE tests."""
    system = mm.System()
    nb = mm.NonbondedForce()
    positions = []
    rng = np.random.RandomState(2)
    k = 0
    for i in range(2):
        for j in range(2):
            for l in range(2):
                if k >= n:
                    break
                system.addParticle(39.95)
                nb.addParticle(0.0, 0.3350, 0.996)
                positions.append(mm.Vec3(i * spacing, j * spacing, l * spacing))
                k += 1
    system.addForce(nb)
    return system, positions


def total_energy(ctx):
    st = ctx.getState(getEnergy=True)
    return (st.getPotentialEnergy() + st.getKineticEnergy()).value_in_unit(
        u.kilojoule_per_mole)


def test_verlet_energy_conservation():
    system, positions = lj_cluster_system()
    integ = mm.VerletIntegrator(0.002)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(100.0, randomSeed=7)
    e0 = total_energy(ctx)
    for _ in range(10):
        integ.step(50)
        e = total_energy(ctx)
        assert abs(e - e0) / max(abs(e0), 1.0) < 0.01, (e0, e)


def test_verlet_time_advances():
    system, positions = lj_cluster_system()
    integ = mm.VerletIntegrator(0.002)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    integ.step(25)
    st = ctx.getState()
    assert abs(st.getTime().value_in_unit(u.picosecond) - 0.05) < 1e-10
    assert st.getStepCount() == 25


@pytest.mark.parametrize("integ_cls", [mm.LangevinIntegrator,
                                       mm.LangevinMiddleIntegrator])
def test_langevin_temperature(integ_cls):
    """Harmonically bound particles must equilibrate to the target T
    (TestLangevinMiddleIntegrator.h:290 pattern)."""
    n = 64
    temp = 300.0
    system = mm.System()
    f = mm.CustomExternalForce if False else None
    # use harmonic bonds to a fixed lattice of anchors (mass 0)
    bond = mm.HarmonicBondForce()
    positions = []
    for i in range(n):
        system.addParticle(10.0)
    for i in range(n):
        system.addParticle(0.0)   # anchors, frozen
        bond.addBond(i, n + i, 0.0, 100.0)
        positions.append(mm.Vec3(i * 0.5, 0, 0))
    positions += positions[:n]
    system.addForce(bond)
    integ = integ_cls(temp, 10.0, 0.002)
    integ.setRandomNumberSeed(4)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(temp, randomSeed=3)
    integ.step(500)  # equilibrate
    kes = []
    for _ in range(60):
        integ.step(20)
        kes.append(ctx.getState(getEnergy=True).getKineticEnergy()._value)
    mean_ke = np.mean(kes)
    dof = 3 * n
    expected = 0.5 * dof * BOLTZ * temp
    assert abs(mean_ke - expected) / expected < 0.12, (mean_ke, expected)


def test_brownian_runs():
    system, positions = lj_cluster_system()
    integ = mm.BrownianIntegrator(300.0, 10.0, 0.0005)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    integ.step(100)
    st = ctx.getState(getPositions=True, getEnergy=True)
    assert np.isfinite(st.getPotentialEnergy()._value)


def test_variable_verlet():
    system, positions = lj_cluster_system()
    integ = mm.VariableVerletIntegrator(1e-5)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(50.0, randomSeed=1)
    e0 = total_energy(ctx)
    integ.step(200)
    st = ctx.getState(getEnergy=True)
    e1 = total_energy(ctx)
    assert st.getTime()._value > 0
    assert abs(e1 - e0) / max(abs(e0), 1.0) < 0.02


def test_andersen_thermostat():
    n = 32
    temp = 250.0
    system = mm.System()
    bond = mm.HarmonicBondForce()
    positions = []
    for i in range(n):
        system.addParticle(5.0)
    for i in range(n):
        system.addParticle(0.0)
        bond.addBond(i, n + i, 0.0, 50.0)
        positions.append(mm.Vec3(i * 0.5, 0, 0))
    positions += positions[:n]
    system.addForce(bond)
    system.addForce(mm.AndersenThermostat(temp, 50.0))
    integ = mm.VerletIntegrator(0.002)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(temp, randomSeed=5)
    integ.step(500)
    kes = []
    for _ in range(60):
        integ.step(20)
        kes.append(ctx.getState(getEnergy=True).getKineticEnergy()._value)
    expected = 0.5 * 3 * n * BOLTZ * temp
    assert abs(np.mean(kes) - expected) / expected < 0.12


def test_cm_motion_remover():
    system, positions = lj_cluster_system()
    system.addForce(mm.CMMotionRemover(1))
    integ = mm.VerletIntegrator(0.002)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocities([mm.Vec3(0.5, 0.2, -0.1)] * system.getNumParticles())
    integ.step(5)
    v = ctx.getState(getVelocities=True).getVelocities(asNumpy=True)._value
    masses = np.array([39.95] * system.getNumParticles())
    p_cm = (masses[:, None] * v).sum(axis=0)
    assert np.max(np.abs(p_cm)) < 1e-6


def test_integration_force_groups():
    """With the bond force excluded from integration, particles keep velocity."""
    system = mm.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    f = mm.HarmonicBondForce()
    f.addBond(0, 1, 1.0, 100.0)
    f.setForceGroup(1)
    system.addForce(f)
    integ = mm.VerletIntegrator(0.001)
    integ.setIntegrationForceGroups({0})   # exclude group 1
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions([mm.Vec3(0, 0, 0), mm.Vec3(2, 0, 0)])
    integ.step(10)
    v = ctx.getState(getVelocities=True).getVelocities(asNumpy=True)._value
    assert np.max(np.abs(v)) < 1e-12


def test_nose_hoover_subsystem_pair_thermostat():
    """addSubsystemThermostat dual-temperature semantics
    (NoseHooverIntegrator.h:116): each pair's center-of-mass motion
    thermostats at `temperature`, its relative motion independently at
    `relativeTemperature`."""
    import numpy as np
    from openmm_tpu.constants import BOLTZ

    n_pairs = 24
    system = mm.System()
    bond = mm.HarmonicBondForce()
    positions = []
    pairs = []
    for i in range(n_pairs):
        a = system.addParticle(16.0)
        b = system.addParticle(1.0)
        bond.addBond(a, b, 0.1, 20000.0)
        base = mm.Vec3(0.5 * (i % 5), 0.5 * ((i // 5) % 5), 0.5 * (i // 25))
        positions += [base, mm.Vec3(base.x + 0.1, base.y, base.z)]
        pairs.append((a, b))
    system.addForce(bond)

    integ = mm.NoseHooverIntegrator(0.0005, None)
    integ.addSubsystemThermostat([], pairs, 300.0, 100.0, 100.0, 100.0,
                                 chainLength=3, numMTS=3, numYoshidaSuzuki=7)
    ctx = mm.Context(system, integ,
                     mm.Platform.getPlatformByName("Reference"))
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(200.0, randomSeed=5)
    integ.step(500)
    ke_com = []
    ke_rel = []
    for _ in range(60):
        integ.step(25)
        v = np.asarray(ctx.getState(getVelocities=True)
                       .getVelocities(asNumpy=True)._value)
        m1, m2 = 16.0, 1.0
        v1 = v[0::2]
        v2 = v[1::2]
        vc = (m1 * v1 + m2 * v2) / (m1 + m2)
        vr = v1 - v2
        mu = m1 * m2 / (m1 + m2)
        ke_com.append(0.5 * (m1 + m2) * np.sum(vc * vc))
        ke_rel.append(0.5 * mu * np.sum(vr * vr))
    t_com = 2.0 * np.mean(ke_com) / (3 * n_pairs * BOLTZ)
    t_rel = 2.0 * np.mean(ke_rel) / (3 * n_pairs * BOLTZ)
    assert abs(t_com - 300.0) < 60.0, t_com
    assert abs(t_rel - 100.0) < 25.0, t_rel


def test_nose_hoover_chain_public_object():
    """NoseHooverChain data class (NoseHooverChain.h) + integrator
    getThermostat/hasSubsystemThermostats (NoseHooverIntegrator.h:197)."""
    integ = mm.NoseHooverIntegrator(310.0, 40.0, 0.001, chainLength=4,
                                    numMTS=2, numYoshidaSuzuki=5)
    assert integ.getNumThermostats() == 1
    assert not integ.hasSubsystemThermostats()
    ch = integ.getThermostat(0)
    assert isinstance(ch, mm.NoseHooverChain)
    assert ch.getTemperature() == 310.0 * u.kelvin
    assert ch.getCollisionFrequency() == 40.0 / u.picosecond
    assert ch.getChainLength() == 4
    assert ch.getNumMultiTimeSteps() == 2
    assert ch.getNumYoshidaSuzukiTimeSteps() == 5
    assert ch.getChainID() == 0
    assert ch.getThermostatedAtoms() == []
    assert ch.getThermostatedPairs() == []
    # setters write through to the integrator (C++ reference semantics)
    ch.setTemperature(350.0)
    assert integ.getTemperature(0) == 350.0 * u.kelvin
    ch.setCollisionFrequency(25.0)
    assert integ.getCollisionFrequency(0) == 25.0 / u.picosecond
    # standalone construction
    solo = mm.NoseHooverChain(300.0, 1.0, 50.0, 5.0, 96, 3, 3, 7, 2,
                              [0, 1, 2], [(3, 4)])
    assert solo.getNumDegreesOfFreedom() == 96
    assert solo.getChainID() == 2
    assert solo.getThermostatedAtoms() == [0, 1, 2]
    assert solo.getThermostatedPairs() == [(3, 4)]
    solo.setNumDegreesOfFreedom(12)
    assert solo.getNumDegreesOfFreedom() == 12
    # subsystem chain flips the flag
    integ2 = mm.NoseHooverIntegrator(300.0, 50.0, 0.001)
    integ2.addSubsystemThermostat([0, 1], [], 200.0, 10.0, 200.0, 10.0)
    assert integ2.hasSubsystemThermostats()


def test_rpmd_updater_marker():
    """RPMDUpdater marker base (plugins/rpmd RPMDUpdater.h): the RPMD
    barostat is one; its update hook runs once per RPMD step."""
    from openmm_tpu import RPMDMonteCarloBarostat, RPMDUpdater
    b = RPMDMonteCarloBarostat(1.0, 5)
    assert isinstance(b, RPMDUpdater)
    b.updateRPMDState(None)   # default no-op must not raise
