"""CustomIntegrator / NoseHoover / Compound / MTS tests (patterns of
tests/TestCustomIntegrator.h, TestNoseHooverIntegrator.h,
TestCompoundIntegrator.h and the reference python MTS/AMD wrappers)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.constants import BOLTZ

from helpers import assert_equal_tol, reference_platform


def lj_cluster():
    system = mm.System()
    nb = mm.NonbondedForce()
    positions = []
    k = 0
    for i in range(2):
        for j in range(2):
            for l in range(2):
                system.addParticle(39.95)
                nb.addParticle(0.0, 0.3350, 0.996)
                positions.append(mm.Vec3(i * 0.45, j * 0.45, l * 0.45))
                k += 1
    system.addForce(nb)
    return system, positions


def total_energy(ctx):
    st = ctx.getState(getEnergy=True)
    return st.getPotentialEnergy()._value + st.getKineticEnergy()._value


def test_custom_verlet_matches_builtin():
    """A leapfrog Verlet written as a CustomIntegrator must track the builtin
    (TestCustomIntegrator.h testSingleBond pattern)."""
    def build():
        system, positions = lj_cluster()
        return system, positions

    system1, positions = build()
    integ1 = mm.VerletIntegrator(0.002)
    ctx1 = mm.Context(system1, integ1, reference_platform())
    ctx1.setPositions(positions)

    system2, _ = build()
    integ2 = mm.CustomIntegrator(0.002)
    integ2.addPerDofVariable("x1", 0)
    integ2.addUpdateContextState()
    integ2.addComputePerDof("v", "v+dt*f/m")
    integ2.addComputePerDof("x1", "x")
    integ2.addComputePerDof("x", "x+dt*v")
    integ2.addConstrainPositions()
    integ2.addComputePerDof("v", "(x-x1)/dt")
    ctx2 = mm.Context(system2, integ2, reference_platform())
    ctx2.setPositions(positions)

    v0 = [mm.Vec3(0.1, -0.05, 0.02)] * 8
    ctx1.setVelocities(v0)
    ctx2.setVelocities(v0)
    integ1.step(50)
    integ2.step(50)
    p1 = ctx1.getState(getPositions=True).getPositions(asNumpy=True)._value
    p2 = ctx2.getState(getPositions=True).getPositions(asNumpy=True)._value
    assert np.max(np.abs(p1 - p2)) < 1e-8, np.max(np.abs(p1 - p2))


def test_custom_global_variables_and_sum():
    system, positions = lj_cluster()
    integ = mm.CustomIntegrator(0.001)
    integ.addGlobalVariable("ke", 0.0)
    integ.addGlobalVariable("counter", 0.0)
    integ.addComputePerDof("v", "v+dt*f/m")
    integ.addComputePerDof("x", "x+dt*v")
    integ.addComputeSum("ke", "m*v*v/2")
    integ.addComputeGlobal("counter", "counter+1")
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(100.0, randomSeed=2)
    integ.step(10)
    assert abs(integ.getGlobalVariableByName("counter") - 10.0) < 1e-10
    ke_var = integ.getGlobalVariableByName("ke")
    ke_state = ctx.getState(getEnergy=True).getKineticEnergy()._value
    assert abs(ke_var - ke_state) < 1e-6 * max(1.0, ke_state)


def test_custom_if_block():
    system = mm.System()
    system.addParticle(1.0)
    nb = mm.NonbondedForce()
    nb.addParticle(0.0, 0.3, 0.0)
    system.addForce(nb)
    integ = mm.CustomIntegrator(0.001)
    integ.addGlobalVariable("a", 0.0)
    integ.addGlobalVariable("b", 0.0)
    integ.beginIfBlock("a < 5")
    integ.addComputeGlobal("b", "b+1")
    integ.endBlock()
    integ.addComputeGlobal("a", "a+1")
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions([mm.Vec3(0, 0, 0)])
    integ.step(10)
    assert abs(integ.getGlobalVariableByName("a") - 10.0) < 1e-10
    assert abs(integ.getGlobalVariableByName("b") - 5.0) < 1e-10


def test_custom_while_block():
    system = mm.System()
    system.addParticle(1.0)
    nb = mm.NonbondedForce()
    nb.addParticle(0.0, 0.3, 0.0)
    system.addForce(nb)
    integ = mm.CustomIntegrator(0.001)
    integ.addGlobalVariable("total", 0.0)
    integ.addGlobalVariable("i", 0.0)
    integ.addComputeGlobal("i", "0")
    integ.beginWhileBlock("i < 4")
    integ.addComputeGlobal("total", "total+i")
    integ.addComputeGlobal("i", "i+1")
    integ.endBlock()
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions([mm.Vec3(0, 0, 0)])
    integ.step(2)
    # each step adds 0+1+2+3 = 6
    assert abs(integ.getGlobalVariableByName("total") - 12.0) < 1e-10


def test_nose_hoover_temperature():
    n = 64
    temp = 300.0
    system = mm.System()
    bond = mm.HarmonicBondForce()
    positions = []
    for i in range(n):
        system.addParticle(10.0)
    for i in range(n):
        system.addParticle(0.0)
        bond.addBond(i, n + i, 0.05, 100.0)
        positions.append(mm.Vec3(i * 0.5, 0, 0))
    positions += positions[:n]
    system.addForce(bond)
    integ = mm.NoseHooverIntegrator(temp, 20.0, 0.002)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(temp, randomSeed=8)
    integ.step(400)
    kes = []
    for _ in range(50):
        integ.step(20)
        kes.append(ctx.getState(getEnergy=True).getKineticEnergy()._value)
    expected = 0.5 * 3 * n * BOLTZ * temp
    assert abs(np.mean(kes) - expected) / expected < 0.12, \
        (np.mean(kes), expected)


def test_compound_integrator():
    system, positions = lj_cluster()
    compound = mm.CompoundIntegrator()
    compound.addIntegrator(mm.VerletIntegrator(0.002))
    compound.addIntegrator(mm.LangevinMiddleIntegrator(300.0, 1.0, 0.001))
    ctx = mm.Context(system, compound, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(100.0, randomSeed=3)
    compound.step(10)
    t1 = ctx.getTime()._value
    assert abs(t1 - 0.02) < 1e-9
    compound.setCurrentIntegrator(1)
    compound.step(10)
    t2 = ctx.getTime()._value
    assert abs(t2 - 0.03) < 1e-9


def test_mts_integrator():
    """MTS with a single group reduces to velocity Verlet; NVE conserved."""
    system, positions = lj_cluster()
    nb = system.getForce(0)
    nb.setForceGroup(0)
    integ = mm.MTSIntegrator(0.002, [(0, 1)])
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(100.0, randomSeed=4)
    e0 = total_energy(ctx)
    integ.step(200)
    e1 = total_energy(ctx)
    assert abs(e1 - e0) / max(abs(e0), 1.0) < 0.02


def test_amd_integrator():
    system, positions = lj_cluster()
    # set E below the minimum so no boost: behaves like Verlet
    integ = mm.AMDIntegrator(0.002, 10.0, -1e6)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(100.0, randomSeed=5)
    e0 = total_energy(ctx)
    integ.step(100)
    e1 = total_energy(ctx)
    assert abs(e1 - e0) / max(abs(e0), 1.0) < 0.02
