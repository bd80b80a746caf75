"""Constraint tests: SETTLE and CCMA distance invariants during dynamics
(pattern of tests/TestSettle.h and the constraint checks in
TestVerletIntegrator.h:126, tol 1e-4)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u

from helpers import reference_platform


def water_box_system(n_waters=8):
    """TIP3P-ish rigid waters with SETTLE triangles."""
    system = mm.System()
    nb = mm.NonbondedForce()
    positions = []
    d_oh = 0.09572
    theta = 104.52 * math.pi / 180.0
    d_hh = 2 * d_oh * math.sin(theta / 2)
    rng = np.random.RandomState(3)
    for w in range(n_waters):
        o = system.addParticle(15.99943)
        h1 = system.addParticle(1.007947)
        h2 = system.addParticle(1.007947)
        nb.addParticle(-0.834, 0.3151, 0.6364)
        nb.addParticle(0.417, 1.0, 0.0)
        nb.addParticle(0.417, 1.0, 0.0)
        system.addConstraint(o, h1, d_oh)
        system.addConstraint(o, h2, d_oh)
        system.addConstraint(h1, h2, d_hh)
        base = np.array([1.2 * (w % 2), 1.2 * ((w // 2) % 2), 1.2 * (w // 4)]) \
            + rng.rand(3) * 0.1
        positions.append(mm.Vec3(*base))
        positions.append(mm.Vec3(*(base + [d_oh, 0, 0])))
        positions.append(mm.Vec3(*(base + [d_oh * math.cos(theta),
                                           d_oh * math.sin(theta), 0])))
    system.addForce(nb)
    return system, positions, (d_oh, d_hh)


def constraint_errors(ctx, system):
    pos = ctx.getState(getPositions=True).getPositions(asNumpy=True)._value
    errs = []
    for ci in range(system.getNumConstraints()):
        p1, p2, d = system.getConstraintParameters(ci)
        d = d._value
        r = np.linalg.norm(pos[p1] - pos[p2])
        errs.append(abs(r - d) / d)
    return np.array(errs)


def test_settle_maintains_distances():
    system, positions, _ = water_box_system()
    integ = mm.VerletIntegrator(0.002)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
    for _ in range(10):
        integ.step(20)
        errs = constraint_errors(ctx, system)
        assert errs.max() < 1e-4, errs.max()


def test_settle_velocity_constraints():
    system, positions, _ = water_box_system(n_waters=4)
    integ = mm.VerletIntegrator(0.002)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=2)
    # after velocity projection, bond-direction relative velocities vanish
    pos = ctx.getState(getPositions=True).getPositions(asNumpy=True)._value
    vel = ctx.getState(getVelocities=True).getVelocities(asNumpy=True)._value
    for ci in range(system.getNumConstraints()):
        p1, p2, d = system.getConstraintParameters(ci)
        rv = (pos[p1] - pos[p2]) @ (vel[p1] - vel[p2])
        assert abs(rv) < 1e-8, rv


def test_ccma_chain():
    """A 5-bead chain with 4 constraints (no triangles -> CCMA path)."""
    system = mm.System()
    nb = mm.NonbondedForce()
    positions = []
    for i in range(5):
        system.addParticle(2.0 if i % 2 == 0 else 1.0)
        nb.addParticle(0.0, 0.2, 0.1)
        positions.append(mm.Vec3(0.11 * i, 0.02 * (i % 2), 0))
    for i in range(4):
        system.addConstraint(i, i + 1, 0.11)
    # angle force provides coupling-matrix cosines
    ang = mm.HarmonicAngleForce()
    for i in range(3):
        ang.addAngle(i, i + 1, i + 2, 2.0, 50.0)
    system.addForce(nb)
    system.addForce(ang)
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.applyConstraints()
    errs = constraint_errors(ctx, system)
    assert errs.max() < 1e-6
    ctx.setVelocitiesToTemperature(300.0, randomSeed=4)
    for _ in range(5):
        integ.step(20)
        errs = constraint_errors(ctx, system)
        assert errs.max() < 1e-4, errs.max()


def test_shake_h_clusters():
    """Methane-like CH3/CH2/NH star clusters take the parallel-SHAKE path
    (IntegrationUtilities.cpp:204-259 cluster rules) and hold distances
    and bond-direction velocities."""
    from openmm_tpu.ops import constraints as cm
    system = mm.System()
    nb = mm.NonbondedForce()
    positions = []
    # C + 3 H (tetrahedral-ish), then N + 1 H
    dirs = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1]]) / math.sqrt(3)
    system.addParticle(12.0)
    nb.addParticle(0.0, 0.34, 0.4)
    positions.append(mm.Vec3(0, 0, 0))
    for k in range(3):
        system.addParticle(1.008)
        nb.addParticle(0.1, 0.1, 0.05)
        positions.append(mm.Vec3(*(dirs[k] * 0.109)))
        system.addConstraint(0, 1 + k, 0.109)
    system.addParticle(14.0)
    system.addParticle(1.008)
    nb.addParticle(-0.3, 0.32, 0.5)
    nb.addParticle(0.3, 0.1, 0.05)
    positions.append(mm.Vec3(0.8, 0, 0))
    positions.append(mm.Vec3(0.901, 0, 0))
    system.addConstraint(4, 5, 0.101)
    system.addForce(nb)

    masses = [12.0, 1.008, 1.008, 1.008, 14.0, 1.008]
    cl, rest = cm.partition_shake_clusters(system._constraints, masses)
    assert len(cl) == 2 and not rest

    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=7)
    for _ in range(5):
        integ.step(20)
        errs = constraint_errors(ctx, system)
        assert errs.max() < 1e-4, errs.max()
    ctx.applyVelocityConstraints()
    pos = ctx.getState(getPositions=True).getPositions(asNumpy=True)._value
    vel = ctx.getState(getVelocities=True).getVelocities(asNumpy=True)._value
    for ci in range(system.getNumConstraints()):
        p1, p2, d = system.getConstraintParameters(ci)
        rv = (pos[p1] - pos[p2]) @ (vel[p1] - vel[p2])
        assert abs(rv) < 1e-7, rv


def test_nve_with_constraints():
    """Total energy conserved with rigid waters (TestSettle.h pattern)."""
    system, positions, _ = water_box_system(n_waters=4)
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(200.0, randomSeed=3)
    st = ctx.getState(getEnergy=True)
    e0 = st.getPotentialEnergy()._value + st.getKineticEnergy()._value
    integ.step(500)
    st = ctx.getState(getEnergy=True)
    e1 = st.getPotentialEnergy()._value + st.getKineticEnergy()._value
    assert abs(e1 - e0) / max(abs(e0), 1.0) < 0.02, (e0, e1)
