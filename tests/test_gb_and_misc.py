"""GBSA-OBC, CustomGB, CustomHbond, CustomCV, RMSD tests (patterns of
tests/TestGBSAOBCForce.h, TestCustomGBForce.h, TestCustomHbondForce.h,
TestCustomCVForce.h, TestRMSDForce.h)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.constants import ONE_4PI_EPS0

from helpers import assert_equal_tol, check_energy_force_consistency, \
    reference_platform

TOL = 1e-4


def make_context(system, positions):
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    return ctx


def test_gbsa_obc_single_particle():
    """One ion: E = -0.5*f*(1/eps_p - 1/eps_w) q^2/R + ACE term
    (TestGBSAOBCForce.h testSingleParticle pattern)."""
    system = mm.System()
    system.addParticle(22.99)
    gbsa = mm.GBSAOBCForce()
    q, r, s = 1.0, 0.15, 0.8
    gbsa.addParticle(q, r, s)
    system.addForce(gbsa)
    ctx = make_context(system, [mm.Vec3(0, 0, 0)])
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # single particle: born radius = offset radius restored via tanh(0)=0:
    # B = 1/(1/(r-offset)) = r - 0.009
    b = r - 0.009
    pre = -ONE_4PI_EPS0 * (1.0 / 1.0 - 1.0 / 78.3)
    e_pol = 0.5 * pre * q * q / b
    sa = 28.3919551 * (r + 0.14) ** 2 * (r / b) ** 6
    assert_equal_tol(e_pol + sa, e, 1e-6)


def test_gbsa_obc_force_consistency():
    rng = np.random.RandomState(5)
    n = 12
    system = mm.System()
    gbsa = mm.GBSAOBCForce()
    positions = []
    for i in range(n):
        system.addParticle(12.0)
        gbsa.addParticle(0.3 if i % 2 == 0 else -0.3, 0.15 + 0.02 * (i % 3), 0.8)
        positions.append(mm.Vec3(*(rng.rand(3) * 1.2)))
    system.addForce(gbsa)
    ctx = make_context(system, positions)
    check_energy_force_consistency(ctx, tol=1e-3)


def test_custom_gb_matches_obc():
    """CustomGBForce programmed as OBC must reproduce GBSAOBCForce energy
    (the customgbforces.py app-layer pattern). Simplified: compare a
    hand-written pair value + energy against a direct computation."""
    system = mm.System()
    f = mm.CustomGBForce()
    f.addPerParticleParameter("q")
    f.addComputedValue("V", "q1*q2/r", mm.CustomGBForce.ParticlePair)
    f.addEnergyTerm("0.5*V^2", mm.CustomGBForce.SingleParticle)
    positions = []
    qs = [1.0, -0.7, 0.4]
    for i, q in enumerate(qs):
        system.addParticle(1.0)
        f.addParticle([q])
        positions.append(mm.Vec3(0.5 * i, 0.1 * i * i, 0))
    system.addForce(f)
    ctx = make_context(system, positions)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    p = np.array([[v.x, v.y, v.z] for v in positions])
    V = np.zeros(3)
    for i in range(3):
        for j in range(3):
            if i != j:
                V[i] += qs[i] * qs[j] / np.linalg.norm(p[i] - p[j])
    expected = 0.5 * np.sum(V ** 2)
    assert_equal_tol(expected, e, 1e-6)
    check_energy_force_consistency(ctx, tol=1e-3)


def test_custom_hbond():
    system = mm.System()
    for _ in range(4):
        system.addParticle(1.0)
    f = mm.CustomHbondForce("k*distance(a1,d1)^2")
    f.addPerDonorParameter("k")
    f.addDonor(0, 1, -1, [2.0])
    f.addAcceptor(2, 3, -1, [])
    system.addForce(f)
    positions = [mm.Vec3(0, 0, 0), mm.Vec3(0.1, 0, 0),
                 mm.Vec3(1, 0, 0), mm.Vec3(1.1, 0, 0)]
    ctx = make_context(system, positions)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert_equal_tol(2.0 * 1.0, e, 1e-6)
    check_energy_force_consistency(ctx)


def test_custom_cv():
    system = mm.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    cv = mm.CustomBondForce("r")
    cv.addBond(0, 1, [])
    f = mm.CustomCVForce("2*d^2; d=dist")
    f.addCollectiveVariable("dist", cv)
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 0, 0), mm.Vec3(1.5, 0, 0)])
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert_equal_tol(2 * 1.5 ** 2, e, 1e-6)
    vals = f.getCollectiveVariableValues(ctx)
    assert abs(vals[0] - 1.5) < 1e-10
    check_energy_force_consistency(ctx)


def test_rmsd_force():
    rng = np.random.RandomState(7)
    n = 10
    ref = rng.rand(n, 3) * 2
    system = mm.System()
    for _ in range(n):
        system.addParticle(1.0)
    f = mm.RMSDForce([mm.Vec3(*r) for r in ref])
    system.addForce(f)
    # identical positions -> rmsd 0
    ctx = make_context(system, [mm.Vec3(*r) for r in ref])
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert abs(e) < 1e-5
    # rotated+translated copy -> still ~0
    theta = 0.7
    rot = np.array([[math.cos(theta), -math.sin(theta), 0],
                    [math.sin(theta), math.cos(theta), 0], [0, 0, 1]])
    moved = ref @ rot.T + np.array([1.0, -2.0, 0.5])
    ctx.setPositions([mm.Vec3(*r) for r in moved])
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert abs(e) < 1e-5
    # displaced single atom -> positive rmsd
    moved2 = ref.copy()
    moved2[0] += [0.5, 0, 0]
    ctx.setPositions([mm.Vec3(*r) for r in moved2])
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert e > 0.01
    check_energy_force_consistency(ctx, tol=1e-3)
