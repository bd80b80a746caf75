"""Custom force tests (patterns of tests/TestCustomBondForce.h,
TestCustomExternalForce.h, TestCustomNonbondedForce.h,
TestCustomCompoundBondForce.h, TestCustomCentroidBondForce.h)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.expressions import compile_expression

from helpers import assert_equal_tol, check_energy_force_consistency, \
    reference_platform

TOL = 1e-5


def test_expression_parser():
    fn = compile_expression("k*(r-r0)^2; k=2; r0=1.5", ["r"])
    assert abs(fn(2.0) - 2 * 0.25) < 1e-12
    fn = compile_expression("select(step(x), a, b)", ["x", "a", "b"])
    assert fn(1.0, 5.0, 7.0) == 5.0
    assert fn(-1.0, 5.0, 7.0) == 7.0
    fn = compile_expression("-x^2", ["x"])
    assert fn(3.0) == -9.0
    fn = compile_expression("2^3^2", ["x"])  # right assoc = 2^9
    assert fn(0.0) == 512.0
    fn = compile_expression("min(max(x, 0), 1)", ["x"])
    assert fn(3.0) == 1.0
    fn = compile_expression("atan2(y, x)", ["y", "x"])
    assert abs(fn(1.0, 1.0) - math.pi / 4) < 1e-12


def make_context(system, positions):
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    return ctx


def test_custom_bond():
    system = mm.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    f = mm.CustomBondForce("scale*k*(r-r0)^2")
    f.addGlobalParameter("scale", 0.5)
    f.addPerBondParameter("k")
    f.addPerBondParameter("r0")
    f.addBond(0, 1, [0.8, 1.5])
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 2, 0), mm.Vec3(0, 0, 0)])
    st = ctx.getState(getEnergy=True)
    assert_equal_tol(0.5 * 0.8 * 0.25, st.getPotentialEnergy(), TOL)
    check_energy_force_consistency(ctx)
    ctx.setParameter("scale", 1.0)
    assert_equal_tol(0.8 * 0.25,
                     ctx.getState(getEnergy=True).getPotentialEnergy(), TOL)


def test_custom_bond_matches_harmonic():
    """CustomBondForce('0.5*k*(r-r0)^2') must equal HarmonicBondForce."""
    rng = np.random.RandomState(1)
    positions = [mm.Vec3(*rng.rand(3)) for _ in range(4)]
    sys1 = mm.System()
    sys2 = mm.System()
    hb = mm.HarmonicBondForce()
    cb = mm.CustomBondForce("0.5*k*(r-r0)^2")
    cb.addPerBondParameter("r0")
    cb.addPerBondParameter("k")
    for i in range(4):
        sys1.addParticle(1.0)
        sys2.addParticle(1.0)
    for (i, j) in [(0, 1), (1, 2), (2, 3), (0, 3)]:
        hb.addBond(i, j, 0.5, 10.0)
        cb.addBond(i, j, [0.5, 10.0])
    sys1.addForce(hb)
    sys2.addForce(cb)
    e1 = make_context(sys1, positions).getState(getEnergy=True).getPotentialEnergy()._value
    e2 = make_context(sys2, positions).getState(getEnergy=True).getPotentialEnergy()._value
    assert abs(e1 - e2) < 1e-10 * max(1, abs(e1))


def test_custom_external():
    system = mm.System()
    system.addParticle(1.0)
    f = mm.CustomExternalForce("kx*(x-x0)^2 + ky*y^2 + kz*z^2")
    f.addGlobalParameter("kx", 10.0)
    f.addGlobalParameter("ky", 20.0)
    f.addGlobalParameter("kz", 30.0)
    f.addPerParticleParameter("x0")
    f.addParticle(0, [0.5])
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(1.0, 2.0, 3.0)])
    st = ctx.getState(getEnergy=True)
    expected = 10 * 0.25 + 20 * 4 + 30 * 9
    assert_equal_tol(expected, st.getPotentialEnergy(), TOL)
    check_energy_force_consistency(ctx)


def test_custom_angle_torsion():
    system = mm.System()
    for _ in range(4):
        system.addParticle(1.0)
    fa = mm.CustomAngleForce("0.5*k*(theta-theta0)^2")
    fa.addPerAngleParameter("k")
    fa.addPerAngleParameter("theta0")
    fa.addAngle(0, 1, 2, [1.1, math.pi / 3])
    ft = mm.CustomTorsionForce("k*(1+cos(n*theta-phase))")
    ft.addPerTorsionParameter("k")
    ft.addPerTorsionParameter("n")
    ft.addPerTorsionParameter("phase")
    ft.addTorsion(0, 1, 2, 3, [1.1, 2, math.pi / 3])
    system.addForce(fa)
    system.addForce(ft)
    ctx = make_context(system, [mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 0),
                                mm.Vec3(1, 0, 0), mm.Vec3(1, 0, 2)])
    st = ctx.getState(getEnergy=True)
    dtheta = math.pi / 2 - math.pi / 3
    expected = (0.5 * 1.1 * dtheta ** 2
                + 1.1 * (1 + math.cos(2 * (math.pi / 2) - math.pi / 3)))
    assert_equal_tol(expected, st.getPotentialEnergy(), 1e-4)
    check_energy_force_consistency(ctx)


def test_custom_nonbonded_matches_lj():
    rng = np.random.RandomState(2)
    n = 10
    positions = [mm.Vec3(*(rng.rand(3) * 2)) for _ in range(n)]
    sys1 = mm.System()
    nb = mm.NonbondedForce()
    sys2 = mm.System()
    cnb = mm.CustomNonbondedForce(
        "4*eps*((sig/r)^12-(sig/r)^6); sig=0.5*(sig1+sig2); eps=sqrt(eps1*eps2)")
    cnb.addPerParticleParameter("sig")
    cnb.addPerParticleParameter("eps")
    for i in range(n):
        sys1.addParticle(1.0)
        sys2.addParticle(1.0)
        s, e = 0.2 + 0.05 * (i % 3), 0.5 + 0.1 * (i % 2)
        nb.addParticle(0.0, s, e)
        cnb.addParticle([s, e])
    nb.addException(0, 1, 0, 1, 0)
    cnb.addExclusion(0, 1)
    sys1.addForce(nb)
    sys2.addForce(cnb)
    e1 = make_context(sys1, positions).getState(getEnergy=True).getPotentialEnergy()._value
    e2 = make_context(sys2, positions).getState(getEnergy=True).getPotentialEnergy()._value
    assert abs(e1 - e2) < 1e-8 * max(1, abs(e1)), (e1, e2)


def test_custom_nonbonded_interaction_groups():
    """Only pairs in set1 x set2 interact (CustomNonbondedForce.h:467)."""
    system = mm.System()
    f = mm.CustomNonbondedForce("1/r")
    for _ in range(4):
        system.addParticle(1.0)
        f.addParticle([])
    f.addInteractionGroup([0], [2, 3])
    system.addForce(f)
    positions = [mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0),
                 mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 1)]
    ctx = make_context(system, positions)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # pairs (0,2) and (0,3) only, both at distance 1
    assert_equal_tol(2.0, e, TOL)


def test_custom_nonbonded_tabulated():
    system = mm.System()
    f = mm.CustomNonbondedForce("tab(r)")
    values = [math.sin(0.25 * i) for i in range(40)]
    f.addTabulatedFunction("tab", mm.Continuous1DFunction(values, 0.0, 3.9))
    for _ in range(2):
        system.addParticle(1.0)
        f.addParticle([])
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 0, 0), mm.Vec3(1.5, 0, 0)])
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # spline through sin(0.25 * (r/0.1)) = sin(2.5 r)... values[i] at x=0.1*i
    assert abs(e - math.sin(2.5 * 1.5)) < 1e-3


def test_custom_compound_bond():
    system = mm.System()
    for _ in range(4):
        system.addParticle(1.0)
    f = mm.CustomCompoundBondForce(
        4, "k*distance(p1,p2)*angle(p1,p2,p3)*(1+cos(dihedral(p1,p2,p3,p4)))")
    f.addPerBondParameter("k")
    f.addBond([0, 1, 2, 3], [2.0])
    system.addForce(f)
    positions = [mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0),
                 mm.Vec3(1, 0, 2)]
    ctx = make_context(system, positions)
    st = ctx.getState(getEnergy=True)
    expected = 2.0 * 1.0 * (math.pi / 2) * (1 + math.cos(math.pi / 2))
    assert_equal_tol(expected, st.getPotentialEnergy(), 1e-4)
    check_energy_force_consistency(ctx)


def test_custom_centroid_bond():
    system = mm.System()
    for _ in range(4):
        system.addParticle(2.0)
    f = mm.CustomCentroidBondForce(2, "k*distance(g1,g2)^2")
    f.addPerBondParameter("k")
    f.addGroup([0, 1])
    f.addGroup([2, 3])
    f.addBond([0, 1], [3.0])
    system.addForce(f)
    positions = [mm.Vec3(0, 0, 0), mm.Vec3(0, 2, 0),
                 mm.Vec3(4, 0, 0), mm.Vec3(4, 2, 0)]
    ctx = make_context(system, positions)
    st = ctx.getState(getEnergy=True)
    # centroids at (0,1,0) and (4,1,0): distance 4
    assert_equal_tol(3.0 * 16.0, st.getPotentialEnergy(), TOL)
    check_energy_force_consistency(ctx)


def test_energy_parameter_derivatives():
    system = mm.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    f = mm.CustomBondForce("lambda_g*k*(r-r0)^2")
    f.addGlobalParameter("lambda_g", 0.7)
    f.addGlobalParameter("k", 2.0)
    f.addPerBondParameter("r0")
    f.addEnergyParameterDerivative("lambda_g")
    f.addBond(0, 1, [1.0])
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 0, 0), mm.Vec3(2, 0, 0)])
    st = ctx.getState(getEnergy=True, getParameterDerivatives=True)
    derivs = st.getEnergyParameterDerivatives()
    assert abs(derivs["lambda_g"] - 2.0 * 1.0) < 1e-8
