"""GayBerne + CustomManyParticle tests (patterns of tests/TestGayBerneForce.h
and TestCustomManyParticleForce.h)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u

from helpers import assert_equal_tol, check_energy_force_consistency, \
    reference_platform


def make_context(system, positions):
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    return ctx


def test_gayberne_sphere_matches_lj():
    """Spherical Gay-Berne particles must reproduce plain LJ exactly."""
    rng = np.random.RandomState(1)
    n = 6
    positions = [mm.Vec3(*(rng.rand(3) * 2)) for _ in range(n)]
    sys1 = mm.System()
    nb = mm.NonbondedForce()
    sys2 = mm.System()
    gb = mm.GayBerneForce()
    sig = 0.3   # equal sigmas: Gay-Berne eta/chi terms are exactly 1
    for i in range(n):
        sys1.addParticle(1.0)
        sys2.addParticle(1.0)
        eps = 0.5 + 0.1 * (i % 2)
        nb.addParticle(0.0, sig, eps)
        gb.addParticle(sig, eps, -1, -1, sig, sig, sig, 1.0, 1.0, 1.0)
    sys1.addForce(nb)
    sys2.addForce(gb)
    e1 = make_context(sys1, positions).getState(getEnergy=True) \
        .getPotentialEnergy()._value
    e2 = make_context(sys2, positions).getState(getEnergy=True) \
        .getPotentialEnergy()._value
    assert abs(e1 - e2) < 1e-6 * max(abs(e1), 1.0), (e1, e2)


def test_gayberne_anisotropic():
    """An anisotropic pair has orientation-dependent energy and consistent
    forces."""
    system = mm.System()
    gb = mm.GayBerneForce()
    for i in range(4):
        system.addParticle(1.0)
    # particles 0,2 are ellipsoids oriented toward partners 1,3
    gb.addParticle(0.3, 1.0, 1, -1, 0.4, 0.25, 0.25, 1.2, 0.9, 0.9)
    gb.addParticle(0.0, 0.0, -1, -1, 0.1, 0.1, 0.1, 1, 1, 1)
    gb.addParticle(0.3, 1.0, 3, -1, 0.4, 0.25, 0.25, 1.2, 0.9, 0.9)
    gb.addParticle(0.0, 0.0, -1, -1, 0.1, 0.1, 0.1, 1, 1, 1)
    system.addForce(gb)
    pos_parallel = [mm.Vec3(0, 0, 0), mm.Vec3(0.3, 0, 0),
                    mm.Vec3(0.7, 0, 0), mm.Vec3(1.0, 0, 0)]
    pos_perp = [mm.Vec3(0, 0, 0), mm.Vec3(0.3, 0, 0),
                mm.Vec3(0.7, 0, 0), mm.Vec3(0.7, 0.3, 0)]
    ctx = make_context(system, pos_parallel)
    e_par = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    ctx.setPositions(pos_perp)
    e_perp = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert abs(e_par - e_perp) > 1e-4
    check_energy_force_consistency(ctx, tol=1e-3)


def test_many_particle_axilrod_teller():
    """3-body energy over all triples; compare against direct python loop."""
    rng = np.random.RandomState(3)
    n = 6
    positions = [mm.Vec3(*(rng.rand(3) * 1.5)) for _ in range(n)]
    system = mm.System()
    f = mm.CustomManyParticleForce(
        3, "C*(1+3*cos(theta1)*cos(theta2)*cos(theta3))/(r12*r13*r23)^3;"
        "theta1=angle(p2,p1,p3); theta2=angle(p1,p2,p3);"
        "theta3=angle(p1,p3,p2); r12=distance(p1,p2);"
        "r13=distance(p1,p3); r23=distance(p2,p3)")
    f.addGlobalParameter("C", 1.5)
    for i in range(n):
        system.addParticle(1.0)
        f.addParticle([])
    system.addForce(f)
    ctx = make_context(system, positions)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value

    import itertools
    p = np.array([[v.x, v.y, v.z] for v in positions])

    def ang(a, b, c):  # angle at b
        v1, v2 = p[a] - p[b], p[c] - p[b]
        return math.acos(np.dot(v1, v2) / (np.linalg.norm(v1)
                                           * np.linalg.norm(v2)))

    expected = 0.0
    for (i, j, k) in itertools.combinations(range(n), 3):
        r12 = np.linalg.norm(p[i] - p[j])
        r13 = np.linalg.norm(p[i] - p[k])
        r23 = np.linalg.norm(p[j] - p[k])
        t1 = ang(j, i, k)
        t2 = ang(i, j, k)
        t3 = ang(i, k, j)
        expected += 1.5 * (1 + 3 * math.cos(t1) * math.cos(t2)
                           * math.cos(t3)) / (r12 * r13 * r23) ** 3
    assert abs(e - expected) < 1e-5 * max(abs(expected), 1.0), (e, expected)
    check_energy_force_consistency(ctx, tol=1e-3)


def test_many_particle_type_filters():
    system = mm.System()
    f = mm.CustomManyParticleForce(3, "1.0")  # counts allowed triples
    for i in range(4):
        system.addParticle(1.0)
        f.addParticle([], 0 if i < 2 else 1)
    # central particle (slot 0) must be type 0; others type 1
    f.setPermutationMode(mm.CustomManyParticleForce.UniqueCentralParticle)
    f.setTypeFilter(0, [0])
    f.setTypeFilter(1, [1])
    f.setTypeFilter(2, [1])
    system.addForce(f)
    positions = [mm.Vec3(0.1 * i, 0, 0) for i in range(4)]
    ctx = make_context(system, positions)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # centers: particles 0,1 (type 0); others must be {2,3}: 2 triples
    assert abs(e - 2.0) < 1e-10
