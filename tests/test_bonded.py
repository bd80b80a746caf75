"""Bonded force tests: analytic micro-systems + finite-difference gates
(pattern of tests/TestHarmonicBondForce.h, TestHarmonicAngleForce.h,
TestPeriodicTorsionForce.h, TestRBTorsionForce.h, TestCMAPTorsionForce.h)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u

from helpers import (assert_equal_tol, assert_equal_vec,
                     check_energy_force_consistency, reference_platform)

TOL = 1e-5


def make_context(system, positions):
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    return ctx


def test_harmonic_bond():
    system = mm.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    f = mm.HarmonicBondForce()
    f.addBond(0, 1, 1.5, 0.8)
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 2, 0), mm.Vec3(0, 0, 0)])
    st = ctx.getState(getEnergy=True, getForces=True)
    # E = 0.5*0.8*0.5^2
    assert_equal_tol(0.5 * 0.8 * 0.25, st.getPotentialEnergy(), TOL)
    forces = st.getForces(asNumpy=True).value_in_unit(
        u.kilojoule_per_mole / u.nanometer)
    assert_equal_vec([0, -0.8 * 0.5, 0], forces[0], TOL)
    assert_equal_vec([0, 0.8 * 0.5, 0], forces[1], TOL)
    check_energy_force_consistency(ctx)


def test_harmonic_angle():
    system = mm.System()
    for _ in range(3):
        system.addParticle(1.0)
    f = mm.HarmonicAngleForce()
    theta0 = math.pi / 3
    f.addAngle(0, 1, 2, theta0, 1.1)
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0)])
    st = ctx.getState(getEnergy=True)
    dtheta = 0.5 * math.pi - theta0
    assert_equal_tol(0.5 * 1.1 * dtheta * dtheta, st.getPotentialEnergy(), TOL)
    check_energy_force_consistency(ctx)


def test_periodic_torsion():
    system = mm.System()
    for _ in range(4):
        system.addParticle(1.0)
    f = mm.PeriodicTorsionForce()
    f.addTorsion(0, 1, 2, 3, 2, math.pi / 3, 1.1)
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 0),
                                mm.Vec3(1, 0, 0), mm.Vec3(1, 0, 2)])
    st = ctx.getState(getEnergy=True)
    # dihedral is 90 degrees: E = k*(1+cos(2*phi - phi0))
    phi = 0.5 * math.pi
    expected = 1.1 * (1 + math.cos(2 * phi - math.pi / 3))
    assert_equal_tol(expected, st.getPotentialEnergy(), TOL)
    check_energy_force_consistency(ctx)


def test_rb_torsion():
    system = mm.System()
    for _ in range(4):
        system.addParticle(1.0)
    f = mm.RBTorsionForce()
    coeffs = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    f.addTorsion(0, 1, 2, 3, *coeffs)
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 0),
                                mm.Vec3(1, 0, 0), mm.Vec3(1, 1, 1)])
    st = ctx.getState(getEnergy=True)
    phi = 0.25 * math.pi   # dihedral of this geometry
    psi = phi - math.pi
    expected = sum(c * math.cos(psi) ** n for n, c in enumerate(coeffs))
    assert_equal_tol(expected, st.getPotentialEnergy(), 1e-4)
    check_energy_force_consistency(ctx)


def test_torsion_sign_convention():
    """The two chiralities must give opposite-sign dihedrals: E(n=1, phase=0)
    differs unless |phi| is 0 or pi."""
    system = mm.System()
    for _ in range(4):
        system.addParticle(1.0)
    f = mm.PeriodicTorsionForce()
    f.addTorsion(0, 1, 2, 3, 1, math.pi / 2, 1.0)
    system.addForce(f)
    pos_plus = [mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0), mm.Vec3(1, 0, 1)]
    pos_minus = [mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0), mm.Vec3(1, 0, -1)]
    ctx = make_context(system, pos_plus)
    e_plus = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    ctx.setPositions(pos_minus)
    e_minus = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # k(1+cos(phi - pi/2)) = k(1+sin(phi)) -> differs for phi = +-pi/2
    assert abs((e_plus - e_minus)) > 0.5


def test_cmap():
    """CMAP with a smooth analytic map: interpolated energy must track the
    function and forces must be consistent."""
    size = 24
    def fmap(phi, psi):
        return 1.5 * math.cos(phi) + 0.5 * math.sin(psi) + 0.25 * math.cos(phi + psi)
    energy = [fmap(i * 2 * math.pi / size, j * 2 * math.pi / size)
              for j in range(size) for i in range(size)]
    system = mm.System()
    for _ in range(5):
        system.addParticle(1.0)
    f = mm.CMAPTorsionForce()
    f.addMap(size, energy)
    f.addTorsion(0, 0, 1, 2, 3, 1, 2, 3, 4)
    system.addForce(f)
    positions = [mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0),
                 mm.Vec3(1, 1, 0.3), mm.Vec3(2, 1, 0.8)]
    ctx = make_context(system, positions)
    st = ctx.getState(getEnergy=True)
    # compute the two dihedrals with numpy for the analytic value
    p = np.array([[v.x, v.y, v.z] for v in positions])

    def dihedral(a, b, c, d):
        b1, b2, b3 = b - a, c - b, d - c
        n1, n2 = np.cross(b1, b2), np.cross(b2, b3)
        y = np.dot(np.cross(n1, n2), b2 / np.linalg.norm(b2))
        x = np.dot(n1, n2)
        return math.atan2(y, x)

    phi = dihedral(p[0], p[1], p[2], p[3])
    psi = dihedral(p[1], p[2], p[3], p[4])
    assert_equal_tol(fmap(phi % (2 * math.pi), psi % (2 * math.pi)),
                     st.getPotentialEnergy(), 1e-3)
    check_energy_force_consistency(ctx)


def test_update_parameters_in_context():
    system = mm.System()
    system.addParticle(1.0)
    system.addParticle(1.0)
    f = mm.HarmonicBondForce()
    f.addBond(0, 1, 1.5, 0.8)
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 2, 0), mm.Vec3(0, 0, 0)])
    assert_equal_tol(0.5 * 0.8 * 0.25,
                     ctx.getState(getEnergy=True).getPotentialEnergy(), TOL)
    f.setBondParameters(0, 0, 1, 1.0, 2.0)
    f.updateParametersInContext(ctx)
    assert_equal_tol(0.5 * 2.0 * 1.0,
                     ctx.getState(getEnergy=True).getPotentialEnergy(), TOL)


def test_windowed_bonded_matches_autodiff():
    """The banded-selection ef_fn (ops/bandsel.py) must reproduce the
    gather/autodiff oracle for bonds, angles, and torsions, including
    out-of-band fallback terms."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from openmm_tpu.forces.bonded import (HarmonicBondForce,
                                          HarmonicAngleForce,
                                          PeriodicTorsionForce)
    from openmm_tpu.forces.base import CompileConfig

    rng = np.random.RandomState(3)
    n = 700
    pos = jnp.asarray(rng.uniform(0, 4.0, (n, 3)).astype(np.float32))
    box = jnp.asarray(np.diag([50.0] * 3).astype(np.float32))

    bond = HarmonicBondForce()
    for _ in range(400):
        i = rng.randint(0, n - 9)
        bond.addBond(i, i + rng.randint(1, 9), 0.12 + 0.05 * rng.rand(),
                     1000.0 * (1 + rng.rand()))
    bond.addBond(2, n - 3, 0.5, 800.0)          # out-of-band fallback

    ang = HarmonicAngleForce()
    for _ in range(300):
        i = rng.randint(0, n - 12)
        ang.addAngle(i, i + rng.randint(1, 6), i + rng.randint(6, 12),
                     1.9 + 0.2 * rng.rand(), 400.0)
    ang.addAngle(1, 5, n - 2, 1.8, 350.0)       # fallback

    tor = PeriodicTorsionForce()
    for _ in range(300):
        i = rng.randint(0, n - 16)
        js = i + np.sort(rng.choice(np.arange(1, 16), 3, replace=False))
        tor.addTorsion(i, int(js[0]), int(js[1]), int(js[2]),
                       int(rng.randint(1, 4)), float(rng.rand()), 8.0)
    tor.addTorsion(0, 3, 7, n - 1, 2, 0.4, 5.0)  # fallback

    cfg = CompileConfig(n_particles=n, dtype=jnp.float32,
                        accum_dtype=jnp.float32,
                        masses=np.ones(n), uses_pbc=False,
                        platform_name="TPU", pair_block=256, mesh=None)
    for force in (bond, ang, tor):
        m = force._compile(None, cfg)
        assert m.ef_fn is not None, type(force).__name__
        e_ref, g = jax.value_and_grad(
            lambda q: m.energy_fn(q, box, m.params, {}))(pos)
        e_fast, f_fast = m.ef_fn(pos, box, m.params, {})
        assert abs(float(e_ref - e_fast)) < 1e-3 * max(1.0, abs(float(e_ref)))
        f_ref = -np.asarray(g)
        scale = np.abs(f_ref).max()
        err = np.abs(np.asarray(f_fast) - f_ref).max()
        assert err < 2e-4 * scale, (type(force).__name__, err, scale)
