"""Drude plugin tests (patterns of plugins/drude/tests/TestDrudeForce.h and
TestDrudeLangevinIntegrator.h)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.constants import BOLTZ, ONE_4PI_EPS0

from helpers import assert_equal_tol, check_energy_force_consistency, \
    reference_platform


def test_drude_spring_energy():
    """Isotropic Drude spring: E = 0.5*k*r^2 with k = f*q^2/alpha
    (TestDrudeForce.h testSingleParticle pattern)."""
    system = mm.System()
    system.addParticle(1.0)    # parent
    system.addParticle(1.0)    # drude
    f = mm.DrudeForce()
    alpha = 0.001
    q = 1.5
    f.addParticle(1, 0, -1, -1, -1, q, alpha, 1, 1)
    system.addForce(f)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    r = 0.01
    ctx.setPositions([mm.Vec3(0, 0, 0), mm.Vec3(r, 0, 0)])
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    k = ONE_4PI_EPS0 * q * q / alpha
    assert_equal_tol(0.5 * k * r * r, e, 1e-5)
    check_energy_force_consistency(ctx)


def test_drude_anisotropic():
    system = mm.System()
    for _ in range(4):
        system.addParticle(1.0)
    f = mm.DrudeForce()
    # parent 0, drude 1, direction partner 2 (and 3 unused)
    alpha, q, aniso12 = 0.001, 1.0, 1.5
    f.addParticle(1, 0, 2, -1, -1, q, alpha, aniso12, 1.0)
    system.addForce(f)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    # displacement along the 0->2 axis vs perpendicular must differ
    base = [mm.Vec3(0, 0, 0), None, mm.Vec3(1, 0, 0), mm.Vec3(0, 1, 0)]
    base[1] = mm.Vec3(0.01, 0, 0)   # parallel
    ctx.setPositions(base)
    e_par = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    base[1] = mm.Vec3(0, 0.01, 0)   # perpendicular
    ctx.setPositions(base)
    e_perp = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert abs(e_par - e_perp) > 1e-6
    check_energy_force_consistency(ctx)


def test_thole_screened_pair():
    """Two Drude oscillators with Thole screening: energy matches the
    4-term screened dipole-dipole formula."""
    system = mm.System()
    for _ in range(4):
        system.addParticle(1.0)
    f = mm.DrudeForce()
    alpha, q = 0.001, 1.0
    d0 = f.addParticle(1, 0, -1, -1, -1, q, alpha, 1, 1)
    d1 = f.addParticle(3, 2, -1, -1, -1, q, alpha, 1, 1)
    f.addScreenedPair(d0, d1, 2.6)
    system.addForce(f)
    positions = [mm.Vec3(0, 0, 0), mm.Vec3(0.005, 0, 0),
                 mm.Vec3(0.5, 0, 0), mm.Vec3(0.505, 0.003, 0)]
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # hand computation
    p = np.array([[v.x, v.y, v.z] for v in positions])
    uscale = 2.6 / (alpha * alpha) ** (1.0 / 6.0)
    expected = 0.0
    for (i, j, sign) in ((1, 3, 1), (1, 2, -1), (0, 3, -1), (0, 2, 1)):
        r = np.linalg.norm(p[i] - p[j])
        uu = uscale * r
        s = 1 - (1 + uu / 2) * math.exp(-uu)
        expected += sign * ONE_4PI_EPS0 * q * q * s / r
    # springs
    k = ONE_4PI_EPS0 * q * q / alpha
    expected += 0.5 * k * np.sum((p[1] - p[0]) ** 2)
    expected += 0.5 * k * np.sum((p[3] - p[2]) ** 2)
    assert_equal_tol(expected, e, 1e-5)
    check_energy_force_consistency(ctx)


def _drude_water_like(n_pairs=16):
    """Parent+drude pairs on a lattice with springs only."""
    system = mm.System()
    f = mm.DrudeForce()
    positions = []
    for i in range(n_pairs):
        p = system.addParticle(15.0)
        d = system.addParticle(0.4)
        f.addParticle(d, p, -1, -1, -1, 1.0, 0.001, 1, 1)
        base = np.array([0.5 * (i % 4), 0.5 * ((i // 4) % 4), 0.5 * (i // 16)])
        positions.append(mm.Vec3(*base))
        positions.append(mm.Vec3(*(base + [0.001, 0, 0])))
    system.addForce(f)
    return system, positions


def test_drude_langevin_dual_temperature():
    """COM dofs equilibrate near T; relative dofs near T_drude
    (TestDrudeLangevinIntegrator.h pattern)."""
    system, positions = _drude_water_like(32)
    integ = mm.DrudeLangevinIntegrator(300.0, 10.0, 1.0, 100.0, 0.001)
    integ.setRandomNumberSeed(7)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    integ.step(1000)
    kes_com, kes_rel = [], []
    masses = np.array([15.0, 0.4] * 32)
    for _ in range(50):
        integ.step(20)
        v = ctx.getState(getVelocities=True).getVelocities(asNumpy=True)._value
        vp = v[0::2]
        vd = v[1::2]
        m_p, m_d = 15.0, 0.4
        m_tot = m_p + m_d
        v_com = (m_p * vp + m_d * vd) / m_tot
        v_rel = vd - vp
        mu = m_p * m_d / m_tot
        kes_com.append(0.5 * m_tot * np.sum(v_com ** 2))
        kes_rel.append(0.5 * mu * np.sum(v_rel ** 2))
    t_com = np.mean(kes_com) / (0.5 * 3 * 32 * BOLTZ)
    t_rel = np.mean(kes_rel) / (0.5 * 3 * 32 * BOLTZ)
    assert abs(t_com - 300.0) / 300.0 < 0.15, t_com
    assert t_rel < 60.0, t_rel   # cold drude dofs


def test_drude_scf():
    """SCF integrator relaxes drude particles to the field minimum."""
    system, positions = _drude_water_like(8)
    # add a static external field via CustomExternalForce on drudes
    ext = mm.CustomExternalForce("-E0*x*q")
    ext.addGlobalParameter("E0", 50.0)
    ext.addPerParticleParameter("q")
    for i in range(8):
        ext.addParticle(2 * i + 1, [1.0])
    system.addForce(ext)
    integ = mm.DrudeSCFIntegrator(0.0005)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    integ.step(5)
    pos = ctx.getState(getPositions=True).getPositions(asNumpy=True)._value
    # drude displacement should approach E0*q/k along x
    from openmm_tpu.constants import ONE_4PI_EPS0 as f_const
    k = f_const * 1.0 / 0.001
    expected_disp = 50.0 / k
    disp = pos[1::2, 0] - pos[0::2, 0]
    assert np.allclose(disp, expected_disp, rtol=0.1), (disp, expected_disp)
