"""NonbondedForce tests: analytic Coulomb/LJ, cutoffs, reaction field,
exceptions, switching, PME/Ewald consistency — pattern of
tests/TestNonbondedForce.h (testCoulomb at :50) and TestEwald.h."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.constants import ONE_4PI_EPS0

from helpers import (assert_equal_tol, check_energy_force_consistency,
                     reference_platform)

TOL = 1e-5


def two_particle_context(charges, sigmas, epsilons, positions, method=None,
                         cutoff=None, **opts):
    system = mm.System()
    nb = mm.NonbondedForce()
    for q, s, e in zip(charges, sigmas, epsilons):
        system.addParticle(1.0)
        nb.addParticle(q, s, e)
    if method is not None:
        nb.setNonbondedMethod(method)
    if cutoff is not None:
        nb.setCutoffDistance(cutoff)
    for k, v in opts.items():
        getattr(nb, k)(v)
    system.addForce(nb)
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    return ctx, system, nb


def test_coulomb():
    ctx, _, _ = two_particle_context(
        [0.5, -1.5], [1.0, 1.0], [0.0, 0.0],
        [mm.Vec3(0, 0, 0), mm.Vec3(2, 0, 0)])
    st = ctx.getState(getEnergy=True, getForces=True)
    force = ONE_4PI_EPS0 * (-0.75) / 4.0
    assert_equal_tol(ONE_4PI_EPS0 * (-0.75) / 2.0, st.getPotentialEnergy(), TOL)
    # attractive pair: force on particle 0 points toward particle 1 (+x)
    f = st.getForces(asNumpy=True)._value
    assert abs(f[0][0] + force) < 1e-5 * abs(force)
    assert abs(f[1][0] - force) < 1e-5 * abs(force)


def test_lj():
    ctx, _, _ = two_particle_context(
        [0.0, 0.0], [1.2, 1.4], [1.0, 2.0],
        [mm.Vec3(0, 0, 0), mm.Vec3(2, 0, 0)])
    st = ctx.getState(getEnergy=True)
    sig = 1.3
    eps = math.sqrt(2.0)
    x6 = (sig / 2.0) ** 6
    expected = 4.0 * eps * (x6 * x6 - x6)
    assert_equal_tol(expected, st.getPotentialEnergy(), TOL)
    check_energy_force_consistency(ctx)


def test_exception_replaces_interaction():
    ctx, system, nb = two_particle_context(
        [1.0, -1.0], [0.3, 0.3], [1.0, 1.0],
        [mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0)])
    e_full = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    nb.addException(0, 1, -0.5, 0.4, 0.5)
    ctx2 = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx2.setPositions([mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0)])
    e_exc = ctx2.getState(getEnergy=True).getPotentialEnergy()._value
    x6 = 0.4 ** 6
    expected = 4.0 * 0.5 * (x6 * x6 - x6) + ONE_4PI_EPS0 * (-0.5)
    assert abs(e_exc - expected) < 1e-5 * abs(expected)
    assert abs(e_exc - e_full) > 1e-3


def test_cutoff_reaction_field():
    eps_solv = 78.3
    cutoff = 2.9
    ctx, _, _ = two_particle_context(
        [1.0, 1.0], [1.0, 1.0], [0.0, 0.0],
        [mm.Vec3(0, 0, 0), mm.Vec3(2, 0, 0)],
        method=mm.NonbondedForce.CutoffNonPeriodic, cutoff=cutoff)
    st = ctx.getState(getEnergy=True)
    krf = (1.0 / cutoff ** 3) * (eps_solv - 1) / (2 * eps_solv + 1)
    crf = (1.0 / cutoff) * 3 * eps_solv / (2 * eps_solv + 1)
    expected = ONE_4PI_EPS0 * (0.5 + krf * 4.0 - crf)
    assert_equal_tol(expected, st.getPotentialEnergy(), TOL)
    # pair beyond cutoff contributes nothing
    ctx.setPositions([mm.Vec3(0, 0, 0), mm.Vec3(3.5, 0, 0)])
    assert abs(ctx.getState(getEnergy=True).getPotentialEnergy()._value) < 1e-10


def test_switching_function():
    system = mm.System()
    nb = mm.NonbondedForce()
    for _ in range(2):
        system.addParticle(1.0)
        nb.addParticle(0.0, 0.3, 1.0)
    nb.setNonbondedMethod(mm.NonbondedForce.CutoffNonPeriodic)
    nb.setCutoffDistance(2.0)
    nb.setUseSwitchingFunction(True)
    nb.setSwitchingDistance(1.5)
    system.addForce(nb)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    r = 1.8
    ctx.setPositions([mm.Vec3(0, 0, 0), mm.Vec3(r, 0, 0)])
    st = ctx.getState(getEnergy=True)
    x6 = (0.3 / r) ** 6
    e_lj = 4.0 * (x6 * x6 - x6)
    t = (r - 1.5) / 0.5
    sw = 1 - 6 * t ** 5 + 15 * t ** 4 - 10 * t ** 3
    assert_equal_tol(e_lj * sw, st.getPotentialEnergy(), TOL)
    check_energy_force_consistency(ctx)


def _charged_box(n_side=3, spacing=0.5, box_l=2.0, method=mm.NonbondedForce.PME):
    """A small NaCl-like lattice, periodic."""
    system = mm.System()
    system.setDefaultPeriodicBoxVectors(mm.Vec3(box_l, 0, 0),
                                        mm.Vec3(0, box_l, 0),
                                        mm.Vec3(0, 0, box_l))
    nb = mm.NonbondedForce()
    nb.setNonbondedMethod(method)
    nb.setCutoffDistance(0.9)
    nb.setEwaldErrorTolerance(1e-5)
    positions = []
    idx = 0
    for i in range(n_side):
        for j in range(n_side):
            for k in range(n_side):
                q = 1.0 if (i + j + k) % 2 == 0 else -1.0
                system.addParticle(22.99 if q > 0 else 35.45)
                nb.addParticle(q, 0.2, 0.1)
                positions.append(mm.Vec3(i * spacing + 0.13,
                                         j * spacing + 0.21,
                                         k * spacing + 0.04))
                idx += 1
    # neutralize if odd count
    total_q = sum(1.0 if (i + j + k) % 2 == 0 else -1.0
                  for i in range(n_side) for j in range(n_side) for k in range(n_side))
    if total_q != 0:
        nb.setParticleParameters(0, 1.0 - total_q, 0.2, 0.1)
    system.addForce(nb)
    return system, nb, positions


def test_pme_vs_ewald():
    """PME and Ewald must agree (cross-method oracle, tests/TestEwald.h)."""
    energies = {}
    for method in (mm.NonbondedForce.Ewald, mm.NonbondedForce.PME):
        system, nb, positions = _charged_box(method=method)
        ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
        ctx.setPositions(positions)
        energies[method] = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    e_ewald = energies[mm.NonbondedForce.Ewald]
    e_pme = energies[mm.NonbondedForce.PME]
    assert abs(e_pme - e_ewald) / abs(e_ewald) < 1e-3, (e_ewald, e_pme)


def test_pme_force_consistency():
    system, nb, positions = _charged_box()
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    check_energy_force_consistency(ctx, tol=1e-3)


def test_pme_exclusions():
    """An excluded pair's full interaction (direct+reciprocal) must vanish:
    compare energy with exception(0,0,0) vs charges zeroed on that pair."""
    system, nb, positions = _charged_box()
    nb.addException(0, 1, 0.0, 1.0, 0.0)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    e_excl = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert np.isfinite(e_excl)
    check_energy_force_consistency(ctx, tol=1e-3)


def test_dispersion_correction():
    system, nb, positions = _charged_box(method=mm.NonbondedForce.CutoffPeriodic)
    nb.setUseDispersionCorrection(False)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    e_no = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    nb.setUseDispersionCorrection(True)
    ctx2 = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx2.setPositions(positions)
    e_yes = ctx2.getState(getEnergy=True).getPotentialEnergy()._value
    # correction is negative (attractive tail) and small
    assert e_yes < e_no
    assert abs(e_yes - e_no) < 0.1 * abs(e_no)


def test_parameter_offsets():
    system = mm.System()
    nb = mm.NonbondedForce()
    system.addParticle(1.0)
    system.addParticle(1.0)
    nb.addParticle(1.0, 0.3, 0.0)
    nb.addParticle(-1.0, 0.3, 0.0)
    nb.addGlobalParameter("lambda_q", 0.5)
    nb.addParticleParameterOffset("lambda_q", 0, 2.0, 0.0, 0.0)
    system.addForce(nb)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions([mm.Vec3(0, 0, 0), mm.Vec3(2, 0, 0)])
    # effective q0 = 1 + 0.5*2 = 2
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert_equal_tol(ONE_4PI_EPS0 * (2.0 * -1.0) / 2.0, e, TOL)
    ctx.setParameter("lambda_q", 0.0)
    e2 = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    assert_equal_tol(ONE_4PI_EPS0 * (1.0 * -1.0) / 2.0, e2, TOL)


def test_create_exceptions_from_bonds():
    system = mm.System()
    nb = mm.NonbondedForce()
    # a 5-atom chain: 0-1-2-3-4
    for i in range(5):
        system.addParticle(1.0)
        nb.addParticle(0.5, 0.3, 0.2)
    bonds = [(0, 1), (1, 2), (2, 3), (3, 4)]
    nb.createExceptionsFromBonds(bonds, 0.8333, 0.5)
    system.addForce(nb)
    # 1-2 and 1-3 pairs excluded; 1-4 pairs scaled
    n_excl = 0
    n_14 = 0
    for i in range(nb.getNumExceptions()):
        p1, p2, cp, sig, eps = nb.getExceptionParameters(i)
        if abs(cp._value) < 1e-12 and abs(eps._value) < 1e-12:
            n_excl += 1
        else:
            n_14 += 1
            assert abs(cp._value - 0.8333 * 0.25) < 1e-6
            assert abs(eps._value - 0.5 * 0.2) < 1e-6
    assert n_excl == 7  # 4 bonds + 3 1-3 pairs
    assert n_14 == 2    # (0,3), (1,4)
