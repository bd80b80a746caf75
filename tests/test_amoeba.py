"""AMOEBA plugin tests (patterns of plugins/amoeba/tests/): buffered 14-7
vdW oracle, multipole limits (charges-only reduces to Coulomb; dipole as
charge-pair limit), polarization energy sign."""
import math

import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.constants import ONE_4PI_EPS0

from helpers import assert_equal_tol, check_energy_force_consistency, \
    reference_platform


def make_context(system, positions):
    ctx = mm.Context(system, mm.VerletIntegrator(0.001), reference_platform())
    ctx.setPositions(positions)
    return ctx


def test_amoeba_vdw():
    system = mm.System()
    f = mm.AmoebaVdwForce()
    for i in range(2):
        system.addParticle(10.0)
        f.addParticle(i, 0.35, 0.5, 1.0)
    system.addForce(f)
    r = 0.4
    ctx = make_context(system, [mm.Vec3(0, 0, 0), mm.Vec3(r, 0, 0)])
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    r0 = (0.35 ** 3 + 0.35 ** 3) / (0.35 ** 2 + 0.35 ** 2)
    e0 = 4 * 0.5 * 0.5 / (math.sqrt(0.5) + math.sqrt(0.5)) ** 2
    rho = r / r0
    expected = e0 * (1.07 / (rho + 0.07)) ** 7 * (1.12 / (rho ** 7 + 0.12) - 2)
    assert_equal_tol(expected, e, 1e-6)
    check_energy_force_consistency(ctx)


def test_amoeba_vdw_hydrogen_reduction():
    """Reduction factor moves the interaction site toward the parent."""
    system = mm.System()
    f = mm.AmoebaVdwForce()
    system.addParticle(16.0)   # O
    system.addParticle(1.0)    # H with reduction
    system.addParticle(16.0)   # other O
    f.addParticle(0, 0.35, 0.5, 1.0)
    f.addParticle(0, 0.28, 0.1, 0.9)   # parent 0, reduction 0.9
    f.addParticle(2, 0.35, 0.5, 1.0)
    f.setParticleExclusions(0, [1])
    f.setParticleExclusions(1, [0])
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 0, 0), mm.Vec3(0.1, 0, 0),
                                mm.Vec3(0.8, 0, 0)])
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # H site at 0.09 from O (r_eff to other O = 0.8 - 0.09 = 0.71)
    def pair(r, s1, e1, s2, e2):
        r0 = (s1 ** 3 + s2 ** 3) / (s1 ** 2 + s2 ** 2)
        e0 = 4 * e1 * e2 / (math.sqrt(e1) + math.sqrt(e2)) ** 2
        rho = r / r0
        return e0 * (1.07 / (rho + 0.07)) ** 7 * (1.12 / (rho ** 7 + 0.12) - 2)
    expected = pair(0.8, 0.35, 0.5, 0.35, 0.5) \
        + pair(0.8 - 0.09, 0.28, 0.1, 0.35, 0.5)
    assert_equal_tol(expected, e, 1e-6)


def test_multipole_charges_reduce_to_coulomb():
    system = mm.System()
    f = mm.AmoebaMultipoleForce()
    qs = [0.7, -0.4, -0.3]
    positions = [mm.Vec3(0, 0, 0), mm.Vec3(0.5, 0, 0), mm.Vec3(0, 0.6, 0.2)]
    for q in qs:
        system.addParticle(10.0)
        f.addMultipole(q, [0, 0, 0], [0] * 9,
                       mm.AmoebaMultipoleForce.NoAxisType, -1, -1, -1,
                       0.39, 0.0, 0.0)   # no polarizability
    system.addForce(f)
    ctx = make_context(system, positions)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    p = np.array([[v.x, v.y, v.z] for v in positions])
    expected = sum(ONE_4PI_EPS0 * qs[i] * qs[j] / np.linalg.norm(p[i] - p[j])
                   for i in range(3) for j in range(i + 1, 3))
    assert_equal_tol(expected, e, 1e-6)
    check_energy_force_consistency(ctx, tol=1e-3)


def test_multipole_dipole_limit():
    """A point dipole must match two separated charges in the far field."""
    d = 0.002   # small separation
    q = 1.0
    mu = q * d  # dipole moment e*nm, along z
    # system A: charge 1.0 at origin + point dipole at (0,0,1)
    sysA = mm.System()
    fA = mm.AmoebaMultipoleForce()
    sysA.addParticle(10.0)
    fA.addMultipole(1.0, [0, 0, 0], [0] * 9,
                    mm.AmoebaMultipoleForce.NoAxisType, -1, -1, -1,
                    0.39, 0.0, 0.0)
    sysA.addParticle(10.0)
    fA.addMultipole(0.0, [0, 0, mu], [0] * 9,
                    mm.AmoebaMultipoleForce.NoAxisType, -1, -1, -1,
                    0.39, 0.0, 0.0)
    sysA.addForce(fA)
    ctxA = make_context(sysA, [mm.Vec3(0, 0, 0), mm.Vec3(0, 0, 1.0)])
    eA = ctxA.getState(getEnergy=True).getPotentialEnergy()._value
    # system B: the dipole as +-q pair straddling (0,0,1)
    sysB = mm.System()
    fB = mm.AmoebaMultipoleForce()
    for qq, z in ((1.0, 0.0), (q, 1.0 + d / 2), (-q, 1.0 - d / 2)):
        sysB.addParticle(10.0)
        fB.addMultipole(qq, [0, 0, 0], [0] * 9,
                        mm.AmoebaMultipoleForce.NoAxisType, -1, -1, -1,
                        0.39, 0.0, 0.0)
    # exclude the internal +-q interaction (constant offset)
    fB.setCovalentMap(1, mm.AmoebaMultipoleForce.Covalent12, [2])
    fB.setCovalentMap(2, mm.AmoebaMultipoleForce.Covalent12, [1])
    sysB.addForce(fB)
    ctxB = make_context(sysB, [mm.Vec3(0, 0, 0), mm.Vec3(0, 0, 1.0 + d / 2),
                               mm.Vec3(0, 0, 1.0 - d / 2)])
    eB = ctxB.getState(getEnergy=True).getPotentialEnergy()._value
    assert abs(eA - eB) < 5e-4 * abs(eB), (eA, eB)


def test_polarization_lowers_energy():
    """Induced dipoles always lower the energy of a polarizable pair."""
    def energy(polarity):
        system = mm.System()
        f = mm.AmoebaMultipoleForce()
        f.setPolarizationType(mm.AmoebaMultipoleForce.Mutual)
        for q in (1.0, -1.0):
            system.addParticle(10.0)
            f.addMultipole(q, [0, 0, 0], [0] * 9,
                           mm.AmoebaMultipoleForce.NoAxisType, -1, -1, -1,
                           0.39, 0.3, polarity)
        system.addForce(f)
        ctx = make_context(system, [mm.Vec3(0, 0, 0), mm.Vec3(0.5, 0, 0)])
        return ctx.getState(getEnergy=True).getPotentialEnergy()._value

    e_rigid = energy(0.0)
    e_pol = energy(0.001)
    assert e_pol < e_rigid, (e_pol, e_rigid)


def test_multipole_force_consistency_with_frames():
    """Dipoles in ZThenX local frames: forces include frame-rotation terms
    (the torque->force mapping the reference does by hand; grad composes it)."""
    system = mm.System()
    f = mm.AmoebaMultipoleForce()
    for i in range(3):
        system.addParticle(10.0)
    # particle 0: dipole along local z (toward particle 1), x toward 2
    f.addMultipole(0.1, [0, 0, 0.01], [0] * 9,
                   mm.AmoebaMultipoleForce.ZThenX, 1, 2, -1, 0.39, 0.0, 0.0)
    f.addMultipole(-0.05, [0, 0, 0], [0] * 9,
                   mm.AmoebaMultipoleForce.NoAxisType, -1, -1, -1,
                   0.39, 0.0, 0.0)
    f.addMultipole(-0.05, [0, 0, 0], [0] * 9,
                   mm.AmoebaMultipoleForce.NoAxisType, -1, -1, -1,
                   0.39, 0.0, 0.0)
    system.addForce(f)
    ctx = make_context(system, [mm.Vec3(0, 0, 0), mm.Vec3(0.4, 0.1, 0),
                                mm.Vec3(0, 0.5, 0.3)])
    check_energy_force_consistency(ctx, tol=1e-3)


def test_torsion_torsion_grid():
    """Bicubic grid lookup: E = f(angle1, angle2) with an analytic surface
    f = 0.01*a1^2 + 0.02*a2^2 (degrees) supplied with exact derivatives."""
    system = mm.System()
    f = mm.AmoebaTorsionTorsionForce()
    for _ in range(5):
        system.addParticle(10.0)
    f.addTorsionTorsion(0, 1, 2, 3, 4, -1, 0)
    xs = np.arange(-180.0, 181.0, 30.0)
    grid = []
    for a1 in xs:
        row = []
        for a2 in xs:
            fa = 0.01 * a1 * a1 + 0.02 * a2 * a2
            row.append([a1, a2, fa, 0.02 * a1, 0.04 * a2, 0.0])
        grid.append(row)
    f.setTorsionTorsionGrid(0, grid)
    system.addForce(f)
    # positions with known dihedrals: chain along x with controlled twists
    import math as m
    positions = [mm.Vec3(0, 1, 0), mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0),
                 mm.Vec3(1, 1, 0), mm.Vec3(2, 1, 0)]
    ctx = make_context(system, positions)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # dihedral(0,1,2,3) = 0 deg (cis); dihedral(1,2,3,4): compute expected
    from openmm_tpu.ops import geometry as geom
    import jax.numpy as jnp
    pts = jnp.asarray([[v.x, v.y, v.z] for v in positions])
    a1 = float(geom.dihedral_angle(pts[0], pts[1], pts[2], pts[3])) * 180 / m.pi
    a2 = float(geom.dihedral_angle(pts[1], pts[2], pts[3], pts[4])) * 180 / m.pi
    expected = 0.01 * a1 * a1 + 0.02 * a2 * a2
    assert_equal_tol(expected, e, 1e-4)
    check_energy_force_consistency(ctx, tol=1e-3)


def test_torsion_torsion_chirality_flip():
    """A chiral-check atom with negative parallelepiped volume flips both
    angle signs (AmoebaReferenceTorsionTorsionForce.cpp:254-281)."""
    system = mm.System()
    f = mm.AmoebaTorsionTorsionForce()
    for _ in range(6):
        system.addParticle(10.0)
    f.addTorsionTorsion(0, 1, 2, 3, 4, 5, 0)
    xs = np.arange(-180.0, 181.0, 30.0)
    # asymmetric surface so a sign flip changes the energy: f = 0.01*a1
    grid = [[[a1, a2, 0.01 * a1, 0.01, 0.0, 0.0] for a2 in xs] for a1 in xs]
    f.setTorsionTorsionGrid(0, grid)
    system.addForce(f)
    base = [mm.Vec3(0, 1, 0.3), mm.Vec3(0, 0, 0), mm.Vec3(1, 0, 0),
            mm.Vec3(1, 1, 0.2), mm.Vec3(2, 1, 0.5)]
    e_vals = []
    for zc in (0.7, -0.7):   # chiral atom above/below the BCD plane
        ctx = make_context(system, base + [mm.Vec3(1.5, 0.2, zc)])
        e_vals.append(ctx.getState(getEnergy=True).getPotentialEnergy()._value)
    assert abs(e_vals[0] + e_vals[1]) < 1e-6 * max(1, abs(e_vals[0]))
    assert abs(e_vals[0]) > 1e-3


def test_wca_dispersion():
    """WCA dispersion: one atom gets its full bulk-water maximum dispersion
    energy; a second nearby atom descreens part of it (raising the energy);
    infinitely separated atoms recover the sum of maxima."""
    def energy(positions):
        system = mm.System()
        f = mm.AmoebaWcaDispersionForce()
        for _ in positions:
            system.addParticle(10.0)
            f.addParticle(0.2, 0.4)
        system.addForce(f)
        ctx = make_context(system, positions)
        return ctx.getState(getEnergy=True).getPotentialEnergy()._value, ctx

    e1, _ = energy([mm.Vec3(0, 0, 0)])
    f = mm.AmoebaWcaDispersionForce()
    expected_single = f._max_dispersion_energy(0.2, 0.4)
    assert_equal_tol(expected_single, e1, 1e-6)
    assert e1 < 0   # bulk dispersion is attractive

    e_far, _ = energy([mm.Vec3(0, 0, 0), mm.Vec3(50.0, 0, 0)])
    assert_equal_tol(2 * expected_single, e_far, 1e-6)

    e_near, ctx = energy([mm.Vec3(0, 0, 0), mm.Vec3(0.35, 0, 0)])
    assert e_near > e_far   # descreening removes favorable dispersion
    check_energy_force_consistency(ctx, tol=1e-3)
