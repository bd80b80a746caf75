"""RPMD tests (pattern of plugins/rpmd/tests/TestRpmd.h)."""
import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.constants import BOLTZ

from helpers import reference_platform


def harmonic_system(n=8, k_spring=100.0):
    system = mm.System()
    f = mm.CustomExternalForce("0.5*k*(x*x+y*y+z*z)")
    f.addGlobalParameter("k", k_spring)
    positions = []
    for i in range(n):
        system.addParticle(2.0)
        f.addParticle(i, [])
        positions.append(mm.Vec3(0.05 * i, 0, 0))
    system.addForce(f)
    return system, positions


def test_rpmd_runs_and_thermalizes():
    system, positions = harmonic_system()
    integ = mm.RPMDIntegrator(8, 300.0, 10.0, 0.0005)
    integ.setRandomNumberSeed(3)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    integ.step(200)
    st = integ.getState(0, getPositions=True, getEnergy=True)
    assert np.isfinite(st.getPotentialEnergy()._value)
    # copies must have spread out (quantum dispersion)
    p0 = integ.getState(0, getPositions=True).getPositions(asNumpy=True)._value
    p4 = integ.getState(4, getPositions=True).getPositions(asNumpy=True)._value
    assert np.max(np.abs(p0 - p4)) > 1e-4


def test_rpmd_centroid_temperature():
    """Centroid kinetic energy thermalizes to ~ (3N/2) kT."""
    n = 16
    system, positions = harmonic_system(n=n, k_spring=50.0)
    k_copies = 4
    integ = mm.RPMDIntegrator(k_copies, 300.0, 10.0, 0.001)
    integ.setRandomNumberSeed(5)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    integ.step(500)
    kes = []
    for _ in range(40):
        integ.step(25)
        vels = np.stack([
            integ.getState(c, getVelocities=True)
            .getVelocities(asNumpy=True)._value for c in range(k_copies)])
        v_centroid = vels.mean(axis=0)
        kes.append(0.5 * 2.0 * np.sum(v_centroid ** 2))
    # the centroid is classical: KE = (3N/2) kT
    mean_ke = np.mean(kes)
    expected = 0.5 * 3 * n * BOLTZ * 300.0
    assert abs(mean_ke - expected) / expected < 0.25, (mean_ke, expected)


def test_rpmd_total_energy_finite():
    system, positions = harmonic_system(4)
    integ = mm.RPMDIntegrator(4, 200.0, 5.0, 0.0005)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    integ.step(50)
    e = integ.getTotalEnergy()
    assert np.isfinite(e._value)


def test_rpmd_barostat_runs():
    from openmm_tpu.models import tip3p_water_box
    """RPMDMonteCarloBarostat scales centroid molecule COMs; copies get the
    same offset (RPMDMonteCarloBarostatImpl.cpp:91-126). Smoke: box changes
    under high pressure, ring polymer stays finite."""
    import numpy as np
    system, positions = tip3p_water_box(n_waters=8)
    system.addForce(mm.RPMDMonteCarloBarostat(1000.0, 2))
    integ = mm.RPMDIntegrator(4, 300.0, 10.0, 0.0005)
    ctx = mm.Context(system, integ, reference_platform())
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0)
    box0 = ctx.getState().getPeriodicBoxVectors(asNumpy=True)._value
    integ.step(30)
    box1 = ctx.getState().getPeriodicBoxVectors(asNumpy=True)._value
    pos = ctx.getState(getPositions=True).getPositions(asNumpy=True)._value
    assert np.all(np.isfinite(pos))
    assert abs(box1[0, 0] - box0[0, 0]) > 1e-6  # some move was accepted


def test_contraction_identity_and_centroid():
    """Contraction semantics (RPMDIntegrator.h:69-92): contracting a force
    group to M=K beads reproduces the uncontracted trajectory exactly, and
    M=1 evaluates that group's force at the centroid (normal-mode
    truncation, kernels/rpmdContraction.cc)."""
    import numpy as np

    def build(contractions):
        # quartic potential: nonlinear forces, so centroid-contracted (M=1)
        # dynamics genuinely differ while M=K stays exact
        system = mm.System()
        f = mm.CustomExternalForce("25*(x^4+y^4+z^4) + 50*(x*x+y*y+z*z)")
        positions = []
        for i in range(4):
            system.addParticle(2.0)
            f.addParticle(i, [])
            positions.append(mm.Vec3(0.05 * (i + 1), 0.02, -0.03))
        system.addForce(f)
        system.getForces()[0].setForceGroup(0)
        integ = mm.RPMDIntegrator(4, 300.0, 1.0, 0.0005,
                                  contractions=contractions)
        integ.setApplyThermostat(False)
        integ.setRandomNumberSeed(7)
        ctx = mm.Context(system, integ, reference_platform())
        ctx.setPositions(positions)
        ctx.setVelocitiesToTemperature(100.0, randomSeed=3)
        vel = ctx.getState(getVelocities=True).getVelocities(asNumpy=True)
        rng = np.random.RandomState(11)
        base = np.asarray([[v.x, v.y, v.z] if hasattr(v, 'x') else v
                           for v in np.asarray(vel._value)])
        for c in range(4):
            # identical bead SPREAD for every build: contraction must act on
            # a genuinely extended ring polymer
            jitter = rng.normal(scale=0.004, size=(4, 3))
            integ.setPositions(c, np.asarray(positions) + jitter)
            integ.setVelocities(c, base)
        return ctx, integ

    ctx0, i0 = build(None)
    ctx1, i1 = build({0: 4})
    ctx2, i2 = build({0: 1})
    i0.step(5)
    i1.step(5)
    i2.step(5)
    p0 = np.asarray(i0.getState(1, getPositions=True)
                    .getPositions(asNumpy=True)._value)
    p1 = np.asarray(i1.getState(1, getPositions=True)
                    .getPositions(asNumpy=True)._value)
    p2 = np.asarray(i2.getState(1, getPositions=True)
                    .getPositions(asNumpy=True)._value)
    # M = K: identical dynamics
    assert np.abs(p0 - p1).max() < 5e-6, np.abs(p0 - p1).max()
    # M = 1: different (centroid-force) dynamics but finite and close
    assert np.isfinite(p2).all()
    assert np.abs(p0 - p2).max() > 0.0
