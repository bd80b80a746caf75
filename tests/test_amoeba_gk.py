"""AmoebaGeneralizedKirkwoodForce vs the reference's golden values.

System, parameters, positions, and expected energies/forces are the ammonia
dimer from the reference's shared GK test
(/root/reference/plugins/amoeba/tests/TestAmoebaGeneralizedKirkwoodForce.h:
setupMultipoleAmmonia :83-298, positions :300-315, goldens :7051-7165).
"""
import numpy as np
import pytest

import openmm_tpu as mm


N_DIP = [8.3832254e-03, 0.0, 3.4232474e-03]
N_QUAD = [-4.0406249e-04, 0.0, -2.6883671e-04,
          0.0, 2.5463927e-04, 0.0,
          -2.6883671e-04, 0.0, 1.4942322e-04]
H_DIP = [-1.7388763e-03, 0.0, -4.6837475e-03]
H_QUAD = [-4.4253841e-05, 0.0, 1.5429571e-05,
          0.0, 4.1798924e-05, 0.0,
          1.5429571e-05, 0.0, 2.4549167e-06]

POSITIONS = np.array([
    [1.5927280e-01, 1.7000000e-06, 1.6491000e-03],
    [2.0805540e-01, -8.1258800e-02, 3.7282500e-02],
    [2.0843610e-01, 8.0953200e-02, 3.7462200e-02],
    [1.7280780e-01, 2.0730000e-04, -9.8741700e-02],
    [-1.6743680e-01, 1.5900000e-05, -6.6149000e-03],
    [-2.0428260e-01, 8.1071500e-02, 4.1343900e-02],
    [-6.7308300e-02, 1.2800000e-05, 1.0623300e-02],
    [-2.0426290e-01, -8.1231400e-02, 4.1033500e-02]])


def build_ammonia(polarization, include_cavity):
    system = mm.System()
    mp = mm.AmoebaMultipoleForce()
    mp.setNonbondedMethod(mm.AmoebaMultipoleForce.NoCutoff)
    mp.setPolarizationType(polarization)
    mp.setMutualInducedTargetEpsilon(1e-6)
    mp.setMutualInducedMaxIterations(500)

    def add_n(z, x, y):
        system.addParticle(14.007)
        mp.addMultipole(-0.5796, N_DIP, N_QUAD, 2, z, x, y,
                        0.39, 0.31996314, 1.073e-03)

    def add_h(z, x, y):
        system.addParticle(1.008)
        mp.addMultipole(0.1932, H_DIP, H_QUAD, 2, z, x, y,
                        0.39, 0.28135002, 4.96e-04)

    add_n(1, 2, 3)
    add_h(0, 2, 3)
    add_h(0, 1, 3)
    add_h(0, 1, 2)
    add_n(5, 6, 7)
    add_h(4, 6, 7)
    add_h(4, 5, 7)
    add_h(4, 5, 6)

    # covalent maps (Covalent12 = 0, Covalent13 = 1, PolarizationCovalent11 = 4)
    for base in (0, 4):
        n_at = base
        hs = [base + 1, base + 2, base + 3]
        group = [base, base + 1, base + 2, base + 3]
        mp.setCovalentMap(n_at, 0, hs)
        mp.setCovalentMap(n_at, 4, group)
        for h in hs:
            mp.setCovalentMap(h, 0, [n_at])
            mp.setCovalentMap(h, 1, [x for x in hs if x != h])
            mp.setCovalentMap(h, 4, group)
    system.addForce(mp)

    gk = mm.AmoebaGeneralizedKirkwoodForce()
    gk.setSolventDielectric(78.3)
    gk.setSoluteDielectric(1.0)
    gk.setIncludeCavityTerm(include_cavity)
    for _ in range(2):
        gk.addParticle(-0.5796, 0.15965, 0.69)
        for _ in range(3):
            gk.addParticle(0.1932, 0.1236, 0.69)
    system.addForce(gk)
    return system


@pytest.mark.parametrize("polarization,cavity,expected", [
    (mm.AmoebaMultipoleForce.Direct, 0, -7.6636680e+01),
    (mm.AmoebaMultipoleForce.Mutual, 0, -7.8018875e+01),
    (mm.AmoebaMultipoleForce.Mutual, 1, -6.0434582e+01),
], ids=["direct", "mutual", "mutual-cavity"])
def test_gk_ammonia_golden_energy(polarization, cavity, expected):
    system = build_ammonia(polarization, cavity)
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ,
                     mm.Platform.getPlatformByName("Reference"))
    ctx.setPositions(POSITIONS)
    st = ctx.getState(getEnergy=True, getForces=True)
    e = st.getPotentialEnergy()._value
    scale = max(1.0, abs(expected))
    # measured slack <= 6.2e-7 rel (2026-08-19) -> 1e-5-class gate
    assert abs(e - expected) / scale < 1e-5, (e, expected)
    f = np.asarray(st.getForces(asNumpy=True)._value, np.float64)
    assert np.isfinite(f).all()


def test_gk_direct_forces_golden():
    expected = np.array([
        [-6.9252994e+02, -8.9085133e+00, 9.6489739e+01],
        [1.5593797e+02, -6.0331931e+01, 1.5104507e+01],
        [1.5870088e+02, 6.1702809e+01, 6.7708985e+00],
        [1.4089885e+02, 7.5870617e+00, -1.1362294e+02],
        [-1.8916205e+02, 2.1465549e-01, -4.3433152e+02],
        [1.0208290e+01, 6.2676753e+01, 1.4987953e+02],
        [4.0621859e+02, 1.8962203e-01, 1.3021956e+02],
        [9.7274235e+00, -6.3130458e+01, 1.4949024e+02]])
    system = build_ammonia(mm.AmoebaMultipoleForce.Direct, 0)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    ctx.setPositions(POSITIONS)
    f = np.asarray(ctx.getState(getForces=True).getForces(
        asNumpy=True)._value, np.float64)
    scale = np.abs(expected).max()
    # measured slack 8.1e-9 rel (2026-08-19)
    assert np.abs(f - expected).max() / scale < 1e-5, \
        np.abs(f - expected).max()
