"""HippoNonbondedForce vs the reference's Tinker-derived golden values
(plugins/amoeba/tests/TestHippoNonbondedForce.h:49-171 testWaterDimer)."""
import math

import numpy as np
import pytest

import openmm_tpu as mm


def build_water_system(n_waters):
    system = mm.System()
    hippo = mm.HippoNonbondedForce()
    hippo.setExtrapolationCoefficients([0.042, 0.635, 0.414])
    bohr = 0.52917720859
    ds = 0.1 * bohr
    qs = 0.01 * bohr * bohr / 3.0
    c6s = math.sqrt(4.184) * 0.001
    ps = math.sqrt(4.184 * 0.1)
    for mol in range(n_waters):
        system.addParticle(15.995)
        system.addParticle(1.008)
        system.addParticle(1.008)
        hippo.addParticle(
            -0.38280, [0.0, 0.0, ds * 0.05477],
            [qs * 0.69866, 0.0, 0.0, 0.0, qs * -0.60471, 0.0, 0.0, 0.0,
             qs * -0.09395], 6.0,
            10 * 4.7075, 4.184 * 1326.0, 10 * 40.0, c6s * 18.7737,
            ps * 2.7104, -2.4233, 10 * 4.3097, 0.001 * 0.795,
            mm.HippoNonbondedForce.Bisector, 3 * mol + 1, 3 * mol + 2, -1)
        for h in (1, 2):
            hippo.addParticle(
                0.19140, [0.0, 0.0, ds * -0.20097],
                [qs * 0.03881, 0.0, 0.0, 0.0, qs * 0.02214, 0.0, 0.0, 0.0,
                 qs * -0.06095], 1.0,
                10 * 4.7909, 0.0, 10 * 3.5582, c6s * 4.5670, ps * 2.0037,
                -0.8086, 10 * 4.6450, 0.001 * 0.341,
                mm.HippoNonbondedForce.ZThenX, 3 * mol,
                3 * mol + (2 if h == 1 else 1), -1)
        hippo.addException(3 * mol, 3 * mol + 1, 0.0, 0.0, 0.2, 0.0, 0.0,
                           0.0)
        hippo.addException(3 * mol, 3 * mol + 2, 0.0, 0.0, 0.2, 0.0, 0.0,
                           0.0)
        hippo.addException(3 * mol + 1, 3 * mol + 2, 0.0, 0.0, 1.0, 0.0,
                           0.0, 0.0)
    system.addForce(hippo)
    return system, hippo


DIMER_POSITIONS = 0.1 * np.array([
    [1.505434, 0.0, -0.065656],
    [0.553912, 0.0, 0.057710],
    [1.907155, 0.0, 0.801980],
    [-1.436029, 0.0, 0.060505],
    [-1.781197, 0.772272, -0.388976],
    [-1.781197, -0.772272, -0.388976]])


@pytest.fixture(scope="module")
def dimer():
    system, hippo = build_water_system(2)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    ctx.setPositions(DIMER_POSITIONS)
    return ctx, hippo


def test_water_dimer_energy(dimer):
    ctx, hippo = dimer
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    # measured slack 1.9e-7 abs (2026-08-19) -> 1e-5-class gate
    assert abs(e - (-18.393623712669680)) < 1e-5 * 18.4, e


def test_water_dimer_forces(dimer):
    ctx, hippo = dimer
    expected = -np.array([
        [-162.94090034728887, 0.0, 35.06615691195519],
        [127.50063696213348, 0.0, -46.51857483822334],
        [39.59601328153432, 0.0, 11.805509637931072],
        [-73.52341534248339, 0.0, -92.08855312751808],
        [34.68383272305204, -26.35219958830841, 45.867730707927564],
        [34.68383272305204, 26.35219958830841, 45.867730707927564]])
    f = np.asarray(ctx.getState(getForces=True)
                   .getForces(asNumpy=True)._value, np.float64)
    scale = np.abs(expected).max()
    # measured slack 1.3e-8 rel (2026-08-19)
    assert np.abs(f - expected).max() < 1e-5 * scale, \
        np.abs(f - expected).max()


def test_water_dimer_dipoles(dimer):
    ctx, hippo = dimer
    expected_lab = np.array([
        [-1.3999971343167967e-3, 0.0, 2.5377493339976591e-3],
        [-1.0546602554698980e-2, 0.0, 1.3673800193405874e-3],
        [4.4683063920526751e-3, 0.0, 9.6506368469037353e-3],
        [-1.7652415043849052e-3, 0.0, -2.2987140077655862e-3],
        [-3.8321399176713630e-3, 8.5739534328208283e-3,
         -4.9902484654859164e-3],
        [-3.8321399176713630e-3, -8.5739534328208283e-3,
         -4.9902484654859164e-3]])
    lab = hippo.getLabFramePermanentDipoles(ctx)
    assert np.abs(np.asarray(lab, np.float64) - expected_lab).max() < 1e-5
    expected_ind = np.array([
        [-2.6946897397455059e-3, 0.0, 5.7283370317562626e-4],
        [-3.4687164828218306e-3, 0.0, 2.3558084682622801e-4],
        [-8.3759103839743578e-4, 0.0, -4.0453541836814088e-4],
        [-4.7635598636156719e-3, 0.0, -6.2133742026147971e-4],
        [-6.3777660942845697e-4, 5.2439508203868156e-4,
         -4.3219965383009991e-4],
        [-6.3777660942845697e-4, -5.2439508203868156e-4,
         -4.3219965383009991e-4]])
    ind = hippo.getInducedDipoles(ctx)
    assert np.abs(np.asarray(ind, np.float64) - expected_ind).max() < 1e-5


def test_force_energy_consistency(dimer):
    ctx, hippo = dimer
    st = ctx.getState(getEnergy=True, getForces=True, getPositions=True)
    f = np.asarray(st.getForces(asNumpy=True)._value, np.float64)
    pos = np.asarray(st.getPositions(asNumpy=True)._value, np.float64)
    norm = np.sqrt(np.sum(f * f))
    delta = 1e-3
    step = 0.5 * delta / norm
    ctx.setPositions(pos - f * step)
    e2 = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    ctx.setPositions(pos + f * step)
    e3 = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    ctx.setPositions(pos)
    assert abs((e2 - e3) - norm * delta) < 1e-3 * norm * delta + 1e-6
