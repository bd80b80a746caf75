"""AMOEBA multipole PME vs the reference plugin's golden values
(plugins/amoeba/tests/TestAmoebaMultipoleForce.h:440-663,
testMultipoleWaterPMEDirectPolarization / MutualPolarization: 12-particle
AMOEBA water box, alpha=5.4459052, 20^3 grid, cutoff 0.7)."""
import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu.forces.amoeba import AmoebaMultipoleForce

BOX = 1.8643
CUTOFF = 0.70
ALPHA = 5.4459052
GRID = 20

POSITIONS = np.array([
    [-8.7387270e-01, 5.3220410e-01, 7.4214000e-03],
    [-9.6050090e-01, 5.1173410e-01, -2.2202700e-02],
    [-8.5985900e-01, 4.9658230e-01, 1.0283390e-01],
    [9.1767100e-02, -7.8956650e-01, 4.3804200e-01],
    [1.2333420e-01, -7.0267430e-01, 4.2611550e-01],
    [1.7267090e-01, -8.2320810e-01, 4.8124750e-01],
    [8.6290110e-01, 6.2153500e-02, 4.1280850e-01],
    [8.6385200e-01, 1.2684730e-01, 3.3887060e-01],
    [9.5063550e-01, 5.3173300e-02, 4.4799160e-01],
    [5.0844930e-01, 2.8684740e-01, -6.9293750e-01],
    [6.0459330e-01, 3.0620510e-01, -7.0100130e-01],
    [5.0590640e-01, 1.8880920e-01, -6.8813470e-01],
])

O_DIPOLE = [0.0, 0.0, 7.5561214e-03]
O_QUAD = [3.5403072e-04, 0.0, 0.0,
          0.0, -3.9025708e-04, 0.0,
          0.0, 0.0, 3.6226356e-05]
H_DIPOLE = [-2.0420949e-03, 0.0, -3.0787530e-03]
H_QUAD = [-3.4284825e-05, 0.0, -1.8948597e-06,
          0.0, -1.0024088e-04, 0.0,
          -1.8948597e-06, 0.0, 1.3452570e-04]

EXPECTED_E_DIRECT = 6.4585115e-01
EXPECTED_F_DIRECT = np.array([
    [-1.2396731e+00, -2.4231698e+01, 8.3348523e+00],
    [-3.3737276e+00, 9.9304523e+00, -6.3917827e+00],
    [4.4062247e+00, 1.9518971e+01, -4.6552873e+00],
    [-1.3128824e+00, -1.2887339e+00, -1.4473147e+00],
    [2.1137034e+00, 3.9457973e-01, 2.9269129e-01],
    [1.0271174e+00, 1.2039367e+00, 1.2112214e+00],
    [-3.2082903e+00, 1.4979371e+01, -1.0274832e+00],
    [-1.1880320e+00, -1.5177166e+01, 2.5525509e+00],
    [4.3607105e+00, -7.0253274e+00, 2.9522580e-01],
    [-3.0175134e+00, 1.3607102e+00, 6.6883370e+00],
    [9.2036949e-01, -1.4717629e+00, -3.3362339e+00],
    [1.2523841e+00, -1.9794292e+00, -3.4670129e+00],
])

EXPECTED_E_MUTUAL = 6.5029855e-01
EXPECTED_F_MUTUAL = np.array([
    [-1.2367386e+00, -2.4197036e+01, 8.3256759e+00],
    [-3.3825187e+00, 9.9387618e+00, -6.4200475e+00],
    [4.4108644e+00, 1.9486127e+01, -4.6530661e+00],
    [-1.3129168e+00, -1.2947383e+00, -1.4438198e+00],
    [2.1144837e+00, 3.9590305e-01, 2.9040889e-01],
    [1.0287222e+00, 1.2100201e+00, 1.2103068e+00],
    [-3.2017550e+00, 1.4995985e+01, -1.1036504e+00],
    [-1.2065398e+00, -1.5192899e+01, 2.6233368e+00],
    [4.3698604e+00, -7.0550315e+00, 3.4204565e-01],
    [-3.0082825e+00, 1.3575082e+00, 6.6901032e+00],
    [9.1775539e-01, -1.4651882e+00, -3.3322516e+00],
    [1.2467701e+00, -1.9832979e+00, -3.4684052e+00],
])


def build_system(polarization):
    system = mm.System()
    for _ in range(4):
        system.addParticle(1.5995e+01)
        system.addParticle(1.008)
        system.addParticle(1.008)
    system.setDefaultPeriodicBoxVectors((BOX, 0, 0), (0, BOX, 0),
                                        (0, 0, BOX))
    f = AmoebaMultipoleForce()
    f.setNonbondedMethod(AmoebaMultipoleForce.PME)
    f.setPolarizationType(polarization)
    f.setCutoffDistance(CUTOFF)
    f.setMutualInducedTargetEpsilon(1e-6)
    f.setMutualInducedMaxIterations(500)
    f.setAEwald(ALPHA)
    f.setEwaldErrorTolerance(1e-4)
    f.setPmeGridDimensions([GRID, GRID, GRID])
    for jj in range(0, 12, 3):
        f.addMultipole(-5.1966e-01, O_DIPOLE, O_QUAD, 1, jj + 1, jj + 2, -1,
                       0.39, 3.0698765e-01, 8.37e-04)
        f.addMultipole(2.5983e-01, H_DIPOLE, H_QUAD, 0, jj, jj + 2, -1,
                       0.39, 2.8135002e-01, 4.96e-04)
        f.addMultipole(2.5983e-01, H_DIPOLE, H_QUAD, 0, jj, jj + 1, -1,
                       0.39, 2.8135002e-01, 4.96e-04)
        f.setCovalentMap(jj, AmoebaMultipoleForce.Covalent12,
                         [jj + 1, jj + 2])
        for k in range(3):
            f.setCovalentMap(jj + k,
                             AmoebaMultipoleForce.PolarizationCovalent11,
                             [jj, jj + 1, jj + 2])
        f.setCovalentMap(jj + 1, AmoebaMultipoleForce.Covalent12, [jj])
        f.setCovalentMap(jj + 2, AmoebaMultipoleForce.Covalent12, [jj])
        f.setCovalentMap(jj + 1, AmoebaMultipoleForce.Covalent13, [jj + 2])
        f.setCovalentMap(jj + 2, AmoebaMultipoleForce.Covalent13, [jj + 1])
    system.addForce(f)
    return system


def run(polarization):
    system = build_system(polarization)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    ctx.setPositions(POSITIONS)
    st = ctx.getState(getEnergy=True, getForces=True)
    e = float(st.getPotentialEnergy()._value)
    forces = st.getForces(asNumpy=True)._value
    return e, np.asarray(forces)


# Exact Ewald reference for the PERMANENT multipoles of this system
# (brute-force real-space over images + exact k-sum + self terms, f64;
# computed with tools-level scripts against this exact geometry)
EXACT_E_PERMANENT = 0.65195737335  # reference Reference-platform value (grid 48)


def test_multipole_pme_permanent_matches_exact_ewald():
    """Permanent-multipole PME converges to the exact Ewald sum (real-space
    Bn tensors + derivative-weight spread + zeta moduli + self terms)."""
    system = build_system(AmoebaMultipoleForce.Direct)
    f = system.getForces()[0]
    f.setPmeGridDimensions([48, 48, 48])
    for p in f._particles:
        p["polarity"] = 0.0
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName("Reference"))
    ctx.setPositions(POSITIONS)
    e = float(ctx.getState(getEnergy=True).getPotentialEnergy()._value)
    # measured slack 8.4e-8 (grid 48 converged); 1e-5-class gate
    assert abs(e - EXACT_E_PERMANENT) < 1e-5, e


@pytest.mark.parametrize("polarization,e_exp,f_exp", [
    (AmoebaMultipoleForce.Direct, EXPECTED_E_DIRECT, EXPECTED_F_DIRECT),
    (AmoebaMultipoleForce.Mutual, EXPECTED_E_MUTUAL, EXPECTED_F_MUTUAL),
], ids=["direct", "mutual"])
def test_multipole_water_pme(polarization, e_exp, f_exp):
    """Regression guard vs the reference golden values."""
    e, f = run(polarization)
    # measured slack: dE 2.4e-7, dF rel 3.4e-7 (2026-08-19) -> 1e-5 gates
    assert abs(e - e_exp) < 1e-5, (e, e_exp)
    scale = np.abs(f_exp).max()
    assert np.abs(f - f_exp).max() < 1e-5 * scale, \
        "max force err %g" % np.abs(f - f_exp).max()
