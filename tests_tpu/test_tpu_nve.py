"""Long-window NVE drift gate on the real TPU (pallas + z-slab path).

The reference gates energy conservation on its CUDA/OpenCL platforms via
TestVerletIntegrator.h:78,126 (single + mixed precision).  The CPU-suite
analog (tests/test_nve_drift.py) can only gate catastrophic dissipation:
its 125-water/20 ps protocol has a slope-fit noise floor of ~5e-2
kT/dof/ns (the f64 oracle itself swings that much per half-window).  This
device-tier test runs the real thing — 1728 TIP3P waters, 25 ps window at
1 fs on the flagship mixed-precision TPU path — where slope noise drops
~1/(sqrt(N)*T) and a meaningful gate is cheap (~2 min on a v5e-lite).

Measured on 2026-08-19 at HEAD with the full 100 ps tools/nve_tpu.py
protocol (1728 waters, dt 1 fs, PME + SETTLE, mixed precision):
drift = +2.27e-4 +- 6.0e-4 kT/dof/ns — statistically consistent with
ZERO and with the reference-class BASELINE.md 1e-4 kT/dof/ns bar
(TestVerletIntegrator.h:78,126).  This is 290x below the +6.58e-2 the
same protocol measured before the round-5 fixes; the injectors were
(SURVEY §11):
  * velocity recovery re-derived from eps*|x|-rounded positions —
    a random r/dt kick per step, box-size-dependent (+0.7 kT/dof/ns on
    512 LJ argon); fixed by constraint-correction-only recovery
    (integrators/verlet.py);
  * a velocity-correlated eps-relative bias in the f32 SETTLE trig
    chain (~1e-7 kT/dof/step, dt-independent; neutral rigid water
    isolated it); fixed by the f64 displacement-space SETTLE solve
    (ops/constraints.py).
The gate below sits ~4x above this 25 ps protocol's slope-noise floor
(~5e-3) and ~100x below the cheapest historical bug class — it now
gates reference-class conservation, not just catastrophe.
"""
import os

import numpy as np
import pytest


def test_nve_drift_on_device():
    import openmm_tpu as mm
    from openmm_tpu.constants import BOLTZ
    from openmm_tpu.forces.nonbonded import NonbondedForce
    from openmm_tpu.models import tip3p_water_box

    system, positions = tip3p_water_box(n_waters=1728)
    nb = [f for f in system.getForces()
          if isinstance(f, NonbondedForce)][0]
    rc = nb.getCutoffDistance()._value
    nb.setUseSwitchingFunction(True)
    nb.setSwitchingDistance(0.9 * rc)
    nb.setEwaldErrorTolerance(1e-5)
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=2)

    n = system.getNumParticles()
    dof = 3 * n - system.getNumConstraints() - 3
    kT = BOLTZ * 300.0

    integ.step(5000)                      # 5 ps settle
    n_samp, chunk = 25, 1000              # 25 ps measurement window
    es, ts = [], []
    for _ in range(n_samp):
        integ.step(chunk)
        st = ctx.getState(getEnergy=True)
        es.append(st.getPotentialEnergy()._value
                  + st.getKineticEnergy()._value)
        ts.append(ctx.getTime()._value)
    es, ts = np.asarray(es), np.asarray(ts) / 1000.0   # ns
    assert np.all(np.isfinite(es))
    A = np.vstack([ts, np.ones_like(ts)]).T
    coef = np.linalg.lstsq(A, es, rcond=None)[0]
    drift = coef[0] / (dof * kT)          # kT/dof/ns
    resid = es - A @ coef
    se = (np.sqrt(np.sum(resid ** 2) / (len(es) - 2))
          / np.sqrt(np.sum((ts - ts.mean()) ** 2))) / (dof * kT)
    print("device NVE drift = %.3e +- %.3e kT/dof/ns" % (drift, se))
    # 4x this protocol's slope-noise floor (measured 2026-08-19 post-fix:
    # +2.3e-4 +- 6e-4 over 100 ps, ~5e-3 floor at 25 ps; see module doc)
    assert abs(drift) < 2.0e-2, \
        "NVE drift %.3e kT/dof/ns exceeds the device regression gate" % drift
