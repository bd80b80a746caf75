"""Long-window NVE drift measurement on the real TPU (pallas engine).

The 125-water CPU-suite protocol cannot resolve drifts below ~5e-2
kT/dof/ns: the 20 ps slope fit's noise floor, measured against the f64
Reference oracle on the identical protocol (round-4 diagnostic: f64 fit
+2.9e-3 with half-window slopes swinging -1.8e-2 / +6.2e-2), exceeds the
gate itself.  This tool measures the real thing: a 13.8x larger box
(1728 TIP3P waters) over a 5x longer window on the TPU fast path, where
slope noise drops ~1/(sqrt(N) * T) ~ 19x.

Env: WATERS (1728), PS (measurement ps, 100), DT (fs, 1), SETTLE_PS (10).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import openmm_tpu as mm
from openmm_tpu.constants import BOLTZ
from openmm_tpu.forces.nonbonded import NonbondedForce
from openmm_tpu.models import tip3p_water_box


def main():
    waters = int(os.environ.get("WATERS", "1728"))
    dt_fs = float(os.environ.get("DT", "1.0"))
    meas_ps = float(os.environ.get("PS", "100"))
    settle_ps = float(os.environ.get("SETTLE_PS", "10"))
    plat = os.environ.get("PLAT", "TPU")

    system, positions = tip3p_water_box(n_waters=waters)
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    rc = nb.getCutoffDistance()._value
    nb.setUseSwitchingFunction(True)
    nb.setSwitchingDistance(0.9 * rc)
    nb.setEwaldErrorTolerance(1e-5)
    integ = mm.VerletIntegrator(0.001 * dt_fs)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName(plat))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=2)

    n = system.getNumParticles()
    dof = 3 * n - system.getNumConstraints() - 3
    kT = BOLTZ * 300.0
    steps_per_ps = int(round(1000.0 / dt_fs))

    t0 = time.time()
    integ.step(int(settle_ps * steps_per_ps))
    print("settle %.0f ps: %.0f s" % (settle_ps, time.time() - t0))

    n_samp = 50
    chunk = int(meas_ps * steps_per_ps / n_samp)
    es, ts = [], []
    t0 = time.time()
    for i in range(n_samp):
        integ.step(chunk)
        st = ctx.getState(getEnergy=True)
        es.append(st.getPotentialEnergy()._value
                  + st.getKineticEnergy()._value)
        ts.append(ctx.getTime()._value)
        if i % 10 == 9:
            print("  %.1f ps  E-E0 = %+.3f kJ/mol  (%.0f s)"
                  % (ts[-1], es[-1] - es[0], time.time() - t0))
    es = np.asarray(es)
    ts = np.asarray(ts)
    A = np.vstack([ts / 1000.0, np.ones_like(ts)]).T
    coef, res, _, _ = np.linalg.lstsq(A, es, rcond=None)
    slope = coef[0]
    resid = es - A @ coef
    se = (np.sqrt(np.sum(resid ** 2) / (len(es) - 2))
          / np.sqrt(np.sum((ts / 1000.0 - np.mean(ts / 1000.0)) ** 2)))
    print("n=%d atoms dof=%d  window=%.0f ps  wall=%.0f s"
          % (n, dof, meas_ps, time.time() - t0))
    print("drift = %.4e +- %.4e kT/dof/ns" % (slope / (dof * kT),
                                              se / (dof * kT)))
    h = len(es) // 2
    s1 = np.polyfit(ts[:h] / 1000.0, es[:h], 1)[0] / (dof * kT)
    s2 = np.polyfit(ts[h:] / 1000.0, es[h:], 1)[0] / (dof * kT)
    print("half slopes: %.4e / %.4e" % (s1, s2))


if __name__ == "__main__":
    main()
