"""A/B probe: pallas tile engine at OMM_TPU_NL_ROW=16 (grouped kernel)
vs 64 (round-4 config) — forces/energy must match, step time should drop.

Run: OMM_TPU_NL_ROW=16 python tools/probe_row16.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import openmm_tpu as mm
from openmm_tpu.forces.nonbonded import NonbondedForce
from openmm_tpu.models import tip3p_water_box


def main():
    waters = int(os.environ.get("WATERS", "1728"))
    system, positions = tip3p_water_box(n_waters=waters)
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    rc = nb.getCutoffDistance()._value
    nb.setUseSwitchingFunction(True)
    nb.setSwitchingDistance(0.9 * rc)
    nb.setEwaldErrorTolerance(1e-5)
    integ = mm.VerletIntegrator(0.002)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=2)

    st = ctx.getState(getEnergy=True, getForces=True)
    e = st.getPotentialEnergy()._value
    f = np.asarray(st.getForces(asNumpy=True)._value)
    print("row=%s  E = %.6f kJ/mol  |F|med = %.4f"
          % (os.environ.get("OMM_TPU_NL_ROW", "16"), e,
             float(np.median(np.linalg.norm(f, axis=1)))), flush=True)

    # reference comparison on the same positions
    if os.environ.get("CHECK_REF", "1") == "1":
        integ2 = mm.VerletIntegrator(0.002)
        ctx2 = mm.Context(system, integ2,
                          mm.Platform.getPlatformByName("Reference"))
        ctx2.setPositions(positions)
        st2 = ctx2.getState(getEnergy=True, getForces=True)
        e2 = st2.getPotentialEnergy()._value
        f2 = np.asarray(st2.getForces(asNumpy=True)._value)
        scale = np.median(np.linalg.norm(f2, axis=1)) + 1e-12
        err = np.linalg.norm(f - f2, axis=1) / scale
        print("vs f64 oracle: dE = %+0.3e  ferr med=%.2e max=%.2e"
              % (e - e2, float(np.median(err)), float(np.max(err))),
              flush=True)

    # step timing
    integ.step(50)   # warm
    for trial in range(3):
        t0 = time.time()
        integ.step(500)
        ctx.getState(getEnergy=False)
        dt_ms = (time.time() - t0) / 500 * 1000
        print("step: %.3f ms  (%.2f ns/day at 2 fs)"
              % (dt_ms, 0.002 * 86400.0 / dt_ms), flush=True)


if __name__ == "__main__":
    main()
