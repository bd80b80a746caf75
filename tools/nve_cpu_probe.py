"""NVE drift probe on the CPU platform: the test protocol of
tests/test_nve_drift.py with selectable seed / velocity-compensation /
platform, for separating systematic dissipation from slope-fit noise.

Env: SEED (2), VEL_COMP (1), PLAT (CPU), WATERS (125), PS (20).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

if os.environ.get("PLAT", "CPU") != "TPU":
    # the axon plugin force-registers itself regardless of JAX_PLATFORMS
    # and blocks on the chip lock; pin the backend before any jax use
    import jax
    jax.config.update("jax_platforms", "cpu")

import openmm_tpu as mm
from openmm_tpu.constants import BOLTZ
from openmm_tpu.forces.nonbonded import NonbondedForce
from openmm_tpu.models import tip3p_water_box


def main():
    seed = int(os.environ.get("SEED", "2"))
    plat = os.environ.get("PLAT", "CPU")
    waters = int(os.environ.get("WATERS", "125"))
    meas_ps = float(os.environ.get("PS", "20"))
    if os.environ.get("VEL_COMP", "1") == "0":
        mm.VerletIntegrator._supports_vel_compensation = False

    system, positions = tip3p_water_box(n_waters=waters)
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    rc = nb.getCutoffDistance()._value
    nb.setUseSwitchingFunction(True)
    nb.setSwitchingDistance(0.9 * rc)
    nb.setEwaldErrorTolerance(1e-5)
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName(plat))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=seed)
    integ.step(2000)
    n = system.getNumParticles()
    dof = 3 * n - system.getNumConstraints() - 3
    kT = BOLTZ * 300.0
    es, ts = [], []
    n_samp = int(meas_ps * 2)
    for _ in range(n_samp):
        integ.step(500)
        st = ctx.getState(getEnergy=True)
        es.append(st.getPotentialEnergy()._value
                  + st.getKineticEnergy()._value)
        ts.append(ctx.getTime()._value)
    slope = np.polyfit(np.asarray(ts) / 1000.0, np.asarray(es), 1)[0]
    h = len(es) // 2
    s1 = np.polyfit(np.asarray(ts[:h]) / 1000.0, es[:h], 1)[0] / (dof * kT)
    s2 = np.polyfit(np.asarray(ts[h:]) / 1000.0, es[h:], 1)[0] / (dof * kT)
    print("seed=%d plat=%s velcomp=%s waters=%d ps=%.0f  drift=%+.4e "
          "halves=%+.3e/%+.3e kT/dof/ns"
          % (seed, plat, os.environ.get("VEL_COMP", "1"), waters, meas_ps,
             slope / (dof * kT), s1, s2))
    if os.environ.get("E_OUT"):
        np.savetxt(os.environ["E_OUT"],
                   np.stack([np.asarray(ts), np.asarray(es)], axis=1))


if __name__ == "__main__":
    main()
