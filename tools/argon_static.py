"""Static discriminator for the argon NVE heating: is the TPU pallas
engine computing the same energy/forces as the f64 Reference oracle at
identical positions?

If the pallas path silently drops in-cutoff pairs (brick-budget class),
the static force error is large and position-dependent; if forces match
to ~1e-5 rel, the heating is dynamical (integration/rounding), not a
force-law or neighbor-list bug.

Runs a short TPU trajectory, snapshots positions every ~0.5 ps, and at
each snapshot evaluates energy+forces on both engines.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import openmm_tpu as mm
from tools.nve_probe5 import argon_box


def forces_energy(platform, system, positions):
    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName(platform))
    ctx.setPositions(positions)
    st = ctx.getState(getEnergy=True, getForces=True)
    f = np.asarray(st.getForces(asNumpy=True)._value)
    e = st.getPotentialEnergy()._value
    del ctx
    return e, f


def main():
    n_side = int(os.environ.get("NSIDE", "8"))
    system, positions = argon_box(n_side=n_side)
    if os.environ.get("SWITCH", "1") == "0":
        nb = system.getForce(0)
        nb.setUseSwitchingFunction(False)

    integ = mm.VerletIntegrator(0.001)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    ctx.setVelocitiesToTemperature(300.0, randomSeed=2)

    for snap in range(4):
        st = ctx.getState(getPositions=True)
        pos = st.getPositions(asNumpy=True)._value
        e_t, f_t = forces_energy("TPU", system, pos)
        e_r, f_r = forces_energy("Reference", system, pos)
        fn = np.linalg.norm(f_r, axis=1)
        scale = np.median(fn) + 1e-12
        err = np.linalg.norm(f_t - f_r, axis=1) / scale
        print("snap %d t=%5.2f ps  E_tpu=%+.6f E_ref=%+.6f dE=%+.3e kJ/mol"
              "  ferr med=%.2e max=%.2e (atom %d)"
              % (snap, ctx.getTime()._value, e_t, e_r, e_t - e_r,
                 float(np.median(err)), float(np.max(err)),
                 int(np.argmax(err))), flush=True)
        integ.step(500)


if __name__ == "__main__":
    main()
