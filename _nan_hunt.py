import time, os
import numpy as np
import openmm_tpu as mm
from openmm_tpu.models import tip3p_water_box

t0 = time.time()
def log(*a):
    print("[%7.1fs]" % (time.time()-t0), *a, flush=True)

system, positions = tip3p_water_box(n_waters=8000)
integ = mm.LangevinMiddleIntegrator(300.0, 1.0, 0.002)
ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
ctx.setPositions(positions)
ctx.applyConstraints()
ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
log("setup done")

def run(phase, dt, fric, steps, chunk):
    integ.setStepSize(dt); integ.setFriction(fric)
    done = 0
    while done < steps:
        integ.step(chunk)
        done += chunk
        st = ctx.getState(getEnergy=True)
        pe = st.getPotentialEnergy()._value
        ke = st.getKineticEnergy()._value
        log(phase, done, "PE %.0f KE %.0f" % (pe, ke))
        if pe != pe or ke != ke:
            st = ctx.getState(getPositions=True, getVelocities=True)
            pos = st.getPositions(asNumpy=True)._value
            vel = st.getVelocities(asNumpy=True)._value
            log("NaN: pos nan", int(np.isnan(pos).sum()),
                "vel nan", int(np.isnan(vel).sum()),
                "max|v|", float(np.nanmax(np.abs(vel))))
            np.savez("/tmp/nan_state2.npz", pos=pos, vel=vel)
            return False
    return True

ok = run("eq05", 0.0005, 20.0, 4000, 500) and \
     run("eq10", 0.001, 20.0, 2000, 500) and \
     run("run20", 0.002, 1.0, 2000, 200)
log("end ok" if ok else "end NaN")
