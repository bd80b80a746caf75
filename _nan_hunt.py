import time, os
import numpy as np
import openmm_tpu as mm
from openmm_tpu.models import tip3p_water_box

t0 = time.time()
def log(*a):
    print("[%7.1fs]" % (time.time()-t0), *a, flush=True)

system, positions = tip3p_water_box(n_waters=8000)
integ = mm.LangevinMiddleIntegrator(300.0, 20.0, 0.0005)
ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
ctx.setPositions(positions)
ctx.applyConstraints()
ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
log("setup done; margin", os.environ.get("OMM_TPU_NL_MARGIN"), "max_cols",
    getattr(system.getForce(0), "_nl_max_cols", None))
for chunk in range(30):
    integ.step(100)
    st = ctx.getState(getEnergy=True, getPositions=True)
    pe = st.getPotentialEnergy()._value
    ke = st.getKineticEnergy()._value
    log("step", (chunk+1)*100, "PE", pe, "KE", ke)
    if pe != pe:
        pos = st.getPositions(asNumpy=True)._value
        log("pos nan count", int(np.isnan(pos).sum()))
        np.save("/tmp/nan_pos.npy", pos)
        break
log("end")
