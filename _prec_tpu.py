import numpy as np
import openmm_tpu as mm
from openmm_tpu.models import tip3p_water_box

f = {}
for name in ("Reference", "CPU", "TPU"):
    system, positions = tip3p_water_box(n_waters=125)
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName(name))
    ctx.setPositions(positions)
    f[name] = ctx.getState(getForces=True).getForces(asNumpy=True)._value
    print(name, "device", ctx._device, flush=True)
ref = f["Reference"]
rn = np.maximum(np.linalg.norm(ref, axis=1), 1e-10)
for name in ("CPU", "TPU"):
    d = np.linalg.norm(f[name] - ref, axis=1)
    print(name, "median rel", float(np.median(d / rn)),
          "max rel", float((d / rn).max()))
d = np.linalg.norm(f["CPU"] - f["TPU"], axis=1)
print("CPU vs TPU median rel", float(np.median(d / rn)))
