import jax
import openmm_tpu as mm
from openmm_tpu.models import tip3p_water_box
print("devices:", jax.devices())
try:
    print("cpu devices:", jax.devices("cpu"))
except Exception as e:
    print("cpu devices FAIL:", e)
system, positions = tip3p_water_box(n_waters=27)
for name in ("Reference", "CPU", "TPU"):
    ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                     mm.Platform.getPlatformByName(name))
    print(name, "->", ctx._device, ctx._dtype, ctx._accum_dtype)
