"""Benchmark harness: prints ONE JSON line with the headline metric.

Config mirrors the reference's benchmark.py `pme` test class (water-dominated
PME system, constraints on H, LangevinMiddle; examples/benchmark.py:110-140):
a TIP3P water box at liquid density, PME + SETTLE, 2 fs steps, mixed
precision. Metric: ns/day. Baseline: the BASELINE.json north-star target of
400 ns/day for the DHFR-class (23k atom) system on one TPU chip.
"""
import json
import os
import time

import openmm_tpu as mm
from openmm_tpu.models import tip3p_water_box

N_WATERS = int(os.environ.get("BENCH_WATERS", "8000"))  # 20^3 -> 24000 atoms (DHFR class)
STEPS_WARMUP = int(os.environ.get("BENCH_WARMUP", "20"))
STEPS_MEASURE = int(os.environ.get("BENCH_STEPS", "400"))
DT_PS = 0.002
BASELINE_NS_DAY = 400.0


def main():
    system, positions = tip3p_water_box(n_waters=N_WATERS)
    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, DT_PS)
    try:
        platform = mm.Platform.getPlatformByName("TPU")
        ctx = mm.Context(system, integ, platform)
    except Exception:
        ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("CPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)

    # equilibrate away the lattice-start potential energy spike (the
    # reference benchmarks start from pre-equilibrated PDB boxes); a strong
    # thermostat at a short timestep drains the relaxation heat safely.
    # dt/friction are runtime params, so this reuses the compiled step.
    integ.setStepSize(0.0005)
    integ.setFriction(20.0)
    integ.step(4000)                   # 2 ps
    integ.setStepSize(0.001)
    integ.step(2000)                   # +2 ps at 1 fs
    integ.setStepSize(DT_PS)
    integ.setFriction(1.0)

    integ.step(STEPS_WARMUP)           # compile + warm
    ctx.getState(getEnergy=True)       # sync
    t0 = time.time()
    integ.step(STEPS_MEASURE)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    elapsed = time.time() - t0
    assert e == e, "energy is NaN"
    ns_per_day = DT_PS * STEPS_MEASURE / elapsed * 86.4
    print(json.dumps({
        "metric": "tip3p_%datoms_pme_ns_day" % (3 * N_WATERS),
        "value": round(ns_per_day, 3),
        "unit": "ns/day",
        "vs_baseline": round(ns_per_day / BASELINE_NS_DAY, 4),
    }))


if __name__ == "__main__":
    main()
