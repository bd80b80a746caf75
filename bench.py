"""Benchmark harness: prints ONE JSON line with the headline metric.

Default config is the reference's own DHFR benchmark (examples/benchmark.py
`pme` test: 5dfr_solv-cube_equil.pdb, amber14, PME at 0.9 nm, HBonds
constraints, LangevinMiddle at 2 fs — examples/benchmark.py:110-140),
built end-to-end through PDBFile + ForceField. Metric: ns/day vs the
BASELINE.md 400 ns/day north-star on one chip.

BENCH_SYSTEM=tip3p falls back to the synthetic water box (lattice start +
equilibration) used in round 1; BENCH_WATERS/BENCH_STEPS size it.
"""
import json
import os
import time

import openmm_tpu as mm
from openmm_tpu import unit as u

BENCH_SYSTEM = os.environ.get("BENCH_SYSTEM", "dhfr")
DHFR_PDB = os.environ.get(
    "BENCH_PDB", "/root/reference/examples/5dfr_solv-cube_equil.pdb")
N_WATERS = int(os.environ.get("BENCH_WATERS", "8000"))
STEPS_WARMUP = int(os.environ.get("BENCH_WARMUP", "60"))
STEPS_MEASURE = int(os.environ.get("BENCH_STEPS", "400"))
DT_PS = 0.002
BASELINE_NS_DAY = 400.0


def build_dhfr():
    from openmm_tpu import app
    pdb = app.PDBFile(DHFR_PDB)
    ff = app.ForceField("amber14-all.json", "amber14-tip3p.json")
    system = ff.createSystem(pdb.topology, nonbondedMethod=app.PME,
                             nonbondedCutoff=0.9 * u.nanometer,
                             constraints=app.HBonds)
    return system, pdb.positions, "dhfr_%datoms_pme" % system.getNumParticles()


def build_tip3p():
    from openmm_tpu.models import tip3p_water_box
    system, positions = tip3p_water_box(n_waters=N_WATERS)
    return system, positions, "tip3p_%datoms_pme" % (3 * N_WATERS)


def main():
    equilibrate = False
    if BENCH_SYSTEM == "dhfr" and os.path.exists(DHFR_PDB):
        system, positions, tag = build_dhfr()
    else:
        system, positions, tag = build_tip3p()
        equilibrate = True

    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, DT_PS)
    try:
        platform = mm.Platform.getPlatformByName("TPU")
        ctx = mm.Context(system, integ, platform)
    except Exception:
        ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("CPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)

    if equilibrate:
        # drain the lattice-start relaxation heat (the DHFR box comes
        # pre-equilibrated; the synthetic box does not)
        integ.setStepSize(0.0005)
        integ.setFriction(20.0)
        integ.step(4000)
        integ.setStepSize(0.001)
        integ.step(2000)
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
        "metric": tag + "_ns_day",
        "value": round(ns_per_day, 3),
        "unit": "ns/day",
        "vs_baseline": round(ns_per_day / BASELINE_NS_DAY, 4),
    }))


if __name__ == "__main__":
    main()
