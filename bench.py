"""Benchmark harness: prints ONE JSON line with the headline metric.

Default config is the reference's own DHFR benchmark (examples/benchmark.py
`pme` test: 5dfr_solv-cube_equil.pdb, amber14, PME at 0.9 nm, HBonds
constraints, LangevinMiddle at 2 fs — examples/benchmark.py:110-140),
built end-to-end through PDBFile + ForceField. Metric: ns/day vs the
BASELINE.md 400 ns/day north-star on one chip.

The JSON line also records the platform + direct-space engine actually used
and the median relative force error vs the float64 Reference oracle at the
starting positions (testInstallation.py:38-79 semantics), so a fast-but-
wrong kernel cannot masquerade as a win.  There is NO silent platform
fallback: if the requested platform cannot build the Context, the bench
fails loudly (set BENCH_PLATFORM to override the default "TPU").

BENCH_SYSTEM=tip3p falls back to the synthetic water box (lattice start +
equilibration) used in round 1; BENCH_WATERS/BENCH_STEPS size it.
"""
import json
import os
import time

import numpy as np

import openmm_tpu as mm
from openmm_tpu import unit as u

BENCH_SYSTEM = os.environ.get("BENCH_SYSTEM", "dhfr")
DHFR_PDB = os.environ.get(
    "BENCH_PDB", "/root/reference/examples/5dfr_solv-cube_equil.pdb")
N_WATERS = int(os.environ.get("BENCH_WATERS", "8000"))
STEPS_WARMUP = int(os.environ.get("BENCH_WARMUP", "60"))
STEPS_MEASURE = int(os.environ.get("BENCH_STEPS", "400"))
PLATFORM = os.environ.get("BENCH_PLATFORM", "TPU")
CHECK_ACCURACY = os.environ.get("BENCH_ACCURACY", "1") == "1"
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


def median_force_error(system, positions, forces):
    """Median relative force error vs the f64 Reference oracle
    (testInstallation.py:68-79: |f - f_ref| / |f_ref|, median over atoms)."""
    ref_ctx = mm.Context(system, mm.VerletIntegrator(0.001),
                         mm.Platform.getPlatformByName("Reference"))
    ref_ctx.setPositions(positions)
    f_ref = np.asarray(ref_ctx.getState(getForces=True)
                       .getForces(asNumpy=True)._value, dtype=np.float64)
    f = np.asarray(forces, dtype=np.float64)
    norm = np.linalg.norm(f_ref, axis=1)
    norm = np.where(norm == 0.0, 1.0, norm)
    rel = np.linalg.norm(f - f_ref, axis=1) / norm
    return float(np.median(rel))


def main():
    equilibrate = False
    if BENCH_SYSTEM == "dhfr" and os.path.exists(DHFR_PDB):
        system, positions, tag = build_dhfr()
    else:
        system, positions, tag = build_tip3p()
        equilibrate = True

    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, DT_PS)
    platform = mm.Platform.getPlatformByName(PLATFORM)
    ctx = mm.Context(system, integ, platform)   # no fallback: fail loudly
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)

    engine = "n/a"
    for force in system.getForces():
        eng = getattr(force, "_direct_engine", None)
        if eng is not None:
            engine = eng

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

    force_err = None
    if CHECK_ACCURACY:
        st = ctx.getState(getPositions=True, getForces=True)
        force_err = median_force_error(
            system, st.getPositions(asNumpy=True),
            st.getForces(asNumpy=True)._value)

    integ.step(STEPS_WARMUP)           # compile + warm
    ctx.getState(getEnergy=True)       # sync
    t0 = time.time()
    integ.step(STEPS_MEASURE)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    elapsed = time.time() - t0
    assert e == e, "energy is NaN"
    ns_per_day = DT_PS * STEPS_MEASURE / elapsed * 86.4
    out = {
        "metric": tag + "_ns_day",
        "value": round(ns_per_day, 3),
        "unit": "ns/day",
        "vs_baseline": round(ns_per_day / BASELINE_NS_DAY, 4),
        "platform": platform.getName(),
        "engine": engine,
    }
    if force_err is not None:
        out["median_force_err_vs_f64"] = float("%.3g" % force_err)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
