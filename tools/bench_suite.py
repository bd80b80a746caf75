"""Multi-config benchmark suite (the reference's examples/benchmark.py
configs that are reproducible in-tree: its `pme`, `rf`, and `gbsa` DHFR
tests per examples/benchmark.py:110-140, plus a 92k-atom PME water box as
the ApoA1-scale stand-in — the ApoA1 PDB is downloaded by the reference
harness and is not shipped in the tree).

Writes BENCH_SUITE.json: {config: {ns_day, ms_step, atoms}}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu import app

DT_PS = 0.002
STEPS = int(os.environ.get("BENCH_STEPS", "400"))
WARM = int(os.environ.get("BENCH_WARMUP", "60"))


def bench_context(ctx, integ, tag, out):
    print("start", tag, flush=True)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
    print("  warming", flush=True)
    integ.step(WARM)
    ctx.getState(getEnergy=True)
    t0 = time.time()
    integ.step(STEPS)
    e = ctx.getState(getEnergy=True).getPotentialEnergy()._value
    elapsed = time.time() - t0
    assert e == e, "NaN energy in %s" % tag
    n = ctx.getSystem().getNumParticles()
    out[tag] = {"ns_day": round(DT_PS * STEPS / elapsed * 86.4, 3),
                "ms_step": round(elapsed / STEPS * 1e3, 3),
                "atoms": n}
    print(tag, out[tag], flush=True)


def platform():
    try:
        p = mm.Platform.getPlatformByName("TPU")
        import jax
        jax.devices()
        return p
    except Exception:
        return mm.Platform.getPlatformByName("CPU")


def main():
    out = {}
    ref = "/root/reference/examples"

    # pme: DHFR explicit, PME 0.9 nm, HBonds (benchmark.py:110-140)
    pdb = app.PDBFile(ref + "/5dfr_solv-cube_equil.pdb")
    ff = app.ForceField("amber14-all.json", "amber14-tip3p.json")
    system = ff.createSystem(pdb.topology, nonbondedMethod=app.PME,
                             nonbondedCutoff=0.9 * u.nanometer,
                             constraints=app.HBonds)
    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, DT_PS)
    ctx = mm.Context(system, integ, platform())
    ctx.setPositions(pdb.positions)
    bench_context(ctx, integ, "dhfr_pme", out)

    # rf: DHFR explicit, reaction field 1.0 nm (benchmark.py:110-118)
    system = ff.createSystem(pdb.topology, nonbondedMethod=app.CutoffPeriodic,
                             nonbondedCutoff=1.0 * u.nanometer,
                             constraints=app.HBonds)
    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, DT_PS)
    ctx = mm.Context(system, integ, platform())
    ctx.setPositions(pdb.positions)
    bench_context(ctx, integ, "dhfr_rf", out)

    # gbsa: DHFR implicit (benchmark.py:119-140; amber99sb + OBC)
    pdb2 = app.PDBFile(ref + "/5dfr_minimized.pdb")
    ff2 = app.ForceField("amber99sb.json", "amber99-obc.json")
    system = ff2.createSystem(pdb2.topology,
                              nonbondedMethod=app.CutoffNonPeriodic,
                              nonbondedCutoff=2.0 * u.nanometer,
                              constraints=app.HBonds)
    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, DT_PS)
    ctx = mm.Context(system, integ, platform())
    ctx.setPositions(pdb2.positions)
    bench_context(ctx, integ, "dhfr_gbsa", out)

    # ApoA1-scale stand-in: ~92k-atom PME water box
    if os.environ.get("BENCH_SKIP_LARGE", "0") != "1":
        from openmm_tpu.models import tip3p_water_box
        system, positions = tip3p_water_box(n_waters=30704)
        integ = mm.LangevinMiddleIntegrator(300.0, 20.0, 0.0005)
        ctx = mm.Context(system, integ, platform())
        ctx.setPositions(positions)
        ctx.applyConstraints()
        ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
        integ.step(2000)                     # lattice relax
        integ.setStepSize(DT_PS)
        integ.setFriction(1.0)
        bench_context(ctx, integ, "water92k_pme", out)

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SUITE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
