"""Locate the 16.9 -> 13.2 ns/day regression in the round-5 uncommitted diff.

Builds DHFR once, times: full step, force_fn alone, position-constraints
(corr path) alone, and the old absolute-constraints path alone.

Run: OMM_TPU_NL_ROW=64 python tools/probe_regress5.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

import openmm_tpu as mm
from openmm_tpu import app
from openmm_tpu import unit as u


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    pdb = app.PDBFile("/root/reference/examples/5dfr_solv-cube_equil.pdb")
    ff = app.ForceField("amber14-all.json", "amber14-tip3p.json")
    system = ff.createSystem(pdb.topology, nonbondedMethod=app.PME,
                             nonbondedCutoff=0.9 * u.nanometer,
                             constraints=app.HBonds)
    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, 0.002)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(pdb.positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
    integ.step(20)

    state = ctx._state
    params = ctx._params
    deps = ctx._deps_for_groups(-1)
    deps.update_hooks = ctx._deps.update_hooks
    step_fn = jax.jit(integ._make_step_fn(deps))
    print("full step: %.3f ms" % timeit(step_fn, state, params), flush=True)

    ef = jax.jit(lambda pos, box: deps.force_fn(
        pos, state["box"], params, state["gp"]))
    print("force_fn:  %.3f ms" % timeit(ef, state["positions"], state["box"]),
          flush=True)

    pos = state["positions"]
    newp = pos + 1e-4

    corr = jax.jit(lambda r, x: deps.apply_position_constraints_corr(r, x))
    print("constraints corr:  %.3f ms" % timeit(corr, pos, newp), flush=True)
    absf = jax.jit(lambda r, x: deps.apply_position_constraints(r, x))
    print("constraints abs:   %.3f ms" % timeit(absf, pos, newp), flush=True)
    velc = jax.jit(lambda p, v: deps.apply_velocity_constraints(p, v))
    print("constraints vel:   %.3f ms"
          % timeit(velc, pos, state["velocities"]), flush=True)


if __name__ == "__main__":
    main()
