"""Full-step per-phase breakdown on the real chip for the DHFR PME bench
config (the BENCH headline). Itemizes: full step, force_fn, per-force-module
ef_fn, pallas direct alone, PME reciprocal alone, recompaction/aux overhead,
integrator+constraints with zero forces, neighbor rebuild amortization.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openmm_tpu as mm
from openmm_tpu import unit as u


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def main():
    from openmm_tpu import app
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
    t0 = time.time()
    integ.step(10)
    print("first 10 steps (compile): %.1f s" % (time.time() - t0))

    state = ctx._state
    params = ctx._params
    deps = ctx._deps_for_groups(-1)
    deps.update_hooks = ctx._deps.update_hooks
    step_fn = jax.jit(integ._make_step_fn(deps))
    t_step = timeit(step_fn, state, params)
    print("FULL STEP: %.3f ms  (%.1f ns/day @2fs)" % (t_step, 0.002 * 86.4 / t_step * 1e3))

    ef = jax.jit(lambda pos, box: deps.force_fn(pos, box, params, state["gp"]))
    print("force_fn (all forces): %.3f ms" % timeit(ef, state["positions"], state["box"]))

    # per-module breakdown
    gp = state["gp"]
    for i, m in enumerate(ctx._modules):
        p = params[i]
        try:
            f = jax.jit(lambda pos, box, p=p, m=m: m.ef_fn(pos, box, p, gp))
            t = timeit(f, state["positions"], state["box"])
            print("  module %-38s %8.3f ms" % (type(m).__name__, t))
        except Exception as e:
            print("  module %-38s FAILED: %s" % (type(m).__name__, str(e)[:80]))

    # nonbonded details
    from openmm_tpu.forces.nonbonded import NonbondedForce
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    print("nb meta:", {k: v for k, v in nb._compiled_meta.items() if k in ("alpha", "grid")},
          "nl_max_cols:", getattr(nb, "_nl_max_cols", None),
          "col_cap:", getattr(nb, "_nl_col_cap", None))

    # integrator-only cost
    import copy
    deps0 = copy.copy(deps)
    deps0.force_fn = lambda pos, box, pl, gpv, *a: (jnp.zeros((), jnp.float32), jnp.zeros_like(pos))
    step0 = jax.jit(integ._make_step_fn(deps0))
    print("step w/ zero forces (integrator+constraints+aux): %.3f ms" % timeit(step0, state, params))


if __name__ == "__main__":
    main()
