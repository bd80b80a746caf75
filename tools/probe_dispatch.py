"""Separate fixed per-call dispatch overhead from true per-iteration cost.

Runs the identity loop over the REAL context state at n=50 and n=500, plus
a trivial scalar jit call, on the TPU. If probe_hooks' 0.6 ms/iter was a
fixed dispatch cost divided by 50, the n=500 figure will be ~10x smaller.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openmm_tpu as mm
from openmm_tpu import unit as u


def timeit_loop(body, state, n):
    def run(state):
        return jax.lax.fori_loop(0, n, lambda i, s: body(s), state)
    runj = jax.jit(run)
    out = runj(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = runj(state)
    jax.block_until_ready(out)
    tot = time.perf_counter() - t0
    return tot * 1e3, tot / n * 1e3


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
    integ.step(5)
    state = ctx._state

    x = jnp.ones((8,), jnp.float32)
    addj = jax.jit(lambda v: v + 1.0)
    jax.block_until_ready(addj(x))
    t0 = time.perf_counter()
    for _ in range(20):
        x = addj(x)
    jax.block_until_ready(x)
    print("tiny jit call round trip: %.3f ms"
          % ((time.perf_counter() - t0) / 20 * 1e3))

    for n in (50, 500):
        tot, per = timeit_loop(lambda s: s, state, n)
        print("identity loop n=%3d: total %.1f ms, %.3f ms/iter"
              % (n, tot, per))

    def bump(s):
        s = dict(s)
        s["positions"] = s["positions"] + 1e-9
        return s
    for n in (50, 500):
        tot, per = timeit_loop(bump, state, n)
        print("bump loop     n=%3d: total %.1f ms, %.3f ms/iter"
              % (n, tot, per))


if __name__ == "__main__":
    main()
