"""Micro-time integrator pieces on DHFR to find the zero-force-step cost."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openmm_tpu as mm
from openmm_tpu import unit as u


def timeit(fn, *args, n=50, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


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
    integ.step(5)

    state = ctx._state
    deps = ctx._deps_for_groups(-1)
    pos = state["positions"]
    vel = state["velocities"]
    key = state["key"]
    print("dtypes:", {k: (v.dtype if hasattr(v, "dtype") else type(v))
                      for k, v in state.items() if k != "faux" and k != "gp"
                      and k != "iparams" and not isinstance(v, (list, dict))})
    faux = state["faux"]
    sz = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(faux)) / 1e6
    print("faux bytes: %.1f MB, leaves: %d" % (sz, len(jax.tree.leaves(faux))))

    # state identity (copy cost)
    ident = jax.jit(lambda s: {k: v for k, v in s.items()})
    print("state identity:     %7.3f ms" % timeit(ident, state))

    # rng
    f = jax.jit(lambda k: jax.random.normal(jax.random.split(k)[1], pos.shape, dtype=pos.dtype))
    print("rng normal:         %7.3f ms" % timeit(f, key))

    # elementwise kick
    inv_m = deps.inv_masses[:, None]
    f = jax.jit(lambda p_, v_: p_ + 0.002 * (v_ + 0.002 * p_ * inv_m))
    print("elementwise kick:   %7.3f ms" % timeit(f, pos, vel))

    # settle / ccma
    f = jax.jit(lambda p_, q_: deps.apply_position_constraints(p_, q_))
    print("pos constraints:    %7.3f ms" % timeit(f, pos, pos + 1e-4))
    f = jax.jit(lambda p_, v_: deps.apply_velocity_constraints(p_, v_))
    print("vel constraints:    %7.3f ms" % timeit(f, pos, vel))

    if ctx._settle is not None:
        f = jax.jit(lambda p_, q_: ctx._settle[0](p_, q_))
        print("settle pos alone:   %7.3f ms" % timeit(f, pos, pos + 1e-4))
        f = jax.jit(lambda p_, v_: ctx._settle[1](p_, v_))
        print("settle vel alone:   %7.3f ms" % timeit(f, pos, vel))
    if ctx._ccma is not None:
        f = jax.jit(lambda p_, q_: ctx._ccma[0](p_, q_))
        print("ccma pos alone:     %7.3f ms" % timeit(f, pos, pos + 1e-4))
        f = jax.jit(lambda p_, v_: ctx._ccma[1](p_, v_))
        print("ccma vel alone:     %7.3f ms" % timeit(f, pos, vel))


if __name__ == "__main__":
    main()
