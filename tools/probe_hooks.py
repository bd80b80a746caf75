"""Isolate the per-step cost of the neighbor-refresh hooks.

Hypothesis: lax.cond over a branch returning the large persistent aux
(sslab ~45 MB, excl_bits ~24 MB, pslab-sized intermediates) pays a copy of
the pass-through buffers every step even when the rebuild branch does not
fire. Measures, inside a 50-step fori loop:
  identity     — loop-carry of the full context state alone
  pred         — motion predicate alone (reduction over positions)
  cond_small   — lax.cond carrying only a small array
  cond_big     — lax.cond passing the real aux dict through unchanged
  real hooks   — the context's refresh hooks as the step runs them
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openmm_tpu as mm
from openmm_tpu import unit as u

N_LOOP = 50


def timeit_loop(body, state, n=N_LOOP):
    def run(state):
        return jax.lax.fori_loop(0, n, lambda i, s: body(s), state)
    runj = jax.jit(run)
    out = runj(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = runj(state)
    jax.block_until_ready(out)
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
    integ.step(5)
    state = ctx._state
    params = ctx._params

    print("identity loop-carry: %.3f ms"
          % timeit_loop(lambda s: s, state))

    def bump(s):
        s = dict(s)
        s["positions"] = s["positions"] + 1e-9
        return s
    print("bump positions only: %.3f ms" % timeit_loop(bump, state))

    # real hooks as the step runs them
    deps = ctx._deps
    def hooks(s):
        for hook, pidx in deps.update_hooks:
            s = hook(s, params)
        return s
    print("real hooks: %.3f ms" % timeit_loop(hooks, state))

    # cond passing the big aux through
    faux_keys = list(state["faux"].keys())
    print("faux keys:", faux_keys)
    for k in faux_keys:
        aux = state["faux"][k]
        if not isinstance(aux, dict):
            continue
        sz = sum(v.size * v.dtype.itemsize
                 for v in jax.tree_util.tree_leaves(aux)) / 1e6
        print("  aux[%s]: %.1f MB in %d arrays"
              % (k, sz, len(jax.tree_util.tree_leaves(aux))))

    def cond_big(s):
        s = dict(s)
        pred = jnp.sum(s["positions"]) > 1e30   # never fires

        def rebuild(a):
            return jax.tree_util.tree_map(lambda x: x + 0, a)

        def keep(a):
            return a
        s["faux"] = jax.lax.cond(pred, rebuild, keep, s["faux"])
        return s
    print("cond over full faux (never fires): %.3f ms"
          % timeit_loop(cond_big, state))

    def nocond(s):
        s = dict(s)
        s["faux"] = jax.tree_util.tree_map(lambda x: x, s["faux"])
        return s
    print("faux passthrough, no cond: %.3f ms" % timeit_loop(nocond, state))


if __name__ == "__main__":
    main()
