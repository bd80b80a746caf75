"""Per-component step-time breakdown on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openmm_tpu as mm
from openmm_tpu.models import tip3p_water_box

N_WATERS = int(os.environ.get("BENCH_WATERS", "8000"))


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
    system, positions = tip3p_water_box(n_waters=N_WATERS)
    integ = mm.LangevinMiddleIntegrator(300.0, 1.0, 0.002)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(positions)
    ctx.applyConstraints()
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
    integ.step(10)

    state = ctx._state
    params = ctx._params
    deps = ctx._deps_for_groups(-1)
    deps.update_hooks = ctx._deps.update_hooks
    step_fn = jax.jit(integ._make_step_fn(deps))
    print("full step: %.3f ms" % timeit(step_fn, state, params))

    ef = jax.jit(lambda pos, box: deps.force_fn(pos, box, params, state["gp"]))
    print("force_fn (all): %.3f ms" % timeit(ef, state["positions"], state["box"]))

    # isolate the NonbondedForce pieces
    from openmm_tpu.forces.nonbonded import NonbondedForce
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    mods = ctx._modules_for_force(nb)
    i_nb = ctx._modules.index(mods[0])
    m = mods[0]
    p = params[i_nb]
    gp = state["gp"]
    print("meta:", nb._compiled_meta, "nl_max_cols:", getattr(nb, "_nl_max_cols", None))

    f = jax.jit(lambda pos, box: m.ef_fn(pos, box, p, gp))
    print("nonbonded ef_fn (direct+recip): %.3f ms" % timeit(f, state["positions"], state["box"]))

    # Pallas direct kernel alone
    from openmm_tpu.ops import pallas_pairs as pp
    from openmm_tpu.ops import pairs as pairs_mod
    n = system.getNumParticles()
    n_pad = pairs_mod.pad_to_block(n, 64)
    charge = p["charge"]
    qpad = jnp.zeros(n_pad, jnp.float32).at[:n].set(charge)
    spad = jnp.ones(n_pad, jnp.float32).at[:n].set(p["sigma"])
    epad = jnp.zeros(n_pad, jnp.float32).at[:n].set(p["epsilon"])
    excl_np = pairs_mod.build_exclusion_table(n, [(e[0], e[1]) for e in nb._exceptions])
    import numpy as np
    excl_pad = np.full((n_pad, excl_np.shape[1]), -1, np.int32)
    excl_pad[:n] = excl_np
    exclusions = jnp.asarray(excl_pad)
    alpha = nb._compiled_meta["alpha"]

    def direct(pos, box):
        pos_pad = jnp.broadcast_to(pos[0], (n_pad, 3)).at[:n].set(pos)
        return pp.direct_ef_pallas(pos_pad, box, qpad, spad, epad, exclusions,
                                   n, nb._cutoff, max_cols=nb._nl_max_cols,
                                   mode=pp.MODE_EWALD, alpha=alpha,
                                   sort_cell=nb._nl_sort_cell,
                                   col_cap=getattr(nb, "_nl_col_cap", None))

    print("pallas direct alone: %.3f ms" % timeit(jax.jit(direct), state["positions"], state["box"]))

    # PME reciprocal alone (energy+grad)
    from openmm_tpu.ops import pme as pme_mod
    from openmm_tpu.ops import geometry as geom
    grid = nb._compiled_meta["grid"]
    md = pme_mod.make_pme_recip_data(grid, 5)
    bx, by, bz = (jnp.asarray(md["bsq_x"].astype(jnp.float32)),
                  jnp.asarray(md["bsq_y"].astype(jnp.float32)),
                  jnp.asarray(md["bsq_z"].astype(jnp.float32)))

    def recip(pos, box):
        def e_fn(pos):
            return pme_mod.pme_reciprocal_energy(pos, charge, box, grid, 5,
                                                 alpha, bx, by, bz, jnp.float32)
        return jax.value_and_grad(e_fn)(pos)

    print("pme recip grad alone (grid %s): %.3f ms" % (grid, timeit(jax.jit(recip), state["positions"], state["box"])))

    # spread alone
    def spread(pos, box):
        return pme_mod.spread_charges_dense(pos, charge, geom.box_inverse(box),
                                            grid, 5, jnp.float32)
    print("pme spread alone: %.3f ms" % timeit(jax.jit(spread), state["positions"], state["box"]))

    # integrator-only cost
    import copy
    deps0 = copy.copy(deps)
    deps0.force_fn = lambda pos, box, pl, gp, *a: (jnp.zeros((), jnp.float32), jnp.zeros_like(pos))
    step0 = jax.jit(integ._make_step_fn(deps0))
    print("step w/ zero forces (integrator+constraints): %.3f ms" % timeit(step0, state, params))


if __name__ == "__main__":
    main()
