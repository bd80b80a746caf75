"""Dissect the step: integrator-only, constraints, refresh hook, direct
sweep from persistent state, PME zslab, rest-grad — on the DHFR config."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import copy
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
    integ.step(10)

    state = ctx._state
    params = ctx._params
    deps = ctx._deps_for_groups(-1)
    deps.update_hooks = ctx._deps.update_hooks
    pos, box, gp = state["positions"], state["box"], state["gp"]

    # ---- zero-force step variants
    def zf(d):
        dd = copy.copy(d)
        dd.force_fn = lambda p_, b_, pl, g_, *a: (jnp.zeros((), jnp.float32),
                                                  jnp.zeros_like(p_))
        return dd

    d0 = zf(deps)
    print("zeroforce full:           %7.3f ms" % timeit(jax.jit(integ._make_step_fn(d0)), state, params))

    d1 = zf(deps); d1.update_hooks = []
    print("zeroforce no hooks:       %7.3f ms" % timeit(jax.jit(integ._make_step_fn(d1)), state, params))

    d2 = zf(deps); d2.update_hooks = []
    d2.apply_position_constraints = lambda ref, new: new
    d2.apply_velocity_constraints = lambda p_, v_: v_
    print("zeroforce no hooks/cons:  %7.3f ms" % timeit(jax.jit(integ._make_step_fn(d2)), state, params))

    d3 = zf(deps); d3.update_hooks = []
    d3.apply_velocity_constraints = lambda p_, v_: v_
    print("zeroforce poscons only:   %7.3f ms" % timeit(jax.jit(integ._make_step_fn(d3)), state, params))

    # each hook alone
    for k, (hook, pidx) in enumerate(deps.update_hooks):
        f = jax.jit(lambda st, pl, hook=hook: hook(st, pl))
        print("hook %d alone:             %7.3f ms" % (k, timeit(f, state, params)))

    # ---- force path from PERSISTENT aux
    from openmm_tpu.forces.nonbonded import NonbondedForce
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    m = ctx._modules_for_force(nb)[0]
    i_nb = ctx._modules.index(m)
    p = params[i_nb]
    aux = state["faux"][i_nb] if isinstance(state.get("faux"), (list, tuple)) else None
    if aux is None:
        faux = state.get("faux")
        print("faux type:", type(faux))
        if isinstance(faux, dict):
            aux = faux.get(i_nb)
    print("aux keys:", list(aux.keys()) if aux else None)

    ef_full = jax.jit(lambda pos, box: m.ef_fn(pos, box, p, gp, aux, True))
    print("nb ef persistent (E+F):   %7.3f ms" % timeit(ef_full, pos, box))
    ef_f = jax.jit(lambda pos, box: m.ef_fn(pos, box, p, gp, aux, False))
    print("nb ef persistent (F only):%7.3f ms" % timeit(ef_f, pos, box))

    # direct sweep alone from persistent state
    from openmm_tpu.ops import pallas_pairs as pp
    st = aux["st"]
    n = system.getNumParticles()
    alpha = nb._compiled_meta["alpha"]
    cutoff = nb._cutoff
    f = jax.jit(lambda pos, box: pp.eval_tiles(pos, box, st, n, cutoff,
                                               pp.MODE_EWALD, alpha=alpha,
                                               want_energy=False))
    print("pallas eval_tiles Fonly:  %7.3f ms" % timeit(f, pos, box))
    f2 = jax.jit(lambda pos, box: pp.eval_tiles(pos, box, st, n, cutoff,
                                                pp.MODE_EWALD, alpha=alpha,
                                                want_energy=True))
    print("pallas eval_tiles E+F:    %7.3f ms" % timeit(f2, pos, box))

    # zslab PME alone
    from openmm_tpu.ops import pme_zslab
    grid = nb._compiled_meta["grid"]
    charge = p["charge"]
    # reconstruct pme_data
    from openmm_tpu.ops import pme as pme_mod
    md = pme_mod.make_pme_recip_data(grid, 5)
    bx = jnp.asarray(md["bsq_x"].astype(jnp.float32))
    by = jnp.asarray(md["bsq_y"].astype(jnp.float32))
    bz = jnp.asarray(md["bsq_z"].astype(jnp.float32))
    zcfg = pme_zslab.zslab_config(n, grid, margin=1.25)
    zst = st["pme"]
    fz = jax.jit(lambda pos, box: pme_zslab.pme_recip_ef(
        pos, charge, box, grid, 5, alpha, bx, by, bz, zst, zcfg))
    print("zslab PME ef:             %7.3f ms" % timeit(fz, pos, box))

    # convolution (DFT) alone
    Q = jnp.zeros((grid[2], grid[0], grid[1]), jnp.float32)
    fc = jax.jit(lambda Q, box: pme_zslab.convolve_potential(Q, box, grid, alpha, bx, by, bz))
    print("zslab convolve (DFTs):    %7.3f ms" % timeit(fc, Q, box))

    # count stats
    import numpy as np
    cnt = np.asarray(st["count"])
    ecnt = np.asarray(st["excl_count"])
    print("cand count mean/max: %.1f/%d  excl chunks mean: %.2f  nb_blocks=%d  max_cols=%d"
          % (cnt.mean(), cnt.max(), (np.ceil(ecnt / 32)).mean(), len(cnt),
             st["code"].shape[1]))


if __name__ == "__main__":
    main()
