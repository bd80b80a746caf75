"""Force-side phase profile (direct sweep / PME z-slab / bonded) for the
DHFR PME bench config. Aux/state arrays are passed as jit ARGUMENTS — baking
them in as closure constants inflates the HLO past the remote-compile
request limit (HTTP 413 on the axon tunnel)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openmm_tpu as mm
from openmm_tpu import unit as u


def timeit(fn, *args, n=20, warmup=2):
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
    pdb = app.PDBFile(os.environ.get(
        "PROFILE_PDB", "/root/reference/examples/5dfr_solv-cube_equil.pdb"))
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
    integ.step(20)
    print("setup+compile+20 steps: %.1f s" % (time.time() - t0), flush=True)

    state = ctx._state
    params = ctx._params
    pos = state["positions"]
    box = state["box"]
    gp = state["gp"]

    from openmm_tpu.forces.nonbonded import NonbondedForce
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    mods = ctx._modules_for_force(nb)
    i_nb = ctx._modules.index(mods[0])
    m_nb = mods[0]
    aux = state["faux"][str(i_nb)]
    p_nb = params[i_nb]

    def nb_ef(pos, box, p_nb, aux):
        return m_nb.ef_fn(pos, box, p_nb, gp, aux, want_energy=False)
    print("nonbonded ef_fn w/ aux (direct+recip+rest): %.3f ms"
          % timeit(jax.jit(nb_ef), pos, box, p_nb, aux), flush=True)

    # direct tile sweep alone
    from openmm_tpu.ops import pallas_pairs as pp
    st = aux["st"]
    n = system.getNumParticles()
    alpha = nb._compiled_meta["alpha"]
    cutoff = float(u.strip(nb.getCutoffDistance(), u.nanometer))
    n_pad = st["order"].size

    def direct(pos, box, st):
        pos_pad = jnp.broadcast_to(pos[0], (n_pad, 3)).at[:n].set(pos)
        return pp.eval_tiles(pos_pad, box, st, n, cutoff, pp.MODE_EWALD,
                             alpha=alpha, want_energy=False)
    print("pallas direct sweep alone: %.3f ms"
          % timeit(jax.jit(direct), pos, box, st), flush=True)

    if "pme" in st:
        from openmm_tpu.ops import pme_zslab
        from openmm_tpu.ops import pme as pme_mod
        grid = nb._compiled_meta["grid"]
        charges = p_nb["charge"]
        zcfg = pme_zslab.zslab_config(n, grid,
                                      margin=1.25 * getattr(nb, "_nl_scale", 1.0))
        md = pme_mod.make_pme_recip_data(grid, 5)
        bx = jnp.asarray(md["bsq_x"].astype(jnp.float32))
        by = jnp.asarray(md["bsq_y"].astype(jnp.float32))
        bz = jnp.asarray(md["bsq_z"].astype(jnp.float32))

        def zslab(pos, box, charges, zst):
            return pme_zslab.pme_recip_ef(pos, charges, box, grid, 5, alpha,
                                          bx, by, bz, zst, zcfg)
        print("pme z-slab ef alone (grid %s): %.3f ms"
              % (grid, timeit(jax.jit(zslab), pos, box, charges, st["pme"])),
              flush=True)

    # fused bonded/rest lane
    fast_idx = {i_nb}

    def pe_rest(pos, box, params):
        e = jnp.zeros((), jnp.float32)
        for i, m in enumerate(ctx._modules):
            if m.energy_fn is None or i in fast_idx:
                continue
            e = e + m.energy_fn(pos, box, params[i], gp).astype(jnp.float32)
        return e

    def rest_grad(pos, box, params):
        return jax.value_and_grad(lambda q: pe_rest(q, box, params))(pos)
    print("fused bonded/rest value_and_grad: %.3f ms"
          % timeit(jax.jit(rest_grad), pos, box, params), flush=True)

    # exception windowed engine (part of nb ef but not the tile sweep)
    print("meta:", {k: v for k, v in nb._compiled_meta.items()
                    if k in ("alpha", "grid")},
          "nl_max_cols:", getattr(nb, "_nl_max_cols", None), flush=True)
    print("count stats: max=%d mean=%.1f  excl_count mean=%.1f img mean=%.1f"
          " (of %d blocks)"
          % (int(jnp.max(st["count"])), float(jnp.mean(st["count"])),
             float(jnp.mean(st["excl_count"])),
             float(jnp.mean(st["img_count"])), st["count"].shape[0]),
          flush=True)


if __name__ == "__main__":
    main()
