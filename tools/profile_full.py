"""Itemized full-step profile for the DHFR PME bench config on the real
chip. Every phase is timed with the PERSISTENT neighbor/z-slab aux (as the
step uses it), and loop-amortized timings remove per-dispatch overhead.

Phases: full step (fori-loop amortized), dispatch overhead, zero-force step,
integrator-only (no hooks), hooks alone, constraints (pos/vel), direct tile
sweep, PME z-slab ef, self+exceptions+exclusions grad, each bonded module's
value_and_grad, aux rebuild (the amortized neighbor rebuild).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import openmm_tpu as mm
from openmm_tpu import unit as u

N_LOOP = 300


def timeit(fn, *args, n=20, warmup=2):
    """Single-dispatch timing: includes the ~3 ms tunnel dispatch overhead
    per call (tools/probe_dispatch.py) — use only for rebuild-class costs."""
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def timeit_loop(step_fn, state, params, n=N_LOOP):
    """Amortized per-step cost: n steps inside one jitted fori_loop.
    n must be large: a big-argument jit call carries a FIXED ~50 ms
    dispatch/return overhead on this tunnel (tools/probe_dispatch.py)."""
    def run(state, params):
        def body(i, s):
            return step_fn(s, params)
        return jax.lax.fori_loop(0, n, body, state)
    runj = jax.jit(run)
    out = runj(state, params)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = runj(state, params)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def timeit_chain(phase_fn, pos, box, n=N_LOOP):
    """Amortized per-call cost of a (pos, box) -> forces-like phase, with a
    tiny dependency chain through the loop so XLA cannot hoist the
    loop-invariant compute; same fixed-overhead correction as timeit_loop."""
    def run(pos, box):
        def body(i, p):
            out = phase_fn(p, box)
            f = out[1] if isinstance(out, tuple) else out
            return p + 1e-12 * f.astype(p.dtype)
        return jax.lax.fori_loop(0, n, body, pos)
    runj = jax.jit(run)
    out = runj(pos, box)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = runj(pos, box)
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
    ctx.setVelocitiesToTemperature(300.0, randomSeed=1)
    t0 = time.time()
    integ.step(20)
    print("setup+compile+20 steps: %.1f s" % (time.time() - t0))

    state = ctx._state
    params = ctx._params
    deps = ctx._deps_for_groups(-1)
    deps.update_hooks = ctx._deps.update_hooks

    # dispatch overhead
    trivial = jax.jit(lambda x: x + 1.0)
    print("dispatch overhead (trivial jit): %.3f ms"
          % timeit(trivial, jnp.zeros(8), n=50))

    step_fn = integ._make_step_fn(deps)
    t_amort = timeit_loop(step_fn, state, params)
    print("FULL STEP (amortized x%d): %.3f ms  (%.1f ns/day @2fs)"
          % (N_LOOP, t_amort, 0.002 * 86.4 / t_amort * 1e3))
    t_step = timeit(jax.jit(step_fn), state, params)
    print("full step (single dispatch): %.3f ms" % t_step)

    # zero-force step: integrator + constraints + hooks
    import copy
    deps0 = copy.copy(deps)
    deps0.force_fn = lambda pos, box, pl, gp, *a: (
        jnp.zeros((), jnp.float32), jnp.zeros_like(pos))
    step0 = integ._make_step_fn(deps0)
    print("step w/ zero forces (integ+constr+hooks, amortized): %.3f ms"
          % timeit_loop(step0, state, params))

    # integrator-only: zero forces AND no hooks
    deps1 = copy.copy(deps0)
    deps1.update_hooks = []
    step1 = integ._make_step_fn(deps1)
    print("step w/ zero forces, no hooks (amortized): %.3f ms"
          % timeit_loop(step1, state, params))

    # hooks alone
    def hooks_only(state, params_list):
        for hook, pidx in deps.update_hooks:
            state = hook(state, params_list)
        return state
    print("hooks alone (amortized): %.3f ms"
          % timeit_loop(hooks_only, state, params))

    # each hook individually
    for hi, (hook, pidx) in enumerate(deps.update_hooks):
        def one(state, params_list, hook=hook):
            return hook(state, params_list)
        try:
            print("  hook[%d] (module %s) amortized: %.3f ms"
                  % (hi, pidx, timeit_loop(one, state, params)))
        except Exception as e:
            print("  hook[%d] FAILED: %s" % (hi, str(e)[:80]))

    # constraints (chained: output feeds the next iteration's input)
    pos = state["positions"]
    vel = state["velocities"]
    print("apply_position_constraints (amortized): %.3f ms"
          % timeit_chain(lambda p, b: (None,
                         deps.apply_position_constraints(p, p + 1e-6)),
                         pos, state["box"]))
    print("apply_velocity_constraints (amortized): %.3f ms"
          % timeit_chain(lambda p, b: (None,
                         deps.apply_velocity_constraints(p, vel)),
                         pos, state["box"]))

    # nonbonded with aux (as the step calls it)
    from openmm_tpu.forces.nonbonded import NonbondedForce
    nb = [f for f in system.getForces() if isinstance(f, NonbondedForce)][0]
    mods = ctx._modules_for_force(nb)
    i_nb = ctx._modules.index(mods[0])
    m_nb = mods[0]
    aux = state["faux"][str(i_nb)]
    gp = state["gp"]
    p_nb = params[i_nb]

    def nb_ef(pos, box):
        return m_nb.ef_fn(pos, box, p_nb, gp, aux, want_energy=False)
    try:
        print("nonbonded ef_fn w/ aux (direct+recip+rest, amortized): %.3f ms"
              % timeit_chain(nb_ef, pos, state["box"]))
    except Exception as e:
        # the axon remote-compile tunnel caps the HLO payload (HTTP 413);
        # this standalone program inlines every selection-matrix constant
        print("nonbonded ef_fn FAILED: %s" % str(e)[:120])

    # direct tile sweep alone (persisted st)
    from openmm_tpu.ops import pallas_pairs as pp
    st = aux["st"]
    n = system.getNumParticles()
    alpha = nb._compiled_meta["alpha"]
    cutoff = float(u.strip(nb.getCutoffDistance(), u.nanometer))
    n_pad = st["order"].size

    def direct(pos, box):
        pos_pad = jnp.broadcast_to(pos[0], (n_pad, 3)).at[:n].set(pos)
        e, f = pp.eval_tiles(pos_pad, box, st, n, cutoff, pp.MODE_EWALD,
                             alpha=alpha, want_energy=False)
        return e, f[:n]
    print("pallas direct sweep alone (amortized): %.3f ms"
          % timeit_chain(direct, pos, state["box"]))

    # PME z-slab ef alone
    if "pme" in st:
        from openmm_tpu.ops import pme_zslab
        grid = nb._compiled_meta["grid"]
        charges = p_nb["charge"]
        zst = st["pme"]
        # rebuild the zslab cfg exactly as _compile did
        zcfg = pme_zslab.zslab_config(n, grid,
                                      margin=1.25 * getattr(nb, "_nl_scale", 1.0))
        # pme_data moduli
        from openmm_tpu.ops import pme as pme_mod
        md = pme_mod.make_pme_recip_data(grid, 5)
        bx = jnp.asarray(md["bsq_x"].astype(jnp.float32))
        by = jnp.asarray(md["bsq_y"].astype(jnp.float32))
        bz = jnp.asarray(md["bsq_z"].astype(jnp.float32))

        def zslab(pos, box):
            return pme_zslab.pme_recip_ef(pos, charges, box, grid, 5, alpha,
                                          bx, by, bz, zst, zcfg)
        print("pme z-slab ef alone (grid %s, amortized): %.3f ms"
              % (grid, timeit_chain(zslab, pos, state["box"])))

    # fused bonded lane exactly as the step runs it: value_and_grad over
    # every non-fast module's energy at once
    fast_idx = {i_nb}

    def pe_rest(pos, box):
        e = jnp.zeros((), jnp.float32)
        for i, m in enumerate(ctx._modules):
            if m.energy_fn is None or i in fast_idx:
                continue
            e = e + m.energy_fn(pos, box, params[i], gp).astype(jnp.float32)
        return e

    def rest_grad(pos, box):
        return jax.value_and_grad(lambda q: pe_rest(q, box))(pos)
    print("fused bonded/rest value_and_grad (amortized): %.3f ms"
          % timeit_chain(rest_grad, pos, state["box"]))

    # bonded + other modules via value_and_grad of energy_fn
    for i, m in enumerate(ctx._modules):
        if i == i_nb or m.energy_fn is None:
            continue
        p = params[i]

        def eg(pos, box, p=p, m=m):
            return jax.value_and_grad(
                lambda q: m.energy_fn(q, box, p, gp))(pos)
        try:
            t = timeit_chain(eg, pos, state["box"])
            print("  module[%d] %-22s grad: %8.3f ms"
                  % (i, m.name or type(m).__name__, t))
        except Exception as e:
            print("  module[%d] FAILED: %s" % (i, str(e)[:100]))

    # neighbor/z rebuild cost (amortization denominator)
    def rebuild(pos, box):
        # the same build the refresh hook runs when the predicate fires
        from openmm_tpu.ops import pairs as pairs_mod
        return None
    # measure via the module's refresh hook with a forced-inf ref_pos
    aux_force = dict(aux)
    aux_force["ref_pos"] = jnp.full((n, 3), jnp.inf, jnp.float32)
    hook_fn = [mm_ for mm_ in [m_nb] if mm_.refresh_fn is not None]
    if hook_fn:
        def do_refresh(state_in):
            s, a = m_nb.refresh_fn(deps, state_in, params, aux_force)
            return a
        print("aux rebuild (NL + zsort build): %.3f ms"
              % timeit(jax.jit(do_refresh), state, n=5))

    print("meta:", {k: v for k, v in nb._compiled_meta.items()
                    if k in ("alpha", "grid")},
          "nl_max_cols:", getattr(nb, "_nl_max_cols", None))
    print("count stats: max=%d mean=%.1f  excl_count mean=%.1f  (of %d blocks)"
          % (int(jnp.max(st["count"])), float(jnp.mean(st["count"])),
             float(jnp.mean(st["excl_count"])), st["count"].shape[0]))


if __name__ == "__main__":
    main()
