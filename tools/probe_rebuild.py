"""Attribute the neighbor-list + z-state rebuild cost (aux rebuild measured
23.6 ms in profile_full, round 5) to its stages, on the real chip.

Stages replicated from pallas_pairs.build_tile_state /
pme_zslab.build_z_state with the DHFR bench geometry.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import openmm_tpu as mm
from openmm_tpu import unit as u
from openmm_tpu import app


_BASE = None


def timeit(fn, *args, n=10, warmup=2):
    """Single-dispatch timing minus the measured trivial-jit baseline."""
    global _BASE
    if _BASE is None:
        _BASE = 0.0
        triv = jax.jit(lambda x: x + 1.0)
        _BASE = timeit(triv, jnp.zeros(8, jnp.float32), n=20)
        print("dispatch baseline: %.2f ms" % _BASE)
    for _ in range(warmup):
        r = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        r = jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / n * 1e3 - _BASE


def main():
    pdb = app.PDBFile("/root/reference/examples/5dfr_solv-cube_equil.pdb")
    ff = app.ForceField("amber14-all.json", "amber14-tip3p.json")
    system = ff.createSystem(pdb.topology, nonbondedMethod=app.PME,
                             nonbondedCutoff=0.9 * u.nanometer,
                             constraints=app.HBonds)
    integ = mm.VerletIntegrator(0.002)
    ctx = mm.Context(system, integ, mm.Platform.getPlatformByName("TPU"))
    ctx.setPositions(pdb.positions)

    nbf = [f for f in system.getForces()
           if type(f).__name__ == "NonbondedForce"][0]
    mod = [m for m in ctx._modules if m.refresh_fn is not None][0]
    st = ctx._state
    pos = st["positions"]
    box = st["box"]

    from openmm_tpu.ops import pallas_pairs as pp
    from openmm_tpu.ops import pairs as pairs_mod
    from openmm_tpu.ops import geometry as geom

    # mirror the compile-time config
    n = system.getNumParticles()
    n_pad = pairs_mod.pad_to_block(n, 64)
    nb = n_pad // 64
    print("n=%d n_pad=%d nb=%d" % (n, n_pad, nb))

    # full refresh via the real module (force a build by ref_pos=inf)
    aux0 = dict(ctx._state["faux"]["3"]) if "3" in ctx._state["faux"] else None
    i_mod = [i for i, m in enumerate(ctx._modules)
             if m.refresh_fn is not None][0]
    aux = ctx._state["faux"][str(i_mod)]

    def full_refresh(p, b):
        a2 = dict(aux)
        a2["ref_pos"] = jnp.full_like(p, jnp.inf)
        _, na = mod.refresh_fn(None, {"positions": p, "box": b,
                                      "gp": ctx._state["gp"],
                                      "faux": ctx._state["faux"]},
                               ctx._params, a2)
        return na["st"]["code"]

    jf = jax.jit(full_refresh)
    print("full refresh: %.2f ms" % timeit(jf, pos, box))

    # ---- stage replicas -------------------------------------------------
    f32 = jnp.float32
    posp = jnp.broadcast_to(pos[0], (n_pad, 3)).at[:n].set(pos).astype(f32)
    sort_cell = nbf._nl_sort_cell
    BRICK = pp.BRICK
    nq = n_pad // BRICK
    reach = 0.9 + float(os.environ.get("OMM_TPU_NL_SKIN", "0.25"))

    def s_sortkeys(p, b):
        keys = pairs_mod.spatial_sort_keys(p, b, n, sort_cell)
        order = jnp.argsort(keys).astype(jnp.int32)
        inv = jnp.argsort(order).astype(jnp.int32)
        return order, inv
    jo = jax.jit(s_sortkeys)
    print("sort keys + 2x argsort: %.2f ms" % timeit(jo, posp, box))
    order, inv_order = jo(posp, box)

    def s_bbox_cull(p, b):
        ps = p[order]
        blocks = ps.reshape(nb, 64, 3)
        bmin = jnp.min(blocks, axis=1)
        bmax = jnp.max(blocks, axis=1)
        centers = 0.5 * (bmin + bmax)
        half = 0.5 * (bmax - bmin)
        bricks = ps.reshape(nq, BRICK, 3)
        qc = 0.5 * (jnp.min(bricks, 1) + jnp.max(bricks, 1))
        qh = 0.5 * (jnp.max(bricks, 1) - jnp.min(bricks, 1))
        d = centers[:, None, :] - qc[None, :, :]
        d = geom.periodic_delta(d, b)
        gap = jnp.maximum(jnp.abs(d) - (half[:, None, :] + qh[None, :, :]),
                          0.0)
        return jnp.sum(gap * gap, axis=-1) < reach * reach
    jc = jax.jit(s_bbox_cull)
    print("row gather + bbox + (nb,nq) cull: %.2f ms" % timeit(jc, posp, box))
    close = jc(posp, box)

    mcq = int(nbf._nl_max_cols) * 4
    mcq = min(nq, int(mcq * 0.8) + 8)

    def s_argsort_cols(c):
        col_order = jnp.argsort(~c, axis=1, stable=True)
        cand = col_order[:, :mcq].astype(jnp.int32)
        return cand
    ja = jax.jit(s_argsort_cols)
    print("(nb,nq) axis-1 argsort + slice: %.2f ms" % timeit(ja, close))
    cand = ja(close)

    # exclusion scan + bitmask build replica
    excl_pairs = nbf._exclusion_pairs() if hasattr(nbf, "_exclusion_pairs") \
        else None
    excl = None
    for attr in ("_excl_table",):
        pass
    # reuse the context's stored table via the module params is awkward;
    # rebuild from the force's exceptions like _compile does
    ex_pairs = [(e[0], e[1]) for e in nbf._exceptions]
    tbl = pairs_mod.build_exclusion_table(n, ex_pairs, pad_multiple=2)
    excl_pad = np.full((n_pad, tbl.shape[1]), -1, np.int32)
    excl_pad[:n] = tbl
    exclusions = jnp.asarray(excl_pad)
    E1 = exclusions.shape[1] + 1
    print("exclusion table width E=%d" % (E1 - 1))

    code = jnp.where(jnp.take_along_axis(close, cand, axis=1), cand,
                     nq).astype(jnp.int32)

    def s_hasexcl(code):
        excl_o_pre = exclusions[order]
        excl_slot_pre = jnp.where(excl_o_pre >= 0,
                                  inv_order[jnp.clip(excl_o_pre, 0)], -1)
        excl_blk = jnp.where(excl_slot_pre >= 0,
                             excl_slot_pre // BRICK, -1)
        excl_blk = excl_blk.reshape(nb, 64 * excl_blk.shape[1])
        return jnp.any(code[:, :, None] == excl_blk[:, None, :], axis=2)
    jh = jax.jit(s_hasexcl)
    print("has_excl (nb,mc,64E) compare: %.2f ms" % timeit(jh, code))

    def s_bits(code):
        excl_o = exclusions[order]
        excl_slot = jnp.where(excl_o >= 0, inv_order[excl_o], -1)
        entries = jnp.concatenate(
            [excl_slot, jnp.arange(n_pad, dtype=jnp.int32)[:, None]], axis=1)
        be = jnp.where(entries >= 0, entries // BRICK, -1)
        le = jnp.where(entries >= 0, entries % BRICK, 0)
        berb = be.reshape(nb, 64, E1)
        lerb = le.reshape(nb, 64, E1)
        sh_f = jnp.left_shift(jnp.int32(1), lerb).astype(f32)
        cap = 256
        chunks = []
        for c0 in range(0, cap, 16):
            cc = code[:, c0:c0 + 16]
            m = cc[:, :, None, None] == berb[:, None, :, :]
            chunks.append(jnp.sum(jnp.where(m, sh_f[:, None], 0.0), axis=3))
        return jnp.concatenate(chunks, axis=1)
    jb = jax.jit(s_bits)
    print("bitmask build (cap 256): %.2f ms" % timeit(jb, code))

    mc = code.shape[1]

    def s_sslab(code):
        static_q = jnp.zeros((nq + 1, 48), f32)
        s = jnp.take(static_q, code.reshape(-1), axis=0)
        return s.reshape(nb, mc, 3, BRICK)
    js = jax.jit(s_sslab)
    print("sslab brick-row gather (%d rows): %.2f ms"
          % (nb * mc, timeit(js, code)))

    # z state
    from openmm_tpu.ops import pme_zslab
    if hasattr(nbf, "_pme_grid") or True:
        try:
            grid = (56, 56, 56)
            cfgz = pme_zslab.zslab_config(n, grid, margin=1.25,
                                          drift_cells=2)
            q = jnp.ones((n,), f32)

            def s_z(p, b):
                zst = pme_zslab.build_z_state(p[:n], b, q, grid, cfgz)
                return zst["zorder"]
            jz = jax.jit(s_z)
            print("build_z_state: %.2f ms" % timeit(jz, posp, box))
        except Exception as e:
            print("z state probe failed:", e)


if __name__ == "__main__":
    main()
