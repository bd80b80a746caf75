"""Probe the Pallas direct-space kernel: where does the time go?

Variants: full Ewald math / plain 1/r math / DMA-only skeleton, at different
cols-per-tile, measured with an in-jit fori_loop to amortize the axon RPC.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import openmm_tpu  # noqa: F401
from openmm_tpu.models import tip3p_water_box
from openmm_tpu.ops import pairs as pairs_mod
from openmm_tpu.ops import pallas_pairs as pp

R = 30


def tloop(f, *args):
    jf = jax.jit(f)
    y = jf(*args)
    np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    t0 = time.perf_counter()
    y = jf(*args)
    np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0])
    return (time.perf_counter() - t0) / R * 1e3


def main():
    n_w = int(os.environ.get("BENCH_WATERS", "8000"))
    system, positions = tip3p_water_box(n_waters=n_w)
    n = 3 * n_w
    box = jnp.asarray(system._box_array().astype(np.float32))
    pos = jnp.asarray(np.asarray(positions, np.float32))
    n_pad = pairs_mod.pad_to_block(n, 64)
    pos_pad = jnp.broadcast_to(pos[0], (n_pad, 3)).at[:n].set(pos)
    q = jnp.tile(jnp.asarray([-0.834, 0.417, 0.417], jnp.float32), n_w)
    q = jnp.zeros(n_pad, jnp.float32).at[:n].set(q)
    sig = jnp.zeros(n_pad, jnp.float32).at[0:n:3].set(0.315).at[1:n:3].set(1.0).at[2:n:3].set(1.0)
    eps = jnp.zeros(n_pad, jnp.float32).at[0:n:3].set(0.636)
    excl = np.full((n_pad, 4), -1, np.int32)
    for m in range(n_w):
        excl[3*m, :2] = [3*m+1, 3*m+2]
        excl[3*m+1, :2] = [3*m, 3*m+2]
        excl[3*m+2, :2] = [3*m, 3*m+1]
    excl = jnp.asarray(excl)
    vol = float(box[0, 0] * box[1, 1] * box[2, 2])
    block_side = (64 * vol / n) ** (1.0 / 3.0)
    cutoff, skin = 0.9, 0.1
    reach = cutoff + skin
    nb = n_pad // 64
    neigh = (nb / vol) * (4.0/3.0) * np.pi * (reach + 1.85*block_side) ** 3
    max_cols = min(nb, int(neigh * 1.6) + 4)
    print("nb=%d max_cols=%d" % (nb, max_cols))

    st = jax.jit(lambda p: pp.build_tile_state(
        p, box, q, sig, eps, excl, n, reach, max_cols,
        sort_cell=block_side))(pos_pad)
    cv = np.asarray(st["cand"][:, -1])
    print("nvalid mean %.1f max %d of %d" % (cv.mean(), cv.max(),
                                             st["cand"].shape[1]-1))

    def build_loop(p):
        def body(i, p):
            s = pp.build_tile_state(p, box, q, sig, eps, excl, n, reach,
                                    max_cols, sort_cell=block_side)
            return p + s["feat"][0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, R, body, p)
    print("build_tile_state: %.3f ms" % tloop(build_loop, pos_pad), flush=True)

    for mode, name in ((pp.MODE_EWALD, "ewald"), (pp.MODE_PLAIN, "plain")):
        def eval_loop(p, st=st, mode=mode):
            def body(i, p):
                e, f = pp.eval_tiles(p, box, st, n, cutoff, mode,
                                     alpha=2.92, krf=0.6, crf=1.5)
                return p + f * 1e-30 + e * 1e-30
            return jax.lax.fori_loop(0, R, body, p)
        print("eval_tiles %s: %.3f ms" % (name, tloop(eval_loop, pos_pad)),
              flush=True)

    # DMA-only skeleton: monkeypatch the tile compute to a trivial reduce
    orig = pp._tile_compute
    def skeleton(consts_ref, row_ref, col_refs, excl_ref, out_ref, n_excl,
                 mode, b):
        acc = row_ref[0] * 0.0
        for ref in col_refs:
            acc = acc + ref[0]
        out_ref[0] = out_ref[0] + acc
    pp._tile_compute = skeleton
    def skel_loop(p):
        def body(i, p):
            e, f = pp.eval_tiles(p, box, st, n, cutoff, 0, alpha=2.92)
            return p + f * 1e-30 + e * 1e-30
        return jax.lax.fori_loop(0, R, body, p)
    print("eval_tiles skeleton (DMA-bound): %.3f ms" % tloop(skel_loop, pos_pad),
          flush=True)
    pp._tile_compute = orig

    # per-step order/gather overhead alone (wrap+sort+feat set, no kernel)
    from openmm_tpu.ops import geometry as geom
    def gath_loop(p):
        def body(i, p):
            pw = geom.wrap_into_box(p, box)
            ps = pw[st["order"]]
            feat = st["feat"].at[:nb, 0].set(ps[:, 0].reshape(nb, 64))
            feat = feat.at[:nb, 1].set(ps[:, 1].reshape(nb, 64))
            feat = feat.at[:nb, 2].set(ps[:, 2].reshape(nb, 64))
            f2 = feat[:nb, 0:3].reshape(3, n_pad).T[st["inv_order"]]
            return p + f2 * 1e-30
        return jax.lax.fori_loop(0, R, body, p)
    print("per-step wrap+sort-gather+feat+invgather: %.3f ms" % tloop(gath_loop, pos_pad))


if __name__ == "__main__":
    main()
