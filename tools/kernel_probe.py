"""Probe the Pallas direct-space kernel: where does the time go?

Variants: full Ewald math / plain 1/r math, plus build cost and the
per-step refresh overhead, measured with an in-jit fori_loop to amortize
the axon RPC.
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
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        y = jf(*args)
        np.asarray(jax.tree_util.tree_leaves(y)[0].ravel()[0])
        best = min(best, (time.perf_counter() - t0) / R * 1e3)
    return best


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
    sig = jnp.zeros(n_pad, jnp.float32).at[0:n:3].set(0.315) \
        .at[1:n:3].set(1.0).at[2:n:3].set(1.0)
    eps = jnp.zeros(n_pad, jnp.float32).at[0:n:3].set(0.636)
    excl = np.full((n_pad, 4), -1, np.int32)
    for m in range(n_w):
        excl[3 * m, :2] = [3 * m + 1, 3 * m + 2]
        excl[3 * m + 1, :2] = [3 * m, 3 * m + 2]
        excl[3 * m + 2, :2] = [3 * m, 3 * m + 1]
    excl = jnp.asarray(excl)
    vol = float(box[0, 0] * box[1, 1] * box[2, 2])
    block_side = (64 * vol / n) ** (1.0 / 3.0)
    cutoff, skin = 0.9, 0.1
    reach = cutoff + skin
    nb = n_pad // 64
    neigh = (nb / vol) * (4.0 / 3.0) * np.pi * (reach + 1.85 * block_side) ** 3
    max_cols = min(nb, int(neigh * 1.6) + 4)
    rho = n / vol
    s, rr = block_side, reach
    vol_dil = (2.0 * s ** 3 + 2.0 * rr * (5.0 * s * s)
               + np.pi * rr * rr * (4.0 * s)
               + (4.0 / 3.0) * np.pi * rr ** 3)
    col_cap = int(-(-(rho * vol_dil * 1.25) // 128) * 128)
    print("nb=%d max_cols=%d col_cap=%d" % (nb, max_cols, col_cap))

    st = jax.jit(lambda p: pp.build_tile_state(
        p, box, q, sig, eps, excl, n, reach, max_cols,
        sort_cell=block_side, col_cap=col_cap))(pos_pad)
    cnt = np.asarray(st["count"])
    print("cand count mean %.0f max %d of %d  overflow %d"
          % (cnt.mean(), cnt.max(), max_cols, int(st["overflow"])))

    def build_loop(p):
        def body(i, p):
            s2 = pp.build_tile_state(p, box, q, sig, eps, excl, n, reach,
                                     max_cols, sort_cell=block_side,
                                     col_cap=col_cap)
            return p + s2["feat"][0, 0, 0] * 1e-30
        return jax.lax.fori_loop(0, R, body, p)
    print("build_tile_state: %.3f ms" % tloop(build_loop, pos_pad),
          flush=True)

    for mode, name in ((pp.MODE_EWALD, "ewald"), (pp.MODE_PLAIN, "plain")):
        def eval_loop(p, st, mode=mode):
            def body(i, p):
                e, f = pp.eval_tiles(p, box, st, n, cutoff, mode,
                                     alpha=2.92, krf=0.6, crf=1.5)
                return p + f * 1e-30 + e * 1e-30
            return jax.lax.fori_loop(0, R, body, p)
        print("eval_tiles %s: %.3f ms" % (name,
                                          tloop(eval_loop, pos_pad, st)),
              flush=True)
        def evalnoe_loop(p, st, mode=mode):
            def body(i, p):
                e, f = pp.eval_tiles(p, box, st, n, cutoff, mode,
                                     alpha=2.92, krf=0.6, crf=1.5,
                                     want_energy=False)
                return p + f * 1e-30
            return jax.lax.fori_loop(0, R, body, p)
        print("eval_tiles %s force-only: %.3f ms"
              % (name, tloop(evalnoe_loop, pos_pad, st)), flush=True)

    # per-step refresh overhead alone (the XLA prologue/epilogue around the
    # kernel): monkeypatch the kernel body to a copy
    orig = pp._tile_compute

    def skeleton(consts_ref, lanebit_ref, row_ref, pslab_ref, sslab_ref,
                 bits_ref, out_ref, ri, ci, *, mode, kc, b,
                 want_energy=True, use_mask=True):
        acc = row_ref[0][0:1, :] + pslab_ref[0][0:1, 0:b] \
            + sslab_ref[0][0:1, 0:b]
        out_ref[0] = out_ref[0] + jnp.broadcast_to(acc, out_ref[0].shape)
    pp._tile_compute = skeleton

    def skel_loop(p, st):
        def body(i, p):
            e, f = pp.eval_tiles(p, box, st, n, cutoff, 0, alpha=2.92)
            return p + f * 1e-30 + e * 1e-30
        return jax.lax.fori_loop(0, R, body, p)
    print("eval_tiles skeleton (DMA+refresh): %.3f ms" % tloop(
        skel_loop, pos_pad, st), flush=True)
    pp._tile_compute = orig


if __name__ == "__main__":
    main()
