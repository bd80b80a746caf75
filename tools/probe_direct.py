"""Fast iteration harness for the direct-space Pallas kernel: synthetic
DHFR-scale system (no ForceField/PDB overhead), times eval_tiles variants
to localize instruction-level cost.

Env knobs: N (atoms, default 23558), MODE (ewald|rf), WANT_E (0|1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openmm_tpu.ops import pallas_pairs as pp
if "CPT" in os.environ:
    # the kernel chunk width derives from KQ, frozen at import: recompute
    # every derived constant or the sweep silently measures the default
    pp.COLS_PER_TILE = int(os.environ["CPT"])
    pp.KQ = (pp.COLS_PER_TILE * 64) // pp.BRICK
from openmm_tpu.ops import pairs as pairs_mod


def timeit(fn, *args, n=30, warmup=3):
    for _ in range(warmup):
        r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    n = int(os.environ.get("N", "23558"))
    rho = 97.8
    box_l = (n / rho) ** (1.0 / 3.0)
    cutoff, skin = 0.9, float(os.environ.get("SKIN", "0.1"))
    rng = np.random.RandomState(0)
    pos_np = rng.uniform(0, box_l, (n, 3))
    block = int(os.environ.get("ROWS", "64"))
    kqc = int(os.environ["KQC"]) if "KQC" in os.environ else None
    n_pad = pairs_mod.pad_to_block(n, 64)
    pos = jnp.asarray(
        np.concatenate([pos_np, np.tile(pos_np[:1], (n_pad - n, 1))]),
        jnp.float32)
    box = jnp.asarray(np.diag([box_l] * 3), jnp.float32)
    charge = jnp.asarray(rng.uniform(-0.8, 0.4, n_pad), jnp.float32)
    sigma = jnp.asarray(np.full(n_pad, 0.31), jnp.float32)
    epsilon = jnp.asarray(np.full(n_pad, 0.6), jnp.float32)
    # water-like exclusions: triples (3k+0,3k+1,3k+2) mutually excluded
    excl = np.full((n_pad, 4), -1, np.int32)
    for k in range(n // 3):
        o, h1, h2 = 3 * k, 3 * k + 1, 3 * k + 2
        excl[o, :2] = [h1, h2]
        excl[h1, :2] = [o, h2]
        excl[h2, :2] = [o, h1]
    exclusions = jnp.asarray(excl)

    nb = n_pad // block
    vol = box_l ** 3
    block_side = (block * vol / n) ** (1.0 / 3.0)
    side64 = (64 * vol / n) ** (1.0 / 3.0)
    # SCF: spatial sort cell factor (sort_cell = SCF * side64) — finer
    # sort cells tighten BRICK bboxes (less candidate overcount)
    scf = float(os.environ.get("SCF", "1.0"))
    reach = cutoff + skin + 1.85 * block_side
    neigh = (nb / vol) * (4.0 / 3.0) * np.pi * reach ** 3
    max_cols = min(nb, int(neigh * 1.6) + 4)
    max_bricks = None
    if block != 64 or "MB" in os.environ:
        # direct brick budget: density x sphere-dilated (row + brick) bbox,
        # snake-quality factor on the halves, 1.35x variance margin
        side_q = (pp.BRICK * vol / n) ** (1.0 / 3.0)
        eff = cutoff + skin + 0.925 * 1.4 * (block_side + side_q)
        nq = n_pad // pp.BRICK
        max_bricks = min(nq, int((nq / vol) * (4.0 / 3.0) * np.pi
                                 * eff ** 3 * 1.35) + 8)
        if "MB" in os.environ:
            max_bricks = int(os.environ["MB"])
    print("n=%d nb=%d max_cols=%s max_bricks=%s box=%.2f"
          % (n, nb, max_cols, max_bricks, box_l))

    use_shift = os.environ.get("SHIFT", "1") == "1"
    build = jax.jit(lambda p: pp.build_tile_state(
        p, box, charge, sigma, epsilon, exclusions, n, cutoff + skin,
        max_cols, block=block, sort_cell=scf * side64,
        use_shift=use_shift, max_bricks=max_bricks, kq=kqc))
    st = build(pos)
    jax.block_until_ready(st["count"])
    print("build: %.3f ms  count mean=%.1f max=%d excl mean=%.1f  overflow=%d"
          % (timeit(build, pos, n=5),
             float(jnp.mean(st["count"])), int(jnp.max(st["count"])),
             float(jnp.mean(st["excl_count"])), int(st["overflow"])))
    print("img_count mean=%.1f max=%d (of count mean %.1f)"
          % (float(jnp.mean(st["img_count"])), int(jnp.max(st["img_count"])),
             float(jnp.mean(st["count"]))))

    mode = pp.MODE_EWALD if os.environ.get("MODE", "ewald") == "ewald" \
        else pp.MODE_RF
    want_e = os.environ.get("WANT_E", "0") == "1"

    def sweep(p):
        return pp.eval_tiles(p, box, st, n, cutoff, mode, alpha=2.92,
                             krf=0.6, crf=1.2, want_energy=want_e)
    t = timeit(jax.jit(sweep), pos)
    slots = float(jnp.sum(st["count"].astype(jnp.float64))) * 16 * block
    print("sweep(mode=%s, want_e=%s): %.3f ms  (%.1f Gpair-slots/s)"
          % (os.environ.get("MODE", "ewald"), want_e, t, slots / t / 1e6))

    # XLA prologue alone (sorted-frame row gather + pslab brick compaction):
    # everything eval_tiles does BEFORE pallas_call
    code = st["code"]
    order = st["order"]
    max_cols = code.shape[1]
    nq = nb * (block // pp.BRICK)

    def prologue(p):
        boxf = box
        rox = (st["rWa"] * boxf[0, 0] + st["rWb"] * boxf[1, 0]
               + st["rWc"] * boxf[2, 0])
        roy = st["rWb"] * boxf[1, 1] + st["rWc"] * boxf[2, 1]
        roz = st["rWc"] * boxf[2, 2]
        ps = jnp.take(p, order.reshape(-1), axis=0).reshape(nb, block, 3)
        pxb = ps[:, :, 0] - rox
        pyb = ps[:, :, 1] - roy
        pzb = ps[:, :, 2] - roz
        pos_q = jnp.stack([pxb, pyb, pzb], axis=1)
        pos_q = pos_q.reshape(nb, 3, block // pp.BRICK, pp.BRICK)
        pos_q = pos_q.transpose(0, 2, 1, 3).reshape(nq, 3 * pp.BRICK)
        pos_q = jnp.concatenate(
            [pos_q, jnp.full((1, 3 * pp.BRICK), 1.0e7, jnp.float32)], axis=0)
        pslab = jnp.take(pos_q, code.reshape(-1), axis=0)
        pslab = pslab.reshape(nb, max_cols, 3, pp.BRICK)
        if "shift" in st:
            pslab = pslab + st["shift"][:, :, :, None]
        pslab = pslab.transpose(0, 2, 1, 3)
        return pslab.reshape(nb, 3, max_cols * pp.BRICK)
    tp = timeit(jax.jit(prologue), pos)
    print("prologue alone (row gather + pslab compaction, %d brick rows): "
          "%.3f ms -> kernel ~%.3f ms" % (nb * max_cols, tp, t - tp))


if __name__ == "__main__":
    main()

# quick COLS_PER_TILE sweep: run with CPT env to override chunk width
