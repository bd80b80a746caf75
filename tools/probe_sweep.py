"""Fast micro-benchmark of the direct-space tile sweep at DHFR scale.

Synthetic system (uniform density, same atom count / box / cutoff as the
DHFR PME bench) so kernel variants can be timed in seconds without the
app-layer build. Throughput depends only on shapes/density, not on the
parameter values.

Env knobs: PROBE_N (atoms), PROBE_BOX (nm), PROBE_SHIFT=0/1, PROBE_ENERGY.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from openmm_tpu.ops import pallas_pairs as pp

N = int(os.environ.get("PROBE_N", "23558"))
BOX = float(os.environ.get("PROBE_BOX", "6.2"))
CUTOFF = 0.9
SKIN = float(os.environ.get("OMM_TPU_NL_SKIN", "0.25"))
USE_SHIFT = os.environ.get("PROBE_SHIFT", "0") == "1"
WANT_E = os.environ.get("PROBE_ENERGY", "0") == "1"


def main():
    rng = np.random.default_rng(0)
    n_pad = ((N + 63) // 64) * 64
    pos = rng.uniform(0, BOX, (n_pad, 3)).astype(np.float32)
    q = rng.normal(0, 0.5, n_pad).astype(np.float32)
    sig = np.full(n_pad, 0.3, np.float32)
    eps = np.full(n_pad, 0.5, np.float32)
    # ~6 exclusions/atom like water+protein
    excl = np.full((n_pad, 6), -1, np.int32)
    for j in range(3):
        excl[:, j] = (np.arange(n_pad) + j + 1) % N
        excl[:, j + 3] = (np.arange(n_pad) - j - 1) % N
    box = jnp.asarray(np.diag([BOX, BOX, BOX]).astype(np.float32))
    vol = BOX ** 3
    nb = n_pad // 64
    block_side = (64 * vol / N) ** (1.0 / 3.0)
    reach_s = CUTOFF + SKIN + 1.85 * block_side
    neigh = (nb / vol) * (4.0 / 3.0) * np.pi * reach_s ** 3
    max_cols = min(nb, int(neigh * 1.6) + 4)
    alpha = 3.47

    posj = jnp.asarray(pos)
    st = jax.jit(lambda p: pp.build_tile_state(
        p, box, jnp.asarray(q), jnp.asarray(sig), jnp.asarray(eps),
        jnp.asarray(excl), N, CUTOFF + SKIN, max_cols,
        sort_cell=block_side, use_shift=USE_SHIFT))(posj)
    st = jax.block_until_ready(st)
    print("overflow:", int(st["overflow"]), "max_cols:", st["code"].shape[1])
    cnt = np.asarray(st["count"])
    print("count mean %.1f max %d | excl_count mean %.1f max %d | "
          "img mean %.1f" % (cnt.mean(), cnt.max(),
                             np.asarray(st["excl_count"]).mean(),
                             np.asarray(st["excl_count"]).max(),
                             np.asarray(st["img_count"]).mean()))
    # count is in BRICKS: each (row block, brick) tile is 64 x BRICK pairs
    pair_slots = int(cnt.sum()) * 64 * pp.BRICK
    print("pair slots: %.1fM  (%.0f/atom)" % (pair_slots / 1e6,
                                              pair_slots / N))

    def sweep(p):
        e, f = pp.eval_tiles(p, box, st, N, CUTOFF, pp.MODE_EWALD,
                             alpha=alpha, want_energy=WANT_E)
        return f
    sweepj = jax.jit(sweep)
    f = jax.block_until_ready(sweepj(posj))
    t0 = time.perf_counter()
    for _ in range(30):
        f = sweepj(posj)
    jax.block_until_ready(f)
    dt = (time.perf_counter() - t0) / 30 * 1e3
    print("sweep: %.3f ms  (%.1f Gpair-slots/s)" % (dt, pair_slots / dt / 1e6))

    # build cost (rebuild amortization denominator)
    buildj = jax.jit(lambda p: pp.build_tile_state(
        p, box, jnp.asarray(q), jnp.asarray(sig), jnp.asarray(eps),
        jnp.asarray(excl), N, CUTOFF + SKIN, max_cols,
        sort_cell=block_side, use_shift=USE_SHIFT))
    jax.block_until_ready(buildj(posj))
    t0 = time.perf_counter()
    for _ in range(5):
        st2 = buildj(posj)
    jax.block_until_ready(st2)
    print("build: %.3f ms" % ((time.perf_counter() - t0) / 5 * 1e3))


if __name__ == "__main__":
    main()
