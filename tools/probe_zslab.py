"""Stage-split timings for the z-slab PME engine at DHFR scale.

Stages timed separately (each jitted standalone, single dispatch):
  zgather   — the one row gather into the persisted z-order
  weights   — fractional coords + B-spline w/dw + dense axis planes + extend
  K1        — the per-plane spread kernel alone (from prebuilt inputs)
  dftconv   — convolve_potential (3 fwd + 3 inv matmul DFTs + kernel)
  K2        — the gather/force kernel alone
  ungather  — inverse-permutation row gather of the forces
  full      — pme_recip_ef end to end

Env: N (atoms), GRID (one int, cubic), SKIN (drift margin source).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    from openmm_tpu.ops import pme_zslab as zs
    from openmm_tpu.ops import pme as pme_mod

    n = int(os.environ.get("N", "23558"))
    g = int(os.environ.get("GRID", "56"))
    skin = float(os.environ.get("SKIN", "0.25"))
    grid = (g, g, g)
    rho = 97.8
    box_l = (n / rho) ** (1.0 / 3.0)
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(0, box_l, (n, 3)), jnp.float32)
    box = jnp.asarray(np.diag([box_l] * 3), jnp.float32)
    charges = jnp.asarray(rng.uniform(-0.8, 0.4, n), jnp.float32)
    alpha = 2.92
    z_cell = box_l / g
    dc = max(1, int(np.ceil((0.5 * skin + 0.02) / z_cell)))
    cfg = zs.zslab_config(n, grid, margin=1.25, drift_cells=dc)
    print("n=%d grid=%d dc=%d cap=%d n_ext=%d pwin=%d"
          % (n, g, dc, cfg["cap"], cfg["n_ext"], cfg["pwin_planes"]))

    md = pme_mod.make_pme_recip_data(grid, 5)
    bx = jnp.asarray(md["bsq_x"].astype(jnp.float32))
    by = jnp.asarray(md["bsq_y"].astype(jnp.float32))
    bz = jnp.asarray(md["bsq_z"].astype(jnp.float32))

    build = jax.jit(lambda p: zs.build_z_state(p, box, charges, grid, cfg))
    zst = build(pos)
    jax.block_until_ready(zst["zorder"])
    print("z build: %.3f ms" % timeit(build, pos, n=5))

    def full(p):
        return zs.pme_recip_ef(p, charges, box, grid, 5, alpha,
                               bx, by, bz, zst, cfg)
    print("full pme_recip_ef: %.3f ms" % timeit(jax.jit(full), pos))

    zo = zst["zorder"]
    print("zgather (n rows): %.3f ms"
          % timeit(jax.jit(lambda p: p[zo]), pos))
    inv = zst["inv_zorder"]
    f_s = jnp.zeros((cfg["n_p"], 3), jnp.float32)
    print("ungather (n_p rows): %.3f ms"
          % timeit(jax.jit(lambda f: f[inv]), f_s))

    nx, ny, nz = grid
    n_p = cfg["n_p"]

    def weights(p):
        from openmm_tpu.ops import geometry as geom
        binv = geom.box_inverse(box).astype(jnp.float32)
        posf = p
        if n_p > posf.shape[0]:
            posf = jnp.concatenate(
                [posf, jnp.broadcast_to(posf[0], (n_p - posf.shape[0], 3))])
        pos_s = posf[zo]
        frac = geom.to_fractional(pos_s, binv)
        frac = frac - jnp.floor(frac)
        u = frac * jnp.array([nx, ny, nz], jnp.float32)
        base = jnp.floor(u)
        t = u - base
        base = base.astype(jnp.int32)
        wx5, dwx5 = zs.bspline_w_dw(t[:, 0], 5)
        wy5, dwy5 = zs.bspline_w_dw(t[:, 1], 5)
        wz5, dwz5 = zs.bspline_w_dw(t[:, 2], 5)
        Wx = zs._dense_axis(wx5, base[:, 0], 4, nx, cfg["nxp"])
        dWx = zs._dense_axis(dwx5, base[:, 0], 4, nx, cfg["nxp"])
        Wy = zs._dense_axis(wy5, base[:, 1], 4, ny, cfg["nyp"])
        dWy = zs._dense_axis(dwy5, base[:, 1], 4, ny, cfg["nyp"])
        return Wx, dWx, Wy, dWy, wz5, dwz5, base
    print("zgather+weights+dense planes: %.3f ms"
          % timeit(jax.jit(weights), pos))

    Q = jnp.asarray(rng.uniform(-1, 1, (nz, nx, ny)), jnp.float32)

    def conv(Qr):
        return zs.convolve_potential(Qr, box, grid, alpha, bx, by, bz)
    print("dft+convolve+idft: %.3f ms" % timeit(jax.jit(conv), Q))


if __name__ == "__main__":
    main()
