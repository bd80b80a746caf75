"""Compare the 3-axis matmul-DFT + convolution against jnp.fft and a
64-padded matmul variant at the DHFR PME grid (56^3)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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
    from openmm_tpu.ops import pme_zslab as zs
    from openmm_tpu.ops import pme as pme_mod

    g = int(os.environ.get("GRID", "56"))
    grid = (g, g, g)
    box_l = 6.22
    box = jnp.asarray(np.diag([box_l] * 3), jnp.float32)
    alpha = 2.92
    rng = np.random.RandomState(0)
    Q = jnp.asarray(rng.uniform(-1, 1, (g, g, g)), jnp.float32)
    md = pme_mod.make_pme_recip_data(grid, 5)
    bx = jnp.asarray(md["bsq_x"].astype(jnp.float32))
    by = jnp.asarray(md["bsq_y"].astype(jnp.float32))
    bz = jnp.asarray(md["bsq_z"].astype(jnp.float32))

    def conv_matmul(Qr):
        return zs.convolve_potential(Qr, box, grid, alpha, bx, by, bz)
    phi0, e0 = jax.jit(conv_matmul)(Q)
    print("matmul-DFT convolve: %.3f ms  (E=%.4f)"
          % (timeit(jax.jit(conv_matmul), Q), float(e0)))

    # jnp.fft variant (complex64); same kernel math
    from openmm_tpu.ops import geometry as geom
    from openmm_tpu.constants import ONE_4PI_EPS0

    def conv_fft(Qr):
        f32 = jnp.float32
        box_inv = geom.box_inverse(box)
        vol = geom.box_volume(box).astype(f32)
        F = jnp.fft.fftn(Qr.astype(jnp.complex64))
        mx = jnp.fft.fftfreq(g, 1.0 / g).astype(f32)
        bi = box_inv.astype(f32)
        kv = (mx[:, None, None, None] * bi.T[None, None, None, 2, :]
              + mx[None, :, None, None] * bi.T[None, None, None, 0, :]
              + mx[None, None, :, None] * bi.T[None, None, None, 1, :])
        m2 = jnp.sum(kv * kv, axis=-1)
        m2_safe = jnp.where(m2 > 0, m2, 1.0)
        kern = jnp.exp(-(jnp.pi ** 2) * m2_safe / (alpha ** 2)) / m2_safe
        kern = jnp.where(m2 > 0, kern, 0.0)
        B = (bz[:, None, None] * bx[None, :, None] * by[None, None, :]
             ).astype(f32)
        Kt = (ONE_4PI_EPS0 / (2.0 * jnp.pi * vol)) * kern * B
        energy = jnp.sum(Kt * (jnp.real(F) ** 2 + jnp.imag(F) ** 2))
        phi = jnp.fft.ifftn(Kt * F) * (g ** 3)
        return jnp.real(phi), energy
    phi1, e1 = jax.jit(conv_fft)(Q)
    print("jnp.fft convolve:    %.3f ms  (E=%.4f, dphi=%.2e)"
          % (timeit(jax.jit(conv_fft), Q), float(e1),
             float(jnp.max(jnp.abs(phi1 - phi0)))))


if __name__ == "__main__":
    main()
