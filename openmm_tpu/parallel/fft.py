"""Distributed 3-D FFT for multi-chip PME (SURVEY §2.10 P7).

The reference is single-node (cuFFT per device, CudaFFT3D.cpp); scaling PME
across chips needs the textbook decomposition instead: shard the grid over
the mesh axis along z, run the (x, y) 2-D FFTs locally per z-plane,
all-to-all transpose so z becomes local (x sharded), run the z-axis 1-D
FFTs, and apply the reciprocal-space kernel in that layout. The inverse
retraces the same path. All collectives ride the mesh axis (ICI on real
hardware); numerics match jnp.fft.fftn exactly.

Layouts (D = mesh size):
  input  Q (nz, nx, ny) real/complex, sharded (z/D, nx, ny)
  after transpose: (nz, x/D, ny) with z local
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import AXIS


def _shard_zxy(mesh, a):
    return jax.lax.with_sharding_constraint(
        a, NamedSharding(mesh, P(AXIS, None, None)))


def fft3_zsharded(mesh, q):
    """Forward 3-D FFT of q (nz, nx, ny) sharded along z; returns the
    spectrum in TRANSPOSED layout (nz, nx, ny) sharded along x (axis 1) —
    the natural layout for the PME convolution, avoiding a second
    transpose until the inverse."""
    from jax.experimental.shard_map import shard_map

    nz, nx, ny = q.shape
    n_dev = mesh.devices.size
    assert nz % n_dev == 0 and nx % n_dev == 0, (q.shape, n_dev)

    def local(qz):
        # qz: (nz/D, nx, ny) local z-planes
        f = jnp.fft.fftn(qz.astype(jnp.complex64), axes=(1, 2))
        # split x across devices and trade z-slabs for x-slabs
        blocks = f.reshape(qz.shape[0], n_dev, nx // n_dev, ny)
        blocks = jnp.moveaxis(blocks, 1, 0)      # (D, nz/D, nx/D, ny)
        got = jax.lax.all_to_all(blocks, AXIS, 0, 0, tiled=False)
        # (D, nz/D, nx/D, ny) -> (nz, nx/D, ny) with z local
        zloc = got.reshape(nz, nx // n_dev, ny)
        return jnp.fft.fft(zloc, axis=0)

    return shard_map(local, mesh=mesh, in_specs=P(AXIS, None, None),
                     out_specs=P(None, AXIS, None))(q)


def ifft3_to_zsharded(mesh, fk):
    """Inverse of fft3_zsharded: takes the x-sharded spectrum
    (nz, nx, ny), returns the real-space grid sharded along z."""
    from jax.experimental.shard_map import shard_map

    nz, nx, ny = fk.shape
    n_dev = mesh.devices.size

    def local(fx):
        # fx: (nz, nx/D, ny), z local
        f = jnp.fft.ifft(fx, axis=0)
        blocks = f.reshape(n_dev, nz // n_dev, nx // n_dev, ny)
        got = jax.lax.all_to_all(blocks, AXIS, 0, 0, tiled=False)
        # (D, nz/D, nx/D, ny) -> (nz/D, nx, ny)
        zsl = jnp.moveaxis(got, 0, 1).reshape(nz // n_dev, nx, ny)
        return jnp.fft.ifftn(zsl, axes=(1, 2))

    return shard_map(local, mesh=mesh, in_specs=P(None, AXIS, None),
                     out_specs=P(AXIS, None, None))(fk)


def pme_convolve_sharded(mesh, q_grid, kernel_zxy):
    """E = sum(K |F(Q)|^2), phi = unnormalized IFFT(K * F(Q)) with the grid
    sharded along z and the spectral kernel K (nz, nx, ny) sharded along x.
    Returns (phi_real (z-sharded), energy). This is the multi-chip twin of
    ops/pme_zslab.convolve_potential: dE/dQ(r) = 2 phi(r)."""
    fk = fft3_zsharded(mesh, q_grid)
    kf = jax.lax.with_sharding_constraint(
        kernel_zxy, NamedSharding(mesh, P(None, AXIS, None)))
    energy = jnp.sum(kf * (fk.real ** 2 + fk.imag ** 2))
    nz, nx, ny = q_grid.shape
    phi = ifft3_to_zsharded(mesh, kf * fk) * (nz * nx * ny)
    return phi.real, energy
