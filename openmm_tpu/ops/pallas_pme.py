"""Pallas TPU kernels for the PME charge-spread triple contraction.

The dense scatter-free spread (ops/pme.py spread_charges_dense) computes
Q[x,y,z] = sum_i A[i,x] Wy[i,y] Wz[i,z] (A = q * Wx). In plain XLA the
intermediate C = Wy (x) Wz materializes in HBM (N*ny*nz floats, ~600 MB of
traffic at DHFR scale) — the dominant PME cost. Here C is built per atom
chunk INSIDE VMEM and fed straight to the MXU, so HBM traffic collapses to
the (N, n_axis) weight arrays plus one grid-sized output.

Forward:  one grid pass over atom chunks, accumulating (nx, ny*nz).
Backward: custom VJP computing (dA, dWy, dWz) with two MXU matmuls and two
exact slice-loop reductions per chunk — the force-interpolation pass of the
reference (platforms/common/src/kernels/pme.cc:506 gridInterpolateForce)
expressed as the exact adjoint of the spread.

TPU numerics: the one-hot expansion matmuls (each output element picks ONE
input element, no summation) run as two DEFAULT (bf16) passes on a hi/lo
split of the weights — error ~2^-18, at one third the cost of a HIGHEST
matmul. The true contractions use HIGHEST (exact f32, 6 MXU passes).

Implementation notes forced by Mosaic: no 3-D reshapes; selectors are
precomputed constant inputs (in-kernel iota//, % arithmetic promotes to
int64 under the package-global jax_enable_x64 and trips an infinite
recursion in the int64 lowering); matmuls stay in plain (1),(0) form, so
the host supplies the transposed cotangent to the backward kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


CHUNK = 256
# smaller backward chunk: the bwd kernel holds several (CHUNK, ny*nz)
# intermediates in VMEM at once
CHUNK_BWD = 128
HIGHEST = jax.lax.Precision.HIGHEST


def _selectors_np(ny, nz):
    """Host-side one-hot selectors for the flattened (y,z) axis.

    sy_t: (ny, ny*nz) with sy_t[y, y*nz+z] = 1   (expand y over the flat axis)
    sz_t: (nz, ny*nz) with sz_t[z, y*nz+z] = 1   (expand z over the flat axis)
    """
    k = np.arange(ny * nz)
    sy_t = (k[None, :] // nz == np.arange(ny)[:, None]).astype(np.float32)
    sz_t = (k[None, :] % nz == np.arange(nz)[:, None]).astype(np.float32)
    return sy_t, sz_t


def _expand(w, sel):
    """One-hot expansion dot, exact to ~2^-18: two bf16 passes on a hi/lo
    split (each output picks a single input, so only input truncation
    matters, not accumulation)."""
    hi = w.astype(jnp.bfloat16).astype(jnp.float32)
    lo = w - hi
    return (jax.lax.dot(hi, sel, preferred_element_type=jnp.float32)
            + jax.lax.dot(lo, sel, preferred_element_type=jnp.float32))


def _fwd_kernel(a_t_ref, wy_ref, wz_ref, sy_ref, sz_ref, out_ref):
    import jax.experimental.pallas as pl  # noqa: F401
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref[:])

    wyr = _expand(wy_ref[:], sy_ref[:])              # (CH, ny*nz)
    wzt = _expand(wz_ref[:], sz_ref[:])
    # (nx, CH) @ (CH, ny*nz) on the MXU
    out_ref[:] += jax.lax.dot(a_t_ref[:], wyr * wzt,
                              preferred_element_type=jnp.float32,
                              precision=HIGHEST)


def _slice_reduce_y(v, ny, nz):
    """dwy[i, y] = sum_z v[i, y*nz + z] via static slices (exact f32)."""
    cols = [jnp.sum(v[:, y * nz:(y + 1) * nz], axis=1, keepdims=True)
            for y in range(ny)]
    return jnp.concatenate(cols, axis=1)


def _slice_reduce_z(v, ny, nz):
    """dwz[i, z] = sum_y v[i, y*nz + z] via static slices (exact f32)."""
    acc = v[:, 0:nz]
    for y in range(1, ny):
        acc = acc + v[:, y * nz:(y + 1) * nz]
    return acc


def _bwd_kernel(dq_ref, dq_t_ref, a_ref, wy_ref, wz_ref, sy_ref, sz_ref,
                da_ref, dwy_ref, dwz_ref):
    import jax.experimental.pallas as pl  # noqa: F401
    wy = wy_ref[:]                      # (CH, ny)
    wz = wz_ref[:]                      # (CH, nz)
    ny = wy.shape[1]
    nz = wz.shape[1]
    wyr = _expand(wy, sy_ref[:])
    wzt = _expand(wz, sz_ref[:])
    # dA (CH, nx) = C @ dQ^T
    da_ref[:] = jax.lax.dot(wyr * wzt, dq_t_ref[:],
                            preferred_element_type=jnp.float32,
                            precision=HIGHEST)
    # U[i, yz] = sum_x A[i,x] dQ[x,yz]
    u = jax.lax.dot(a_ref[:], dq_ref[:],
                    preferred_element_type=jnp.float32,
                    precision=HIGHEST)               # (CH, ny*nz)
    dwy_ref[:] = _slice_reduce_y(u * wzt, ny, nz)
    dwz_ref[:] = _slice_reduce_z(u * wyr, ny, nz)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def spread_triple(a, wy, wz):
    """Q[x, (y,z)] = sum_i a[i,x] wy[i,y] wz[i,z].

    a: (N, nx) charge-scaled x-weights; wy: (N, ny); wz: (N, nz). N must be
    a multiple of CHUNK (zero-pad the rows). Returns (nx, ny*nz) float32.
    """
    return _spread_fwd_impl(a, wy, wz)


def _spread_fwd_impl(a, wy, wz):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    n, nx = a.shape
    ny = wy.shape[1]
    nz = wz.shape[1]
    assert n % CHUNK == 0
    grid = (n // CHUNK,)
    sy_t, sz_t = _selectors_np(ny, nz)

    def const_spec(rows):
        return pl.BlockSpec((rows, ny * nz), lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nx, CHUNK), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, ny), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK, nz), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            const_spec(ny), const_spec(nz),
        ],
        out_specs=pl.BlockSpec((nx, ny * nz), lambda i: (i * 0, i * 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nx, ny * nz), jnp.float32),
    )(a.T, wy, wz, jnp.asarray(sy_t), jnp.asarray(sz_t))


def _spread_fwd(a, wy, wz):
    return _spread_fwd_impl(a, wy, wz), (a, wy, wz)


def _spread_bwd(res, dq):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    a, wy, wz = res
    n, nx = a.shape
    ny = wy.shape[1]
    nz = wz.shape[1]
    grid = (n // CHUNK_BWD,)
    sy_t, sz_t = _selectors_np(ny, nz)

    def const_spec(shape):
        return pl.BlockSpec(shape, lambda i: (i * 0, i * 0),
                            memory_space=pltpu.VMEM)

    da, dwy, dwz = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            const_spec((nx, ny * nz)),
            const_spec((ny * nz, nx)),
            pl.BlockSpec((CHUNK_BWD, nx), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_BWD, ny), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_BWD, nz), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            const_spec((ny, ny * nz)), const_spec((nz, ny * nz)),
        ],
        out_specs=[
            pl.BlockSpec((CHUNK_BWD, nx), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_BWD, ny), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK_BWD, nz), lambda i: (i, i * 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, nx), jnp.float32),
            jax.ShapeDtypeStruct((n, ny), jnp.float32),
            jax.ShapeDtypeStruct((n, nz), jnp.float32),
        ],
    )(dq, dq.T, a, wy, wz, jnp.asarray(sy_t), jnp.asarray(sz_t))
    return da, dwy, dwz


spread_triple.defvjp(_spread_fwd, _spread_bwd)
