"""Smooth Particle-Mesh Ewald and classic Ewald reciprocal space, TPU-style.

Replaces the reference's PME pipeline (charge spread -> FFT -> convolution ->
FFT^-1 -> force interpolation: platforms/common/src/kernels/pme.cc:64-616,
ReferencePME.cpp:58-877, cuFFT / generated Stockham kernels in
CudaFFT3D.cpp:187-202) with one differentiable jnp program: B-spline scatter-add
spread, jnp.fft.fftn (XLA batched FFT), k-space convolution, and forces via
jax.grad (the adjoint of the spread is exactly the force interpolation pass).

Parameter auto-selection matches NonbondedForceImpl::calcEwaldParameters /
calcPMEParameters (openmmapi/src/NonbondedForceImpl.cpp:144-234).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ONE_4PI_EPS0

SQRT_PI = math.sqrt(math.pi)


# ---------------------------------------------------------------------------
# Parameter selection (host-side, matches reference formulas)
# ---------------------------------------------------------------------------
def ewald_alpha(cutoff, tol):
    return (1.0 / cutoff) * math.sqrt(-math.log(2.0 * tol))


def ewald_kmax(box_widths, alpha, tol):
    """kmax per axis: smallest k with error <= tol, then bumped to odd
    (NonbondedForceImpl::calcEwaldParameters)."""
    out = []
    for width in box_widths:
        def err(k):
            temp = k * math.pi / (width * alpha)
            return tol - 0.05 * math.sqrt(width * alpha) * k * math.exp(-temp * temp)
        k = 10
        if err(k) > 0:
            while err(k) > 0 and k > 0:
                k -= 1
            k += 1
        else:
            while err(k) < 0:
                k += 1
        if k % 2 == 0:
            k += 1
        out.append(k)
    return out


def pme_grid_size(box_widths, alpha, tol, lj=False):
    sizes = []
    for width in box_widths:
        if lj:
            s = int(math.ceil(alpha * width / (3 * tol ** 0.2)))
        else:
            s = int(math.ceil(2 * alpha * width / (3 * tol ** 0.2)))
        sizes.append(max(s, 6))
    return [find_legal_fft_dim(s) for s in sizes]


def find_legal_fft_dim(minimum):
    """Smallest 2,3,5,7-smooth integer >= minimum (XLA FFT is fastest on
    smooth sizes; same policy as CudaFFT3D::findLegalDimension)."""
    n = int(minimum)
    while True:
        m = n
        for f in (2, 3, 5, 7):
            while m % f == 0:
                m //= f
        if m == 1:
            return n
        n += 1


# ---------------------------------------------------------------------------
# Cardinal B-splines
# ---------------------------------------------------------------------------
def bspline_weights(t, order):
    """M_order(t + j) for j = 0..order-1, given fractional offsets t in [0,1).

    t: (...,) array. Returns (..., order) weights that sum to 1.
    Uses the stable recursion M_n(x) = (x M_{n-1}(x) + (n-x) M_{n-1}(x-1))/(n-1).
    """
    # data[j] approximates M_k evaluated at the grid offsets; build iteratively
    # following the same recurrence the reference kernels use (pme.cc:64).
    shape = t.shape
    w = [jnp.zeros(shape, t.dtype) for _ in range(order)]
    w[0] = 1.0 - t
    w[1] = t
    for k in range(3, order + 1):
        div = 1.0 / (k - 1)
        new = [None] * order
        new[k - 1] = div * t * w[k - 2]
        for j in range(1, k - 1):
            new[k - 1 - j] = div * ((t + j) * w[k - 2 - j] + (k - j - t) * w[k - 1 - j])
        new[0] = div * (1.0 - t) * w[0]
        for j in range(k):
            w[j] = new[j]
    return jnp.stack(w, axis=-1)  # (..., order); w[..., j] = weight of gridpoint floor(u)-?


def _bspline_int_values(order):
    """M_order(k) at integer k = 1..order-1, computed with the same recursion
    as bspline_weights at t=0 so both conventions always agree.
    Weight identity: bspline_weights(0)[j] = M_order(order-1-j)."""
    t = np.zeros(1)
    w = [np.zeros(1) for _ in range(order)]
    w[0] = 1.0 - t
    w[1] = t.copy()
    for k in range(3, order + 1):
        div = 1.0 / (k - 1)
        new = [None] * order
        new[k - 1] = div * t * w[k - 2]
        for j in range(1, k - 1):
            new[k - 1 - j] = div * ((t + j) * w[k - 2 - j] + (k - j - t) * w[k - 1 - j])
        new[0] = div * (1.0 - t) * w[0]
        for j in range(k):
            w[j] = new[j]
    # w[j] = M_order(order-1-j); M_order(m) = w[order-1-m]
    return np.array([w[order - 1 - m][0] for m in range(1, order)])


def _bspline_moduli(grid_size, order):
    """|b(m)|^2 per axis (host-side numpy), counterpart of the moduli setup in
    ReferencePME.cpp / pme.cc. Near-zeros (even order at Nyquist) are patched
    by averaging neighbors, the standard fix."""
    mvals = _bspline_int_values(order)  # M_order(1..order-1)
    m = np.arange(grid_size)
    k = np.arange(1, order)
    phases = np.exp(2j * np.pi * np.outer(m, k) / grid_size)
    denom = phases @ mvals
    mag2 = np.abs(denom) ** 2
    bsq = 1.0 / np.maximum(mag2, 1e-300)
    bad = mag2 < 1e-10
    if bad.any():
        for i in np.where(bad)[0]:
            bsq[i] = 0.5 * (bsq[(i - 1) % grid_size] + bsq[(i + 1) % grid_size])
    return bsq


def _zeta_correction(size, order, jcut=50):
    """TINKER's optimal influence-function factor zeta(k)^2 (the 'optimal
    zeta coefficient' of AmoebaReferenceMultipoleForce.cpp:5049-5076):
    dividing the moduli by zeta^2 cancels the leading aliasing error of
    derivative spreads, which is what lets AMOEBA run sharp alpha on
    coarse grids."""
    zeta2 = np.ones(size)
    for i in range(1, size + 1):
        k = i - 1
        if i > size // 2:
            k -= size
        if k == 0:
            continue
        factor = math.pi * k / size
        sum1 = 1.0
        sum2 = 1.0
        for j in range(1, jcut + 1):
            arg = factor / (factor + math.pi * j)
            sum1 += arg ** order
            sum2 += arg ** (2 * order)
        for j in range(1, jcut + 1):
            arg = factor / (factor - math.pi * j)
            sum1 += arg ** order
            sum2 += arg ** (2 * order)
        zeta = sum2 / sum1
        zeta2[i - 1] = zeta * zeta
    return zeta2


def make_pme_recip_data(grid, order, dtype=np.float64, zeta=False):
    """Precompute per-axis 1/|b|^2 moduli (optionally with the TINKER
    optimal-zeta correction used by AMOEBA). Returns dict of numpy arrays."""
    nx, ny, nz = grid
    out = {}
    for key, g in (("bsq_x", nx), ("bsq_y", ny), ("bsq_z", nz)):
        bsq = _bspline_moduli(g, order)
        if zeta:
            bsq = bsq / _zeta_correction(g, order)
        out[key] = bsq.astype(dtype)
    return out


def spread_charges_dense(pos, charges, box_inv, grid, order, dtype,
                         atom_chunk=4096, pallas=False):
    """Scatter-free B-spline charge spreading for TPU.

    The sparse scatter (125 points/atom) is recast as dense per-axis weight
    matrices contracted on the MXU: Q[x,y,z] = sum_i q_i Wx[i,x] Wy[i,y]
    Wz[i,z], evaluated per atom chunk as one einsum. This trades ~G^3/125x
    more FLOPs for the elimination of XLA scatter (which serializes on TPU) —
    a large win for MD-sized grids; the reverse-mode gradient is the matching
    dense gather automatically.

    With pallas=True the triple contraction runs in a fused Pallas kernel
    (ops/pallas_pme.py) that never materializes the (N, ny*nz) intermediate
    in HBM — use on TPU with f32.
    """
    nx, ny, nz = grid
    n = pos.shape[0]
    sizes = jnp.array([nx, ny, nz], dtype)
    from . import geometry as _geom
    frac = _geom.to_fractional(pos, box_inv)
    frac = frac - jnp.floor(frac)
    u = frac * sizes
    base = jnp.floor(u)
    t = u - base
    w = bspline_weights(t, order)               # (N,3,order)
    base = base.astype(jnp.int32)
    offs = jnp.arange(order, dtype=jnp.int32)

    def axis_weights(axis, n_axis):
        g = jnp.mod(base[:, axis:axis + 1] + offs[None, :] - (order - 1),
                    n_axis)                      # (N, order)
        onehot = (g[:, :, None]
                  == jnp.arange(n_axis, dtype=jnp.int32)[None, None, :])
        return jnp.sum(w[:, axis, :, None] * onehot, axis=1)  # (N, n_axis)

    Wx = axis_weights(0, nx)
    Wy = axis_weights(1, ny)
    Wz = axis_weights(2, nz)
    A = charges[:, None].astype(dtype) * Wx.astype(dtype)

    if pallas and dtype == jnp.float32:
        from .pallas_pme import spread_triple, CHUNK
        pad = (-n) % CHUNK
        if pad:
            A_p = jnp.concatenate([A, jnp.zeros((pad, nx), dtype)])
            Wy_p = jnp.concatenate([Wy, jnp.zeros((pad, ny), dtype)])
            Wz_p = jnp.concatenate([Wz, jnp.zeros((pad, nz), dtype)])
        else:
            A_p, Wy_p, Wz_p = A, Wy, Wz
        return spread_triple(A_p, Wy_p, Wz_p).reshape(nx, ny, nz)

    n_chunks = max(1, -(-n // atom_chunk))
    if n_chunks == 1:
        C = Wy[:, :, None] * Wz[:, None, :]
        return jnp.einsum("ix,iyz->xyz", A, C.astype(dtype),
                          preferred_element_type=dtype,
                          precision=jax.lax.Precision.HIGH)
    pad = n_chunks * atom_chunk - n
    A_p = jnp.concatenate([A, jnp.zeros((pad, nx), dtype)])
    Wy_p = jnp.concatenate([Wy, jnp.zeros((pad, ny), dtype)])
    Wz_p = jnp.concatenate([Wz, jnp.zeros((pad, nz), dtype)])
    A_c = A_p.reshape(n_chunks, atom_chunk, nx)
    Wy_c = Wy_p.reshape(n_chunks, atom_chunk, ny)
    Wz_c = Wz_p.reshape(n_chunks, atom_chunk, nz)

    def body(acc, xs):
        a, wy, wz = xs
        C = wy[:, :, None] * wz[:, None, :]
        return acc + jnp.einsum("ix,iyz->xyz", a, C,
                                preferred_element_type=dtype,
                                precision=jax.lax.Precision.HIGH), None

    out, _ = jax.lax.scan(body, jnp.zeros((nx, ny, nz), dtype),
                          (A_c, Wy_c, Wz_c))
    return out


def spread_charges(pos, charges, box_inv, grid, order, dtype):
    """Scatter B-spline-weighted charges onto the (nx, ny, nz) grid.

    box_inv: (3,3) inverse of box matrix (rows are reciprocal vectors, no 2pi).
    Differentiable: jax.grad through the scatter gives the interpolation
    (gather) used for forces.
    """
    nx, ny, nz = grid
    sizes = jnp.array([nx, ny, nz], dtype)
    # fractional coordinates in [0,1)
    from . import geometry as _geom
    frac = _geom.to_fractional(pos, box_inv)
    frac = frac - jnp.floor(frac)
    u = frac * sizes
    base = jnp.floor(u)
    t = u - base                                # (N,3) in [0,1)
    w = bspline_weights(t, order)               # (N,3,order)
    base = base.astype(jnp.int32)

    offs = jnp.arange(order, dtype=jnp.int32)
    # weight w[..., j] = M_order(t + order-1-j) belongs to grid point
    # base + j - (order-1) (see bspline_weights); wrap modulo the grid
    gx = jnp.mod(base[:, 0:1] + offs[None, :] - (order - 1), nx)
    gy = jnp.mod(base[:, 1:2] + offs[None, :] - (order - 1), ny)
    gz = jnp.mod(base[:, 2:3] + offs[None, :] - (order - 1), nz)
    val = (charges[:, None, None, None]
           * w[:, 0, :, None, None] * w[:, 1, None, :, None] * w[:, 2, None, None, :])
    flat_idx = ((gx[:, :, None, None] * ny + gy[:, None, :, None]) * nz
                + gz[:, None, None, :])
    grid_flat = jnp.zeros(nx * ny * nz, dtype=dtype)
    grid_flat = grid_flat.at[flat_idx.reshape(-1)].add(val.reshape(-1).astype(dtype))
    return grid_flat.reshape(nx, ny, nz)


def _dft_matrices(n, dtype=np.float64):
    """Real/imag DFT matrices for one axis (host-side)."""
    kk = np.arange(n)
    ang = -2.0 * np.pi * np.outer(kk, kk) / n
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def dft3_power(Q, mats):
    """|FFT3(Q)|^2 via separable matmul-DFT (MXU path).

    XLA's TPU FFT custom-call costs ~1-2 ms regardless of size for MD-scale
    grids; three axes of dense DFT matmuls are ~G^4 MACs — microseconds on
    the MXU up to G~128. Q is real; (Re, Im) pairs are carried through the
    three contractions.
    """
    (wrx, wix), (wry, wiy), (wrz, wiz) = mats

    HIGH = jax.lax.Precision.HIGH  # bf16x3: f32-grade, half the cost

    def apply_axis(re, im, wr, wi, axis):
        re2 = jnp.tensordot(wr, re, axes=([1], [axis]), precision=HIGH)
        re2 = re2 - jnp.tensordot(wi, im, axes=([1], [axis]), precision=HIGH)
        im2 = jnp.tensordot(wr, im, axes=([1], [axis]), precision=HIGH)
        im2 = im2 + jnp.tensordot(wi, re, axes=([1], [axis]), precision=HIGH)
        # tensordot moves the contracted axis to the front; rotate it back
        return jnp.moveaxis(re2, 0, axis), jnp.moveaxis(im2, 0, axis)

    re, im = Q, jnp.zeros_like(Q)
    re, im = apply_axis(re, im, wrx, wix, 0)
    re, im = apply_axis(re, im, wry, wiy, 1)
    re, im = apply_axis(re, im, wrz, wiz, 2)
    return re * re + im * im


def _k_vectors(grid, box_inv, dtype):
    """Reciprocal vectors m~ (no 2pi) for each FFT bin, with fftfreq wrapping."""
    nx, ny, nz = grid
    mx = jnp.fft.fftfreq(nx, 1.0 / nx).astype(dtype)
    my = jnp.fft.fftfreq(ny, 1.0 / ny).astype(dtype)
    mz = jnp.fft.fftfreq(nz, 1.0 / nz).astype(dtype)
    bi = box_inv.astype(dtype)
    # positions use frac = pos @ box_inv, so S(m) phases are pos·(Binv @ m):
    # the reciprocal vector for integer triple m is a combination of Binv COLUMNS
    kx = (mx[:, None, None, None] * bi.T[None, None, None, 0, :])
    ky = (my[None, :, None, None] * bi.T[None, None, None, 1, :])
    kz = (mz[None, None, :, None] * bi.T[None, None, None, 2, :])
    return kx + ky + kz  # (nx, ny, nz, 3)


def recip_energy_from_grid(Q, box, grid, alpha, bsq_x, bsq_y, bsq_z,
                           accum_dtype):
    """Coulomb reciprocal energy of an arbitrary (nx, ny, nz) real charge
    grid (the convolution half of pme_reciprocal_energy; used by the
    AMOEBA multipole PME, whose grid carries dipole/quadrupole spreads)."""
    from . import geometry as geom
    box_inv = geom.box_inverse(box)
    vol = geom.box_volume(box)
    if max(grid) <= 128:
        mats = tuple(
            tuple(jnp.asarray(m.astype(Q.dtype)) for m in _dft_matrices(g))
            for g in grid)
        sq = dft3_power(Q, mats).astype(accum_dtype)
    else:
        FQ = jnp.fft.fftn(Q)
        sq = (FQ * jnp.conj(FQ)).real.astype(accum_dtype)
    kvec = _k_vectors(grid, box_inv, accum_dtype)
    m2 = jnp.sum(kvec * kvec, axis=-1)
    B = (bsq_x[:, None, None] * bsq_y[None, :, None]
         * bsq_z[None, None, :]).astype(accum_dtype)
    m2_safe = jnp.where(m2 > 0, m2, 1.0)
    kernel = jnp.exp(-(jnp.pi ** 2) * m2_safe / (alpha ** 2)) / m2_safe
    kernel = jnp.where(m2 > 0, kernel, 0.0)
    return ONE_4PI_EPS0 / (2.0 * jnp.pi * vol) * jnp.sum(kernel * B * sq)


def dense_axis_weights(w, base, offs_minus, n_axis):
    """Expand (N, order) spline weights into dense (N, n_axis) planes at
    grid points (base + j - offs_minus) mod n_axis."""
    order = w.shape[-1]
    lane = jnp.arange(n_axis, dtype=jnp.int32)[None, :]
    acc = jnp.zeros((w.shape[0], n_axis), w.dtype)
    for j in range(order):
        g = jnp.mod(base + (j - offs_minus), n_axis)[:, None]
        acc = acc + jnp.where(lane == g, w[:, j:j + 1], 0.0)
    return acc


def bspline_w_dw_d2w(t, order):
    """(M, dM/du, d2M/du2) weight stacks of shape (..., order) for the
    grid-point convention of bspline_weights (weight j sits at
    floor(u) + j - (order-1)); derivative identities
    dM_n(u) = M_{n-1}(u) - M_{n-1}(u-1),
    d2M_n(u) = M_{n-2}(u) - 2 M_{n-2}(u-1) + M_{n-2}(u-2)."""
    shape = t.shape
    zeros = jnp.zeros(shape, t.dtype)
    w = [jnp.zeros(shape, t.dtype) for _ in range(order)]
    w[0] = 1.0 - t
    w[1] = t
    w2 = None
    w3 = None
    for k in range(3, order + 1):
        if k == order - 1:
            w2 = [x for x in w]       # order-(n-2) weights
        if k == order:
            w3 = [x for x in w]       # order-(n-1) weights
        div = 1.0 / (k - 1)
        new = [None] * order
        new[k - 1] = div * t * w[k - 2]
        for j in range(1, k - 1):
            new[k - 1 - j] = div * ((t + j) * w[k - 2 - j]
                                    + (k - j - t) * w[k - 1 - j])
        new[0] = div * (1.0 - t) * w[0]
        for j in range(k):
            w[j] = new[j]
    if w3 is None:                    # order == 2
        w3 = [zeros] * order
    if w2 is None:
        w2 = [zeros] * order

    def at(lst, j, width):
        return lst[j] if 0 <= j <= width else zeros

    dw = [at(w3, j - 1, order - 2) - at(w3, j, order - 2)
          for j in range(order)]
    d2w = [at(w2, j - 2, order - 3) - 2.0 * at(w2, j - 1, order - 3)
           + at(w2, j, order - 3) for j in range(order)]
    return (jnp.stack(w, axis=-1), jnp.stack(dw, axis=-1),
            jnp.stack(d2w, axis=-1))


def pme_reciprocal_energy(pos, charges, box, grid, order, alpha, bsq_x, bsq_y,
                          bsq_z, accum_dtype, coulomb=True, c6s=None,
                          pallas=False):
    """Reciprocal-space PME energy.

    For coulomb: E = f/(2 pi V) sum_{m != 0} exp(-pi^2 m^2/a^2)/m^2 B(m) |FQ|^2.
    For LJ dispersion (c6s given): Essmann's dispersion kernel with geometric
    C6 combination (theory 02_standard_forces.rst LJPME section).
    """
    from . import geometry as geom
    dtype = pos.dtype
    nx, ny, nz = grid
    box_inv = geom.box_inverse(box)
    vol = geom.box_volume(box)
    q = charges if coulomb else c6s
    Q = spread_charges_dense(pos, q, box_inv, grid, order, dtype,
                             pallas=pallas)
    if max(grid) <= 128:
        mats = tuple(
            tuple(jnp.asarray(m.astype(dtype)) for m in _dft_matrices(g))
            for g in grid)
        sq = dft3_power(Q, mats).astype(accum_dtype)
    else:
        FQ = jnp.fft.fftn(Q)
        sq = (FQ * jnp.conj(FQ)).real.astype(accum_dtype)
    kvec = _k_vectors(grid, box_inv, accum_dtype)
    m2 = jnp.sum(kvec * kvec, axis=-1)
    B = (bsq_x[:, None, None] * bsq_y[None, :, None] * bsq_z[None, None, :]).astype(accum_dtype)
    if coulomb:
        m2_safe = jnp.where(m2 > 0, m2, 1.0)
        kernel = jnp.exp(-(jnp.pi ** 2) * m2_safe / (alpha ** 2)) / m2_safe
        kernel = jnp.where(m2 > 0, kernel, 0.0)
        e = ONE_4PI_EPS0 / (2.0 * jnp.pi * vol) * jnp.sum(kernel * B * sq)
    else:
        # LJPME dispersion eterm exactly per the reference convolution
        # (pme.cc:396-431): E = sum_m B(m)|S6|^2 * (-(2 pi sqrt(pi))/(6V)) *
        # [2 pi^3 sqrt(pi) m^3 erfc(pi m/a) + e^{-(pi m/a)^2}(a^3 - 2 a pi^2 m^2)]
        # — the m=0 term IS included for dispersion.
        m_abs = jnp.sqrt(m2)
        b = jnp.pi * m_abs / alpha
        fac1 = 2.0 * jnp.pi ** 3 * SQRT_PI
        fac2 = alpha ** 3
        fac3 = -2.0 * alpha * jnp.pi ** 2
        eterm = (fac1 * jax.scipy.special.erfc(b) * m_abs * m2
                 + jnp.exp(-b * b) * (fac2 + fac3 * m2))
        # the reference's kernel constant -(2pi/6)sqrt(pi)/V is halved by the
        # downstream 0.5x on the grid-energy sum; fold it in here
        scale = -0.5 * (2.0 * jnp.pi / 6.0) * SQRT_PI / vol
        e = scale * jnp.sum(eterm * B * sq)
    return e


def ewald_reciprocal_energy(pos, charges, box, kmax, alpha, accum_dtype):
    """Exact structure-factor Ewald sum over a symmetric k-box (classic Ewald,
    method used by the reference for NonbondedForce::Ewald)."""
    from . import geometry as geom
    kx, ky, kz = kmax
    box_inv = geom.box_inverse(box).astype(accum_dtype)
    vol = geom.box_volume(box).astype(accum_dtype)
    mx = np.arange(-(kx - 1), kx)
    my = np.arange(-(ky - 1), ky)
    mz = np.arange(-(kz - 1), kz)
    M = np.stack(np.meshgrid(mx, my, mz, indexing="ij"), axis=-1).reshape(-1, 3)
    M = M[np.any(M != 0, axis=1)]
    M = jnp.asarray(M, dtype=accum_dtype)
    # both products MUST pin HIGHEST: on TPU a plain @ lands on the MXU in
    # bf16, truncating positions to ~8 mantissa bits — phases k.r (up to
    # ~10^2 rad) then carry O(1) errors and the k-sum lands % off (caught
    # by tests_tpu test_pme_vs_ewald_energy_on_device: -3000.6 vs -3043.5)
    kvecs = 2.0 * jnp.pi * jnp.matmul(
        M, box_inv.T, precision=jax.lax.Precision.HIGHEST)   # (K,3)
    k2 = jnp.sum(kvecs * kvecs, axis=-1)
    phase = jnp.matmul(pos.astype(accum_dtype), kvecs.T,
                       precision=jax.lax.Precision.HIGHEST)  # (N,K)
    qc = charges.astype(accum_dtype)
    s_re = jnp.sum(qc[:, None] * jnp.cos(phase), axis=0)
    s_im = jnp.sum(qc[:, None] * jnp.sin(phase), axis=0)
    s2 = s_re * s_re + s_im * s_im
    kernel = jnp.exp(-k2 / (4.0 * alpha ** 2)) / k2
    return ONE_4PI_EPS0 * (2.0 * jnp.pi / vol) * jnp.sum(kernel * s2)


def ewald_self_energy(charges, alpha, accum_dtype):
    q = charges.astype(accum_dtype)
    return -ONE_4PI_EPS0 * alpha / SQRT_PI * jnp.sum(q * q)


def dispersion_self_energy(c6s, alpha, accum_dtype):
    """LJPME self term: +alpha^6/12 sum_i c6_ii with c6_ii = c6_i^2
    (CudaKernels.cpp:724: eps*(sigma*dispAlpha)^6/3 per particle)."""
    c6 = c6s.astype(accum_dtype)
    return (alpha ** 6 / 12.0) * jnp.sum(c6 * c6)
