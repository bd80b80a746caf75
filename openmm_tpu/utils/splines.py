"""Cubic spline fitting (natural & periodic) and bicubic surface coefficients.

Host-side (numpy) setup math used when compiling TabulatedFunctions and CMAP
maps; evaluation happens in jnp inside jitted energy functions. Functional
counterpart of the reference SplineFitter
(/root/reference/openmmapi/src/SplineFitter.cpp, 750 LoC): createNaturalSpline,
createPeriodicSpline, create2DNaturalSpline, and the bicubic patch-coefficient
construction used by CMAPTorsionForceImpl.
"""
from __future__ import annotations

import numpy as np


def natural_spline(x, y):
    """Second derivatives of the natural cubic spline through (x, y)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    if n < 2:
        raise ValueError("spline requires at least two points")
    if n == 2:
        return np.zeros(n)
    h = np.diff(x)
    # tridiagonal system for interior second derivatives
    a = np.zeros(n - 2)
    b = np.zeros(n - 2)
    c = np.zeros(n - 2)
    d = np.zeros(n - 2)
    for i in range(1, n - 1):
        a[i - 1] = h[i - 1]
        b[i - 1] = 2.0 * (h[i - 1] + h[i])
        c[i - 1] = h[i]
        d[i - 1] = 6.0 * ((y[i + 1] - y[i]) / h[i] - (y[i] - y[i - 1]) / h[i - 1])
    m = _solve_tridiag(a, b, c, d)
    deriv2 = np.zeros(n)
    deriv2[1:-1] = m
    return deriv2


def periodic_spline(x, y):
    """Second derivatives of the periodic cubic spline (y[0] must equal y[-1])."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(x)
    if n < 3:
        return np.zeros(n)
    h = np.diff(x)
    m = n - 1  # unique points
    A = np.zeros((m, m))
    d = np.zeros(m)
    for i in range(m):
        hm = h[i - 1] if i > 0 else h[m - 1]
        hp = h[i]
        im = (i - 1) % m
        ip = (i + 1) % m
        A[i, im] += hm
        A[i, i] += 2.0 * (hm + hp)
        A[i, ip] += hp
        ym = y[im] if i > 0 else y[m - 1]
        d[i] = 6.0 * ((y[ip] - y[i]) / hp - (y[i] - ym) / hm)
    sol = np.linalg.solve(A, d)
    deriv2 = np.zeros(n)
    deriv2[:m] = sol
    deriv2[m] = sol[0]
    return deriv2


def _solve_tridiag(a, b, c, d):
    n = len(d)
    cp = np.zeros(n)
    dp = np.zeros(n)
    cp[0] = c[0] / b[0]
    dp[0] = d[0] / b[0]
    for i in range(1, n):
        mdiv = b[i] - a[i] * cp[i - 1]
        cp[i] = c[i] / mdiv
        dp[i] = (d[i] - a[i] * dp[i - 1]) / mdiv
    x = np.zeros(n)
    x[-1] = dp[-1]
    for i in range(n - 2, -1, -1):
        x[i] = dp[i] - cp[i] * x[i + 1]
    return x


def spline_first_derivatives(x, y, deriv2):
    """First derivative of the cubic spline at every knot."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    n = len(x)
    d1 = np.zeros(n)
    for i in range(n - 1):
        h = x[i + 1] - x[i]
        d1[i] = (y[i + 1] - y[i]) / h - h * (2.0 * deriv2[i] + deriv2[i + 1]) / 6.0
    h = x[n - 1] - x[n - 2]
    d1[n - 1] = (y[n - 1] - y[n - 2]) / h + h * (deriv2[n - 2] + 2.0 * deriv2[n - 1]) / 6.0
    return d1


def _bicubic_solver_matrix():
    """Inverse of the constraint matrix mapping bicubic coefficients
    c[i][j] (f(t,u) = sum c_ij t^i u^j over a unit cell) to the 16 constraints
    [f, ft, fu, ftu] at the 4 corners (0,0),(1,0),(1,1),(0,1).
    Built numerically instead of hand-typing the Numerical Recipes table."""
    corners = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)]
    A = np.zeros((16, 16))

    def mono(i, t):
        return t ** i if i > 0 else 1.0

    def dmono(i, t):
        return i * t ** (i - 1) if i >= 2 else (1.0 if i == 1 else 0.0)

    row = 0
    for kind in range(4):  # f, ft, fu, ftu — grouped like the NR layout
        for (t, ucoord) in corners:
            for i in range(4):
                for j in range(4):
                    col = 4 * i + j
                    if kind == 0:
                        A[row, col] = mono(i, t) * mono(j, ucoord)
                    elif kind == 1:
                        A[row, col] = dmono(i, t) * mono(j, ucoord)
                    elif kind == 2:
                        A[row, col] = mono(i, t) * dmono(j, ucoord)
                    else:
                        A[row, col] = dmono(i, t) * dmono(j, ucoord)
            row += 1
    return np.linalg.inv(A)


_BICUBIC_INV = _bicubic_solver_matrix()


def bicubic_coefficients_periodic(grid):
    """Per-cell bicubic coefficients (size, size, 4, 4) for a doubly periodic
    square grid of values with unit cell spacing (rescale at evaluation time).

    grid[i, j] = f(x_i, y_j), periodic with period `size` in both axes.
    Derivatives are obtained by periodic cubic spline fits along each axis, the
    same scheme as CMAPTorsionForceImpl::calcMapDerivatives
    (openmmapi/src/CMAPTorsionForceImpl.cpp).
    """
    grid = np.asarray(grid, dtype=np.float64)
    size = grid.shape[0]
    xs = np.arange(size + 1, dtype=np.float64)

    def periodic_d1(values_2d, axis):
        out = np.zeros_like(values_2d)
        v = values_2d if axis == 0 else values_2d.T
        res = np.zeros_like(v)
        for k in range(v.shape[1]):
            col = np.concatenate([v[:, k], v[:1, k]])
            d2 = periodic_spline(xs, col)
            d1 = spline_first_derivatives(xs, col, d2)
            res[:, k] = d1[:size]
        out = res if axis == 0 else res.T
        return out

    fx = periodic_d1(grid, axis=0)
    fy = periodic_d1(grid, axis=1)
    fxy = periodic_d1(fy, axis=0)

    ip = (np.arange(size) + 1) % size

    # corner ordering: (i,j), (i+1,j), (i+1,j+1), (i,j+1)
    def corners(a):
        return np.stack([a, a[ip, :], a[ip][:, ip], a[:, ip]], axis=-1)

    vec = np.concatenate([corners(grid), corners(fx), corners(fy), corners(fxy)],
                         axis=-1)  # (size, size, 16) ordered [f, ft, fu, ftu] x corners
    coeffs = vec @ _BICUBIC_INV.T  # c = INV @ vec, batched
    return coeffs.reshape(size, size, 4, 4)


def bicubic_coefficients_from_derivatives(f, fx, fy, fxy):
    """Per-cell bicubic coefficients (nx-1, ny-1, 4, 4) given function values
    and partial derivatives at the grid nodes, all already expressed in
    cell-local units (fx multiplied by dx, etc.). Non-periodic: the last
    row/column only bound the final cells."""
    f = np.asarray(f, np.float64)
    nx, ny = f.shape

    def corners(a):
        return np.stack([a[:-1, :-1], a[1:, :-1], a[1:, 1:], a[:-1, 1:]],
                        axis=-1)

    vec = np.concatenate([corners(f), corners(fx), corners(fy),
                          corners(fxy)], axis=-1)   # (nx-1, ny-1, 16)
    coeffs = vec @ _BICUBIC_INV.T
    return coeffs.reshape(nx - 1, ny - 1, 4, 4)
