"""TabulatedFunction family: Continuous1D/2D/3D (cubic splines), Discrete1D/2D/3D.

API mirrors openmmapi/include/openmm/TabulatedFunction.h:78-348 with spline
math per openmmapi/src/SplineFitter.cpp; out-of-range evaluation returns 0
and periodic tables wrap, matching ReferenceTabulatedFunction.cpp. Each class
compiles to a pure jnp callable used inside custom-force expressions; all
derivative bookkeeping is left to jax.grad.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import unit as u
from .exceptions import OpenMMException
from .utils.splines import (natural_spline, periodic_spline,
                            spline_first_derivatives, _BICUBIC_INV)


def _spline_d2(x, y, periodic):
    return periodic_spline(x, y) if periodic else natural_spline(x, y)


class TabulatedFunction(object):
    def getPeriodic(self):
        return getattr(self, "_periodic", False)

    def getUpdateCount(self):
        return getattr(self, "_update_count", 0)


class Continuous1DFunction(TabulatedFunction):
    def __init__(self, values, min, max, periodic=False):  # noqa: A002
        values = [float(v) for v in u.strip(values)]
        if len(values) < 2:
            raise OpenMMException("Continuous1DFunction needs >= 2 values")
        if periodic and abs(values[0] - values[-1]) > 1e-10:
            raise OpenMMException("periodic function must have matching endpoints")
        self._values = values
        self._min = float(u.strip(min))
        self._max = float(u.strip(max))
        self._periodic = bool(periodic)
        self._update_count = 0

    def getFunctionParameters(self):
        return list(self._values), self._min, self._max

    def setFunctionParameters(self, values, min, max):  # noqa: A002
        self._values = [float(v) for v in u.strip(values)]
        self._min = float(u.strip(min))
        self._max = float(u.strip(max))
        self._update_count += 1

    def Copy(self):
        return Continuous1DFunction(self._values, self._min, self._max,
                                    self._periodic)

    def _make_eval(self, dtype):
        y = np.asarray(self._values, np.float64)
        n = len(y)
        xs = np.linspace(self._min, self._max, n)
        d2 = _spline_d2(xs, y, self._periodic)
        h = (self._max - self._min) / (n - 1)
        yj = jnp.asarray(y.astype(dtype))
        d2j = jnp.asarray(d2.astype(dtype))
        xmin, xmax = self._min, self._max
        periodic = self._periodic

        def fn(x):
            if periodic:
                x = xmin + jnp.mod(x - xmin, xmax - xmin)
            in_range = (x >= xmin) & (x <= xmax)
            xc = jnp.clip(x, xmin, xmax)
            idx = jnp.clip(((xc - xmin) / h).astype(jnp.int32), 0, n - 2)
            xl = xmin + idx * h
            a = (xl + h - xc) / h
            b = (xc - xl) / h
            val = (a * yj[idx] + b * yj[idx + 1]
                   + ((a ** 3 - a) * d2j[idx] + (b ** 3 - b) * d2j[idx + 1])
                   * (h * h) / 6.0)
            return jnp.where(in_range, val, 0.0)

        return fn


class Continuous2DFunction(TabulatedFunction):
    def __init__(self, xsize, ysize, values, xmin, xmax, ymin, ymax,
                 periodic=False):
        values = [float(v) for v in u.strip(values)]
        if len(values) != xsize * ysize:
            raise OpenMMException("values must have xsize*ysize elements")
        self._xsize, self._ysize = int(xsize), int(ysize)
        self._values = values
        self._xmin, self._xmax = float(u.strip(xmin)), float(u.strip(xmax))
        self._ymin, self._ymax = float(u.strip(ymin)), float(u.strip(ymax))
        self._periodic = bool(periodic)
        self._update_count = 0

    def getFunctionParameters(self):
        return (self._xsize, self._ysize, list(self._values), self._xmin,
                self._xmax, self._ymin, self._ymax)

    def setFunctionParameters(self, xsize, ysize, values, xmin, xmax, ymin, ymax):
        self.__init__(xsize, ysize, values, xmin, xmax, ymin, ymax,
                      self._periodic)
        self._update_count += 1

    def Copy(self):
        return Continuous2DFunction(self._xsize, self._ysize, self._values,
                                    self._xmin, self._xmax, self._ymin,
                                    self._ymax, self._periodic)

    def _coefficients(self):
        """(nx-1, ny-1, 4, 4) bicubic coefficients in cell-local t,u in [0,1].
        values[i + xsize*j] = f(x_i, y_j)."""
        nx, ny = self._xsize, self._ysize
        g = np.asarray(self._values, np.float64).reshape(nx, ny, order="F")
        xs = np.arange(nx, dtype=np.float64)
        ys = np.arange(ny, dtype=np.float64)
        per = self._periodic

        def d1_axis(a, axis):
            v = a if axis == 0 else a.T
            grid = xs if axis == 0 else ys
            out = np.zeros_like(v)
            for k in range(v.shape[1]):
                d2 = _spline_d2(grid, v[:, k], per)
                out[:, k] = spline_first_derivatives(grid, v[:, k], d2)
            return out if axis == 0 else out.T

        fx = d1_axis(g, 0)
        fy = d1_axis(g, 1)
        fxy = d1_axis(fy, 0)

        def corners(a):
            return np.stack([a[:-1, :-1], a[1:, :-1], a[1:, 1:], a[:-1, 1:]],
                            axis=-1)

        vec = np.concatenate([corners(g), corners(fx), corners(fy),
                              corners(fxy)], axis=-1)
        coeffs = vec @ _BICUBIC_INV.T
        return coeffs.reshape(nx - 1, ny - 1, 4, 4)

    def _make_eval(self, dtype):
        nx, ny = self._xsize, self._ysize
        C = jnp.asarray(self._coefficients().astype(dtype))
        xmin, xmax, ymin, ymax = self._xmin, self._xmax, self._ymin, self._ymax
        hx = (xmax - xmin) / (nx - 1)
        hy = (ymax - ymin) / (ny - 1)
        periodic = self._periodic

        def fn(x, y):
            if periodic:
                x = xmin + jnp.mod(x - xmin, xmax - xmin)
                y = ymin + jnp.mod(y - ymin, ymax - ymin)
            in_range = (x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
            xc = jnp.clip(x, xmin, xmax)
            yc = jnp.clip(y, ymin, ymax)
            i = jnp.clip(((xc - xmin) / hx).astype(jnp.int32), 0, nx - 2)
            j = jnp.clip(((yc - ymin) / hy).astype(jnp.int32), 0, ny - 2)
            t = (xc - xmin) / hx - i
            v = (yc - ymin) / hy - j
            c = C[i, j]
            ta = jnp.stack([jnp.ones_like(t), t, t * t, t ** 3], -1)
            tb = jnp.stack([jnp.ones_like(v), v, v * v, v ** 3], -1)
            val = jnp.einsum("...a,...ab,...b->...", ta, c, tb)
            return jnp.where(in_range, val, 0.0)

        return fn


def _tricubic_solver_matrix():
    corners = [(i, j, k) for k in (0.0, 1.0) for j in (0.0, 1.0)
               for i in (0.0, 1.0)]

    def mono(i, t):
        return t ** i if i > 0 else 1.0

    def dmono(i, t):
        return i * t ** (i - 1) if i >= 2 else (1.0 if i == 1 else 0.0)

    A = np.zeros((64, 64))
    row = 0
    # constraint kinds: f, fx, fy, fz, fxy, fxz, fyz, fxyz
    kinds = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
             (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
    for dx, dy, dz in kinds:
        for (t, v, w) in corners:
            for i in range(4):
                for j in range(4):
                    for k in range(4):
                        col = 16 * i + 4 * j + k
                        fi = dmono(i, t) if dx else mono(i, t)
                        fj = dmono(j, v) if dy else mono(j, v)
                        fk = dmono(k, w) if dz else mono(k, w)
                        A[row, col] = fi * fj * fk
            row += 1
    return np.linalg.inv(A)


_TRICUBIC_INV = None


class Continuous3DFunction(TabulatedFunction):
    def __init__(self, xsize, ysize, zsize, values, xmin, xmax, ymin, ymax,
                 zmin, zmax, periodic=False):
        values = [float(v) for v in u.strip(values)]
        if len(values) != xsize * ysize * zsize:
            raise OpenMMException("values must have xsize*ysize*zsize elements")
        self._sizes = (int(xsize), int(ysize), int(zsize))
        self._values = values
        self._lims = (float(u.strip(xmin)), float(u.strip(xmax)),
                      float(u.strip(ymin)), float(u.strip(ymax)),
                      float(u.strip(zmin)), float(u.strip(zmax)))
        self._periodic = bool(periodic)
        self._update_count = 0

    def getFunctionParameters(self):
        return (*self._sizes, list(self._values), *self._lims)

    def setFunctionParameters(self, xsize, ysize, zsize, values, xmin, xmax,
                              ymin, ymax, zmin, zmax):
        self.__init__(xsize, ysize, zsize, values, xmin, xmax, ymin, ymax,
                      zmin, zmax, self._periodic)
        self._update_count += 1

    def Copy(self):
        return Continuous3DFunction(*self._sizes, self._values, *self._lims,
                                    self._periodic)

    def _make_eval(self, dtype):
        global _TRICUBIC_INV
        if _TRICUBIC_INV is None:
            _TRICUBIC_INV = _tricubic_solver_matrix()
        nx, ny, nz = self._sizes
        g = np.asarray(self._values, np.float64).reshape(nx, ny, nz, order="F")
        per = self._periodic

        def d1(a, axis):
            grid = np.arange(a.shape[axis], dtype=np.float64)
            moved = np.moveaxis(a, axis, 0)
            out = np.zeros_like(moved)
            flat = moved.reshape(moved.shape[0], -1)
            oflat = out.reshape(out.shape[0], -1)
            for k in range(flat.shape[1]):
                d2 = _spline_d2(grid, flat[:, k], per)
                oflat[:, k] = spline_first_derivatives(grid, flat[:, k], d2)
            return np.moveaxis(oflat.reshape(moved.shape), 0, axis)

        fx = d1(g, 0)
        fy = d1(g, 1)
        fz = d1(g, 2)
        fxy = d1(fy, 0)
        fxz = d1(fz, 0)
        fyz = d1(fz, 1)
        fxyz = d1(fyz, 0)

        # corner ordering must match _tricubic_solver_matrix: (i,j,k) loops
        # k-major over (0,1)^3 => order (0,0,0),(1,0,0),(0,1,0),(1,1,0),
        # (0,0,1),(1,0,1),(0,1,1),(1,1,1)
        def corners_ordered(a):
            return np.stack([
                a[:-1, :-1, :-1], a[1:, :-1, :-1], a[:-1, 1:, :-1],
                a[1:, 1:, :-1], a[:-1, :-1, 1:], a[1:, :-1, 1:],
                a[:-1, 1:, 1:], a[1:, 1:, 1:]], axis=-1)

        vec = np.concatenate([corners_ordered(v) for v in
                              (g, fx, fy, fz, fxy, fxz, fyz, fxyz)], axis=-1)
        coeffs = (vec @ _TRICUBIC_INV.T).reshape(nx - 1, ny - 1, nz - 1, 4, 4, 4)
        C = jnp.asarray(coeffs.astype(dtype))
        xmin, xmax, ymin, ymax, zmin, zmax = self._lims
        hx = (xmax - xmin) / (nx - 1)
        hy = (ymax - ymin) / (ny - 1)
        hz = (zmax - zmin) / (nz - 1)

        def fn(x, y, z):
            if per:
                x = xmin + jnp.mod(x - xmin, xmax - xmin)
                y = ymin + jnp.mod(y - ymin, ymax - ymin)
                z = zmin + jnp.mod(z - zmin, zmax - zmin)
            in_range = ((x >= xmin) & (x <= xmax) & (y >= ymin) & (y <= ymax)
                        & (z >= zmin) & (z <= zmax))
            xc = jnp.clip(x, xmin, xmax)
            yc = jnp.clip(y, ymin, ymax)
            zc = jnp.clip(z, zmin, zmax)
            i = jnp.clip(((xc - xmin) / hx).astype(jnp.int32), 0, nx - 2)
            j = jnp.clip(((yc - ymin) / hy).astype(jnp.int32), 0, ny - 2)
            k = jnp.clip(((zc - zmin) / hz).astype(jnp.int32), 0, nz - 2)
            t = (xc - xmin) / hx - i
            v = (yc - ymin) / hy - j
            w = (zc - zmin) / hz - k
            c = C[i, j, k]
            ta = jnp.stack([jnp.ones_like(t), t, t * t, t ** 3], -1)
            tb = jnp.stack([jnp.ones_like(v), v, v * v, v ** 3], -1)
            tc = jnp.stack([jnp.ones_like(w), w, w * w, w ** 3], -1)
            val = jnp.einsum("...a,...abc,...b,...c->...", ta, c, tb, tc)
            return jnp.where(in_range, val, 0.0)

        return fn


class Discrete1DFunction(TabulatedFunction):
    def __init__(self, values):
        self._values = [float(v) for v in u.strip(values)]
        self._update_count = 0

    def getFunctionParameters(self):
        return list(self._values)

    def setFunctionParameters(self, values):
        self._values = [float(v) for v in u.strip(values)]
        self._update_count += 1

    def Copy(self):
        return Discrete1DFunction(self._values)

    def _make_eval(self, dtype):
        vals = jnp.asarray(np.asarray(self._values, np.float64).astype(dtype))
        n = len(self._values)

        def fn(x):
            idx = jnp.clip(jnp.round(x).astype(jnp.int32), 0, n - 1)
            return vals[idx]

        return fn


class Discrete2DFunction(TabulatedFunction):
    def __init__(self, xsize, ysize, values):
        values = [float(v) for v in u.strip(values)]
        if len(values) != xsize * ysize:
            raise OpenMMException("values must have xsize*ysize elements")
        self._xsize, self._ysize = int(xsize), int(ysize)
        self._values = values
        self._update_count = 0

    def getFunctionParameters(self):
        return self._xsize, self._ysize, list(self._values)

    def setFunctionParameters(self, xsize, ysize, values):
        self.__init__(xsize, ysize, values)
        self._update_count += 1

    def Copy(self):
        return Discrete2DFunction(self._xsize, self._ysize, self._values)

    def _make_eval(self, dtype):
        nx, ny = self._xsize, self._ysize
        vals = jnp.asarray(np.asarray(self._values, np.float64)
                           .reshape(nx, ny, order="F").astype(dtype))

        def fn(x, y):
            i = jnp.clip(jnp.round(x).astype(jnp.int32), 0, nx - 1)
            j = jnp.clip(jnp.round(y).astype(jnp.int32), 0, ny - 1)
            return vals[i, j]

        return fn


class Discrete3DFunction(TabulatedFunction):
    def __init__(self, xsize, ysize, zsize, values):
        values = [float(v) for v in u.strip(values)]
        if len(values) != xsize * ysize * zsize:
            raise OpenMMException("values must have xsize*ysize*zsize elements")
        self._sizes = (int(xsize), int(ysize), int(zsize))
        self._values = values
        self._update_count = 0

    def getFunctionParameters(self):
        return (*self._sizes, list(self._values))

    def setFunctionParameters(self, xsize, ysize, zsize, values):
        self.__init__(xsize, ysize, zsize, values)
        self._update_count += 1

    def Copy(self):
        return Discrete3DFunction(*self._sizes, self._values)

    def _make_eval(self, dtype):
        nx, ny, nz = self._sizes
        vals = jnp.asarray(np.asarray(self._values, np.float64)
                           .reshape(nx, ny, nz, order="F").astype(dtype))

        def fn(x, y, z):
            i = jnp.clip(jnp.round(x).astype(jnp.int32), 0, nx - 1)
            j = jnp.clip(jnp.round(y).astype(jnp.int32), 0, ny - 1)
            k = jnp.clip(jnp.round(z).astype(jnp.int32), 0, nz - 1)
            return vals[i, j, k]

        return fn
