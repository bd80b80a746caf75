"""GayBerneForce: anisotropic ellipsoidal LJ with particle body frames.

Math per the reference theory manual (02_standard_forces.rst GayBerneForce
section, Everaers & Ejtehadi 2003): E = U_r * eta_12 * chi_12 with
sigma_12 from the Gaussian-overlap closest-approach distance; API per
openmmapi/include/openmm/GayBerneForce.h (frames from xparticle/yparticle,
Lorentz-Berthelot combining, exceptions replace pair terms).

Reduces exactly to LJ for spherical particles (sx=sy=sz=sigma, e*=1), which
the tests exploit as an oracle. Implemented as a dense row-chunked N^2 sweep
with batched 3x3 linear algebra (adjugate inverses, no LU).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..exceptions import OpenMMException
from ..ops import geometry as geom
from .base import CompiledForce, Force

_NM = u.nanometer
_E = u.kilojoule_per_mole


def _inv3(M):
    """Batched closed-form 3x3 inverse (adjugate)."""
    a = M[..., 0, 0]; b = M[..., 0, 1]; c = M[..., 0, 2]  # noqa: E702
    d = M[..., 1, 0]; e = M[..., 1, 1]; f = M[..., 1, 2]  # noqa: E702
    g = M[..., 2, 0]; h = M[..., 2, 1]; i = M[..., 2, 2]  # noqa: E702
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d  # noqa: E741
    det = a * A + b * D + c * G
    inv_det = 1.0 / det
    row0 = jnp.stack([A, B, C], -1)
    row1 = jnp.stack([D, E, F], -1)
    row2 = jnp.stack([G, H, I], -1)
    return jnp.stack([row0, row1, row2], -2) * inv_det[..., None, None], det


class GayBerneForce(Force):
    NoCutoff = 0
    CutoffNonPeriodic = 1
    CutoffPeriodic = 2

    def __init__(self):
        super().__init__()
        self._particles = []   # (sigma, eps, xp, yp, sx, sy, sz, ex, ey, ez)
        self._exceptions = []  # (p1, p2, sigma, epsilon)
        self._exception_index = {}
        self._method = GayBerneForce.NoCutoff
        self._cutoff = 1.0
        self._switching = False
        self._switch_dist = -1.0

    def getNumParticles(self):
        return len(self._particles)

    def addParticle(self, sigma, epsilon, xparticle, yparticle, sx, sy, sz,
                    ex, ey, ez):
        self._particles.append((
            float(u.strip(sigma, _NM)), float(u.strip(epsilon, _E)),
            int(xparticle), int(yparticle),
            float(u.strip(sx, _NM)), float(u.strip(sy, _NM)),
            float(u.strip(sz, _NM)), float(ex), float(ey), float(ez)))
        return len(self._particles) - 1

    def getParticleParameters(self, index):
        return self._particles[index]

    def setParticleParameters(self, index, sigma, epsilon, xparticle,
                              yparticle, sx, sy, sz, ex, ey, ez):
        self._particles[index] = (
            float(u.strip(sigma, _NM)), float(u.strip(epsilon, _E)),
            int(xparticle), int(yparticle),
            float(u.strip(sx, _NM)), float(u.strip(sy, _NM)),
            float(u.strip(sz, _NM)), float(ex), float(ey), float(ez))

    def getNumExceptions(self):
        return len(self._exceptions)

    def addException(self, particle1, particle2, sigma, epsilon,
                     replace=False):
        key = (min(particle1, particle2), max(particle1, particle2))
        if key in self._exception_index and not replace:
            raise OpenMMException("GayBerneForce: duplicate exception")
        entry = (int(particle1), int(particle2),
                 float(u.strip(sigma, _NM)), float(u.strip(epsilon, _E)))
        if key in self._exception_index:
            self._exceptions[self._exception_index[key]] = entry
            return self._exception_index[key]
        self._exceptions.append(entry)
        self._exception_index[key] = len(self._exceptions) - 1
        return len(self._exceptions) - 1

    def getExceptionParameters(self, index):
        return self._exceptions[index]

    def setExceptionParameters(self, index, particle1, particle2, sigma,
                               epsilon):
        self._exceptions[index] = (int(particle1), int(particle2),
                                   float(u.strip(sigma, _NM)),
                                   float(u.strip(epsilon, _E)))

    def getNonbondedMethod(self):
        return self._method

    def setNonbondedMethod(self, method):
        self._method = int(method)

    def getCutoffDistance(self):
        return u.Quantity(self._cutoff, _NM)

    def setCutoffDistance(self, distance):
        self._cutoff = float(u.strip(distance, _NM))

    def getUseSwitchingFunction(self):
        return self._switching

    def setUseSwitchingFunction(self, use):
        self._switching = bool(use)

    def getSwitchingDistance(self):
        return u.Quantity(self._switch_dist, _NM)

    def setSwitchingDistance(self, distance):
        self._switch_dist = float(u.strip(distance, _NM))

    def usesPeriodicBoundaryConditions(self):
        return self._method == GayBerneForce.CutoffPeriodic

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _pack_params(self, cfg):
        arr = (np.asarray([(p[0], p[1], *p[4:]) for p in self._particles],
                          np.float64)
               if self._particles else np.zeros((0, 8), np.float64))
        return {"sigma": jnp.asarray(arr[:, 0].astype(cfg.dtype)),
                "epsilon": jnp.asarray(arr[:, 1].astype(cfg.dtype)),
                "radii": jnp.asarray((arr[:, 2:5] * 0.5).astype(cfg.dtype)),
                "escale": jnp.asarray(arr[:, 5:8].astype(cfg.dtype))}

    def _compile(self, system, cfg):
        n = cfg.n_particles
        if len(self._particles) != n:
            raise OpenMMException(
                "GayBerneForce must have same particle count as the System")
        dtype = cfg.dtype
        accum = cfg.accum_dtype
        periodic = self._method == GayBerneForce.CutoffPeriodic
        use_cutoff = self._method != GayBerneForce.NoCutoff
        cutoff = self._cutoff
        use_switch = self._switching and use_cutoff
        rs = self._switch_dist
        params = self._pack_params(cfg)
        xp = jnp.asarray(np.asarray([p[2] for p in self._particles], np.int32))
        yp = jnp.asarray(np.asarray([p[3] for p in self._particles], np.int32))
        has_x = jnp.asarray(np.asarray(
            [p[2] >= 0 for p in self._particles], bool))
        has_y = jnp.asarray(np.asarray(
            [p[3] >= 0 for p in self._particles], bool))
        # exceptions: mask those pairs out of the N^2 sum, add explicitly
        exc_mask_np = np.zeros((n, n), bool)
        for (p1, p2, sig, eps) in self._exceptions:
            exc_mask_np[p1, p2] = exc_mask_np[p2, p1] = True
        exc_mask = jnp.asarray(exc_mask_np)
        exc_idx = (np.asarray([(e[0], e[1]) for e in self._exceptions],
                              np.int32) if self._exceptions
                   else np.zeros((0, 2), np.int32))
        exc_par = (np.asarray([(e[2], e[3]) for e in self._exceptions],
                              np.float64) if self._exceptions
                   else np.zeros((0, 2), np.float64))
        exc_idx_j = jnp.asarray(exc_idx)
        exc_sig = jnp.asarray(exc_par[:, 0].astype(dtype))
        exc_eps = jnp.asarray(exc_par[:, 1].astype(dtype))

        def safe_unit(v, valid):
            """Normalize v where valid; NaN-safe under reverse-mode (zero
            vectors in the untaken branch must not poison gradients)."""
            s = jnp.sum(v * v, -1, keepdims=True)
            s = jnp.where(valid, s, 1.0)
            return jnp.where(valid, v, 0.0) / jnp.sqrt(jnp.maximum(s, 1e-20))

        def frames(pos):
            """(N,3,3) rotation matrices A (rows = body axes in lab frame)."""
            xdir = pos[jnp.maximum(xp, 0)] - pos
            ex_ax = jnp.where(has_x[:, None],
                              safe_unit(xdir, has_x[:, None]),
                              jnp.array([1.0, 0.0, 0.0], dtype))
            ydir = pos[jnp.maximum(yp, 0)] - pos
            ydir = ydir - ex_ax * jnp.sum(ydir * ex_ax, -1, keepdims=True)
            # arbitrary perpendicular when yparticle == -1
            alt = jnp.cross(ex_ax, jnp.array([0.0, 0.0, 1.0], dtype))
            alt2 = jnp.cross(ex_ax, jnp.array([0.0, 1.0, 0.0], dtype))
            big = jnp.sum(alt * alt, -1, keepdims=True) > 0.01
            alt = jnp.where(big, alt, alt2)
            alt = safe_unit(alt, jnp.ones_like(big))
            ey_ax = jnp.where(has_y[:, None],
                              safe_unit(ydir, has_y[:, None]), alt)
            ez_ax = jnp.cross(ex_ax, ey_ax)
            return jnp.stack([ex_ax, ey_ax, ez_ax], axis=-2)  # (N,3,3)

        def pair_energy(pos, box, p, gp, pairs_i, pairs_j, sig_ij, eps_ij):
            """Gay-Berne energy for explicit index pairs (M,)."""
            A = frames(pos)
            r12 = pos[pairs_j] - pos[pairs_i]
            if periodic:
                r12 = geom.periodic_delta(r12, box)
            r = jnp.sqrt(jnp.sum(r12 * r12, -1) + 1e-30)
            rhat = r12 / r[:, None]
            radii = p["radii"]
            S2_1 = radii[pairs_i] ** 2            # (M,3)
            S2_2 = radii[pairs_j] ** 2
            A1 = A[pairs_i]                        # (M,3,3) rows=axes
            A2 = A[pairs_j]
            # G = A^T S^2 A summed
            G = (jnp.einsum("mia,mi,mib->mab", A1, S2_1, A1)
                 + jnp.einsum("mia,mi,mib->mab", A2, S2_2, A2))
            Ginv, detG = _inv3(G)
            quad = jnp.einsum("ma,mab,mb->m", rhat, Ginv, rhat)
            sigma12 = 1.0 / jnp.sqrt(jnp.maximum(0.5 * quad, 1e-12))
            h = r - sigma12
            frac = sig_ij / (h + sig_ij)
            f6 = frac ** 6
            ur = 4.0 * eps_ij * f6 * (f6 - 1.0)
            # eta
            rr1 = radii[pairs_i]
            rr2 = radii[pairs_j]
            s1 = (rr1[:, 0] * rr1[:, 1] + rr1[:, 2] ** 2) \
                * jnp.sqrt(rr1[:, 0] * rr1[:, 1])
            s2 = (rr2[:, 0] * rr2[:, 1] + rr2[:, 2] ** 2) \
                * jnp.sqrt(rr2[:, 0] * rr2[:, 1])
            eta = jnp.sqrt(2.0 * s1 * s2 / jnp.maximum(detG, 1e-30))
            # chi
            einv = 1.0 / jnp.sqrt(p["escale"])
            B = (jnp.einsum("mia,mi,mib->mab", A1, einv[pairs_i], A1)
                 + jnp.einsum("mia,mi,mib->mab", A2, einv[pairs_j], A2))
            Binv, _ = _inv3(B)
            chi = (2.0 * jnp.einsum("ma,mab,mb->m", rhat, Binv, rhat)) ** 2
            e = ur * eta * chi
            if use_switch:
                x = jnp.clip((r - rs) / (cutoff - rs), 0.0, 1.0)
                sw = 1.0 - x ** 3 * (10.0 - 15.0 * x + 6.0 * x * x)
                e = e * sw
            if use_cutoff:
                e = jnp.where(r < cutoff, e, 0.0)
            return e

        iu, ju = np.triu_indices(n, k=1)
        keep = ~exc_mask_np[iu, ju]
        iu, ju = iu[keep].astype(np.int32), ju[keep].astype(np.int32)
        iu_j = jnp.asarray(iu)
        ju_j = jnp.asarray(ju)

        def energy_fn(pos, box, p, gp):
            total = jnp.zeros((), accum)
            if len(iu):
                sig_ij = 0.5 * (p["sigma"][iu_j] + p["sigma"][ju_j])
                eps_ij = jnp.sqrt(p["epsilon"][iu_j] * p["epsilon"][ju_j])
                e = pair_energy(pos, box, p, gp, iu_j, ju_j, sig_ij, eps_ij)
                total = total + jnp.sum(e.astype(accum))
            if exc_idx_j.shape[0]:
                e = pair_energy(pos, box, p, gp, exc_idx_j[:, 0],
                                exc_idx_j[:, 1], exc_sig, exc_eps)
                total = total + jnp.sum(e.astype(accum))
            return total

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic)
