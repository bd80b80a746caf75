"""DrudeForce: charge-on-spring polarization + Thole-screened pairs.

Counterpart of the drude plugin (plugins/drude/openmmapi/include/openmm/
DrudeForce.h:90,135; kernel math per drudeParticleForce.cc — anisotropic
spring constants k1/k2/k3 from polarizability and aniso12/aniso34 exactly as
CommonDrudeKernels.cpp:114-128 — and drudePairForce.cc: four Thole-screened
Coulomb terms per screened pair with S(u) = 1-(1+u/2)exp(-u)).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..constants import ONE_4PI_EPS0
from ..exceptions import OpenMMException
from ..ops import geometry as geom
from .base import CompiledForce, Force

_NM = u.nanometer


class DrudeForce(Force):
    def __init__(self):
        super().__init__()
        # (particle, particle1, particle2, particle3, particle4,
        #  charge, polarizability, aniso12, aniso34)
        self._particles = []
        self._screened_pairs = []  # (particle1, particle2, thole)
        self._periodic = False

    def getNumParticles(self):
        return len(self._particles)

    def addParticle(self, particle, particle1, particle2, particle3,
                    particle4, charge, polarizability, aniso12, aniso34):
        self._particles.append((
            int(particle), int(particle1), int(particle2), int(particle3),
            int(particle4), float(u.strip(charge, u.elementary_charge)),
            float(u.strip(polarizability, _NM ** 3)),
            float(aniso12), float(aniso34)))
        return len(self._particles) - 1

    def getParticleParameters(self, index):
        return self._particles[index]

    def setParticleParameters(self, index, particle, particle1, particle2,
                              particle3, particle4, charge, polarizability,
                              aniso12, aniso34):
        self._particles[index] = (
            int(particle), int(particle1), int(particle2), int(particle3),
            int(particle4), float(u.strip(charge, u.elementary_charge)),
            float(u.strip(polarizability, _NM ** 3)),
            float(aniso12), float(aniso34))

    def getNumScreenedPairs(self):
        return len(self._screened_pairs)

    def addScreenedPair(self, particle1, particle2, thole):
        self._screened_pairs.append((int(particle1), int(particle2),
                                     float(thole)))
        return len(self._screened_pairs) - 1

    def getScreenedPairParameters(self, index):
        return self._screened_pairs[index]

    def setScreenedPairParameters(self, index, particle1, particle2, thole):
        self._screened_pairs[index] = (int(particle1), int(particle2),
                                       float(thole))

    def setUsesPeriodicBoundaryConditions(self, periodic):
        self._periodic = bool(periodic)

    def usesPeriodicBoundaryConditions(self):
        return self._periodic

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        return [(p[0], p[1]) for p in self._particles]

    def _drude_pairs(self):
        """(drude, parent) index pairs — used by the Drude integrators."""
        return [(p[0], p[1]) for p in self._particles]

    def _pack_params(self, cfg):
        n = len(self._particles)
        k123 = np.zeros((n, 3))
        for i, p in enumerate(self._particles):
            (_, _, p2, p3, p4, charge, alpha, aniso12, aniso34) = p
            a1 = 1.0 if p2 == -1 else aniso12
            a2 = 1.0 if (p3 == -1 or p4 == -1) else aniso34
            a3 = 3.0 - a1 - a2
            k3 = ONE_4PI_EPS0 * charge * charge / (alpha * a3)
            k1 = ONE_4PI_EPS0 * charge * charge / (alpha * a1) - k3
            k2 = ONE_4PI_EPS0 * charge * charge / (alpha * a2) - k3
            if p2 == -1:
                k1 = 0.0
            if p3 == -1 or p4 == -1:
                k2 = 0.0
            k123[i] = (k1, k2, k3)
        m = len(self._screened_pairs)
        sp = np.zeros((m, 2))
        for j, (s1, s2, thole) in enumerate(self._screened_pairs):
            p_a = self._particles[s1]
            p_b = self._particles[s2]
            sp[j, 0] = thole / (p_a[6] * p_b[6]) ** (1.0 / 6.0)
            sp[j, 1] = ONE_4PI_EPS0 * p_a[5] * p_b[5]
        return {"k": jnp.asarray(k123.astype(cfg.dtype)),
                "sp": jnp.asarray(sp.astype(cfg.dtype))}

    def _compile(self, system, cfg):
        n = len(self._particles)
        params = self._pack_params(cfg)
        periodic = self._periodic
        accum = cfg.accum_dtype
        if n:
            arr = np.asarray([p[:5] for p in self._particles], np.int32)
            # -1 anisotropy partners collapse to the parent (k is zeroed)
            idx = np.where(arr < 0, arr[:, 1:2], arr)
            idx_j = jnp.asarray(idx)
        if self._screened_pairs:
            sp_atoms = np.asarray(
                [(self._particles[s1][0], self._particles[s1][1],
                  self._particles[s2][0], self._particles[s2][1])
                 for (s1, s2, _) in self._screened_pairs], np.int32)
            sp_idx = jnp.asarray(sp_atoms)
        n_sp = len(self._screened_pairs)

        def energy_fn(pos, box, p, gp):
            b = box if periodic else None
            e = jnp.zeros((), accum)
            if n:
                r_d = pos[idx_j[:, 0]]   # drude
                r_p = pos[idx_j[:, 1]]   # parent
                delta = geom.delta(r_d, r_p, b)
                r2 = jnp.sum(delta * delta, -1)
                e = e + jnp.sum((0.5 * p["k"][:, 2] * r2).astype(accum))
                # anisotropic terms along (p2-p3) and (p4-p5) directions
                dir1 = geom.delta(pos[idx_j[:, 1]], pos[idx_j[:, 2]], b)
                dir1 = dir1 / geom.distance(dir1)[:, None]
                rp1 = jnp.sum(dir1 * delta, -1)
                e = e + jnp.sum((0.5 * p["k"][:, 0] * rp1 * rp1).astype(accum))
                dir2 = geom.delta(pos[idx_j[:, 3]], pos[idx_j[:, 4]], b)
                dir2 = dir2 / geom.distance(dir2)[:, None]
                rp2 = jnp.sum(dir2 * delta, -1)
                e = e + jnp.sum((0.5 * p["k"][:, 1] * rp2 * rp2).astype(accum))
            if n_sp:
                uscale = p["sp"][:, 0]
                qq = p["sp"][:, 1]

                def screened(i_col, j_col, sign):
                    d = geom.delta(pos[sp_idx[:, i_col]],
                                   pos[sp_idx[:, j_col]], b)
                    r = geom.distance(d)
                    uu = uscale * r
                    s = 1.0 - (1.0 + 0.5 * uu) * jnp.exp(-uu)
                    return jnp.sum((sign * qq * s / r).astype(accum))

                e = e + screened(0, 2, 1.0)    # drude1-drude2
                e = e + screened(0, 3, -1.0)   # drude1-parent2
                e = e + screened(1, 2, -1.0)   # parent1-drude2
                e = e + screened(1, 3, 1.0)    # parent1-parent2
            return e

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()))
