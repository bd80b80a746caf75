"""RMSDForce: energy as a function of the optimal-rotation RMSD to a
reference structure (RMSDForce.h; quaternion best-fit via the largest
eigenvalue of the 4x4 key matrix — the reference uses the jama eigensolver
and kernel rmsd.cc; here jnp.linalg.eigh, with forces from jax.grad through
the eigendecomposition).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..exceptions import OpenMMException
from .base import CompiledForce, Force


class RMSDForce(Force):
    def __init__(self, referencePositions, particles=()):
        super().__init__()
        self.setReferencePositions(referencePositions)
        self._particles = [int(p) for p in particles]

    def getReferencePositions(self):
        from ..vec3 import Vec3
        return u.Quantity([Vec3(*r) for r in self._ref], u.nanometer)

    def setReferencePositions(self, positions):
        pos = np.asarray(u.strip(positions, u.nanometer), np.float64)
        self._ref = pos

    def getParticles(self):
        return list(self._particles)

    def setParticles(self, particles):
        self._particles = [int(p) for p in particles]

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _pack_params(self, cfg):
        ref = self._ref
        if self._particles:
            ref = ref[np.asarray(self._particles)]
        ref = ref - ref.mean(axis=0)
        return {"ref": jnp.asarray(ref.astype(cfg.dtype))}

    def _compile(self, system, cfg):
        particles = self._particles or list(range(cfg.n_particles))
        idx = jnp.asarray(np.asarray(particles, np.int32))
        params = self._pack_params(cfg)
        m = len(particles)

        def energy_fn(pos, box, p, gp):
            x = pos[idx]
            x = x - jnp.mean(x, axis=0, keepdims=True)
            y = p["ref"]
            R = x.T @ y   # (3,3) correlation
            # quaternion key matrix (standard Kabsch/Kearsley formulation,
            # as in the reference's RMSD kernel rmsd.cc)
            F = jnp.array([
                [R[0, 0] + R[1, 1] + R[2, 2], R[1, 2] - R[2, 1],
                 R[2, 0] - R[0, 2], R[0, 1] - R[1, 0]],
                [R[1, 2] - R[2, 1], R[0, 0] - R[1, 1] - R[2, 2],
                 R[0, 1] + R[1, 0], R[0, 2] + R[2, 0]],
                [R[2, 0] - R[0, 2], R[0, 1] + R[1, 0],
                 -R[0, 0] + R[1, 1] - R[2, 2], R[1, 2] + R[2, 1]],
                [R[0, 1] - R[1, 0], R[0, 2] + R[2, 0], R[1, 2] + R[2, 1],
                 -R[0, 0] - R[1, 1] + R[2, 2]],
            ])
            evals = jnp.linalg.eigvalsh(F)
            lam = evals[-1]
            msd = (jnp.sum(x * x) + jnp.sum(y * y) - 2.0 * lam) / m
            msd = jnp.maximum(msd, 0.0)
            return jnp.sqrt(msd + 1e-30).astype(cfg.accum_dtype)

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn)
