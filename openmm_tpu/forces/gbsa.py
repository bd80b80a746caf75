"""GBSAOBCForce: OBC-II generalized Born implicit solvent + ACE surface area.

Math per ReferenceObc.cpp (Born radii via the HCT pairwise integral + OBC
tanh rescaling, ReferenceObc.cpp:130-215 with OBC-II constants alpha=1.0,
beta=0.8, gamma=4.85 and dielectricOffset=0.009; pair energy
q_i q_j / sqrt(r^2 + B_i B_j exp(-r^2/4B_iB_j)) with
preFactor = -ONE_4PI_EPS0 (1/eps_solute - 1/eps_solvent),
ReferenceObc.cpp:287-390; ACE term 4*pi*Esa*(R+probe)^2 (R/B)^6,
ReferenceObc.cpp:253-260).

TPU design: both N^2 passes run as row-chunked dense sweeps under lax.scan
with jax.checkpoint (same shape as ops/pairs.py); forces including the Born-
radius chain rule come from jax.grad — no hand-written obcChain pass.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..constants import ONE_4PI_EPS0
from ..ops import geometry as geom
from ..exceptions import OpenMMException
from .base import CompiledForce, Force

DIELECTRIC_OFFSET = 0.009
ALPHA_OBC = 1.0
BETA_OBC = 0.8
GAMMA_OBC = 4.85


class GBSAOBCForce(Force):
    NoCutoff = 0
    CutoffNonPeriodic = 1
    CutoffPeriodic = 2

    def __init__(self):
        super().__init__()
        self._particles = []   # (charge, radius, scalingFactor)
        self._solvent_dielectric = 78.3
        self._solute_dielectric = 1.0
        self._surface_energy = 28.3919551 / (4.0 * math.pi)
        self._method = GBSAOBCForce.NoCutoff
        self._cutoff = 1.0

    def getNumParticles(self):
        return len(self._particles)

    def addParticle(self, charge, radius, scalingFactor):
        self._particles.append((float(u.strip(charge, u.elementary_charge)),
                                float(u.strip(radius, u.nanometer)),
                                float(scalingFactor)))
        return len(self._particles) - 1

    def getParticleParameters(self, index):
        c, r, s = self._particles[index]
        return (u.Quantity(c, u.elementary_charge), u.Quantity(r, u.nanometer), s)

    def setParticleParameters(self, index, charge, radius, scalingFactor):
        self._particles[index] = (float(u.strip(charge, u.elementary_charge)),
                                  float(u.strip(radius, u.nanometer)),
                                  float(scalingFactor))

    def getSolventDielectric(self):
        return self._solvent_dielectric

    def setSolventDielectric(self, dielectric):
        self._solvent_dielectric = float(dielectric)

    def getSoluteDielectric(self):
        return self._solute_dielectric

    def setSoluteDielectric(self, dielectric):
        self._solute_dielectric = float(dielectric)

    def getSurfaceAreaEnergy(self):
        return u.Quantity(self._surface_energy,
                          u.kilojoule_per_mole / u.nanometer ** 2)

    def setSurfaceAreaEnergy(self, energy):
        self._surface_energy = float(
            u.strip(energy, u.kilojoule_per_mole / u.nanometer ** 2))

    def getNonbondedMethod(self):
        return self._method

    def setNonbondedMethod(self, method):
        self._method = int(method)

    def getCutoffDistance(self):
        return u.Quantity(self._cutoff, u.nanometer)

    def setCutoffDistance(self, distance):
        self._cutoff = float(u.strip(distance, u.nanometer))

    def usesPeriodicBoundaryConditions(self):
        return self._method == GBSAOBCForce.CutoffPeriodic

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _pack_params(self, cfg):
        arr = (np.asarray(self._particles, np.float64)
               if self._particles else np.zeros((0, 3), np.float64))
        return {"charge": jnp.asarray(arr[:, 0].astype(cfg.dtype)),
                "radius": jnp.asarray(arr[:, 1].astype(cfg.dtype)),
                "scale": jnp.asarray(arr[:, 2].astype(cfg.dtype))}

    def _compile(self, system, cfg):
        n = cfg.n_particles
        if len(self._particles) != n:
            raise OpenMMException(
                "GBSAOBCForce must have same particle count as the System")
        dtype = cfg.dtype
        accum = cfg.accum_dtype
        chunk = min(cfg.pair_block, max(1, n))
        n_pad = ((n + chunk - 1) // chunk) * chunk
        params = self._pack_params(cfg)
        periodic = self._method == GBSAOBCForce.CutoffPeriodic
        use_cutoff = self._method != GBSAOBCForce.NoCutoff
        cutoff = self._cutoff
        pre_factor = -ONE_4PI_EPS0 * (1.0 / self._solute_dielectric
                                      - 1.0 / self._solvent_dielectric)
        pi4asolv = 4.0 * math.pi * self._surface_energy

        def pad(x, fill=0.0):
            return jnp.full(n_pad, fill, dtype).at[:n].set(x)

        def energy_fn(pos, box, p, gp):
            charge = pad(p["charge"])
            radius = pad(p["radius"], 0.15)
            scale = pad(p["scale"])
            pos_pad = jnp.zeros((n_pad, 3), pos.dtype).at[:n].set(pos)
            valid = jnp.arange(n_pad, dtype=jnp.int32) < n
            offset_r = radius - DIELECTRIC_OFFSET
            scaled_r = offset_r * scale
            b = box if periodic else None

            # ---- pass 1: HCT integral sums -> Born radii -----------------
            def row_chunk(start):
                pos_i = jax.lax.dynamic_slice(pos_pad, (start, jnp.zeros((), start.dtype)), (chunk, 3))
                off_i = jax.lax.dynamic_slice_in_dim(offset_r, start, chunk)
                gi = start + jnp.arange(chunk, dtype=jnp.int32)
                dr = pos_i[:, None, :] - pos_pad[None, :, :]
                if b is not None:
                    dr = geom.periodic_delta(dr, b)
                r2 = jnp.sum(dr * dr, -1)
                mask = (gi[:, None] != jnp.arange(n_pad, dtype=jnp.int32)[None, :]) \
                    & valid[None, :] & (gi[:, None] < n)
                if use_cutoff:
                    mask = mask & (r2 < cutoff * cutoff)
                r = jnp.sqrt(jnp.where(mask, r2, 1.0))
                sr_j = scaled_r[None, :]
                r_sr = r + sr_j
                contributes = mask & (off_i[:, None] < r_sr)
                r_safe = jnp.where(contributes, r, 1.0)
                inv_r = 1.0 / r_safe
                l_ij = jnp.maximum(off_i[:, None], jnp.abs(r_safe - sr_j))
                l_ij = 1.0 / l_ij
                u_ij = 1.0 / jnp.where(contributes, r_sr, 1.0)
                l2 = l_ij * l_ij
                u2 = u_ij * u_ij
                term = (l_ij - u_ij + 0.25 * r_safe * (u2 - l2)
                        + 0.5 * inv_r * jnp.log(u_ij / l_ij)
                        + 0.25 * sr_j * sr_j * inv_r * (l2 - u2))
                inside = contributes & (off_i[:, None] < (sr_j - r_safe))
                term = term + jnp.where(
                    inside, 2.0 * (1.0 / off_i[:, None] - l_ij), 0.0)
                return jnp.sum(jnp.where(contributes, term, 0.0), axis=1)

            starts = jnp.arange(0, n_pad, chunk, dtype=jnp.int32)

            def scan_body(_, start):
                return None, jax.checkpoint(row_chunk)(start)

            _, sums = jax.lax.scan(scan_body, None, starts)
            hct_sum = sums.reshape(-1)

            psi = 0.5 * hct_sum * offset_r
            tanh_term = jnp.tanh(ALPHA_OBC * psi - BETA_OBC * psi * psi
                                 + GAMMA_OBC * psi ** 3)
            born = 1.0 / (1.0 / offset_r - tanh_term / radius)

            # ---- ACE surface-area term -----------------------------------
            ratio6 = (radius / born) ** 6
            sa = pi4asolv * (radius + 0.14) ** 2 * ratio6
            e_sa = jnp.sum(jnp.where(valid, sa, 0.0).astype(accum))

            # ---- pass 2: GB pair energy ----------------------------------
            qp = pre_factor * charge

            def row_chunk2(start):
                pos_i = jax.lax.dynamic_slice(pos_pad, (start, jnp.zeros((), start.dtype)), (chunk, 3))
                q_i = jax.lax.dynamic_slice_in_dim(qp, start, chunk)
                b_i = jax.lax.dynamic_slice_in_dim(born, start, chunk)
                gi = start + jnp.arange(chunk, dtype=jnp.int32)
                dr = pos_i[:, None, :] - pos_pad[None, :, :]
                if b is not None:
                    dr = geom.periodic_delta(dr, b)
                r2 = jnp.sum(dr * dr, -1)
                gj = jnp.arange(n_pad, dtype=jnp.int32)
                # strictly upper pairs + diagonal self term handled via i<=j
                mask = (gj[None, :] > gi[:, None]) & valid[None, :] \
                    & (gi[:, None] < n)
                if use_cutoff:
                    mask = mask & (r2 < cutoff * cutoff)
                r2s = jnp.where(mask, r2, 1.0)
                alpha2 = b_i[:, None] * born[None, :]
                d_ij = r2s / (4.0 * alpha2)
                expterm = jnp.exp(-d_ij)
                denom = jnp.sqrt(r2s + alpha2 * expterm)
                gpol = q_i[:, None] * charge[None, :] / denom
                if use_cutoff:
                    gpol = gpol - q_i[:, None] * charge[None, :] / cutoff
                return jnp.sum(jnp.where(mask, gpol, 0.0).astype(accum))

            def scan_body2(acc, start):
                return acc + jax.checkpoint(row_chunk2)(start), None

            e_pair, _ = jax.lax.scan(scan_body2, jnp.zeros((), accum), starts)
            # self terms: 0.5 * preFactor * q_i^2 / B_i
            e_self = jnp.sum(jnp.where(
                valid, 0.5 * qp * charge / born, 0.0).astype(accum))
            return e_sa + e_pair + e_self

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic)
