"""CustomGBForce: programmable generalized-Born-style forces.

API per openmmapi/include/openmm/CustomGBForce.h:92-99: staged "computed
values" (ParticlePair sums over neighbors, then SingleParticle chains), then
energy terms (SingleParticle and ParticlePair). The reference implements the
chain-rule differentiation through the value stages by generated kernels
(customGBValueN2.cc, customGBEnergyN2.cc, customGBChainRule.cc); here the
whole computation is one differentiable jnp program and jax.grad IS the
chain rule.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..exceptions import OpenMMException
from ..expressions import compile_energy_expression
from ..ops import geometry as geom
from ..ops import pairs as pairs_mod
from .base import CompiledForce, Force
from .custom import _CustomMixin


class CustomGBForce(Force, _CustomMixin):
    NoCutoff = 0
    CutoffNonPeriodic = 1
    CutoffPeriodic = 2
    # computation types
    SingleParticle = 0
    ParticlePair = 1
    ParticlePairNoExclusions = 2

    def __init__(self):
        super().__init__()
        self._init_custom("")
        self._per_particle = []
        self._particles = []
        self._values = []       # (name, expression, type)
        self._energy_terms = []  # (expression, type)
        self._exclusions = []
        self._method = CustomGBForce.NoCutoff
        self._cutoff = 1.0

    def getNumPerParticleParameters(self):
        return len(self._per_particle)

    def addPerParticleParameter(self, name):
        self._per_particle.append(str(name))
        return len(self._per_particle) - 1

    def getPerParticleParameterName(self, index):
        return self._per_particle[index]

    def getNumParticles(self):
        return len(self._particles)

    def addParticle(self, parameters=()):
        self._particles.append([float(u.strip(p)) for p in parameters])
        return len(self._particles) - 1

    def getParticleParameters(self, index):
        return list(self._particles[index])

    def setParticleParameters(self, index, parameters=()):
        self._particles[index] = [float(u.strip(p)) for p in parameters]

    def getNumComputedValues(self):
        return len(self._values)

    def addComputedValue(self, name, expression, type):  # noqa: A002
        self._values.append((str(name), str(expression), int(type)))
        return len(self._values) - 1

    def getComputedValueParameters(self, index):
        return self._values[index]

    def setComputedValueParameters(self, index, name, expression, type):  # noqa: A002
        self._values[index] = (str(name), str(expression), int(type))

    def getNumEnergyTerms(self):
        return len(self._energy_terms)

    def addEnergyTerm(self, expression, type):  # noqa: A002
        self._energy_terms.append((str(expression), int(type)))
        return len(self._energy_terms) - 1

    def getEnergyTermParameters(self, index):
        return self._energy_terms[index]

    def setEnergyTermParameters(self, index, expression, type):  # noqa: A002
        self._energy_terms[index] = (str(expression), int(type))

    def getNumExclusions(self):
        return len(self._exclusions)

    def addExclusion(self, particle1, particle2):
        self._exclusions.append((int(particle1), int(particle2)))
        return len(self._exclusions) - 1

    def getExclusionParticles(self, index):
        return self._exclusions[index]

    def setExclusionParticles(self, index, particle1, particle2):
        self._exclusions[index] = (int(particle1), int(particle2))

    def getNonbondedMethod(self):
        return self._method

    def setNonbondedMethod(self, method):
        self._method = int(method)

    def getCutoffDistance(self):
        return u.Quantity(self._cutoff, u.nanometer)

    def setCutoffDistance(self, distance):
        self._cutoff = float(u.strip(distance, u.nanometer))

    def usesPeriodicBoundaryConditions(self):
        return self._method == CustomGBForce.CutoffPeriodic

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _pack_params(self, cfg):
        n = len(self._particles)
        npar = len(self._per_particle)
        par = (np.asarray(self._particles, np.float64).astype(cfg.dtype)
               if n and npar else np.zeros((n, npar), cfg.dtype))
        return {"par": jnp.asarray(par)}

    def _compile(self, system, cfg):
        n = cfg.n_particles
        if len(self._particles) != n:
            raise OpenMMException(
                "CustomGBForce must have same particle count as the System")
        dtype = cfg.dtype
        accum = cfg.accum_dtype
        chunk = min(cfg.pair_block, max(1, n))
        n_pad = ((n + chunk - 1) // chunk) * chunk
        params = self._pack_params(cfg)
        fns = self._compiled_functions(dtype)
        names = list(self._per_particle)
        periodic = self._method == CustomGBForce.CutoffPeriodic
        use_cutoff = self._method != CustomGBForce.NoCutoff
        cutoff = self._cutoff
        value_defs = list(self._values)
        energy_defs = list(self._energy_terms)

        # exclusion table
        excl_np = pairs_mod.build_exclusion_table(n, self._exclusions)
        excl_pad = np.full((n_pad, excl_np.shape[1]), -1, np.int32)
        excl_pad[:n] = excl_np
        exclusions = jnp.asarray(excl_pad)

        def energy_fn(pos, box, p, gp):
            pos_pad = jnp.zeros((n_pad, 3), pos.dtype).at[:n].set(pos)
            valid = jnp.arange(n_pad, dtype=jnp.int32) < n
            par_pad = jnp.zeros((n_pad, p["par"].shape[1]), dtype
                                ).at[:n].set(p["par"])
            b = box if periodic else None
            computed = {}   # name -> (n_pad,)
            starts = jnp.arange(0, n_pad, chunk, dtype=jnp.int32)

            def pair_env(r, gi, start, no_excl, prev_values):
                """Env for a (chunk, n_pad) pair expression."""
                env = {"r": r}
                par_i = jax.lax.dynamic_slice(
                    par_pad, (start, jnp.zeros((), start.dtype)), (chunk, par_pad.shape[1]))
                for k, name in enumerate(names):
                    env[name + "1"] = par_i[:, k][:, None]
                    env[name + "2"] = par_pad[None, :, k]
                for vname, vals in prev_values.items():
                    v_i = jax.lax.dynamic_slice_in_dim(vals, start, chunk)
                    env[vname + "1"] = v_i[:, None]
                    env[vname + "2"] = vals[None, :]
                for k, v in gp.items():
                    env[k] = v
                return env

            def pair_mask(r2, gi, start, no_excl):
                gj = jnp.arange(n_pad, dtype=jnp.int32)
                mask = (gi[:, None] != gj[None, :]) & valid[None, :] \
                    & (gi[:, None] < n)
                if use_cutoff:
                    mask = mask & (r2 < cutoff * cutoff)
                if not no_excl:
                    excl_i = jax.lax.dynamic_slice(
                        exclusions, (start, jnp.zeros((), start.dtype)), (chunk, exclusions.shape[1]))
                    is_excl = jnp.any(excl_i[:, :, None] == gj[None, None, :],
                                      axis=1)
                    mask = mask & ~is_excl
                return mask

            # ---- computed values ------------------------------------------
            for (vname, vexpr, vtype) in value_defs:
                expr_fn = compile_energy_expression(vexpr, fns)
                if vtype == CustomGBForce.SingleParticle:
                    env = {"x": pos_pad[:, 0], "y": pos_pad[:, 1],
                           "z": pos_pad[:, 2]}
                    for k, name in enumerate(names):
                        env[name] = par_pad[:, k]
                    for prev_name, vals in computed.items():
                        env[prev_name] = vals
                    for k, v in gp.items():
                        env[k] = v
                    computed[vname] = jnp.broadcast_to(expr_fn(env), (n_pad,))
                else:
                    no_excl = vtype == CustomGBForce.ParticlePairNoExclusions
                    prev = dict(computed)

                    def row_fn(start, _expr_fn=expr_fn, _no_excl=no_excl,
                               _prev=prev):
                        pos_i = jax.lax.dynamic_slice(
                            pos_pad, (start, jnp.zeros((), start.dtype)),
                            (chunk, 3))
                        gi = start + jnp.arange(chunk, dtype=jnp.int32)
                        dr = pos_i[:, None, :] - pos_pad[None, :, :]
                        if b is not None:
                            dr = geom.periodic_delta(dr, b)
                        r2 = jnp.sum(dr * dr, -1)
                        mask = pair_mask(r2, gi, start, _no_excl)
                        r = jnp.sqrt(jnp.where(mask, r2, 1.0))
                        env = pair_env(r, gi, start, _no_excl, _prev)
                        e = jnp.broadcast_to(_expr_fn(env), r.shape)
                        return jnp.sum(jnp.where(mask, e, 0.0), axis=1)

                    def scan_body(_, start, _row_fn=row_fn):
                        return None, jax.checkpoint(_row_fn)(start)

                    _, rows = jax.lax.scan(scan_body, None, starts)
                    computed[vname] = rows.reshape(-1)

            # ---- energy terms ----------------------------------------------
            total = jnp.zeros((), accum)
            for (eexpr, etype) in energy_defs:
                expr_fn = compile_energy_expression(eexpr, fns)
                if etype == CustomGBForce.SingleParticle:
                    env = {"x": pos_pad[:, 0], "y": pos_pad[:, 1],
                           "z": pos_pad[:, 2]}
                    for k, name in enumerate(names):
                        env[name] = par_pad[:, k]
                    for prev_name, vals in computed.items():
                        env[prev_name] = vals
                    for k, v in gp.items():
                        env[k] = v
                    e = jnp.broadcast_to(expr_fn(env), (n_pad,))
                    total = total + jnp.sum(
                        jnp.where(valid, e, 0.0).astype(accum))
                else:
                    no_excl = etype == CustomGBForce.ParticlePairNoExclusions

                    def row_fn2(start, _expr_fn=expr_fn, _no_excl=no_excl):
                        pos_i = jax.lax.dynamic_slice(
                            pos_pad, (start, jnp.zeros((), start.dtype)),
                            (chunk, 3))
                        gi = start + jnp.arange(chunk, dtype=jnp.int32)
                        dr = pos_i[:, None, :] - pos_pad[None, :, :]
                        if b is not None:
                            dr = geom.periodic_delta(dr, b)
                        r2 = jnp.sum(dr * dr, -1)
                        mask = pair_mask(r2, gi, start, _no_excl)
                        # i < j half to avoid double counting
                        gj = jnp.arange(n_pad, dtype=jnp.int32)
                        mask = mask & (gj[None, :] > gi[:, None])
                        r = jnp.sqrt(jnp.where(mask, r2, 1.0))
                        env = pair_env(r, gi, start, _no_excl, computed)
                        e = jnp.broadcast_to(_expr_fn(env), r.shape)
                        return jnp.sum(jnp.where(mask, e, 0.0).astype(accum))

                    def scan_body2(acc, start, _row_fn=row_fn2):
                        return acc + jax.checkpoint(_row_fn)(start), None

                    esum, _ = jax.lax.scan(scan_body2, jnp.zeros((), accum),
                                           starts)
                    total = total + esum
            return total

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             global_defaults=self._gp_defaults(),
                             requested_derivs=tuple(self._deriv_requests))
