"""Custom forces driven by user energy expressions: CustomExternal, CustomBond,
CustomAngle, CustomTorsion, CustomNonbonded, CustomCompoundBond,
CustomCentroidBond.

API mirrors the reference Custom*Force headers (openmmapi/include/openmm/);
where the reference JITs expression strings per platform (Lepton x86 JIT /
ExpressionUtilities GPU codegen), here expressions compile once into jnp
functions (openmm_tpu/expressions) evaluated elementwise over packed term
arrays, and every derivative — forces AND energy parameter derivatives —
comes from jax.grad.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..exceptions import OpenMMException
from ..expressions import compile_energy_expression
from ..expressions.parser import parse_expression, variables_in
from ..ops import geometry as geom
from ..ops import pairs as pairs_mod
from .base import CompiledForce, Force


class _CustomMixin:
    """Global parameters, parameter derivatives, tabulated functions."""

    def _init_custom(self, energy):
        self._energy_expr = str(energy)
        self._global_params = []
        self._deriv_requests = []
        self._functions = []      # (name, TabulatedFunction)

    def getEnergyFunction(self):
        return self._energy_expr

    def setEnergyFunction(self, energy):
        self._energy_expr = str(energy)

    def getNumGlobalParameters(self):
        return len(self._global_params)

    def addGlobalParameter(self, name, defaultValue):
        self._global_params.append((str(name), float(u.strip(defaultValue))))
        return len(self._global_params) - 1

    def getGlobalParameterName(self, index):
        return self._global_params[index][0]

    def setGlobalParameterName(self, index, name):
        self._global_params[index] = (str(name), self._global_params[index][1])

    def getGlobalParameterDefaultValue(self, index):
        return self._global_params[index][1]

    def setGlobalParameterDefaultValue(self, index, value):
        self._global_params[index] = (self._global_params[index][0],
                                      float(u.strip(value)))

    def getNumEnergyParameterDerivatives(self):
        return len(self._deriv_requests)

    def addEnergyParameterDerivative(self, name):
        names = [n for n, _ in self._global_params]
        if name not in names:
            raise OpenMMException(
                "addEnergyParameterDerivative: unknown global parameter %r" % name)
        self._deriv_requests.append(str(name))

    def getEnergyParameterDerivativeName(self, index):
        return self._deriv_requests[index]

    def getNumTabulatedFunctions(self):
        return len(self._functions)

    def addTabulatedFunction(self, name, function):
        self._functions.append((str(name), function))
        return len(self._functions) - 1

    def getTabulatedFunction(self, index):
        return self._functions[index][1]

    def getTabulatedFunctionName(self, index):
        return self._functions[index][0]

    # legacy API (addFunction for Continuous1D)
    def addFunction(self, name, values, min, max):  # noqa: A002
        from ..tabulated import Continuous1DFunction
        return self.addTabulatedFunction(
            name, Continuous1DFunction(values, min, max))

    def _compiled_functions(self, dtype):
        return {name: fn._make_eval(dtype) for name, fn in self._functions}

    def _gp_defaults(self):
        return {name: val for name, val in self._global_params}


class _PeriodicFlagMixin:
    def setUsesPeriodicBoundaryConditions(self, periodic):
        self._periodic = bool(periodic)

    def usesPeriodicBoundaryConditions(self):
        return getattr(self, "_periodic", False)


def _pack_terms(terms, n_params, dtype):
    """terms: list of (idx_tuple, params_list) -> (idx array, params (M,P))."""
    if terms:
        idx = np.asarray([t[0] for t in terms], np.int32)
        if n_params:
            par = np.asarray([t[1] for t in terms], np.float64).astype(dtype)
        else:
            par = np.zeros((len(terms), 0), dtype)
    else:
        idx = np.zeros((0, 1), np.int32)
        par = np.zeros((0, max(n_params, 0)), dtype)
    return idx, par


def _term_env(par, names, gp, extra):
    env = dict(extra)
    for k, name in enumerate(names):
        env[name] = par[:, k]
    for k, v in gp.items():
        env[k] = v
    return env


def _sum_term_energy(expr_fn, env, accum_dtype, n_terms):
    if n_terms == 0:
        return jnp.zeros((), accum_dtype)
    e = expr_fn(env)
    return jnp.sum(jnp.broadcast_to(e, (n_terms,)).astype(accum_dtype))


class CustomExternalForce(Force, _CustomMixin):
    """E(x, y, z; per-particle + global params) (CustomExternalForce.h).
    Note: x/y/z of a periodic system are wrapped coordinates in the reference;
    here raw coordinates are used (matching non-periodic reference behavior).
    periodicdistance(x,y,z,x0,y0,z0) is supported in expressions."""

    def __init__(self, energy):
        super().__init__()
        self._init_custom(energy)
        self._per_particle = []
        self._terms = []  # (particle, params)

    def getNumPerParticleParameters(self):
        return len(self._per_particle)

    def addPerParticleParameter(self, name):
        self._per_particle.append(str(name))
        return len(self._per_particle) - 1

    def getPerParticleParameterName(self, index):
        return self._per_particle[index]

    def getNumParticles(self):
        return len(self._terms)

    def addParticle(self, particle, parameters=()):
        self._terms.append((int(particle),
                            [float(u.strip(p)) for p in parameters]))
        return len(self._terms) - 1

    def getParticleParameters(self, index):
        return self._terms[index]

    def setParticleParameters(self, index, particle, parameters=()):
        self._terms[index] = (int(particle),
                              [float(u.strip(p)) for p in parameters])

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _pack_params(self, cfg):
        _, par = _pack_terms([((t[0],), t[1]) for t in self._terms],
                             len(self._per_particle), cfg.dtype)
        return {"par": jnp.asarray(par)}

    def _compile(self, system, cfg):
        idx, _ = _pack_terms([((t[0],), t[1]) for t in self._terms],
                             len(self._per_particle), cfg.dtype)
        idx = jnp.asarray(idx[:, 0]) if idx.size else jnp.zeros(0, jnp.int32)
        params = self._pack_params(cfg)
        fns = self._compiled_functions(cfg.dtype)
        names = list(self._per_particle)
        n_terms = len(self._terms)
        expr = self._energy_expr

        def energy_fn(pos, box, p, gp):
            if n_terms == 0:
                return jnp.zeros((), cfg.accum_dtype)
            fns2 = dict(fns)
            if box is not None:
                def periodicdistance(x1, y1, z1, x2, y2, z2):
                    d = jnp.stack([x1 - x2, y1 - y2, z1 - z2], -1)
                    d = geom.periodic_delta(d, box)
                    return jnp.sqrt(jnp.sum(d * d, -1))
                fns2["periodicdistance"] = periodicdistance
            expr_fn = compile_energy_expression(expr, fns2)
            xyz = pos[idx]
            env = _term_env(p["par"], names, gp,
                            {"x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]})
            return _sum_term_energy(expr_fn, env, cfg.accum_dtype, n_terms)

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             global_defaults=self._gp_defaults(),
                             requested_derivs=tuple(self._deriv_requests))


class _CustomBondedBase(Force, _CustomMixin, _PeriodicFlagMixin):
    """Shared machinery for CustomBond/Angle/Torsion."""

    _n_atoms = 2
    _coord_name = "r"
    _param_api = "PerBond"

    def __init__(self, energy):
        super().__init__()
        self._init_custom(energy)
        self._per_term = []
        self._terms = []
        self._periodic = False

    # per-term parameter API (names differ per class; see subclasses)
    def _add_per_term_parameter(self, name):
        self._per_term.append(str(name))
        return len(self._per_term) - 1

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        out = []
        for t in self._terms:
            atoms = t[0]
            out += [(atoms[i], atoms[i + 1]) for i in range(len(atoms) - 1)]
        return out

    def _coord(self, pos, idx, box):
        raise NotImplementedError

    def _pack_params(self, cfg):
        _, par = _pack_terms(self._terms, len(self._per_term), cfg.dtype)
        return {"par": jnp.asarray(par)}

    def _compile(self, system, cfg):
        idx_np, _ = _pack_terms(self._terms, len(self._per_term), cfg.dtype)
        if idx_np.shape[0] and idx_np.shape[1] != self._n_atoms:
            idx_np = idx_np.reshape(-1, self._n_atoms)
        idx = jnp.asarray(idx_np if idx_np.size else
                          np.zeros((0, self._n_atoms), np.int32))
        params = self._pack_params(cfg)
        fns = self._compiled_functions(cfg.dtype)
        expr_fn = compile_energy_expression(self._energy_expr, fns)
        names = list(self._per_term)
        n_terms = len(self._terms)
        periodic = self._periodic
        coord_name = self._coord_name
        coord = self._coord

        def energy_fn(pos, box, p, gp):
            if n_terms == 0:
                return jnp.zeros((), cfg.accum_dtype)
            c = coord(pos, idx, box if periodic else None)
            env = _term_env(p["par"], names, gp, {coord_name: c})
            return _sum_term_energy(expr_fn, env, cfg.accum_dtype, n_terms)

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()),
                             global_defaults=self._gp_defaults(),
                             requested_derivs=tuple(self._deriv_requests))


class CustomBondForce(_CustomBondedBase):
    _n_atoms = 2
    _coord_name = "r"

    def getNumPerBondParameters(self):
        return len(self._per_term)

    def addPerBondParameter(self, name):
        return self._add_per_term_parameter(name)

    def getPerBondParameterName(self, index):
        return self._per_term[index]

    def getNumBonds(self):
        return len(self._terms)

    def addBond(self, particle1, particle2, parameters=()):
        self._terms.append(((int(particle1), int(particle2)),
                            [float(u.strip(p)) for p in parameters]))
        return len(self._terms) - 1

    def getBondParameters(self, index):
        (p1, p2), params = self._terms[index]
        return p1, p2, list(params)

    def setBondParameters(self, index, particle1, particle2, parameters=()):
        self._terms[index] = ((int(particle1), int(particle2)),
                              [float(u.strip(p)) for p in parameters])

    @staticmethod
    def _coord(pos, idx, box):
        dr = geom.bond_vectors(pos, idx, box)
        return geom.distance(dr)


class CustomAngleForce(_CustomBondedBase):
    _n_atoms = 3
    _coord_name = "theta"

    def getNumPerAngleParameters(self):
        return len(self._per_term)

    def addPerAngleParameter(self, name):
        return self._add_per_term_parameter(name)

    def getPerAngleParameterName(self, index):
        return self._per_term[index]

    def getNumAngles(self):
        return len(self._terms)

    def addAngle(self, p1, p2, p3, parameters=()):
        self._terms.append(((int(p1), int(p2), int(p3)),
                            [float(u.strip(p)) for p in parameters]))
        return len(self._terms) - 1

    def getAngleParameters(self, index):
        (p1, p2, p3), params = self._terms[index]
        return p1, p2, p3, list(params)

    def setAngleParameters(self, index, p1, p2, p3, parameters=()):
        self._terms[index] = ((int(p1), int(p2), int(p3)),
                              [float(u.strip(p)) for p in parameters])

    @staticmethod
    def _coord(pos, idx, box):
        v1 = geom.delta(pos[idx[:, 0]], pos[idx[:, 1]], box)
        v2 = geom.delta(pos[idx[:, 2]], pos[idx[:, 1]], box)
        return geom.angle_between(v1, v2)


class CustomTorsionForce(_CustomBondedBase):
    _n_atoms = 4
    _coord_name = "theta"

    def getNumPerTorsionParameters(self):
        return len(self._per_term)

    def addPerTorsionParameter(self, name):
        return self._add_per_term_parameter(name)

    def getPerTorsionParameterName(self, index):
        return self._per_term[index]

    def getNumTorsions(self):
        return len(self._terms)

    def addTorsion(self, p1, p2, p3, p4, parameters=()):
        self._terms.append(((int(p1), int(p2), int(p3), int(p4)),
                            [float(u.strip(p)) for p in parameters]))
        return len(self._terms) - 1

    def getTorsionParameters(self, index):
        (p1, p2, p3, p4), params = self._terms[index]
        return p1, p2, p3, p4, list(params)

    def setTorsionParameters(self, index, p1, p2, p3, p4, parameters=()):
        self._terms[index] = ((int(p1), int(p2), int(p3), int(p4)),
                              [float(u.strip(p)) for p in parameters])

    @staticmethod
    def _coord(pos, idx, box):
        return geom.dihedral_angle(pos[idx[:, 0]], pos[idx[:, 1]],
                                   pos[idx[:, 2]], pos[idx[:, 3]], box)


class CustomNonbondedForce(Force, _CustomMixin):
    """Pairwise E(r; per-particle params via name1/name2) with exclusions,
    interaction groups, switching, and numeric long-range correction
    (CustomNonbondedForce.h:257,277,343,467)."""

    NoCutoff = 0
    CutoffNonPeriodic = 1
    CutoffPeriodic = 2

    def __init__(self, energy):
        super().__init__()
        self._init_custom(energy)
        self._per_particle = []
        self._particles = []
        self._exclusions = []
        self._method = CustomNonbondedForce.NoCutoff
        self._cutoff = 1.0
        self._switching = False
        self._switch_dist = -1.0
        self._lrc = False
        self._groups = []   # (set1, set2)

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

    def getNumExclusions(self):
        return len(self._exclusions)

    def addExclusion(self, particle1, particle2):
        self._exclusions.append((int(particle1), int(particle2)))
        return len(self._exclusions) - 1

    def getExclusionParticles(self, index):
        return self._exclusions[index]

    def setExclusionParticles(self, index, particle1, particle2):
        self._exclusions[index] = (int(particle1), int(particle2))

    def createExclusionsFromBonds(self, bonds, bondCutoff):
        bonded = {}
        for b1, b2 in bonds:
            bonded.setdefault(int(b1), set()).add(int(b2))
            bonded.setdefault(int(b2), set()).add(int(b1))
        excl = set()
        frontier = {i: {i} for i in bonded}
        for i in bonded:
            cur = {i}
            for _ in range(bondCutoff):
                nxt = set()
                for a in cur:
                    nxt |= bonded.get(a, set())
                cur = nxt
                for j in cur:
                    if j != i:
                        excl.add((min(i, j), max(i, j)))
        for (i, j) in sorted(excl):
            self.addExclusion(i, j)

    def getNonbondedMethod(self):
        return self._method

    def setNonbondedMethod(self, method):
        self._method = int(method)

    def getCutoffDistance(self):
        return u.Quantity(self._cutoff, u.nanometer)

    def setCutoffDistance(self, distance):
        self._cutoff = float(u.strip(distance, u.nanometer))

    def getUseSwitchingFunction(self):
        return self._switching

    def setUseSwitchingFunction(self, use):
        self._switching = bool(use)

    def getSwitchingDistance(self):
        return u.Quantity(self._switch_dist, u.nanometer)

    def setSwitchingDistance(self, distance):
        self._switch_dist = float(u.strip(distance, u.nanometer))

    def getUseLongRangeCorrection(self):
        return self._lrc

    def setUseLongRangeCorrection(self, use):
        self._lrc = bool(use)

    def getNumInteractionGroups(self):
        return len(self._groups)

    def addInteractionGroup(self, set1, set2):
        self._groups.append((sorted(set(int(i) for i in set1)),
                             sorted(set(int(i) for i in set2))))
        return len(self._groups) - 1

    def getInteractionGroupParameters(self, index):
        return self._groups[index]

    def setInteractionGroupParameters(self, index, set1, set2):
        self._groups[index] = (sorted(set(int(i) for i in set1)),
                               sorted(set(int(i) for i in set2)))

    def usesPeriodicBoundaryConditions(self):
        return self._method == CustomNonbondedForce.CutoffPeriodic

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _pack_params(self, cfg):
        n = len(self._particles)
        npar = len(self._per_particle)
        par = (np.asarray(self._particles, np.float64).astype(cfg.dtype)
               if n and npar else np.zeros((n, npar), cfg.dtype))
        out = {"par": jnp.asarray(par)}
        if self._lrc and self._method == CustomNonbondedForce.CutoffPeriodic:
            out["lrc_coeff"] = jnp.asarray(
                self._long_range_coefficient(), cfg.accum_dtype)
        return out

    def _long_range_coefficient(self):
        """2*pi*N^2*<integral of E(r) r^2 dr from rc to inf>, averaged over
        particle-class pairs (CustomNonbondedForceImpl::calcLongRangeCorrection).
        Numeric: substitute r = rc/t, integrate t in (0,1] by Gauss-Legendre."""
        classes = {}
        for p in self._particles:
            key = tuple(p)
            classes[key] = classes.get(key, 0) + 1
        keys = list(classes)
        gp = self._gp_defaults()
        fns = self._compiled_functions(np.float64)
        expr_fn = compile_energy_expression(self._energy_expr, fns)
        rc = self._cutoff
        x_gl, w_gl = np.polynomial.legendre.leggauss(128)
        t = 0.5 * (x_gl + 1.0)         # (0,1)
        wt = 0.5 * w_gl
        r = rc / t
        total = 0.0
        n_pairs_total = 0
        for a, ka in enumerate(keys):
            for b in range(a + 1):
                kb = keys[b]
                count = (classes[ka] * (classes[ka] + 1) / 2.0 if a == b
                         else classes[ka] * classes[kb])
                env = {"r": jnp.asarray(r)}
                for k, name in enumerate(self._per_particle):
                    env[name + "1"] = ka[k]
                    env[name + "2"] = kb[k]
                for k, v in gp.items():
                    env[k] = v
                e_r = np.asarray(expr_fn(env), np.float64)
                if self._switching and self._switch_dist >= 0:
                    x = np.clip(r - self._switch_dist, 0, None)
                    tt = np.where(r < rc, x / (rc - self._switch_dist), 1.0)
                    sw = 1 - tt ** 3 * (10 - 15 * tt + 6 * tt * tt)
                    # only the region beyond rc plus switched deficit matters:
                    # integral of E*(1-S) from rs..rc + E from rc..inf; the
                    # substitution below integrates rc..inf; the switched
                    # deficit is added separately
                    pass
                # integral_rc^inf E(r) r^2 dr = rc * sum w * E(rc/t) (rc/t)^2 / t^2
                integral = rc * np.sum(wt * e_r * (r ** 2) / (t ** 2))
                if self._switching and self._switch_dist >= 0:
                    # switched region deficit: int_rs^rc E(r)(1-S(r)) r^2 dr
                    rs = self._switch_dist
                    xq, wq = np.polynomial.legendre.leggauss(64)
                    rq = 0.5 * (rc - rs) * xq + 0.5 * (rc + rs)
                    wq2 = 0.5 * (rc - rs) * wq
                    envq = {"r": jnp.asarray(rq)}
                    for k, name in enumerate(self._per_particle):
                        envq[name + "1"] = ka[k]
                        envq[name + "2"] = kb[k]
                    for k, v in gp.items():
                        envq[k] = v
                    eq = np.asarray(expr_fn(envq), np.float64)
                    tt = (rq - rs) / (rc - rs)
                    sw = 1 - tt ** 3 * (10 - 15 * tt + 6 * tt * tt)
                    integral += np.sum(wq2 * eq * (1 - sw) * rq * rq)
                total += count * integral
                n_pairs_total += count
        n = len(self._particles)
        n_int = n * (n + 1) / 2.0
        return 2.0 * math.pi * n * n * (total / n_int) / 1.0

    def _compile(self, system, cfg):
        n = cfg.n_particles
        if len(self._particles) != n:
            raise OpenMMException(
                "CustomNonbondedForce must have same particle count as System")
        dtype = cfg.dtype
        accum = cfg.accum_dtype
        block = cfg.pair_block
        periodic = self.usesPeriodicBoundaryConditions()
        use_cutoff = self._method != CustomNonbondedForce.NoCutoff
        cutoff = self._cutoff
        use_switch = self._switching and use_cutoff
        rs = self._switch_dist
        names = list(self._per_particle)
        fns = self._compiled_functions(dtype)
        expr_fn = compile_energy_expression(self._energy_expr, fns)
        params = self._pack_params(cfg)

        n_pad = pairs_mod.pad_to_block(max(n, 1), block)
        excl_np = pairs_mod.build_exclusion_table(n, self._exclusions)
        excl_pad = np.full((n_pad, excl_np.shape[1]), -1, np.int32)
        excl_pad[:n] = excl_np
        exclusions = jnp.asarray(excl_pad)

        # interaction-group bitmasks (up to 32 groups)
        group_masks = None
        if self._groups:
            if len(self._groups) > 32:
                raise OpenMMException("at most 32 interaction groups supported")
            s1 = np.zeros(n_pad, np.int64)
            s2 = np.zeros(n_pad, np.int64)
            for g, (set1, set2) in enumerate(self._groups):
                for i in set1:
                    s1[i] |= (1 << g)
                for i in set2:
                    s2[i] |= (1 << g)
            group_masks = (jnp.asarray(s1), jnp.asarray(s2))

        def pair_fn(r2, pi, pj):
            r = jnp.sqrt(r2)
            env = {"r": r}
            for k, name in enumerate(names):
                env[name + "1"] = pi["par_" + str(k)][:, None]
                env[name + "2"] = pj["par_" + str(k)][None, :]
            for k, v in pair_fn.gp.items():
                env[k] = v
            e = expr_fn(env)
            e = jnp.broadcast_to(e, r.shape)
            if use_switch:
                x = jnp.clip(r - rs, 0.0, None)
                t = x / (cutoff - rs)
                sw = 1.0 - t * t * t * (10.0 - 15.0 * t + 6.0 * t * t)
                e = e * sw
            if use_cutoff:
                e = jnp.where(r2 < cutoff * cutoff, e, 0.0)
            return e

        def energy_fn(pos, box, p, gp):
            if n == 0:
                return jnp.zeros((), accum)
            pos_pad = jnp.zeros((n_pad, 3), pos.dtype).at[:n].set(pos)
            per_atom = {}
            for k in range(len(names)):
                col = jnp.zeros(n_pad, dtype).at[:n].set(p["par"][:, k])
                per_atom["par_" + str(k)] = col
            pair_fn.gp = gp
            total = _custom_pair_sum(pos_pad, box, pair_fn, per_atom,
                                     exclusions, n, block, periodic, accum,
                                     group_masks)
            e = total
            if "lrc_coeff" in p:
                e = e + p["lrc_coeff"] / geom.box_volume(box).astype(accum)
            return e

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             global_defaults=self._gp_defaults(),
                             requested_derivs=tuple(self._deriv_requests))


def _custom_pair_sum(pos, box, pair_fn, per_atom, exclusions, n_real, block,
                     periodic, accum_dtype, group_masks):
    """pair_energy_n2 with optional interaction-group bitmask columns."""
    if group_masks is not None:
        per_atom = dict(per_atom)
        per_atom.pop("_s1", None)
        s1, s2 = group_masks

        inner = pair_fn

        def masked_pair(r2, pi, pj):
            e = inner(r2, pi, pj)
            i1 = pi["_gm1"].astype(jnp.int64)[:, None]
            j2 = pj["_gm2"].astype(jnp.int64)[None, :]
            i2 = pi["_gm2"].astype(jnp.int64)[:, None]
            j1 = pj["_gm1"].astype(jnp.int64)[None, :]
            ok = ((i1 & j2) | (i2 & j1)) != 0
            return jnp.where(ok, e, 0.0)

        per_atom["_gm1"] = s1
        per_atom["_gm2"] = s2
        fn = masked_pair
    else:
        fn = pair_fn
    return pairs_mod.pair_energy_n2(pos, box, fn, per_atom, exclusions,
                                    n_real, block=block, periodic=periodic,
                                    accum_dtype=accum_dtype)


def _point_functions(box):
    """distance/angle/dihedral over (M,3) coordinate arrays, plus the
    pointdistance/pointangle/pointdihedral scalar-coordinate variants
    (CustomCompoundBondForce.h expression primitives)."""
    def wrap(d):
        return geom.periodic_delta(d, box) if box is not None else d

    def distance(a, b):
        return geom.distance(wrap(a - b))

    def angle(a, b, c):
        return geom.angle_between(wrap(a - b), wrap(c - b))

    def dihedral(a, b, c, d):
        return geom.dihedral_angle(a, b, c, d, box)

    def pointdistance(x1, y1, z1, x2, y2, z2):
        return distance(jnp.stack(jnp.broadcast_arrays(x1, y1, z1), -1),
                        jnp.stack(jnp.broadcast_arrays(x2, y2, z2), -1))

    def pointangle(x1, y1, z1, x2, y2, z2, x3, y3, z3):
        return angle(jnp.stack(jnp.broadcast_arrays(x1, y1, z1), -1),
                     jnp.stack(jnp.broadcast_arrays(x2, y2, z2), -1),
                     jnp.stack(jnp.broadcast_arrays(x3, y3, z3), -1))

    def pointdihedral(x1, y1, z1, x2, y2, z2, x3, y3, z3, x4, y4, z4):
        return dihedral(jnp.stack(jnp.broadcast_arrays(x1, y1, z1), -1),
                        jnp.stack(jnp.broadcast_arrays(x2, y2, z2), -1),
                        jnp.stack(jnp.broadcast_arrays(x3, y3, z3), -1),
                        jnp.stack(jnp.broadcast_arrays(x4, y4, z4), -1))

    return {"distance": distance, "angle": angle, "dihedral": dihedral,
            "pointdistance": pointdistance, "pointangle": pointangle,
            "pointdihedral": pointdihedral}


class CustomCompoundBondForce(Force, _CustomMixin, _PeriodicFlagMixin):
    """N-particle bonded term with distance/angle/dihedral/coordinate
    primitives (CustomCompoundBondForce.h). Particle placeholders p1..pN
    evaluate to (M,3) coordinate arrays; x1/y1/z1 are scalar coordinates."""

    def __init__(self, numParticles, energy):
        super().__init__()
        self._init_custom(energy)
        self._n_atoms = int(numParticles)
        self._per_term = []
        self._terms = []
        self._periodic = False

    def getNumParticlesPerBond(self):
        return self._n_atoms

    def getNumPerBondParameters(self):
        return len(self._per_term)

    def addPerBondParameter(self, name):
        self._per_term.append(str(name))
        return len(self._per_term) - 1

    def getPerBondParameterName(self, index):
        return self._per_term[index]

    def getNumBonds(self):
        return len(self._terms)

    def addBond(self, particles, parameters=()):
        if len(particles) != self._n_atoms:
            raise OpenMMException("wrong number of particles in bond")
        self._terms.append((tuple(int(p) for p in particles),
                            [float(u.strip(p)) for p in parameters]))
        return len(self._terms) - 1

    def getBondParameters(self, index):
        atoms, params = self._terms[index]
        return list(atoms), list(params)

    def setBondParameters(self, index, particles, parameters=()):
        self._terms[index] = (tuple(int(p) for p in particles),
                              [float(u.strip(p)) for p in parameters])

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        out = []
        for atoms, _ in self._terms:
            out += [(atoms[i], atoms[i + 1]) for i in range(len(atoms) - 1)]
        return out

    def _pack_params(self, cfg):
        _, par = _pack_terms(self._terms, len(self._per_term), cfg.dtype)
        return {"par": jnp.asarray(par)}

    def _compile(self, system, cfg):
        n_atoms = self._n_atoms
        idx_np = (np.asarray([t[0] for t in self._terms], np.int32)
                  if self._terms else np.zeros((0, n_atoms), np.int32))
        idx = jnp.asarray(idx_np)
        params = self._pack_params(cfg)
        base_fns = self._compiled_functions(cfg.dtype)
        names = list(self._per_term)
        n_terms = len(self._terms)
        periodic = self._periodic
        expr = self._energy_expr

        def energy_fn(pos, box, p, gp):
            if n_terms == 0:
                return jnp.zeros((), cfg.accum_dtype)
            b = box if periodic else None
            fns = dict(base_fns)
            fns.update(_point_functions(b))
            expr_fn = compile_energy_expression(expr, fns)
            env = _term_env(p["par"], names, gp, {})
            for k in range(n_atoms):
                xyz = pos[idx[:, k]]
                env["p%d" % (k + 1)] = xyz
                env["x%d" % (k + 1)] = xyz[:, 0]
                env["y%d" % (k + 1)] = xyz[:, 1]
                env["z%d" % (k + 1)] = xyz[:, 2]
            return _sum_term_energy(expr_fn, env, cfg.accum_dtype, n_terms)

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()),
                             global_defaults=self._gp_defaults(),
                             requested_derivs=tuple(self._deriv_requests))


class CustomCentroidBondForce(Force, _CustomMixin, _PeriodicFlagMixin):
    """Like CustomCompoundBondForce but over weighted centroids of particle
    groups (CustomCentroidBondForce.h; kernel customCentroidBond.cc).
    Placeholders g1..gN; centroid weights default to particle masses."""

    def __init__(self, numGroups, energy):
        super().__init__()
        self._init_custom(energy)
        self._n_groups = int(numGroups)
        self._per_term = []
        self._groups = []  # (particles, weights-or-None)
        self._terms = []   # (group indices, params)
        self._periodic = False

    def getNumGroupsPerBond(self):
        return self._n_groups

    def getNumGroups(self):
        return len(self._groups)

    def addGroup(self, particles, weights=None):
        self._groups.append((tuple(int(p) for p in particles),
                             None if weights is None or len(weights) == 0
                             else [float(w) for w in weights]))
        return len(self._groups) - 1

    def getGroupParameters(self, index):
        particles, weights = self._groups[index]
        return list(particles), list(weights) if weights else []

    def setGroupParameters(self, index, particles, weights=None):
        self._groups[index] = (tuple(int(p) for p in particles),
                               None if weights is None or len(weights) == 0
                               else [float(w) for w in weights])

    def getNumPerBondParameters(self):
        return len(self._per_term)

    def addPerBondParameter(self, name):
        self._per_term.append(str(name))
        return len(self._per_term) - 1

    def getPerBondParameterName(self, index):
        return self._per_term[index]

    def getNumBonds(self):
        return len(self._terms)

    def addBond(self, groups, parameters=()):
        if len(groups) != self._n_groups:
            raise OpenMMException("wrong number of groups in bond")
        self._terms.append((tuple(int(g) for g in groups),
                            [float(u.strip(p)) for p in parameters]))
        return len(self._terms) - 1

    def getBondParameters(self, index):
        groups, params = self._terms[index]
        return list(groups), list(params)

    def setBondParameters(self, index, groups, parameters=()):
        self._terms[index] = (tuple(int(g) for g in groups),
                              [float(u.strip(p)) for p in parameters])

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        out = []
        for groups, _ in self._terms:
            atoms = [self._groups[g][0][0] for g in groups]
            out += [(atoms[i], atoms[i + 1]) for i in range(len(atoms) - 1)]
        return out

    def _pack_params(self, cfg):
        _, par = _pack_terms(self._terms, len(self._per_term), cfg.dtype)
        return {"par": jnp.asarray(par)}

    def _compile(self, system, cfg):
        masses = cfg.masses
        # pad groups to uniform width
        max_g = max((len(g[0]) for g in self._groups), default=1)
        g_idx = np.zeros((len(self._groups), max_g), np.int32)
        g_w = np.zeros((len(self._groups), max_g), np.float64)
        for gi, (particles, weights) in enumerate(self._groups):
            k = len(particles)
            g_idx[gi, :k] = particles
            if weights is None:
                w = np.asarray([masses[p] for p in particles], np.float64)
            else:
                w = np.asarray(weights, np.float64)
            if w.sum() == 0:
                w = np.ones(k)
            g_w[gi, :k] = w / w.sum()
        g_idx_j = jnp.asarray(g_idx)
        g_w_j = jnp.asarray(g_w.astype(cfg.dtype))
        idx_np = (np.asarray([t[0] for t in self._terms], np.int32)
                  if self._terms else np.zeros((0, self._n_groups), np.int32))
        idx = jnp.asarray(idx_np)
        params = self._pack_params(cfg)
        base_fns = self._compiled_functions(cfg.dtype)
        names = list(self._per_term)
        n_terms = len(self._terms)
        n_groups = self._n_groups
        periodic = self._periodic
        expr = self._energy_expr

        def energy_fn(pos, box, p, gp):
            if n_terms == 0:
                return jnp.zeros((), cfg.accum_dtype)
            b = box if periodic else None
            fns = dict(base_fns)
            fns.update(_point_functions(b))
            expr_fn = compile_energy_expression(expr, fns)
            centroids = jnp.sum(pos[g_idx_j] * g_w_j[:, :, None], axis=1)
            env = _term_env(p["par"], names, gp, {})
            for k in range(n_groups):
                xyz = centroids[idx[:, k]]
                env["g%d" % (k + 1)] = xyz
                env["x%d" % (k + 1)] = xyz[:, 0]
                env["y%d" % (k + 1)] = xyz[:, 1]
                env["z%d" % (k + 1)] = xyz[:, 2]
            return _sum_term_energy(expr_fn, env, cfg.accum_dtype, n_terms)

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()),
                             global_defaults=self._gp_defaults(),
                             requested_derivs=tuple(self._deriv_requests))
