"""Standard bonded forces: HarmonicBond, HarmonicAngle, PeriodicTorsion,
RBTorsion, CMAPTorsion.

Functional forms per the reference theory manual
(/root/reference/docs-source/usersguide/theory/02_standard_forces.rst — bond :9,
angle :31, periodic torsion :49, RB torsion :63, CMAP :82); API mirrors
openmmapi/include/openmm/{HarmonicBondForce,HarmonicAngleForce,
PeriodicTorsionForce,RBTorsionForce,CMAPTorsionForce}.h. All terms of one
force evaluate as a single vectorized gather + elementwise pass (the TPU
counterpart of the fused bonded kernel in BondedUtilities).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .. import unit as u
from ..exceptions import OpenMMException
from ..ops import geometry as geom
from ..ops.bandsel import WindowedTerms
from ..utils.splines import bicubic_coefficients_periodic
from .base import CompiledForce, Force


def _make_windowed_ef(eng, term_energy, fallback_energy, accum):
    """Analytic-force fast path for a bonded force: slot positions via the
    banded fwd matmul, grads of the pure term math (no gathers inside the
    differentiated region), accumulation via the banded bwd matmul; the few
    out-of-band terms run through the ordinary gather/scatter lane."""
    def ef_fn(pos, box, p, gp):
        slots = eng.fwd(pos, p["sel_F"])
        e, g = jax.value_and_grad(lambda s: term_energy(s, p))(slots)
        f = -eng.bwd(g, pos.shape[0], p["sel_M"])
        if fallback_energy is not None:
            e2, g2 = jax.value_and_grad(
                lambda q: fallback_energy(q, box, p, gp))(pos)
            e = e + e2.astype(e.dtype)
            f = f - g2
        return e.astype(accum), f
    return ef_fn


def _use_windowed(cfg, periodic, n_terms):
    return (not periodic and n_terms > 0
            and cfg.platform_name != "Reference"
            and cfg.dtype == jnp.float32)

_ENERGY_PER_NM2 = u.kilojoule_per_mole / u.nanometer ** 2
_ENERGY_PER_RAD2 = u.kilojoule_per_mole / u.radian ** 2
_ENERGY = u.kilojoule_per_mole


class _PeriodicMixin:
    def setUsesPeriodicBoundaryConditions(self, periodic):
        self._periodic = bool(periodic)

    def usesPeriodicBoundaryConditions(self):
        return getattr(self, "_periodic", False)


class HarmonicBondForce(Force, _PeriodicMixin):
    """E = (k/2)(r - r0)^2."""

    def __init__(self):
        super().__init__()
        self._bonds = []  # (p1, p2, length nm, k kJ/mol/nm^2)
        self._periodic = False

    def getNumBonds(self):
        return len(self._bonds)

    def addBond(self, particle1, particle2, length, k):
        self._bonds.append((int(particle1), int(particle2),
                            float(u.strip(length, u.nanometer)),
                            float(u.strip(k, _ENERGY_PER_NM2))))
        return len(self._bonds) - 1

    def getBondParameters(self, index):
        p1, p2, r0, k = self._bonds[index]
        return p1, p2, u.Quantity(r0, u.nanometer), u.Quantity(k, _ENERGY_PER_NM2)

    def setBondParameters(self, index, particle1, particle2, length, k):
        self._bonds[index] = (int(particle1), int(particle2),
                              float(u.strip(length, u.nanometer)),
                              float(u.strip(k, _ENERGY_PER_NM2)))

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        return [(b[0], b[1]) for b in self._bonds]

    def _pack(self, dtype):
        if not self._bonds:
            return (np.zeros((0, 2), np.int32),
                    {"r0": np.zeros(0, dtype), "k": np.zeros(0, dtype)})
        arr = np.asarray(self._bonds, np.float64)
        idx = arr[:, :2].astype(np.int32)
        return idx, {"r0": arr[:, 2].astype(dtype), "k": arr[:, 3].astype(dtype)}

    def _pack_params(self, cfg):
        _, params = self._pack(cfg.dtype)
        eng = getattr(self, "_weng", None)
        if eng is not None:
            for key in ("r0", "k"):
                params["w_" + key] = eng.layout(params[key])
                params["fb_" + key] = params[key][eng.fallback_ids]
            params.update(eng.tensors())
        return {k: jnp.asarray(v) for k, v in params.items()}

    def _compile(self, system, cfg):
        idx_np, _ = self._pack(cfg.dtype)
        idx = jnp.asarray(idx_np)
        periodic = self._periodic

        def energy_fn(pos, box, p, gp):
            if idx.shape[0] == 0:
                return jnp.zeros((), cfg.accum_dtype)
            dr = geom.bond_vectors(pos, idx, box if periodic else None)
            r = geom.distance(dr)
            e = 0.5 * p["k"] * (r - p["r0"]) ** 2
            return jnp.sum(e.astype(cfg.accum_dtype))

        ef_fn = None
        self._weng = None
        if _use_windowed(cfg, periodic, len(self._bonds)):
            eng = WindowedTerms(idx_np, cfg.n_particles)
            if eng.B > 0:
                self._weng = eng
                fb = jnp.asarray(idx_np[eng.fallback_ids])

                def term_energy(slots, p):
                    dr = slots[:, :, 0] - slots[:, :, 1]
                    r = geom.distance(dr)
                    e = 0.5 * p["w_k"] * (r - p["w_r0"]) ** 2
                    return jnp.sum(eng.live * e)

                fallback = None
                if len(eng.fallback_ids):
                    def fallback(pos, box, p, gp):
                        dr = geom.bond_vectors(pos, fb)
                        r = geom.distance(dr)
                        return jnp.sum(
                            0.5 * p["fb_k"] * (r - p["fb_r0"]) ** 2)

                ef_fn = _make_windowed_ef(eng, term_energy, fallback,
                                          cfg.accum_dtype)
        params = self._pack_params(cfg)

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             ef_fn=ef_fn, uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()))


class HarmonicAngleForce(Force, _PeriodicMixin):
    """E = (k/2)(theta - theta0)^2."""

    def __init__(self):
        super().__init__()
        self._angles = []  # (p1, p2, p3, angle rad, k kJ/mol/rad^2)
        self._periodic = False

    def getNumAngles(self):
        return len(self._angles)

    def addAngle(self, particle1, particle2, particle3, angle, k):
        self._angles.append((int(particle1), int(particle2), int(particle3),
                             float(u.strip(angle, u.radian)),
                             float(u.strip(k, _ENERGY_PER_RAD2))))
        return len(self._angles) - 1

    def getAngleParameters(self, index):
        p1, p2, p3, a, k = self._angles[index]
        return p1, p2, p3, u.Quantity(a, u.radian), u.Quantity(k, _ENERGY_PER_RAD2)

    def setAngleParameters(self, index, particle1, particle2, particle3, angle, k):
        self._angles[index] = (int(particle1), int(particle2), int(particle3),
                               float(u.strip(angle, u.radian)),
                               float(u.strip(k, _ENERGY_PER_RAD2)))

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        return [(a[0], a[1]) for a in self._angles] + [(a[1], a[2]) for a in self._angles]

    def _pack_params(self, cfg):
        if self._angles:
            arr = np.asarray(self._angles, np.float64)
            params = {"theta0": arr[:, 3].astype(cfg.dtype),
                      "k": arr[:, 4].astype(cfg.dtype)}
        else:
            params = {"theta0": np.zeros(0, cfg.dtype),
                      "k": np.zeros(0, cfg.dtype)}
        eng = getattr(self, "_weng", None)
        if eng is not None:
            for key in ("theta0", "k"):
                params["w_" + key] = eng.layout(params[key])
                params["fb_" + key] = params[key][eng.fallback_ids]
            params.update(eng.tensors())
        return {k: jnp.asarray(v) for k, v in params.items()}

    def _compile(self, system, cfg):
        if self._angles:
            arr = np.asarray(self._angles, np.float64)
            idx_np = arr[:, :3].astype(np.int32)
        else:
            idx_np = np.zeros((0, 3), np.int32)
        idx = jnp.asarray(idx_np)
        periodic = self._periodic

        def energy_fn(pos, box, p, gp):
            if idx.shape[0] == 0:
                return jnp.zeros((), cfg.accum_dtype)
            b = box if periodic else None
            v1 = geom.delta(pos[idx[:, 0]], pos[idx[:, 1]], b)
            v2 = geom.delta(pos[idx[:, 2]], pos[idx[:, 1]], b)
            theta = geom.angle_between(v1, v2)
            e = 0.5 * p["k"] * (theta - p["theta0"]) ** 2
            return jnp.sum(e.astype(cfg.accum_dtype))

        ef_fn = None
        self._weng = None
        if _use_windowed(cfg, periodic, len(self._angles)):
            eng = WindowedTerms(idx_np, cfg.n_particles)
            if eng.B > 0:
                self._weng = eng
                fb = jnp.asarray(idx_np[eng.fallback_ids])
                dead = (1.0 - eng.live)[:, :, None]
                ex = jnp.array([1.0, 0.0, 0.0], cfg.dtype)
                ey = jnp.array([0.0, 1.0, 0.0], cfg.dtype)

                def term_energy(slots, p):
                    # padding slots are all-zero: offset them onto fixed unit
                    # vectors (constant wrt slots) so grads stay finite; their
                    # energy is killed by live
                    v1 = slots[:, :, 0] - slots[:, :, 1] + dead * ex
                    v2 = slots[:, :, 2] - slots[:, :, 1] + dead * ey
                    theta = geom.angle_between(v1, v2)
                    e = 0.5 * p["w_k"] * (theta - p["w_theta0"]) ** 2
                    return jnp.sum(eng.live * e)

                fallback = None
                if len(eng.fallback_ids):
                    def fallback(pos, box, p, gp):
                        v1 = geom.delta(pos[fb[:, 0]], pos[fb[:, 1]], None)
                        v2 = geom.delta(pos[fb[:, 2]], pos[fb[:, 1]], None)
                        theta = geom.angle_between(v1, v2)
                        return jnp.sum(
                            0.5 * p["fb_k"] * (theta - p["fb_theta0"]) ** 2)

                ef_fn = _make_windowed_ef(eng, term_energy, fallback,
                                          cfg.accum_dtype)
        params = self._pack_params(cfg)

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             ef_fn=ef_fn, uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()))


class PeriodicTorsionForce(Force, _PeriodicMixin):
    """E = k (1 + cos(n*phi - phi0))."""

    def __init__(self):
        super().__init__()
        self._torsions = []  # (p1,p2,p3,p4, periodicity, phase rad, k kJ/mol)
        self._periodic = False

    def getNumTorsions(self):
        return len(self._torsions)

    def addTorsion(self, particle1, particle2, particle3, particle4,
                   periodicity, phase, k):
        self._torsions.append((int(particle1), int(particle2), int(particle3),
                               int(particle4), int(periodicity),
                               float(u.strip(phase, u.radian)),
                               float(u.strip(k, _ENERGY))))
        return len(self._torsions) - 1

    def getTorsionParameters(self, index):
        t = self._torsions[index]
        return (t[0], t[1], t[2], t[3], t[4], u.Quantity(t[5], u.radian),
                u.Quantity(t[6], _ENERGY))

    def setTorsionParameters(self, index, particle1, particle2, particle3,
                             particle4, periodicity, phase, k):
        self._torsions[index] = (int(particle1), int(particle2), int(particle3),
                                 int(particle4), int(periodicity),
                                 float(u.strip(phase, u.radian)),
                                 float(u.strip(k, _ENERGY)))

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        out = []
        for t in self._torsions:
            out += [(t[0], t[1]), (t[1], t[2]), (t[2], t[3])]
        return out

    def _pack_params(self, cfg):
        if self._torsions:
            arr = np.asarray(self._torsions, np.float64)
            params = {"n": arr[:, 4].astype(cfg.dtype),
                      "phase": arr[:, 5].astype(cfg.dtype),
                      "k": arr[:, 6].astype(cfg.dtype)}
        else:
            params = {"n": np.zeros(0, cfg.dtype),
                      "phase": np.zeros(0, cfg.dtype),
                      "k": np.zeros(0, cfg.dtype)}
        eng = getattr(self, "_weng", None)
        if eng is not None:
            for key in ("n", "phase", "k"):
                params["w_" + key] = eng.layout(params[key])
                params["fb_" + key] = params[key][eng.fallback_ids]
            params.update(eng.tensors())
        return {k: jnp.asarray(v) for k, v in params.items()}

    def _compile(self, system, cfg):
        if self._torsions:
            arr = np.asarray(self._torsions, np.float64)
            idx_np = arr[:, :4].astype(np.int32)
        else:
            idx_np = np.zeros((0, 4), np.int32)
        idx = jnp.asarray(idx_np)
        periodic = self._periodic

        def energy_fn(pos, box, p, gp):
            if idx.shape[0] == 0:
                return jnp.zeros((), cfg.accum_dtype)
            b = box if periodic else None
            phi = geom.dihedral_angle(pos[idx[:, 0]], pos[idx[:, 1]],
                                      pos[idx[:, 2]], pos[idx[:, 3]], b)
            e = p["k"] * (1.0 + jnp.cos(p["n"] * phi - p["phase"]))
            return jnp.sum(e.astype(cfg.accum_dtype))

        ef_fn = None
        self._weng = None
        if _use_windowed(cfg, periodic, len(self._torsions)):
            eng = WindowedTerms(idx_np, cfg.n_particles)
            if eng.B > 0:
                self._weng = eng
                fb = jnp.asarray(idx_np[eng.fallback_ids])
                dead = (1.0 - eng.live)[:, :, None]
                ex = jnp.array([1.0, 0.0, 0.0], cfg.dtype)
                ey = jnp.array([0.0, 1.0, 0.0], cfg.dtype)
                ez = jnp.array([0.0, 0.0, 1.0], cfg.dtype)

                def term_energy(slots, p):
                    # padding slots sit at the origin: offset each towards a
                    # fixed non-degenerate dihedral (constant wrt slots) so
                    # grads stay finite; live kills their energy
                    r1 = slots[:, :, 0] + dead * ex
                    r2 = slots[:, :, 1]
                    r3 = slots[:, :, 2] + dead * ey
                    r4 = slots[:, :, 3] + dead * (ey + ez)
                    phi = geom.dihedral_angle(r1, r2, r3, r4, None)
                    e = p["w_k"] * (1.0 + jnp.cos(p["w_n"] * phi
                                                  - p["w_phase"]))
                    return jnp.sum(eng.live * e)

                fallback = None
                if len(eng.fallback_ids):
                    def fallback(pos, box, p, gp):
                        phi = geom.dihedral_angle(
                            pos[fb[:, 0]], pos[fb[:, 1]],
                            pos[fb[:, 2]], pos[fb[:, 3]], None)
                        return jnp.sum(p["fb_k"] * (1.0 + jnp.cos(
                            p["fb_n"] * phi - p["fb_phase"])))

                ef_fn = _make_windowed_ef(eng, term_energy, fallback,
                                          cfg.accum_dtype)
        params = self._pack_params(cfg)

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             ef_fn=ef_fn, uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()))


class RBTorsionForce(Force, _PeriodicMixin):
    """Ryckaert-Bellemans: E = sum_n C_n cos(psi)^n with psi = phi - pi."""

    def __init__(self):
        super().__init__()
        self._torsions = []  # (p1..p4, c0..c5)
        self._periodic = False

    def getNumTorsions(self):
        return len(self._torsions)

    def addTorsion(self, particle1, particle2, particle3, particle4,
                   c0, c1, c2, c3, c4, c5):
        cs = [float(u.strip(c, _ENERGY)) for c in (c0, c1, c2, c3, c4, c5)]
        self._torsions.append((int(particle1), int(particle2), int(particle3),
                               int(particle4), *cs))
        return len(self._torsions) - 1

    def getTorsionParameters(self, index):
        t = self._torsions[index]
        return (t[0], t[1], t[2], t[3],
                *[u.Quantity(c, _ENERGY) for c in t[4:10]])

    def setTorsionParameters(self, index, particle1, particle2, particle3,
                             particle4, c0, c1, c2, c3, c4, c5):
        cs = [float(u.strip(c, _ENERGY)) for c in (c0, c1, c2, c3, c4, c5)]
        self._torsions[index] = (int(particle1), int(particle2), int(particle3),
                                 int(particle4), *cs)

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        out = []
        for t in self._torsions:
            out += [(t[0], t[1]), (t[1], t[2]), (t[2], t[3])]
        return out

    def _pack_params(self, cfg):
        if self._torsions:
            arr = np.asarray(self._torsions, np.float64)
            return {"c": jnp.asarray(arr[:, 4:10].astype(cfg.dtype))}
        return {"c": jnp.zeros((0, 6), cfg.dtype)}

    def _compile(self, system, cfg):
        if self._torsions:
            arr = np.asarray(self._torsions, np.float64)
            idx = jnp.asarray(arr[:, :4].astype(np.int32))
        else:
            idx = jnp.zeros((0, 4), jnp.int32)
        params = self._pack_params(cfg)
        periodic = self._periodic

        def energy_fn(pos, box, p, gp):
            if idx.shape[0] == 0:
                return jnp.zeros((), cfg.accum_dtype)
            b = box if periodic else None
            phi = geom.dihedral_angle(pos[idx[:, 0]], pos[idx[:, 1]],
                                      pos[idx[:, 2]], pos[idx[:, 3]], b)
            cpsi = jnp.cos(phi - jnp.pi)
            # Horner evaluation of sum C_n cpsi^n
            c = p["c"]
            e = c[:, 5]
            for n in (4, 3, 2, 1, 0):
                e = e * cpsi + c[:, n]
            return jnp.sum(e.astype(cfg.accum_dtype))

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()))


class CMAPTorsionForce(Force, _PeriodicMixin):
    """Bicubic-spline energy correction map over pairs of dihedrals
    (CMAPTorsionForce.h: map element energy[i+size*j] is E at angle1=i*2pi/size,
    angle2=j*2pi/size; kernel mapping per
    platforms/common/src/kernels/cmapTorsionForce.cc)."""

    def __init__(self):
        super().__init__()
        self._maps = []      # (size, energy flat list)
        self._torsions = []  # (map, a1..a4, b1..b4)
        self._periodic = False

    def getNumMaps(self):
        return len(self._maps)

    def getNumTorsions(self):
        return len(self._torsions)

    def addMap(self, size, energy):
        energy = [float(u.strip(e, _ENERGY)) for e in energy]
        if len(energy) != size * size:
            raise OpenMMException("CMAP energy array must have size*size elements")
        self._maps.append((int(size), energy))
        return len(self._maps) - 1

    def getMapParameters(self, index):
        size, energy = self._maps[index]
        return size, u.Quantity(list(energy), _ENERGY)

    def setMapParameters(self, index, size, energy):
        energy = [float(u.strip(e, _ENERGY)) for e in energy]
        if len(energy) != size * size:
            raise OpenMMException("CMAP energy array must have size*size elements")
        self._maps[index] = (int(size), energy)

    def addTorsion(self, map, a1, a2, a3, a4, b1, b2, b3, b4):  # noqa: A002
        self._torsions.append((int(map), int(a1), int(a2), int(a3), int(a4),
                               int(b1), int(b2), int(b3), int(b4)))
        return len(self._torsions) - 1

    def getTorsionParameters(self, index):
        return self._torsions[index]

    def setTorsionParameters(self, index, map, a1, a2, a3, a4, b1, b2, b3, b4):  # noqa: A002
        self._torsions[index] = (int(map), int(a1), int(a2), int(a3), int(a4),
                                 int(b1), int(b2), int(b3), int(b4))

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        out = []
        for t in self._torsions:
            _, a1, a2, a3, a4, b1, b2, b3, b4 = t
            out += [(a1, a2), (a2, a3), (a3, a4), (b1, b2), (b2, b3), (b3, b4)]
        return out

    def _pack_params(self, cfg):
        size = self._maps[0][0]
        coeffs = np.stack([
            bicubic_coefficients_periodic(
                np.asarray(energy, np.float64).reshape(size, size, order="F"))
            for _, energy in self._maps])  # (n_maps, size, size, 4, 4)
        return {"coeffs": jnp.asarray(coeffs.astype(cfg.dtype))}

    def _compile(self, system, cfg):
        n_t = len(self._torsions)
        if n_t == 0:
            def zero_fn(pos, box, p, gp):
                return jnp.zeros((), cfg.accum_dtype)
            return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                                 params={}, energy_fn=zero_fn)
        sizes = {s for s, _ in self._maps}
        if len(sizes) != 1:
            # pad all maps to a common coefficient tensor by compiling per-size
            # groups; for now require uniform size (standard CHARMM usage)
            raise OpenMMException("CMAP maps of differing sizes not yet supported")
        size = sizes.pop()
        arr = np.asarray(self._torsions, np.int64)
        map_idx = jnp.asarray(arr[:, 0].astype(np.int32))
        idx_a = jnp.asarray(arr[:, 1:5].astype(np.int32))
        idx_b = jnp.asarray(arr[:, 5:9].astype(np.int32))
        params = self._pack_params(cfg)
        periodic = self._periodic
        two_pi = 2.0 * np.pi

        def energy_fn(pos, box, p, gp):
            b = box if periodic else None
            phi = geom.dihedral_angle(pos[idx_a[:, 0]], pos[idx_a[:, 1]],
                                      pos[idx_a[:, 2]], pos[idx_a[:, 3]], b)
            psi = geom.dihedral_angle(pos[idx_b[:, 0]], pos[idx_b[:, 1]],
                                      pos[idx_b[:, 2]], pos[idx_b[:, 3]], b)
            phi = jnp.mod(phi + two_pi, two_pi)
            psi = jnp.mod(psi + two_pi, two_pi)
            delta = two_pi / size
            s = jnp.minimum(jnp.floor(phi / delta), size - 1).astype(jnp.int32)
            t = jnp.minimum(jnp.floor(psi / delta), size - 1).astype(jnp.int32)
            da = phi / delta - s
            db = psi / delta - t
            c = p["coeffs"][map_idx, s, t]  # (n_t, 4, 4)
            ta = jnp.stack([jnp.ones_like(da), da, da * da, da ** 3], -1)
            tb = jnp.stack([jnp.ones_like(db), db, db * db, db ** 3], -1)
            e = jnp.einsum("ta,tab,tb->t", ta, c, tb)
            return jnp.sum(e.astype(cfg.accum_dtype))

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()))
