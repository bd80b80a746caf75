"""NonbondedForce: Lennard-Jones + Coulomb with NoCutoff / CutoffNonPeriodic /
CutoffPeriodic (reaction field) / Ewald / PME / LJPME.

API and semantics mirror the reference
(/root/reference/openmmapi/include/openmm/NonbondedForce.h:113-144 methods;
exceptions replace standard pair terms and ignore the cutoff,
platforms/common/src/kernels/nonbondedExceptions.cc; the direct-space pair
math follows platforms/common/src/kernels/coulombLennardJones.cc: RF constants
krf/crf per ReferenceLJCoulombIxn.cpp:78-79, erfc direct space, LJ switching
1+x^3(C3+x(C4+x C5)); dispersion correction per
openmmapi/src/NonbondedForceImpl.cpp:236; Ewald/PME auto-params per
NonbondedForceImpl.cpp:144-234; self energy with includeReciprocal and
dispersion correction with includeDirect per CudaKernels.cpp:1133,1347).

TPU design: the direct space is a blocked dense tile sweep (ops/pairs.py);
reciprocal space is scatter-spread + XLA FFT (ops/pme.py); forces come from
jax.grad of the single fused energy.
"""
from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..constants import ONE_4PI_EPS0
from ..exceptions import OpenMMException
from ..ops import geometry as geom
from ..ops import pairs as pairs_mod
from ..ops import pme as pme_mod
from .base import CompiledForce, Force

_E = u.kilojoule_per_mole
_NM = u.nanometer
TWO_OVER_SQRT_PI = 2.0 / math.sqrt(math.pi)


def _erfc_f32(x, exp_x2):
    """Hastings rational erfc approximation (max err 1.5e-7), the same one
    the reference f32 kernels use (coulombLennardJones.cc:18-20). Takes the
    precomputed exp(-x^2) so the transcendental is shared with the force
    term. Used only in single/mixed precision; f64 uses the exact erfc."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (0.254829592 + (-0.284496736 + (1.421413741 + (-1.453152027
            + 1.061405429 * t) * t) * t) * t) * t
    return poly * exp_x2


class NonbondedForce(Force):
    # NonbondedMethod enum (NonbondedForce.h:113-144)
    NoCutoff = 0
    CutoffNonPeriodic = 1
    CutoffPeriodic = 2
    Ewald = 3
    PME = 4
    LJPME = 5

    def __init__(self):
        super().__init__()
        self._particles = []        # (charge, sigma, epsilon)
        self._exceptions = []       # (p1, p2, chargeProd, sigma, epsilon)
        self._exception_index = {}  # (min,max) -> index
        self._method = NonbondedForce.NoCutoff
        self._cutoff = 1.0
        self._switching = False
        self._switch_dist = -1.0
        self._rf_dielectric = 78.3
        self._ewald_tol = 5e-4
        self._alpha = 0.0
        self._grid = (0, 0, 0)
        self._lj_alpha = 0.0
        self._lj_grid = (0, 0, 0)
        self._dispersion_correction = True
        self._exceptions_use_pbc = False
        self._include_direct = True
        self._recip_group = -1
        self._global_params = []    # (name, default)
        self._particle_offsets = []  # (param, particle, cScale, sScale, eScale)
        self._exception_offsets = []  # (param, exception, cpScale, sScale, eScale)

    # ------------------------------------------------------------------ API
    def getNumParticles(self):
        return len(self._particles)

    def addParticle(self, charge, sigma, epsilon):
        self._particles.append((float(u.strip(charge, u.elementary_charge)),
                                float(u.strip(sigma, _NM)),
                                float(u.strip(epsilon, _E))))
        return len(self._particles) - 1

    def getParticleParameters(self, index):
        c, s, e = self._particles[index]
        return (u.Quantity(c, u.elementary_charge), u.Quantity(s, _NM),
                u.Quantity(e, _E))

    def setParticleParameters(self, index, charge, sigma, epsilon):
        self._particles[index] = (float(u.strip(charge, u.elementary_charge)),
                                  float(u.strip(sigma, _NM)),
                                  float(u.strip(epsilon, _E)))

    def getNumExceptions(self):
        return len(self._exceptions)

    def addException(self, particle1, particle2, chargeProd, sigma, epsilon,
                     replace=False):
        p1, p2 = int(particle1), int(particle2)
        key = (min(p1, p2), max(p1, p2))
        cp = float(u.strip(chargeProd, u.elementary_charge ** 2))
        s = float(u.strip(sigma, _NM))
        e = float(u.strip(epsilon, _E))
        if key in self._exception_index:
            if not replace:
                raise OpenMMException(
                    "NonbondedForce: multiple exceptions for particles %d and %d"
                    % (p1, p2))
            idx = self._exception_index[key]
            self._exceptions[idx] = (p1, p2, cp, s, e)
            return idx
        self._exceptions.append((p1, p2, cp, s, e))
        self._exception_index[key] = len(self._exceptions) - 1
        return len(self._exceptions) - 1

    def getExceptionParameters(self, index):
        p1, p2, cp, s, e = self._exceptions[index]
        return (p1, p2, u.Quantity(cp, u.elementary_charge ** 2),
                u.Quantity(s, _NM), u.Quantity(e, _E))

    def setExceptionParameters(self, index, particle1, particle2, chargeProd,
                               sigma, epsilon):
        self._exceptions[index] = (int(particle1), int(particle2),
                                   float(u.strip(chargeProd, u.elementary_charge ** 2)),
                                   float(u.strip(sigma, _NM)),
                                   float(u.strip(epsilon, _E)))

    def createExceptionsFromBonds(self, bonds, coulomb14Scale, lj14Scale):
        """1-2/1-3 fully excluded; 1-4 scaled (semantics of
        NonbondedForce::createExceptionsFromBonds / NonbondedForceImpl)."""
        bonded = {}
        for b1, b2 in bonds:
            bonded.setdefault(int(b1), set()).add(int(b2))
            bonded.setdefault(int(b2), set()).add(int(b1))
        exclusions = {}  # (i,j) -> separation (2 or 3 bonds)
        for p1 in bonded:
            for p2 in bonded[p1]:
                key = (min(p1, p2), max(p1, p2))
                exclusions[key] = 2
        for p1 in bonded:
            for mid in bonded[p1]:
                for p2 in bonded[mid]:
                    if p2 == p1:
                        continue
                    key = (min(p1, p2), max(p1, p2))
                    exclusions.setdefault(key, 3)
        pairs14 = {}
        for p1 in bonded:
            for a in bonded[p1]:
                for b in bonded[a]:
                    if b == p1:
                        continue
                    for p2 in bonded[b]:
                        if p2 == p1 or p2 in bonded[p1] or p2 == a:
                            continue
                        key = (min(p1, p2), max(p1, p2))
                        if key not in exclusions:
                            pairs14[key] = True
        for (p1, p2) in sorted(exclusions):
            self.addException(p1, p2, 0.0, 1.0, 0.0, True)
        for (p1, p2) in sorted(pairs14):
            c1, s1, e1 = self._particles[p1]
            c2, s2, e2 = self._particles[p2]
            self.addException(p1, p2, coulomb14Scale * c1 * c2,
                              0.5 * (s1 + s2),
                              lj14Scale * math.sqrt(e1 * e2), True)

    # -- method / cutoff / etc --------------------------------------------------
    def getNonbondedMethod(self):
        return self._method

    def setNonbondedMethod(self, method):
        if method < 0 or method > 5:
            raise OpenMMException("NonbondedForce: illegal nonbonded method")
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

    def getReactionFieldDielectric(self):
        return self._rf_dielectric

    def setReactionFieldDielectric(self, dielectric):
        self._rf_dielectric = float(dielectric)

    def getEwaldErrorTolerance(self):
        return self._ewald_tol

    def setEwaldErrorTolerance(self, tol):
        self._ewald_tol = float(tol)

    def getPMEParameters(self):
        return self._alpha, *self._grid

    def setPMEParameters(self, alpha, nx, ny, nz):
        self._alpha = float(u.strip(alpha, _NM ** -1))
        self._grid = (int(nx), int(ny), int(nz))

    def getLJPMEParameters(self):
        return self._lj_alpha, *self._lj_grid

    def setLJPMEParameters(self, alpha, nx, ny, nz):
        self._lj_alpha = float(u.strip(alpha, _NM ** -1))
        self._lj_grid = (int(nx), int(ny), int(nz))

    def getPMEParametersInContext(self, context):
        mods = context._modules_for_force(self)
        meta = mods[0].params.get("_pme_meta") if mods else None
        if meta is None:
            return self.getPMEParameters()
        return meta

    def getUseDispersionCorrection(self):
        return self._dispersion_correction

    def setUseDispersionCorrection(self, use):
        self._dispersion_correction = bool(use)

    def getExceptionsUsePeriodicBoundaryConditions(self):
        return self._exceptions_use_pbc

    def setExceptionsUsePeriodicBoundaryConditions(self, flag):
        self._exceptions_use_pbc = bool(flag)

    def getIncludeDirectSpace(self):
        return self._include_direct

    def setIncludeDirectSpace(self, include):
        self._include_direct = bool(include)

    def getReciprocalSpaceForceGroup(self):
        return self._recip_group

    def setReciprocalSpaceForceGroup(self, group):
        if group < -1 or group > 31:
            raise OpenMMException("Force group must be between -1 and 31")
        self._recip_group = int(group)

    # -- global parameters & offsets ----------------------------------------------
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

    def setGlobalParameterDefaultValue(self, index, defaultValue):
        self._global_params[index] = (self._global_params[index][0],
                                      float(u.strip(defaultValue)))

    def getNumParticleParameterOffsets(self):
        return len(self._particle_offsets)

    def addParticleParameterOffset(self, parameter, particleIndex, chargeScale,
                                   sigmaScale, epsilonScale):
        self._particle_offsets.append((str(parameter), int(particleIndex),
                                       float(chargeScale), float(sigmaScale),
                                       float(epsilonScale)))
        return len(self._particle_offsets) - 1

    def getParticleParameterOffset(self, index):
        return self._particle_offsets[index]

    def setParticleParameterOffset(self, index, parameter, particleIndex,
                                   chargeScale, sigmaScale, epsilonScale):
        self._particle_offsets[index] = (str(parameter), int(particleIndex),
                                         float(chargeScale), float(sigmaScale),
                                         float(epsilonScale))

    def getNumExceptionParameterOffsets(self):
        return len(self._exception_offsets)

    def addExceptionParameterOffset(self, parameter, exceptionIndex,
                                    chargeProdScale, sigmaScale, epsilonScale):
        self._exception_offsets.append((str(parameter), int(exceptionIndex),
                                        float(chargeProdScale), float(sigmaScale),
                                        float(epsilonScale)))
        return len(self._exception_offsets) - 1

    def getExceptionParameterOffset(self, index):
        return self._exception_offsets[index]

    def setExceptionParameterOffset(self, index, parameter, exceptionIndex,
                                    chargeProdScale, sigmaScale, epsilonScale):
        self._exception_offsets[index] = (str(parameter), int(exceptionIndex),
                                          float(chargeProdScale), float(sigmaScale),
                                          float(epsilonScale))

    def usesPeriodicBoundaryConditions(self):
        return self._method in (NonbondedForce.CutoffPeriodic, NonbondedForce.Ewald,
                                NonbondedForce.PME, NonbondedForce.LJPME)

    def _escalate_nl_capacity(self):
        """Grow the persistent neighbor-list capacity after an overflow
        (Context re-runs _compile; the reference resizes its interaction
        buffers the same way, ContextImpl.cpp:298-307)."""
        self._nl_scale = getattr(self, "_nl_scale", 1.0) * 1.4

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        # exceptions with nonzero chargeProd or epsilon bond particles into a
        # molecule (NonbondedForceImpl::getBondedParticles semantics)
        return [(e[0], e[1]) for e in self._exceptions if e[2] != 0 or e[4] != 0]

    # ------------------------------------------------------------- compilation
    def _default_global_values(self):
        return {name: val for name, val in self._global_params}

    def _resolved_pme_params(self, system):
        box = system._box_array()
        widths = [box[0][0], box[1][1], box[2][2]]
        alpha, grid = self._alpha, self._grid
        if alpha == 0.0:
            alpha = pme_mod.ewald_alpha(self._cutoff, self._ewald_tol)
            grid = tuple(pme_mod.pme_grid_size(widths, alpha, self._ewald_tol))
        else:
            grid = tuple(pme_mod.find_legal_fft_dim(g) for g in grid)
        return alpha, grid

    def _resolved_ljpme_params(self, system):
        box = system._box_array()
        widths = [box[0][0], box[1][1], box[2][2]]
        alpha, grid = self._lj_alpha, self._lj_grid
        if alpha == 0.0:
            alpha = pme_mod.ewald_alpha(self._cutoff, self._ewald_tol)
            grid = tuple(pme_mod.pme_grid_size(widths, alpha, self._ewald_tol, lj=True))
        else:
            grid = tuple(pme_mod.find_legal_fft_dim(g) for g in grid)
        return alpha, grid

    def _pack_params(self, cfg):
        """Runtime-updatable parameter pytree (updateParametersInContext)."""
        n = len(self._particles)
        arr = (np.asarray(self._particles, np.float64) if n
               else np.zeros((0, 3), np.float64))
        p = {
            "charge": arr[:, 0].astype(cfg.dtype),
            "sigma": arr[:, 1].astype(cfg.dtype),
            "epsilon": arr[:, 2].astype(cfg.dtype),
        }
        m = len(self._exceptions)
        earr = (np.asarray([e[2:] for e in self._exceptions], np.float64)
                if m else np.zeros((0, 3), np.float64))
        p["exc_chargeprod"] = earr[:, 0].astype(cfg.dtype)
        p["exc_sigma"] = earr[:, 1].astype(cfg.dtype)
        p["exc_epsilon"] = earr[:, 2].astype(cfg.dtype)
        if self.usesPeriodicBoundaryConditions() and self._dispersion_correction \
                and self._method != NonbondedForce.LJPME:
            p["disp_coeff"] = np.asarray(self._dispersion_coefficient(),
                                         cfg.accum_dtype)
        eng = getattr(self, "_exc_weng", None)
        if eng is not None:
            # windowed layouts for the banded exception engine, incl. the
            # particle charge product the Ewald exclusion correction uses
            qq = np.array([arr[e[0], 0] * arr[e[1], 0]
                           for e in self._exceptions], np.float64) \
                if m else np.zeros(0, np.float64)
            p["exc_qq"] = qq.astype(cfg.dtype)
            for key in ("exc_chargeprod", "exc_sigma", "exc_epsilon",
                        "exc_qq"):
                p["w_" + key] = eng.layout(p[key])
                p["fb_" + key] = p[key][eng.fallback_ids]
            p.update(eng.tensors())
        return {k: jnp.asarray(v) for k, v in p.items()}

    def _dispersion_coefficient(self):
        """Long-range LJ correction coefficient; energy adds coeff/volume
        (NonbondedForceImpl::calcDispersionCorrection). The switched-region
        integral is evaluated with Gauss-Legendre quadrature instead of the
        reference's closed form — same quantity, simpler code."""
        if self._method in (NonbondedForce.NoCutoff, NonbondedForce.CutoffNonPeriodic):
            return 0.0
        n = len(self._particles)
        sigma = np.array([p[1] for p in self._particles])
        eps = np.array([p[2] for p in self._particles])
        defaults = self._default_global_values()
        for (param, index, csc, ssc, esc) in self._particle_offsets:
            sigma[index] += defaults[param] * ssc
            eps[index] += defaults[param] * esc
        classes = {}
        for s, e in zip(sigma, eps):
            classes[(s, e)] = classes.get((s, e), 0) + 1
        keys = list(classes)
        rc = self._cutoff
        rs = self._switch_dist
        use_switch = self._switching

        if use_switch:
            x_gl, w_gl = np.polynomial.legendre.leggauss(64)
            r_q = 0.5 * (rc - rs) * x_gl + 0.5 * (rc + rs)
            w_q = 0.5 * (rc - rs) * w_gl
            t = (r_q - rs) / (rc - rs)
            switch = 1.0 - t * t * t * (10.0 - 15.0 * t + 6.0 * t * t)

        sum1 = sum2 = sum3 = 0.0
        for a, (s1, e1) in enumerate(keys):
            for b, (s2, e2) in enumerate(keys[:a + 1]):
                if a == b:
                    count = classes[keys[a]] * (classes[keys[a]] + 1) / 2.0
                    sig, epsi = s1, e1
                else:
                    count = float(classes[keys[a]]) * classes[keys[b]]
                    sig = 0.5 * (s1 + s2)
                    epsi = math.sqrt(e1 * e2)
                sig2 = sig * sig
                sig6 = sig2 * sig2 * sig2
                sum1 += count * epsi * sig6 * sig6
                sum2 += count * epsi * sig6
                if use_switch:
                    fr = (sig6 * sig6 / r_q ** 12 - sig6 / r_q ** 6)
                    sum3 += count * epsi * np.sum(w_q * fr * (1.0 - switch) * r_q * r_q)
        n_int = n * (n + 1) / 2.0
        sum1 /= n_int
        sum2 /= n_int
        sum3 /= n_int
        return 8.0 * n * n * math.pi * (sum1 / (9.0 * rc ** 9)
                                        - sum2 / (3.0 * rc ** 3) + 4.0 * sum3)

    def _offset_arrays(self, gp_names, cfg):
        """Pack parameter offsets into gather/scatter arrays."""
        name_to_idx = {n: i for i, n in enumerate(gp_names)}

        def pack(offsets):
            if not offsets:
                return None
            pi = np.array([name_to_idx[o[0]] for o in offsets], np.int32)
            tgt = np.array([o[1] for o in offsets], np.int32)
            sc = np.array([[o[2], o[3], o[4]] for o in offsets], np.float64)
            return (jnp.asarray(pi), jnp.asarray(tgt),
                    jnp.asarray(sc.astype(cfg.dtype)))

        return pack(self._particle_offsets), pack(self._exception_offsets)

    def _compile(self, system, cfg):
        method = self._method
        n = cfg.n_particles
        if len(self._particles) != n:
            raise OpenMMException(
                "NonbondedForce must have same number of particles as the System")
        dtype = cfg.dtype
        accum = cfg.accum_dtype
        block = cfg.pair_block
        cutoff = self._cutoff
        periodic = self.usesPeriodicBoundaryConditions()
        use_cutoff = method != NonbondedForce.NoCutoff
        is_ewald_family = method in (NonbondedForce.Ewald, NonbondedForce.PME,
                                     NonbondedForce.LJPME)
        gp_names = [name for name, _ in self._global_params]
        particle_offs, exception_offs = self._offset_arrays(gp_names, cfg)

        # exclusion table from exceptions (exceptions REPLACE standard terms)
        excl_pairs = [(e[0], e[1]) for e in self._exceptions]
        n_pad = pairs_mod.pad_to_block(max(n, 1), block)
        excl_np = pairs_mod.build_exclusion_table(n, excl_pairs)
        excl_pad = np.full((n_pad, excl_np.shape[1]), -1, np.int32)
        excl_pad[:n] = excl_np
        exclusions = jnp.asarray(excl_pad)
        exc_idx = (np.asarray([e[:2] for e in self._exceptions], np.int32)
                   if self._exceptions else np.zeros((0, 2), np.int32))
        exc_idx = jnp.asarray(exc_idx)

        # reaction field constants (ReferenceLJCoulombIxn.cpp:78-79)
        eps_solv = self._rf_dielectric
        krf = (1.0 / cutoff ** 3) * (eps_solv - 1.0) / (2.0 * eps_solv + 1.0)
        crf = (1.0 / cutoff) * 3.0 * eps_solv / (2.0 * eps_solv + 1.0)

        # switching constants
        use_switch = self._switching and use_cutoff
        rs = self._switch_dist

        # Ewald / PME setup
        alpha = 0.0
        ewald_kmax = None
        pme_grid = None
        pme_data = {}
        lj_alpha = 0.0
        lj_grid = None
        if method == NonbondedForce.Ewald:
            box = system._box_array()
            alpha = pme_mod.ewald_alpha(cutoff, self._ewald_tol)
            ewald_kmax = pme_mod.ewald_kmax(
                [box[0][0], box[1][1], box[2][2]], alpha, self._ewald_tol)
        elif method in (NonbondedForce.PME, NonbondedForce.LJPME):
            alpha, pme_grid = self._resolved_pme_params(system)
            md = pme_mod.make_pme_recip_data(pme_grid, 5)
            pme_data = {k: jnp.asarray(v.astype(dtype)) for k, v in md.items()}
            if method == NonbondedForce.LJPME:
                lj_alpha, lj_grid = self._resolved_ljpme_params(system)
                mdl = pme_mod.make_pme_recip_data(lj_grid, 5)
                pme_data.update({k + "_lj": jnp.asarray(v.astype(dtype))
                                 for k, v in mdl.items()})

        self._compiled_meta = {"alpha": alpha, "grid": pme_grid,
                               "lj_alpha": lj_alpha, "lj_grid": lj_grid,
                               "ewald_kmax": ewald_kmax}
        is_ljpme = method == NonbondedForce.LJPME
        if is_ljpme:
            dar2c = (lj_alpha * cutoff) ** 2
            mult_shift6 = -(1.0 - math.exp(-dar2c)
                            * (1.0 + dar2c + 0.5 * dar2c * dar2c)) / cutoff ** 6
            inv_cut6 = 1.0 / cutoff ** 6

        params = self._pack_params(cfg)

        def effective_particle_params(p, gp):
            charge, sigma, eps = p["charge"], p["sigma"], p["epsilon"]
            if particle_offs is not None:
                pi, tgt, sc = particle_offs
                vals = jnp.stack([gp[name] for name in gp_names]).astype(dtype) \
                    if gp_names else jnp.zeros(1, dtype)
                v = vals[pi]
                charge = charge.at[tgt].add(v * sc[:, 0])
                sigma = sigma.at[tgt].add(v * sc[:, 1])
                eps = eps.at[tgt].add(v * sc[:, 2])
            return charge, sigma, eps

        def effective_exception_params(p, gp):
            cp, sig, eps = p["exc_chargeprod"], p["exc_sigma"], p["exc_epsilon"]
            if exception_offs is not None:
                pi, tgt, sc = exception_offs
                vals = jnp.stack([gp[name] for name in gp_names]).astype(dtype) \
                    if gp_names else jnp.zeros(1, dtype)
                v = vals[pi]
                cp = cp.at[tgt].add(v * sc[:, 0])
                sig = sig.at[tgt].add(v * sc[:, 1])
                eps = eps.at[tgt].add(v * sc[:, 2])
            return cp, sig, eps

        def lj_and_coulomb(r2, pi, pj):
            """Per-tile pair energies. r2 is pre-masked 'safe'."""
            inv_r2 = 1.0 / r2
            r = jnp.sqrt(r2)
            inv_r = 1.0 / r
            sig = 0.5 * (pi["sigma"][:, None] + pj["sigma"][None, :])
            eps4 = 4.0 * jnp.sqrt(pi["epsilon"][:, None] * pj["epsilon"][None, :])
            sig2 = sig * sig * inv_r2
            sig6 = sig2 * sig2 * sig2
            e_lj = eps4 * sig6 * (sig6 - 1.0)
            if use_switch:
                x = jnp.clip(r - rs, 0.0, None)
                t = x / (cutoff - rs)
                sw = 1.0 - t * t * t * (10.0 - 15.0 * t + 6.0 * t * t)
                e_lj = e_lj * sw
            if is_ljpme:
                # multiplicative-combination grid complement + potential
                # shifts (coulombLennardJones.cc DO_LJPME block)
                c6g = eps4 * (pi["sigma"][:, None] * pj["sigma"][None, :]) ** 3
                dar2 = (lj_alpha * lj_alpha) * r2
                eprefac = 1.0 + dar2 + 0.5 * dar2 * dar2
                exp_dar2 = jnp.exp(-dar2)
                coef = c6g * inv_r2 * inv_r2 * inv_r2
                e_lj = e_lj + coef * (1.0 - exp_dar2 * eprefac)
                sig6c = (sig * sig) ** 3 * inv_cut6
                e_lj = e_lj + eps4 * sig6c * (1.0 - sig6c) \
                    + mult_shift6 * c6g
            qq = ONE_4PI_EPS0 * pi["charge"][:, None] * pj["charge"][None, :]
            if is_ewald_family:
                if dtype == jnp.float32:
                    ar = alpha * r
                    e_c = qq * inv_r * _erfc_f32(ar, jnp.exp(-ar * ar))
                else:
                    e_c = qq * inv_r * jax.scipy.special.erfc(alpha * r)
            elif use_cutoff:
                e_c = qq * (inv_r + krf * r2 - crf)
            else:
                e_c = qq * inv_r
            e = e_lj + e_c
            if use_cutoff:
                e = jnp.where(r2 < cutoff * cutoff, e, 0.0)
            return e

        def exception_energy(pos, box, p, gp):
            if exc_idx.shape[0] == 0:
                return jnp.zeros((), accum)
            cp, sig, eps = effective_exception_params(p, gp)
            b = box if self._exceptions_use_pbc else None
            dr = geom.bond_vectors(pos, exc_idx, b)
            r2 = jnp.sum(dr * dr, axis=-1)
            inv_r2 = 1.0 / r2
            sig6 = (sig * sig * inv_r2) ** 3
            e = 4.0 * eps * sig6 * (sig6 - 1.0) \
                + ONE_4PI_EPS0 * cp * jnp.sqrt(inv_r2)
            return jnp.sum(e.astype(accum))

        def exclusion_correction(pos, box, charge, gp, sigma=None, eps=None):
            """Subtract erf(alpha r)/r for every excluded pair (the reciprocal
            sum includes all pairs; pmeExclusions.cc / ewald.cc counterpart);
            for LJPME also cancel the pair's dispersion-grid contribution."""
            if exc_idx.shape[0] == 0:
                return jnp.zeros((), accum)
            dr = geom.bond_vectors(pos, exc_idx, box if periodic else None)
            r2 = jnp.sum(dr * dr, axis=-1)
            r = jnp.sqrt(r2)
            qq = ONE_4PI_EPS0 * charge[exc_idx[:, 0]] * charge[exc_idx[:, 1]]
            e = -qq * jax.scipy.special.erf(alpha * r) / r
            total = jnp.sum(e.astype(accum))
            if is_ljpme:
                c6i = 2.0 * jnp.sqrt(eps) * sigma ** 3
                c6g = c6i[exc_idx[:, 0]] * c6i[exc_idx[:, 1]]
                dar2 = (lj_alpha * lj_alpha) * r2
                g_lr = 1.0 - jnp.exp(-dar2) * (1.0 + dar2 + 0.5 * dar2 * dar2)
                total = total + jnp.sum((c6g / r2 ** 3 * g_lr).astype(accum))
            return total

        include_direct = self._include_direct

        def lj_coulomb_ef(r2, pi, pj):
            """(energy, dE/dr2) with broadcast pi/pj — the analytic-force
            twin of lj_and_coulomb (derivatives per coulombLennardJones.cc)."""
            inv_r2 = 1.0 / r2
            r = jnp.sqrt(r2)
            inv_r = 1.0 / r
            sig = 0.5 * (pi["sigma"] + pj["sigma"])
            eps4 = 4.0 * jnp.sqrt(pi["epsilon"] * pj["epsilon"])
            s2 = sig * sig * inv_r2
            s6 = s2 * s2 * s2
            e_lj = eps4 * s6 * (s6 - 1.0)
            de_lj = -3.0 * eps4 * s6 * (2.0 * s6 - 1.0) * inv_r2
            if use_switch:
                x = jnp.clip(r - rs, 0.0, None)
                t = x / (cutoff - rs)
                sw = 1.0 - t * t * t * (10.0 - 15.0 * t + 6.0 * t * t)
                dsw_dr2 = (-30.0 * t * t * (1.0 - t) * (1.0 - t)
                           / (cutoff - rs)) * (0.5 * inv_r)
                de_lj = de_lj * sw + e_lj * dsw_dr2
                e_lj = e_lj * sw
            if is_ljpme:
                c6g = eps4 * (pi["sigma"] * pj["sigma"]) ** 3
                dar2 = (lj_alpha * lj_alpha) * r2
                dar4 = dar2 * dar2
                eprefac = 1.0 + dar2 + 0.5 * dar4
                dprefac = eprefac + dar4 * dar2 / 6.0
                exp_dar2 = jnp.exp(-dar2)
                coef = c6g * inv_r2 * inv_r2 * inv_r2
                e_lj = e_lj + coef * (1.0 - exp_dar2 * eprefac)
                de_lj = de_lj - 3.0 * coef * (1.0 - exp_dar2 * dprefac) * inv_r2
                sig6c = (sig * sig) ** 3 * inv_cut6
                e_lj = e_lj + eps4 * sig6c * (1.0 - sig6c) \
                    + mult_shift6 * c6g
            qq = ONE_4PI_EPS0 * pi["charge"] * pj["charge"]
            if is_ewald_family:
                exp_a2r2 = jnp.exp(-alpha * alpha * r2)
                if dtype == jnp.float32:
                    erfc_ar = _erfc_f32(alpha * r, exp_a2r2)
                else:
                    erfc_ar = jax.scipy.special.erfc(alpha * r)
                e_c = qq * inv_r * erfc_ar
                de_c = (-qq * (erfc_ar * inv_r2
                               + TWO_OVER_SQRT_PI * alpha
                               * exp_a2r2 * inv_r)
                        ) * (0.5 * inv_r)
            elif use_cutoff:
                e_c = qq * (inv_r + krf * r2 - crf)
                de_c = qq * (-0.5 * inv_r2 * inv_r + krf)
            else:
                e_c = qq * inv_r
                de_c = -0.5 * qq * inv_r2 * inv_r
            e = e_lj + e_c
            de = de_lj + de_c
            if use_cutoff:
                inside = r2 < cutoff * cutoff
                e = jnp.where(inside, e, 0.0)
                de = jnp.where(inside, de, 0.0)
            return e, de

        # neighbor-list culling pays off once the block grid is nontrivial
        use_neighbor = (use_cutoff and cfg.use_neighbor_list and n >= 1024
                        and periodic)
        nl_block = 64
        # Row granularity of the PALLAS tile engine only (padding and the
        # XLA rows engine stay at 64). Finer rows cull candidates
        # geometrically tighter (16-atom bboxes reach ~3x fewer bricks than
        # 64-atom ones at liquid density); the kernel groups 64//pl_row
        # consecutive rows per program so per-program fixed costs stay
        # amortized (see pallas_pairs._kernel_body).
        pl_row = int(os.environ.get("OMM_TPU_NL_ROW", "16"))
        assert pl_row in (16, 32, 64)
        pl_rows_per_program = 64 // pl_row
        # kernel chunk width scales with the row size so the exclusion /
        # image prefix classes keep their resolution on smaller rows
        pl_kq = {64: 128, 32: 64, 16: 32}[pl_row]
        # Direct-space tile engine: 'pallas' (hand-scheduled TPU kernel) or
        # 'rows' (XLA tile sweep). Both reuse a PERSISTENT candidate state
        # (spatial sort + block culling at cutoff + skin) carried in the
        # Context aux and rebuilt on the motion predicate; OMM_TPU_DIRECT
        # overrides the choice, OMM_TPU_DIRECT=perstep disables persistence.
        engine_env = os.environ.get("OMM_TPU_DIRECT", "auto")
        if use_neighbor:
            n_pad = pairs_mod.pad_to_block(n, nl_block)
            excl_np2 = pairs_mod.build_exclusion_table(n, excl_pairs,
                                                       pad_multiple=2)
            excl_pad2 = np.full((n_pad, excl_np2.shape[1]), -1, np.int32)
            excl_pad2[:n] = excl_np2
            exclusions = jnp.asarray(excl_pad2)
            # density-based per-row candidate count (full-matrix traversal).
            # Spatial sorting makes blocks ~cubic, so the cube-volume estimate
            # holds; overflow poisons the energy with NaN so a blown estimate
            # can never be silently wrong.
            box0 = system._box_array()
            vol = float(box0[0][0] * box0[1][1] * box0[2][2])
            nb_blocks = n_pad // nl_block
            block_side = (nl_block * vol / n) ** (1.0 / 3.0)
            # snake-ordered blocks have bbox half-extents ~0.6x the cube
            # side on average; the measured max close-block count at DHFR
            # scale matches reach = rc + 1.85*block_side (mean 67, max 98 of
            # 375 blocks), so budget that plus a 1.35x safety margin
            nl_scale = getattr(self, "_nl_scale", 1.0)
            # default measured on DHFR-PME/v5e: 0.25 amortizes rebuilds best
            # (12.8 -> 14.0 ns/day vs 0.1; sweep 2026-08-18 in SURVEY §10)
            nl_skin = float(os.environ.get("OMM_TPU_NL_SKIN", "0.25"))
            reach = cutoff + 1.85 * block_side
            neigh = (nb_blocks / vol) * (4.0 / 3.0) * math.pi * reach ** 3
            margin = float(os.environ.get("OMM_TPU_NL_MARGIN", "1.6")) \
                * nl_scale
            self._nl_max_cols = min(nb_blocks, int(neigh * margin) + 4)
            self._nl_sort_cell = block_side
            # skinned budget for the persistent state
            reach_s = cutoff + nl_skin + 1.85 * block_side
            neigh_s = (nb_blocks / vol) * (4.0 / 3.0) * math.pi * reach_s ** 3
            nl_max_cols_s = min(nb_blocks, int(neigh_s * margin) + 4)
            # compacted-column capacity (atoms within reach of a block bbox):
            # density * sphere-dilated block volume with the worst-case
            # 2-brick z straddle (a, a, 2a), plus a variance margin
            rho = n / vol
            rr = cutoff + nl_skin
            a = b_ = block_side
            c_ = 2.0 * block_side
            vol_dil = (a * b_ * c_
                       + 2.0 * rr * (a * b_ + a * c_ + b_ * c_)
                       + math.pi * rr * rr * (a + b_ + c_)
                       + (4.0 / 3.0) * math.pi * rr ** 3)
            col_margin = float(os.environ.get("OMM_TPU_NL_COL_MARGIN",
                                              "1.25")) * nl_scale
            self._nl_col_cap = min(
                n_pad, int(-(-(rho * vol_dil * col_margin) // 128) * 128))
            # Pallas-engine tuning (measured, DHFR-scale probe 2026-08-19):
            # (a) a 0.6x sort cell tightens brick bboxes (snake order over
            # finer cells: candidate count 305 -> 225 bricks/row, kernel
            # 2.8 -> 2.2 ms); (b) a DIRECT density-derived brick budget
            # replaces the block-budget x4 x0.8 subset bound, which
            # over-provisioned ~2x (dead candidate chunks still cost
            # prologue gather + pipeline DMA: sweep 4.5 -> 3.6 ms).
            # Calibration: measured max candidate count fits
            # (nq/vol)(4/3)pi (reach + 0.95*s64 + 0.85*s16)^3 at SCF=0.6;
            # 1.18x variance margin on top. Overflow poisons + escalates
            # via nl_scale, never silent.
            scf = float(os.environ.get("OMM_TPU_NL_SCF", "0.6"))
            self._nl_sort_cell_pallas = scf * block_side
            s16 = (16.0 * vol / n) ** (1.0 / 3.0)
            # row-bbox reach scales with the pallas ROW granularity: 64-atom
            # rows calibrated at 0.95x the row cube side (measured, SURVEY
            # §10); 16-atom rows are brick-sized, so both extents use the
            # brick calibration. Overflow poisons + escalates, never silent.
            s_row = (pl_row * vol / n) ** (1.0 / 3.0)
            c_row = {64: 0.95, 32: 0.90, 16: 0.85}[pl_row]
            r_q = (cutoff + nl_skin + c_row * s_row + 0.85 * s16)
            nq_bricks = n_pad // 16
            bq_margin = float(os.environ.get("OMM_TPU_NL_BRICK_MARGIN",
                                             "1.18")) * nl_scale
            self._nl_max_bricks = min(nq_bricks, int(
                (nq_bricks / vol) * (4.0 / 3.0) * math.pi * r_q ** 3
                * bq_margin) + 8)
            # the Pallas engine bakes parameter planes at list build, so it
            # requires parameters that can't drift mid-trajectory via global
            # parameter offsets (the rows engine re-sorts them every step)
            pallas_ok = (cfg.platform_name == "TPU"
                         and dtype == jnp.float32
                         and not is_ljpme
                         and particle_offs is None)
            # build-time candidate image shifts replace the per-pair minimum
            # image when the box is comfortably larger than (cutoff + skin +
            # block extents); the exact per-pair bound is still checked at
            # every rebuild (violations poison via the overflow channel)
            box_min = min(float(box0[0][0]), float(box0[1][1]),
                          float(box0[2][2]))
            self._nl_use_shift = (
                box_min > 2.0 * (cutoff + nl_skin) + 4.5 * block_side
                and os.environ.get("OMM_TPU_NL_SHIFT", "0") == "1")
            direct_engine = ("pallas" if pallas_ok else "rows") \
                if engine_env in ("auto", "perstep") else engine_env
        else:
            direct_engine = "n2"
        self._direct_engine = direct_engine   # introspection (bench harness)

        # forward-only z-slab PME (ops/pme_zslab.py) rides the same persistent
        # aux as the direct tile state; it replaces the jax.grad double pass
        # through the dense spread on the TPU fast path
        use_zslab = (use_neighbor and direct_engine == "pallas"
                     and method == NonbondedForce.PME and not is_ljpme
                     and os.environ.get("OMM_TPU_PME_ZSLAB", "1") == "1")
        if use_zslab:
            from ..ops import pme_zslab
            # z-window drift margin MUST cover the rebuild predicate's
            # displacement bound (skin/2, plus ~one step of motion past the
            # predicate) in z grid cells, or the spread silently loses
            # charge from drifted atoms between rebuilds
            z_cell = float(box0[2][2]) / pme_grid[2]
            drift_cells = max(1, int(math.ceil(
                (0.5 * nl_skin + 0.02) / z_cell)))
            zslab_cfg = pme_zslab.zslab_config(
                n, pme_grid,
                margin=1.25 * getattr(self, "_nl_scale", 1.0),
                drift_cells=drift_cells)

        # windowed banded-selection exceptions (ops/bandsel.py): the
        # exception pair terms and the Ewald exclusion corrections iterate
        # the same static pair list, so both move off the gather+scatter
        # autodiff lane onto analytic forces with block-banded matmuls.
        # Requires static parameters (no offsets) and non-periodic exception
        # math (the reference default; exceptions ignore the cutoff).
        self._exc_weng = None
        if (use_neighbor and dtype == jnp.float32 and not is_ljpme
                and particle_offs is None and exception_offs is None
                and not self._exceptions_use_pbc and len(self._exceptions)
                and os.environ.get("OMM_TPU_EXC_WINDOWED", "1") == "1"):
            from ..ops.bandsel import WindowedTerms
            eng = WindowedTerms(np.asarray(exc_idx), n)
            if eng.B > 0:
                self._exc_weng = eng
                params = self._pack_params(cfg)   # re-pack with w_/fb_ planes
                exc_fb_idx = jnp.asarray(
                    np.asarray(exc_idx)[eng.fallback_ids])

                def exc_term_energy(slots, p):
                    live = eng.live
                    dr = slots[:, :, 0] - slots[:, :, 1]
                    r2 = jnp.sum(dr * dr, axis=-1)
                    r2s = jnp.where(live > 0, r2, 1.0)
                    inv_r2 = 1.0 / r2s
                    r = jnp.sqrt(r2s)
                    inv_r = 1.0 / r
                    sig6 = (p["w_exc_sigma"] ** 2 * inv_r2) ** 3
                    e = 4.0 * p["w_exc_epsilon"] * sig6 * (sig6 - 1.0) \
                        + ONE_4PI_EPS0 * p["w_exc_chargeprod"] * inv_r
                    if is_ewald_family:
                        ar = alpha * r
                        # erf = 1 - erfc (Hastings); shares the exp
                        erf_ar = 1.0 - _erfc_f32(ar, jnp.exp(-ar * ar))
                        e = e - ONE_4PI_EPS0 * p["w_exc_qq"] * erf_ar * inv_r
                    return jnp.sum(live * e)

                def exc_fallback_energy(pos, box, p, gp):
                    if exc_fb_idx.shape[0] == 0:
                        return jnp.zeros((), accum)
                    dr = geom.bond_vectors(pos, exc_fb_idx)
                    r2 = jnp.sum(dr * dr, axis=-1)
                    inv_r2 = 1.0 / r2
                    r = jnp.sqrt(r2)
                    sig6 = (p["fb_exc_sigma"] ** 2 * inv_r2) ** 3
                    e = 4.0 * p["fb_exc_epsilon"] * sig6 * (sig6 - 1.0) \
                        + ONE_4PI_EPS0 * p["fb_exc_chargeprod"] / r
                    if is_ewald_family:
                        e = e - ONE_4PI_EPS0 * p["fb_exc_qq"] \
                            * jax.scipy.special.erf(alpha * r) / r
                    return jnp.sum(e.astype(accum))

        def direct_energy(pos, box, p, gp):
            charge, sigma, eps = effective_particle_params(p, gp)
            if use_neighbor:
                per_atom = {
                    "charge": jnp.zeros(n_pad, dtype).at[:n].set(charge),
                    "sigma": jnp.ones(n_pad, dtype).at[:n].set(sigma),
                    "epsilon": jnp.zeros(n_pad, dtype).at[:n].set(eps),
                }
                # padded atoms sit on atom 0 so block bounding boxes stay tight
                pos_pad = jnp.broadcast_to(pos[0], (n_pad, 3)).at[:n].set(pos)
                e, _, overflow = pairs_mod.pair_energy_force_rows(
                    pos_pad, box, lj_coulomb_ef, per_atom, exclusions, n,
                    cutoff=cutoff, max_cols=self._nl_max_cols,
                    block=nl_block, periodic=periodic, accum_dtype=accum,
                    sort_cell=self._nl_sort_cell, mesh=cfg.mesh)
                # capacity overflow -> NaN (the honest analog of the
                # reference's overflow-retry, ContextImpl.cpp:298)
                e = e + jnp.where(overflow > 0, jnp.nan, 0.0).astype(accum)
            else:
                per_atom = {
                    "charge": jnp.zeros(n_pad, dtype).at[:n].set(charge),
                    "sigma": jnp.ones(n_pad, dtype).at[:n].set(sigma),
                    "epsilon": jnp.zeros(n_pad, dtype).at[:n].set(eps),
                }
                pos_pad = jnp.zeros((n_pad, 3), pos.dtype).at[:n].set(pos)
                e = pairs_mod.pair_energy_n2(
                    pos_pad, box, lj_and_coulomb, per_atom, exclusions, n,
                    block=block, periodic=periodic, accum_dtype=accum,
                    mesh=cfg.mesh)
            e = e + exception_energy(pos, box, p, gp)
            if is_ewald_family:
                e = e + exclusion_correction(pos, box, charge, gp, sigma, eps)
            if "disp_coeff" in p:
                e = e + p["disp_coeff"] / geom.box_volume(box).astype(accum)
            return e

        # fused Pallas spread (ops/pallas_pme.py) on the TPU f32 path; the
        # chunked-einsum spread everywhere else. OFF by default: every
        # caller of reciprocal_energy outside the z-slab fast path
        # differentiates it (rows-engine forces, the minimizer, parameter
        # derivatives), and the JVP of the fused spread kernel blows the
        # 16 MB scoped-VMEM stack at ~5k atoms (measured: f32[96,9216]
        # 27.3 MB scoped alloc at 1728 waters). The z-slab engine, which
        # owns the TPU hot path, never calls this.
        pallas_spread = (cfg.platform_name == "TPU" and dtype == jnp.float32
                         and os.environ.get("OMM_TPU_PME_PALLAS", "0") == "1")

        def reciprocal_energy(pos, box, p, gp):
            charge, sigma, eps = effective_particle_params(p, gp)
            e = pme_mod.ewald_self_energy(charge, alpha, accum)
            if method == NonbondedForce.Ewald:
                e = e + pme_mod.ewald_reciprocal_energy(
                    pos, charge, box, ewald_kmax, alpha, accum)
            else:
                e = e + pme_mod.pme_reciprocal_energy(
                    pos, charge, box, pme_grid, 5, alpha,
                    pme_data["bsq_x"], pme_data["bsq_y"], pme_data["bsq_z"],
                    accum, pallas=pallas_spread)
            if is_ljpme:
                c6 = 2.0 * jnp.sqrt(eps) * sigma ** 3
                e = e + pme_mod.dispersion_self_energy(c6, lj_alpha, accum)
                e = e + pme_mod.pme_reciprocal_energy(
                    pos, charge, box, lj_grid, 5, lj_alpha,
                    pme_data["bsq_x_lj"], pme_data["bsq_y_lj"],
                    pme_data["bsq_z_lj"], accum, coulomb=False, c6s=c6,
                    pallas=pallas_spread)
            return e

        def pad_per_atom(charge, sigma, eps):
            return {
                "charge": jnp.zeros(n_pad, dtype).at[:n].set(charge),
                "sigma": jnp.ones(n_pad, dtype).at[:n].set(sigma),
                "epsilon": jnp.zeros(n_pad, dtype).at[:n].set(eps),
            }

        def build_direct_state(pos, box, p, gp):
            """Build the persistent candidate state (engine-specific)."""
            pos_pad = jnp.broadcast_to(pos[0], (n_pad, 3)).at[:n].set(pos)
            if direct_engine == "pallas":
                from ..ops import pallas_pairs as pp
                charge, sigma, eps = effective_particle_params(p, gp)
                pa = pad_per_atom(charge, sigma, eps)
                st = pp.build_tile_state(
                    pos_pad, box, pa["charge"], pa["sigma"], pa["epsilon"],
                    exclusions, n, cutoff + nl_skin, nl_max_cols_s,
                    block=pl_row, sort_cell=self._nl_sort_cell_pallas,
                    col_cap=self._nl_col_cap,
                    use_shift=self._nl_use_shift,
                    max_bricks=self._nl_max_bricks, kq=pl_kq)
                if use_zslab:
                    from ..ops import pme_zslab
                    zst = pme_zslab.build_z_state(pos, box, charge,
                                                  pme_grid, zslab_cfg)
                    zov = zst.pop("overflow")
                    st["pme"] = zst
                    st["overflow"] = st["overflow"] + zov
                return st
            return pairs_mod.build_row_state(
                pos_pad, box, n, cutoff + nl_skin, nl_max_cols_s,
                block=nl_block, periodic=periodic,
                sort_cell=self._nl_sort_cell)

        def direct_ef_from_state(pos, box, p, gp, st, want_energy=True):
            """(energy, forces) of the tile sweep given a candidate state."""
            pos_pad = jnp.broadcast_to(pos[0], (n_pad, 3)).at[:n].set(pos)
            if direct_engine == "pallas":
                from ..ops import pallas_pairs as pp
                mode = (pp.MODE_EWALD if is_ewald_family
                        else pp.MODE_RF if use_cutoff else pp.MODE_PLAIN)
                e_d, f_pad = pp.eval_tiles(
                    pos_pad, box, st, n, cutoff, mode,
                    alpha=(alpha if is_ewald_family else 0.0),
                    krf=(krf if (use_cutoff and not is_ewald_family)
                         else 0.0),
                    crf=(crf if (use_cutoff and not is_ewald_family)
                         else 0.0), block=pl_row,
                    want_energy=want_energy, mesh=cfg.mesh,
                    switch_dist=(rs if use_switch else -1.0),
                    rows_per_program=pl_rows_per_program)
                return e_d.astype(accum), f_pad[:n]
            charge, sigma, eps = effective_particle_params(p, gp)
            e_d, f_pad = pairs_mod.rows_ef_from_state(
                pos_pad, box, st, lj_coulomb_ef,
                pad_per_atom(charge, sigma, eps), exclusions, n, cutoff,
                block=nl_block, periodic=periodic, accum_dtype=accum,
                mesh=cfg.mesh)
            return e_d, f_pad[:n]

        def make_direct_ef(include_recip):
            """Analytic-force fast path + one small reverse-mode pass for
            exceptions/corrections/reciprocal. The tile-candidate state
            persists in the Context aux (rebuilt on the motion predicate);
            aux=None rebuilds inline (host-initiated getState before any
            step, minimizer)."""
            if not use_neighbor:
                return None

            exc_eng = self._exc_weng

            def rest_energy(pos, box, p, gp):
                e = jnp.zeros((), accum)
                if exc_eng is None:
                    e = e + exception_energy(pos, box, p, gp)
                    if is_ewald_family:
                        ch, sg, ep = effective_particle_params(p, gp)
                        e = e + exclusion_correction(pos, box, ch, gp, sg, ep)
                if "disp_coeff" in p:
                    e = e + p["disp_coeff"] / geom.box_volume(box).astype(accum)
                if include_recip:
                    if use_zslab:
                        # the grid term is computed analytically below; only
                        # the (position-independent) self term remains here
                        ch, _, _ = effective_particle_params(p, gp)
                        e = e + pme_mod.ewald_self_energy(ch, alpha, accum)
                    else:
                        e = e + reciprocal_energy(pos, box, p, gp)
                return e

            def ef(pos, box, p, gp, aux=None, want_energy=True):
                if aux is None:
                    st = build_direct_state(pos, box, p, gp)
                    overflow = st["overflow"]
                else:
                    st = aux["st"]
                    overflow = aux["overflow"]
                e_d, f = direct_ef_from_state(pos, box, p, gp, st,
                                              want_energy=want_energy)
                if exc_eng is not None:
                    # banded exception + exclusion-correction lane (analytic
                    # forces; the differentiated region has no gathers)
                    slots = exc_eng.fwd(pos, p["sel_F"])
                    e_x, g_x = jax.value_and_grad(
                        lambda s: exc_term_energy(s, p))(slots)
                    e_d = e_d + e_x.astype(accum)
                    f = f - exc_eng.bwd(g_x, pos.shape[0], p["sel_M"])
                    e_fb, g_fb = jax.value_and_grad(
                        lambda q: exc_fallback_energy(q, box, p, gp))(pos)
                    e_d = e_d + e_fb.astype(accum)
                    f = f - g_fb
                if include_recip and use_zslab:
                    from ..ops import pme_zslab
                    ch, _, _ = effective_particle_params(p, gp)
                    e_z, f_z = pme_zslab.pme_recip_ef(
                        pos, ch, box, pme_grid, 5, alpha,
                        pme_data["bsq_x"], pme_data["bsq_y"],
                        pme_data["bsq_z"], st["pme"], zslab_cfg)
                    e_d = e_d + e_z.astype(accum)
                    f = f + f_z
                # capacity overflow poisons BOTH energy and forces:
                # integrators consume only forces, and silently truncated
                # pair lists must never yield a finite (corrupt) trajectory
                poison = jnp.where(overflow > 0, jnp.nan, 0.0)
                e_d = e_d + poison.astype(accum)
                f = f + poison.astype(f.dtype)
                e_r, g = jax.value_and_grad(
                    lambda q: rest_energy(q, box, p, gp))(pos)
                return e_d + e_r, f - g

            return ef

        def make_nl_aux_fns(module_params):
            """(init_aux, refresh_fn) for the persistent tile state."""
            if not use_neighbor or engine_env == "perstep":
                return None, None
            nl_skin_local = nl_skin

            def init_aux(deps):
                # placeholder geometry fixes the aux SHAPES; ref_pos = +inf
                # forces a real build on the first step
                zero_pos = jnp.zeros((n, 3), dtype)
                box0j = jnp.asarray(box0.astype(np.dtype(dtype)))
                gp0 = {name: jnp.asarray(val, dtype)
                       for name, val in self._global_params}
                st = build_direct_state(zero_pos, box0j, module_params, gp0)
                st = dict(st)
                st.pop("overflow", None)
                return {"st": st,
                        "ref_pos": jnp.full((n, 3), jnp.inf, dtype),
                        "overflow": jnp.zeros((), jnp.int32)}

            def refresh(deps, state, params_list, aux):
                pos = state["positions"]
                box = state["box"]

                def do(aux):
                    p = params_list[refresh.param_index]
                    st = build_direct_state(pos, box, p, state["gp"])
                    st = dict(st)
                    ov = st.pop("overflow")
                    return {"st": st, "ref_pos": pos,
                            "overflow": aux["overflow"] + ov}

                new_aux = jax.lax.cond(
                    pairs_mod.needs_rebuild(pos, aux["ref_pos"],
                                            nl_skin_local),
                    do, lambda a: a, aux)
                return state, new_aux

            return init_aux, refresh

        modules = []
        merged_recip = is_ewald_family and self._recip_group in (-1, self._force_group)
        if include_direct or not is_ewald_family:
            if merged_recip:
                def energy_fn(pos, box, p, gp):
                    e = reciprocal_energy(pos, box, p, gp)
                    if include_direct:
                        e = e + direct_energy(pos, box, p, gp)
                    return e
            elif is_ewald_family:
                energy_fn = direct_energy
            else:
                energy_fn = direct_energy
            init_aux, refresh_fn = make_nl_aux_fns(params)
            modules.append(CompiledForce(
                name=self.getName(), force_group=self.getForceGroup(),
                params=params, energy_fn=energy_fn, uses_pbc=periodic,
                bonded_particles=tuple(self._bonded_particles()),
                global_defaults=self._default_global_values(),
                ef_fn=make_direct_ef(include_recip=merged_recip
                                     and include_direct),
                ef_takes_want_energy=use_neighbor,
                needs_aux=init_aux is not None,
                init_aux=init_aux, refresh_fn=refresh_fn))
        if is_ewald_family and not merged_recip:
            grp = self._recip_group
            modules.append(CompiledForce(
                name=self.getName() + "_reciprocal", force_group=grp,
                params=params, energy_fn=reciprocal_energy, uses_pbc=True,
                global_defaults=self._default_global_values()))
        elif is_ewald_family and merged_recip and not include_direct:
            modules.append(CompiledForce(
                name=self.getName(), force_group=self.getForceGroup(),
                params=params, energy_fn=reciprocal_energy, uses_pbc=True,
                global_defaults=self._default_global_values()))
        return modules
