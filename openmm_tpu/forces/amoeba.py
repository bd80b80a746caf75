"""AMOEBA plugin forces (scoped port of plugins/amoeba/openmmapi):
AmoebaVdwForce (buffered 14-7), AmoebaMultipoleForce (point multipoles +
induced-dipole polarization, direct/mutual/extrapolated; NoCutoff dense
sweep and full multipole PME), AmoebaGeneralizedKirkwoodForce (implicit
solvent, evaluated inside the multipole force via ops/gk.py),
AmoebaTorsionTorsionForce, and AmoebaWcaDispersionForce.

Energies are validated against reference-platform golden values (ammonia
GK dimer, 12-water PME box). The induced-dipole SCF is a jitted fixed-point
iteration (the TPU translation of the reference's DIIS loop,
AmoebaCommonKernels.cpp:317-321); all forces come from jax.grad through the
converged dipoles (implicit differentiation via unrolled iterations).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..constants import ONE_4PI_EPS0
from ..exceptions import OpenMMException
from ..ops import geometry as geom
from .base import CompiledForce, Force
from .nonbonded import _erfc_f32 as _erfc_f32_local

_NM = u.nanometer
_E = u.kilojoule_per_mole


class AmoebaVdwForce(Force):
    """Buffered 14-7 van der Waals (AmoebaVdwForce.h; Halgren 1992):
    E = eps_ij (1.07/(rho+0.07))^7 ((1.12/(rho^7+0.12)) - 2), rho = r/r0_ij,
    with cubic-mean sigma and HHG epsilon combining and hydrogen reduction
    factors."""

    NoCutoff = 0
    CutoffPeriodic = 1

    def __init__(self):
        super().__init__()
        self._particles = []   # (parentIndex, sigma, epsilon, reduction)
        self._exclusions = []  # list of lists
        self._sigma_rule = "CUBIC-MEAN"
        self._eps_rule = "HHG"
        self._cutoff = 1.0
        self._method = AmoebaVdwForce.NoCutoff
        self._use_dispersion_correction = False

    def getNumParticles(self):
        return len(self._particles)

    def addParticle(self, parentIndex, sigma, epsilon, reductionFactor,
                    typeIndex=-1):
        self._particles.append((int(parentIndex),
                                float(u.strip(sigma, _NM)),
                                float(u.strip(epsilon, _E)),
                                float(reductionFactor)))
        self._exclusions.append([])
        return len(self._particles) - 1

    def getParticleParameters(self, index):
        return self._particles[index]

    def setParticleParameters(self, index, parentIndex, sigma, epsilon,
                              reductionFactor, typeIndex=-1):
        self._particles[index] = (int(parentIndex),
                                  float(u.strip(sigma, _NM)),
                                  float(u.strip(epsilon, _E)),
                                  float(reductionFactor))

    def setParticleExclusions(self, index, exclusions):
        self._exclusions[index] = [int(x) for x in exclusions]

    def getParticleExclusions(self, index):
        return list(self._exclusions[index])

    def getSigmaCombiningRule(self):
        return self._sigma_rule

    def setSigmaCombiningRule(self, rule):
        self._sigma_rule = str(rule)

    def getEpsilonCombiningRule(self):
        return self._eps_rule

    def setEpsilonCombiningRule(self, rule):
        self._eps_rule = str(rule)

    def getCutoffDistance(self):
        return u.Quantity(self._cutoff, _NM)

    def setCutoffDistance(self, cutoff):
        self._cutoff = float(u.strip(cutoff, _NM))

    def getNonbondedMethod(self):
        return self._method

    def setNonbondedMethod(self, method):
        self._method = int(method)

    def getUseDispersionCorrection(self):
        return self._use_dispersion_correction

    def setUseDispersionCorrection(self, use):
        self._use_dispersion_correction = bool(use)

    def usesPeriodicBoundaryConditions(self):
        return self._method == AmoebaVdwForce.CutoffPeriodic

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _pack_params(self, cfg):
        arr = (np.asarray(self._particles, np.float64)
               if self._particles else np.zeros((0, 4), np.float64))
        return {"sigma": jnp.asarray(arr[:, 1].astype(cfg.dtype)),
                "epsilon": jnp.asarray(arr[:, 2].astype(cfg.dtype)),
                "reduction": jnp.asarray(arr[:, 3].astype(cfg.dtype))}

    def _compile(self, system, cfg):
        n = cfg.n_particles
        if len(self._particles) != n:
            raise OpenMMException(
                "AmoebaVdwForce must have same particle count as the System")
        accum = cfg.accum_dtype
        params = self._pack_params(cfg)
        parents = jnp.asarray(np.asarray(
            [p[0] for p in self._particles], np.int32))
        periodic = self.usesPeriodicBoundaryConditions()
        use_cutoff = self._method != AmoebaVdwForce.NoCutoff
        cutoff = self._cutoff
        sigma_rule = self._sigma_rule.upper()
        eps_rule = self._eps_rule.upper()
        excl_pairs = [(i, j) for i, ex in enumerate(self._exclusions)
                      for j in ex if j > i]
        exc_mask_np = np.zeros((n, n), bool)
        for (i, j) in excl_pairs:
            exc_mask_np[i, j] = exc_mask_np[j, i] = True
        np.fill_diagonal(exc_mask_np, True)
        keep = ~exc_mask_np[np.triu_indices(n, 1)]
        iu, ju = np.triu_indices(n, 1)
        iu, ju = iu[keep].astype(np.int32), ju[keep].astype(np.int32)
        iu_j = jnp.asarray(iu)
        ju_j = jnp.asarray(ju)

        def energy_fn(pos, box, p, gp):
            if len(iu) == 0:
                return jnp.zeros((), accum)
            # hydrogen reduction: interaction site moves toward the parent
            red = p["reduction"][:, None]
            site = pos[parents] + red * (pos - pos[parents])
            dr = site[iu_j] - site[ju_j]
            if periodic:
                dr = geom.periodic_delta(dr, box)
            r = geom.distance(dr)
            si = p["sigma"][iu_j]
            sj = p["sigma"][ju_j]
            ei = p["epsilon"][iu_j]
            ej = p["epsilon"][ju_j]
            if sigma_rule == "CUBIC-MEAN":
                r0 = (si ** 3 + sj ** 3) / (si ** 2 + sj ** 2)
            elif sigma_rule == "GEOMETRIC":
                r0 = 2.0 * jnp.sqrt(si * sj)
            else:  # ARITHMETIC
                r0 = si + sj
            if eps_rule == "HHG":
                e0 = 4.0 * ei * ej / (jnp.sqrt(ei) + jnp.sqrt(ej)) ** 2
            elif eps_rule == "GEOMETRIC":
                e0 = jnp.sqrt(ei * ej)
            else:  # ARITHMETIC
                e0 = 0.5 * (ei + ej)
            rho = r / r0
            t1 = (1.07 / (rho + 0.07)) ** 7
            t2 = 1.12 / (rho ** 7 + 0.12) - 2.0
            e = e0 * t1 * t2
            if use_cutoff:
                e = jnp.where(r < cutoff, e, 0.0)
            return jnp.sum(e.astype(accum))

        return CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic)


class AmoebaMultipoleForce(Force):
    """Point multipoles with induced-dipole polarization
    (AmoebaMultipoleForce.h:72-92). This round: NoCutoff direct space,
    Mutual (fixed-point SCF) / Direct / Extrapolated polarization, Thole
    damping, local-frame multipole rotation (ZThenX / Bisector / ZBisect /
    ThreeFold / ZOnly / NoAxisType)."""

    NoCutoff = 0
    PME = 1
    Mutual = 0
    Direct = 1
    Extrapolated = 2
    ZThenX = 0
    Bisector = 1
    ZBisect = 2
    ThreeFold = 3
    ZOnly = 4
    NoAxisType = 5

    # covalent map types
    Covalent12 = 0
    Covalent13 = 1
    Covalent14 = 2
    Covalent15 = 3
    PolarizationCovalent11 = 4
    PolarizationCovalent12 = 5
    PolarizationCovalent13 = 6
    PolarizationCovalent14 = 7

    def __init__(self):
        super().__init__()
        self._particles = []   # dicts
        self._covalent = []    # list of dict type -> [indices]
        self._method = AmoebaMultipoleForce.NoCutoff
        self._polarization = AmoebaMultipoleForce.Mutual
        self._cutoff = 1.0
        self._mutual_max_iter = 60
        self._mutual_eps = 1e-5
        self._extrapolation_coefficients = [-0.154, 0.017, 0.657, 0.475]
        self._aewald = 0.0
        self._pme_grid = (0, 0, 0)
        self._ewald_tol = 1e-4

    def getNumMultipoles(self):
        return len(self._particles)

    def addMultipole(self, charge, molecularDipole, molecularQuadrupole,
                     axisType, multipoleAtomZ, multipoleAtomX,
                     multipoleAtomY, thole, dampingFactor, polarity):
        self._particles.append({
            "charge": float(u.strip(charge, u.elementary_charge)),
            "dipole": [float(x) for x in u.strip(molecularDipole)],
            "quadrupole": [float(x) for x in u.strip(molecularQuadrupole)],
            "axisType": int(axisType),
            "atomZ": int(multipoleAtomZ),
            "atomX": int(multipoleAtomX),
            "atomY": int(multipoleAtomY),
            "thole": float(thole),
            "damp": float(dampingFactor),
            "polarity": float(u.strip(polarity)),
        })
        self._covalent.append({})
        return len(self._particles) - 1

    def getMultipoleParameters(self, index):
        p = self._particles[index]
        return (p["charge"], p["dipole"], p["quadrupole"], p["axisType"],
                p["atomZ"], p["atomX"], p["atomY"], p["thole"], p["damp"],
                p["polarity"])

    def setMultipoleParameters(self, index, charge, molecularDipole,
                               molecularQuadrupole, axisType, multipoleAtomZ,
                               multipoleAtomX, multipoleAtomY, thole,
                               dampingFactor, polarity):
        self._particles[index] = {
            "charge": float(u.strip(charge, u.elementary_charge)),
            "dipole": [float(x) for x in u.strip(molecularDipole)],
            "quadrupole": [float(x) for x in u.strip(molecularQuadrupole)],
            "axisType": int(axisType), "atomZ": int(multipoleAtomZ),
            "atomX": int(multipoleAtomX), "atomY": int(multipoleAtomY),
            "thole": float(thole), "damp": float(dampingFactor),
            "polarity": float(u.strip(polarity))}

    def setCovalentMap(self, index, typeId, covalentAtoms):
        self._covalent[index][int(typeId)] = [int(x) for x in covalentAtoms]

    def getCovalentMap(self, index, typeId):
        return list(self._covalent[index].get(int(typeId), []))

    def getNonbondedMethod(self):
        return self._method

    def setNonbondedMethod(self, method):
        self._method = int(method)

    def getPolarizationType(self):
        return self._polarization

    def setPolarizationType(self, ptype):
        self._polarization = int(ptype)

    def getCutoffDistance(self):
        return u.Quantity(self._cutoff, _NM)

    def setCutoffDistance(self, cutoff):
        self._cutoff = float(u.strip(cutoff, _NM))

    def getMutualInducedMaxIterations(self):
        return self._mutual_max_iter

    def setMutualInducedMaxIterations(self, n):
        self._mutual_max_iter = int(n)

    def getMutualInducedTargetEpsilon(self):
        return self._mutual_eps

    def setMutualInducedTargetEpsilon(self, eps):
        self._mutual_eps = float(eps)

    def getExtrapolationCoefficients(self):
        return list(self._extrapolation_coefficients)

    def setExtrapolationCoefficients(self, coeffs):
        self._extrapolation_coefficients = [float(c) for c in coeffs]

    def getAEwald(self):
        return self._aewald

    def setAEwald(self, aewald):
        self._aewald = float(u.strip(aewald, _NM ** -1))

    def getPmeGridDimensions(self):
        return list(self._pme_grid)

    def setPmeGridDimensions(self, dims):
        self._pme_grid = tuple(int(d) for d in dims)

    def getEwaldErrorTolerance(self):
        return self._ewald_tol

    def setEwaldErrorTolerance(self, tol):
        self._ewald_tol = float(tol)

    def usesPeriodicBoundaryConditions(self):
        return self._method == AmoebaMultipoleForce.PME

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def getInducedDipoles(self, context):
        mods = context._modules_for_force(self)
        s = context._state
        return np.asarray(mods[0]._induced_fn(
            s["positions"], s["box"], mods[0].params, s["gp"]))

    def _pack_params(self, cfg):
        n = len(self._particles)
        charge = np.array([p["charge"] for p in self._particles])
        dipole = np.array([p["dipole"] for p in self._particles]) \
            if n else np.zeros((0, 3))
        quad = np.array([p["quadrupole"] for p in self._particles]) \
            if n else np.zeros((0, 9))
        thole = np.array([p["thole"] for p in self._particles])
        polarity = np.array([p["polarity"] for p in self._particles])
        dt = cfg.dtype
        return {"charge": jnp.asarray(charge.astype(dt)),
                "dipole": jnp.asarray(dipole.astype(dt)),
                "quad": jnp.asarray(quad.reshape(n, 3, 3).astype(dt)),
                "thole": jnp.asarray(thole.astype(dt)),
                "polarity": jnp.asarray(polarity.astype(dt))}

    def _scale_matrices(self, n):
        """Covalent scale factors (AMOEBA conventions): permanent-permanent
        m-scale (1-2,1-3: 0; 1-4: 0.4; 1-5: 0.8), induced-permanent p-scale,
        mutual u-scale via polarization groups."""
        m = np.ones((n, n))
        p = np.ones((n, n))
        d = np.ones((n, n))   # direct-induction scale (polarization groups)
        u_s = np.ones((n, n))
        for i, cov in enumerate(self._covalent):
            for j in cov.get(self.Covalent12, []):
                m[i, j] = 0.0
            for j in cov.get(self.Covalent13, []):
                m[i, j] = 0.0
            for j in cov.get(self.Covalent14, []):
                m[i, j] = 0.4
            for j in cov.get(self.Covalent15, []):
                m[i, j] = 0.8
            group = set(cov.get(self.PolarizationCovalent11, []))
            for j in cov.get(self.Covalent12, []):
                p[i, j] = 0.0
            for j in cov.get(self.Covalent13, []):
                p[i, j] = 0.0
            for j in cov.get(self.Covalent14, []):
                p[i, j] = 0.5 if j in group else 1.0
            for j in group:
                if j != i:
                    d[i, j] = 0.0
                    u_s[i, j] = 1.0
        np.fill_diagonal(m, 0.0)
        np.fill_diagonal(p, 0.0)
        np.fill_diagonal(d, 0.0)
        np.fill_diagonal(u_s, 0.0)
        return m, p, d, u_s

    def _compile(self, system, cfg):
        n = cfg.n_particles
        if len(self._particles) != n:
            raise OpenMMException(
                "AmoebaMultipoleForce must have same particle count as System")
        if self._method == AmoebaMultipoleForce.PME:
            return self._compile_pme(system, cfg)
        dt = cfg.dtype
        accum = cfg.accum_dtype
        params = self._pack_params(cfg)
        m_s, p_s, d_s, u_s = self._scale_matrices(n)
        m_s = jnp.asarray(m_s.astype(dt))
        p_s = jnp.asarray(p_s.astype(dt))
        d_s = jnp.asarray(d_s.astype(dt))
        u_sj = jnp.asarray(u_s.astype(dt))
        axis_type = jnp.asarray(np.asarray(
            [p["axisType"] for p in self._particles], np.int32))
        atom_z = jnp.asarray(np.asarray(
            [max(p["atomZ"], 0) for p in self._particles], np.int32))
        atom_x = jnp.asarray(np.asarray(
            [max(p["atomX"], 0) for p in self._particles], np.int32))
        atom_y = jnp.asarray(np.asarray(
            [max(p["atomY"], 0) for p in self._particles], np.int32))
        damp = jnp.asarray(np.asarray(
            [p["damp"] for p in self._particles]).astype(dt))
        polarization = self._polarization
        max_iter = min(self._mutual_max_iter, 30)
        ext_coeffs = list(self._extrapolation_coefficients)

        def rotation_matrices(pos, p):
            """Lab-frame rotation matrix per site from its axis definition."""
            zdir = pos[atom_z] - pos
            xdir = pos[atom_x] - pos
            ydir = pos[atom_y] - pos

            def unit(v):
                return v / jnp.sqrt(jnp.maximum(
                    jnp.sum(v * v, -1, keepdims=True), 1e-20))

            uz = unit(zdir)
            at = axis_type[:, None]
            # Bisector: z = bisector of z and x dirs
            uz = jnp.where(at == AmoebaMultipoleForce.Bisector,
                           unit(unit(zdir) + unit(xdir)), uz)
            # ThreeFold: z = sum of the three unit axis vectors
            uz = jnp.where(at == AmoebaMultipoleForce.ThreeFold,
                           unit(unit(zdir) + unit(xdir) + unit(ydir)), uz)
            # default x: component of xdir orthogonal to z; ZBisect takes
            # the bisector of the x and y directions as the raw x axis
            ux_raw = jnp.where(at == AmoebaMultipoleForce.ZBisect,
                               unit(unit(xdir) + unit(ydir)), unit(xdir))
            ux_raw = jnp.where(at == AmoebaMultipoleForce.ZOnly,
                               jnp.array([1.0, 0.0, 0.0], dt), ux_raw)
            ux = unit(ux_raw - uz * jnp.sum(ux_raw * uz, -1, keepdims=True))
            # fallback when x degenerate
            alt = jnp.cross(uz, jnp.array([0.0, 0.0, 1.0], dt))
            alt2 = jnp.cross(uz, jnp.array([0.0, 1.0, 0.0], dt))
            alt = jnp.where(jnp.sum(alt * alt, -1, keepdims=True) > 0.01,
                            alt, alt2)
            bad = jnp.sum(ux * ux, -1, keepdims=True) < 1e-8
            ux = jnp.where(bad, unit(alt), ux)
            uy = jnp.cross(uz, ux)
            # NoAxisType: identity
            eye = jnp.broadcast_to(jnp.eye(3, dtype=dt), (n, 3, 3))
            R = jnp.stack([ux, uy, uz], axis=-2)   # rows = lab axes of x,y,z
            R = jnp.where((at == AmoebaMultipoleForce.NoAxisType)[..., None],
                          eye, R)
            return R

        def lab_multipoles(pos, p):
            R = rotation_matrices(pos, p)
            # molecular-frame dipole (x,y,z) -> lab: d_lab = R^T d_mol
            d_lab = jnp.einsum("nij,nj->ni", jnp.swapaxes(R, 1, 2),
                               p["dipole"])
            q_lab = jnp.einsum("nki,nkl,nlj->nij", R, p["quad"], R)
            return d_lab, q_lab

        def fields_and_energy(pos, box, p, gp):
            """Permanent multipole energy and field via interaction tensors.

            Potential of site j: phi(x) = q G - d.DG + (1/3) Theta : DDG with
            G = 1/|x - r_j|; energy of site i in it:
            E_ij = (q_i + d_i.D + (1/3)Theta_i:DD) phi_j(r_i).
            T tensors are the successive derivatives of 1/r.
            """
            charge = p["charge"]
            d_lab, q_lab = lab_multipoles(pos, p)
            dr = pos[:, None, :] - pos[None, :, :]    # r = r_i - r_j
            r2 = jnp.sum(dr * dr, -1)
            mask = ~jnp.eye(n, dtype=bool)
            r2s = jnp.where(mask, r2, 1.0)
            r = jnp.sqrt(r2s)
            inv_r = 1.0 / r
            inv_r2 = inv_r * inv_r
            inv_r3 = inv_r * inv_r2
            inv_r5 = inv_r3 * inv_r2
            inv_r7 = inv_r5 * inv_r2
            inv_r9 = inv_r7 * inv_r2

            qi = charge[:, None]
            qj = charge[None, :]
            di_r = jnp.einsum("ik,ijk->ij", d_lab, dr)
            dj_r = jnp.einsum("jk,ijk->ij", d_lab, dr)
            di_dj = jnp.einsum("ik,jk->ij", d_lab, d_lab)
            Qi_r = jnp.einsum("ikl,ijl->ijk", q_lab, dr)
            Qj_r = jnp.einsum("jkl,ijl->ijk", q_lab, dr)
            rQi_r = jnp.einsum("ijk,ijk->ij", Qi_r, dr)
            rQj_r = jnp.einsum("ijk,ijk->ij", Qj_r, dr)
            tr_Qi = jnp.trace(q_lab, axis1=1, axis2=2)
            di_Qj_r = jnp.einsum("ik,ijk->ij", d_lab, Qj_r)
            dj_Qi_r = jnp.einsum("jk,ijk->ij", d_lab, Qi_r)
            Qi_Qj = jnp.einsum("ikl,jkl->ij", q_lab, q_lab)
            QiQj_rr = jnp.einsum("ijk,ijk->ij", Qi_r, Qj_r)

            # contractions with the T tensors (r = r_i - r_j):
            # T = 1/r ; T_a = -r_a/r^3 ; T_ab = (3 r_a r_b - r^2 d_ab)/r^5
            # T_abc = -15 r r r /r^7 + 3 (r d perms)/r^5
            # T_abcd = 105 rrrr/r^9 - 15 (rr d perms)/r^7 + 3 (dd perms)/r^5
            e = qi * qj * inv_r
            # q_j d_i.T_a - q_i d_j.T_a with T_a = -r/r^3
            e = e + (-qj * di_r + qi * dj_r) * inv_r3
            # - d_i^a d_j^b T_ab
            e = e - (3.0 * di_r * dj_r * inv_r5 - di_dj * inv_r3)
            # (q_i Theta_j + q_j Theta_i) : T_ab — the API stores the
            # TINKER-convention quadrupole, which the reference contracts
            # with unit weight (verified against the reference binary:
            # E_cq = q * (Q_stored : T))
            e = e + (
                qi * (3.0 * rQj_r * inv_r5 - tr_Qi[None, :] * inv_r3)
                + qj * (3.0 * rQi_r * inv_r5 - tr_Qi[:, None] * inv_r3))
            # (1/3)(d_i : Theta_j T_abc - Theta_i : d_j T_abc)
            # d_i^a Theta_j^bc T_abc = -15 (d.r)(rQr)/r^7
            #   + 3[ (d.r) tr(Q) + 2 d.(Q r) ]/r^5
            t3_i = (-15.0 * di_r * rQj_r * inv_r7
                    + 3.0 * (di_r * tr_Qi[None, :] + 2.0 * di_Qj_r) * inv_r5)
            t3_j = (-15.0 * dj_r * rQi_r * inv_r7
                    + 3.0 * (dj_r * tr_Qi[:, None] + 2.0 * dj_Qi_r) * inv_r5)
            e = e + (t3_i - t3_j)
            # (1/9) Theta_i^ab Theta_j^cd T_abcd:
            #  105 rQir rQjr /r^9
            #  -15 [ rQir trQj + rQjr trQi + 4 rQiQjr ] /r^7
            #  + 3 [ trQi trQj + 2 Qi:Qj ] /r^5
            t4 = (105.0 * rQi_r * rQj_r * inv_r9
                  - 15.0 * (rQi_r * tr_Qi[None, :] + rQj_r * tr_Qi[:, None]
                            + 4.0 * QiQj_rr) * inv_r7
                  + 3.0 * (tr_Qi[:, None] * tr_Qi[None, :] + 2.0 * Qi_Qj)
                  * inv_r5)
            e = e + t4
            e_perm = 0.5 * ONE_4PI_EPS0 * jnp.sum(
                jnp.where(mask, e * m_s, 0.0).astype(accum))

            # Thole-damped inverse distances (getAndScaleInverseRs):
            # lam3/lam5/lam7 damp successive tensor orders separately
            dd = damp[:, None] * damp[None, :]
            dd = jnp.where(dd > 0, dd, 1.0)
            a_th = jnp.minimum(p["thole"][:, None], p["thole"][None, :])
            uu = a_th * (r / dd) ** 3
            expu = jnp.exp(-jnp.minimum(uu, 50.0))
            lam3 = jnp.where(mask, 1.0 - expu, 0.0)
            lam5 = jnp.where(mask, 1.0 - (1.0 + uu) * expu, 0.0)
            lam7 = jnp.where(mask,
                             1.0 - (1.0 + uu + 0.6 * uu * uu) * expu, 0.0)

            # permanent field at site i (calculateFixedMultipoleFieldPairIxn,
            # with dr = r_i - r_j): dr*(lam3 q_j/r^3 + 3 lam5 (d_j.dr)/r^5
            # + 15 lam7 (dr Q_j dr)/r^7) - lam3 d_j/r^3 - 6 lam5 Q_j.dr/r^5
            radial = (qj * lam3 * inv_r3 + 3.0 * dj_r * lam5 * inv_r5
                      + 15.0 * rQj_r * lam7 * inv_r7)
            field_terms = (radial[:, :, None] * dr
                           - d_lab[None, :, :] * (lam3 * inv_r3)[:, :, None]
                           - 6.0 * Qj_r * (lam5 * inv_r5)[:, :, None])

            e_field = jnp.sum(field_terms * d_s[:, :, None], axis=1)
            e_field_p = jnp.sum(field_terms * p_s[:, :, None], axis=1)
            return e_perm, e_field, e_field_p, \
                (dr, r, inv_r3, inv_r5, lam3, lam5, mask)

        def induce(p, e_field, geom_cache, extra_field_fn=None):
            dr, r, inv_r3, inv_r5, lam3e, lam5e, mask = geom_cache
            alpha = p["polarity"][:, None]

            def dipole_field(mu):
                mu_r = jnp.einsum("jk,ijk->ij", mu, dr)
                f = (mu[None, :, :] * (lam3e * inv_r3)[:, :, None]
                     - 3.0 * (mu_r * lam5e * inv_r5)[:, :, None] * dr)
                out = -jnp.sum(f * u_sj[:, :, None], axis=1)
                if extra_field_fn is not None:
                    out = out + extra_field_fn(mu)
                return out

            mu0 = alpha * e_field
            if polarization == AmoebaMultipoleForce.Direct:
                return mu0
            if polarization == AmoebaMultipoleForce.Extrapolated:
                mus = [mu0]
                for _ in range(len(ext_coeffs) - 1):
                    mus.append(alpha * (e_field + dipole_field(mus[-1])))
                total = sum(c * m for c, m in zip(ext_coeffs, mus))
                return total
            # Mutual: fixed-point with successive over-relaxation
            omega = 0.7

            def body(i, mu):
                new = alpha * (e_field + dipole_field(mu))
                return (1 - omega) * mu + omega * new

            return jax.lax.fori_loop(0, max_iter, body, mu0)

        # generalized Kirkwood implicit solvent: evaluated inside this
        # force, exactly as the reference couples its GK kernel into the
        # multipole kernel (AmoebaReferenceGeneralizedKirkwoodMultipoleForce)
        gk = None
        for f in system.getForces():
            if isinstance(f, AmoebaGeneralizedKirkwoodForce):
                gk = f
        if gk is not None:
            from ..ops import gk as gk_ops
            gk_radii = jnp.asarray(np.asarray(
                [pp[1] for pp in gk._particles]).astype(dt))
            gk_scales = jnp.asarray(np.asarray(
                [pp[2] for pp in gk._particles]).astype(dt))
            gk_eps = gk._solvent_dielectric
            gk_cavity = gk._include_cavity
            gk_probe = gk._probe_radius
            gk_safac = gk._surface_area_factor

        def gk_extra_energy(pos, p, e_field, geom_cache):
            """Born radii + solvated SCF + GK pair energies + cavity."""
            from ..ops import gk as gk_ops
            d_lab, q_lab = lab_multipoles(pos, p)
            born = gk_ops.grycuk_born_radii(pos, gk_radii, gk_scales)
            setup = gk_ops.gk_setup(pos, born, p["charge"], d_lab, q_lab,
                                    gk_eps)
            gk_field = gk_ops.gk_permanent_field(setup)

            def gk_mu_field(mu):
                return gk_ops.gk_dipole_field(setup, mu)

            mu_s = induce(p, e_field + gk_field, geom_cache,
                          extra_field_fn=gk_mu_field)
            e_gp = ONE_4PI_EPS0 * gk_ops.gk_energy_permanent(setup)
            e_gi = ONE_4PI_EPS0 * gk_ops.gk_energy_induced(setup, mu_s)
            e = e_gp + e_gi
            if gk_cavity:
                e = e + gk_ops.cavity_energy(gk_radii, born, gk_probe,
                                             gk_safac)
            return e, mu_s

        def energy_fn(pos, box, p, gp):
            e_perm, e_field, e_field_p, geom_cache = \
                fields_and_energy(pos, box, p, gp)
            if jnp.ndim(p["polarity"]) and n > 0:
                if gk is not None:
                    e_gk, mu_s = gk_extra_energy(pos, p, e_field, geom_cache)
                    # polarization energy of the SOLVATED dipoles against the
                    # p-scaled permanent field (base epol + TINKER ediff)
                    e_pol = -0.5 * ONE_4PI_EPS0 * jnp.sum(mu_s * e_field_p)
                    return e_perm + (e_pol + e_gk).astype(accum)
                mu = induce(p, e_field, geom_cache)
                # polarization energy: -1/2 mu . E_perm (p-scaled field)
                e_pol = -0.5 * ONE_4PI_EPS0 * jnp.sum(mu * e_field_p)
                return e_perm + e_pol.astype(accum)
            return e_perm

        cf = CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                           params=params, energy_fn=energy_fn,
                           uses_pbc=False)

        def induced_fn(pos, box, p, gp):
            _, e_field, _, geom_cache = fields_and_energy(pos, box, p, gp)
            return induce(p, e_field, geom_cache)

        cf._induced_fn = induced_fn
        return cf

    def _compile_pme(self, system, cfg):
        """Multipole PME: real-space Bn-damped tensors + scale corrections,
        B-spline derivative-weight spread of charge/dipole/quadrupole, dense
        matmul-DFT convolution, Ewald self terms; the induced-dipole SCF
        sees real+reciprocal+self fields. Forces and torques come from
        jax.grad through the whole pipeline (lab-frame rotation matrices
        are functions of positions, so the torque chain is automatic).
        Reference: plugins/amoeba/platforms/common/src/kernels/
        multipolePme.cc, AmoebaReferenceMultipoleForce.cpp:4943-6319."""
        from ..ops import pme as pme_mod

        n = cfg.n_particles
        dt = cfg.dtype
        accum = cfg.accum_dtype
        params = self._pack_params(cfg)
        m_s, p_s, d_s, u_s = self._scale_matrices(n)
        m_s = jnp.asarray(m_s.astype(dt))
        d_s = jnp.asarray(d_s.astype(dt))
        u_sj = jnp.asarray(u_s.astype(dt))
        axis_type = jnp.asarray(np.asarray(
            [p["axisType"] for p in self._particles], np.int32))
        atom_z = jnp.asarray(np.asarray(
            [max(p["atomZ"], 0) for p in self._particles], np.int32))
        atom_x = jnp.asarray(np.asarray(
            [max(p["atomX"], 0) for p in self._particles], np.int32))
        atom_y = jnp.asarray(np.asarray(
            [max(p["atomY"], 0) for p in self._particles], np.int32))
        damp = jnp.asarray(np.asarray(
            [p["damp"] for p in self._particles]).astype(dt))
        polarization = self._polarization
        max_iter = min(self._mutual_max_iter, 60)
        ext_coeffs = list(self._extrapolation_coefficients)
        cutoff = self._cutoff

        box0 = system._box_array()
        widths = [box0[0][0], box0[1][1], box0[2][2]]
        alpha = self._aewald
        if alpha <= 0.0:
            alpha = pme_mod.ewald_alpha(cutoff, self._ewald_tol)
        grid_dims = (tuple(self._pme_grid) if all(self._pme_grid)
                     else tuple(pme_mod.pme_grid_size(widths, alpha,
                                                      self._ewald_tol)))
        md = pme_mod.make_pme_recip_data(grid_dims, 5, zeta=True)
        bsq = tuple(jnp.asarray(md[k].astype(dt))
                    for k in ("bsq_x", "bsq_y", "bsq_z"))
        nx, ny, nz = grid_dims
        SQRT_PI = math.sqrt(math.pi)

        # ---- frame helpers (same math as the NoCutoff branch)
        def rotation_matrices(pos):
            zdir = pos[atom_z] - pos
            xdir = pos[atom_x] - pos
            ydir = pos[atom_y] - pos

            def unit(v):
                return v / jnp.sqrt(jnp.maximum(
                    jnp.sum(v * v, -1, keepdims=True), 1e-20))

            uz = unit(zdir)
            at = axis_type[:, None]
            uz = jnp.where(at == AmoebaMultipoleForce.Bisector,
                           unit(unit(zdir) + unit(xdir)), uz)
            uz = jnp.where(at == AmoebaMultipoleForce.ThreeFold,
                           unit(unit(zdir) + unit(xdir) + unit(ydir)), uz)
            ux_raw = jnp.where(at == AmoebaMultipoleForce.ZBisect,
                               unit(unit(xdir) + unit(ydir)), unit(xdir))
            ux_raw = jnp.where(at == AmoebaMultipoleForce.ZOnly,
                               jnp.array([1.0, 0.0, 0.0], dt), ux_raw)
            ux = unit(ux_raw - uz * jnp.sum(ux_raw * uz, -1, keepdims=True))
            alt = jnp.cross(uz, jnp.array([0.0, 0.0, 1.0], dt))
            alt2 = jnp.cross(uz, jnp.array([0.0, 1.0, 0.0], dt))
            alt = jnp.where(jnp.sum(alt * alt, -1, keepdims=True) > 0.01,
                            alt, alt2)
            bad = jnp.sum(ux * ux, -1, keepdims=True) < 1e-8
            ux = jnp.where(bad, unit(alt), ux)
            uy = jnp.cross(uz, ux)
            eye = jnp.broadcast_to(jnp.eye(3, dtype=dt), (n, 3, 3))
            R = jnp.stack([ux, uy, uz], axis=-2)
            R = jnp.where((at == AmoebaMultipoleForce.NoAxisType)[..., None],
                          eye, R)
            return R

        def lab_multipoles(pos, p):
            R = rotation_matrices(pos)
            d_lab = jnp.einsum("nij,nj->ni", jnp.swapaxes(R, 1, 2),
                               p["dipole"])
            q_lab = jnp.einsum("nki,nkl,nlj->nij", R, p["quad"], R)
            return d_lab, q_lab

        # ---- reciprocal energy of arbitrary (charge, dipole, quad) sets
        def recip_energy(pos, box, charge, dip, quad):
            from ..ops import geometry as geom
            binv = geom.box_inverse(box).astype(dt)
            frac = geom.to_fractional(pos, binv)
            frac = frac - jnp.floor(frac)
            u3 = frac * jnp.array([nx, ny, nz], dt)
            base = jnp.floor(u3)
            t = u3 - base
            base = base.astype(jnp.int32)
            wx, dwx, d2wx = pme_mod.bspline_w_dw_d2w(t[:, 0], 5)
            wy, dwy, d2wy = pme_mod.bspline_w_dw_d2w(t[:, 1], 5)
            wz, dwz, d2wz = pme_mod.bspline_w_dw_d2w(t[:, 2], 5)

            def dense(w, axis, n_axis):
                return pme_mod.dense_axis_weights(w, base[:, axis], 4,
                                                  n_axis)

            Wx, dWx, d2Wx = (dense(wx, 0, nx), dense(dwx, 0, nx),
                             dense(d2wx, 0, nx))
            Wy, dWy, d2Wy = (dense(wy, 1, ny), dense(dwy, 1, ny),
                             dense(d2wy, 1, ny))
            Wz, dWz, d2Wz = (dense(wz, 2, nz), dense(dwz, 2, nz),
                             dense(d2wz, 2, nz))

            # fractional multipoles: du_a/dx_k = n_a binv[k, a]; the stored
            # dW stacks differentiate wrt the ATOM's fractional offset, so
            # the dipole spread carries S1 = +1 relative to -d.grad(delta)
            J = binv * jnp.array([nx, ny, nz], dt)[None, :]
            dF = dip @ J                                     # (N, 3)
            QF = jnp.einsum("nkl,ka,lb->nab", quad, J, J)

            def tri(a, b, c):
                return jnp.einsum("ix,iy,iz->xyz", a, b, c)

            Q = tri(charge[:, None] * Wx, Wy, Wz)
            Q = Q + tri(dF[:, 0:1] * dWx, Wy, Wz)
            Q = Q + tri(dF[:, 1:2] * Wx, dWy, Wz)
            Q = Q + tri(dF[:, 2:3] * Wx, Wy, dWz)
            Q = Q + (
                tri(QF[:, 0, 0:1] * d2Wx, Wy, Wz)
                + tri(QF[:, 1, 1:2] * Wx, d2Wy, Wz)
                + tri(QF[:, 2, 2:3] * Wx, Wy, d2Wz)
                + 2.0 * tri(QF[:, 0, 1:2] * dWx, dWy, Wz)
                + 2.0 * tri(QF[:, 0, 2:3] * dWx, Wy, dWz)
                + 2.0 * tri(QF[:, 1, 2:3] * Wx, dWy, dWz))
            return pme_mod.recip_energy_from_grid(
                Q, box, grid_dims, alpha, bsq[0], bsq[1], bsq[2], accum)

        # ---- real-space machinery
        def pair_data(pos, box, p):
            from ..ops import geometry as geom
            charge = p["charge"]
            d_lab, q_lab = lab_multipoles(pos, p)
            dr = pos[:, None, :] - pos[None, :, :]
            dr = geom.periodic_delta(dr, box)
            r2 = jnp.sum(dr * dr, -1)
            mask = ~jnp.eye(n, dtype=bool)
            r2s = jnp.where(mask, r2, 1.0)
            r = jnp.sqrt(r2s)
            return charge, d_lab, q_lab, dr, r, r2s, mask

        def contractions(charge, d_lab, q_lab, dr):
            qi = charge[:, None]
            qj = charge[None, :]
            di_r = jnp.einsum("ik,ijk->ij", d_lab, dr)
            dj_r = jnp.einsum("jk,ijk->ij", d_lab, dr)
            di_dj = jnp.einsum("ik,jk->ij", d_lab, d_lab)
            Qi_r = jnp.einsum("ikl,ijl->ijk", q_lab, dr)
            Qj_r = jnp.einsum("jkl,ijl->ijk", q_lab, dr)
            rQi_r = jnp.einsum("ijk,ijk->ij", Qi_r, dr)
            rQj_r = jnp.einsum("ijk,ijk->ij", Qj_r, dr)
            tr_Q = jnp.trace(q_lab, axis1=1, axis2=2)
            di_Qj_r = jnp.einsum("ik,ijk->ij", d_lab, Qj_r)
            dj_Qi_r = jnp.einsum("jk,ijk->ij", d_lab, Qi_r)
            Qi_Qj = jnp.einsum("ikl,jkl->ij", q_lab, q_lab)
            QiQj_rr = jnp.einsum("ijk,ijk->ij", Qi_r, Qj_r)
            return (qi, qj, di_r, dj_r, di_dj, Qi_r, Qj_r, rQi_r, rQj_r,
                    tr_Q, di_Qj_r, dj_Qi_r, Qi_Qj, QiQj_rr)

        def tensor_energy(C, K1, K2, K3, K4, K5):
            """Multipole pair energy with generalized radial kernels:
            plain kernels are (1/r, 1/r^3, 1/r^5, 1/r^7, 1/r^9); the Ewald
            real space substitutes (B0, B1, B2/3, B3/15, B4/105)."""
            (qi, qj, di_r, dj_r, di_dj, Qi_r, Qj_r, rQi_r, rQj_r,
             tr_Q, di_Qj_r, dj_Qi_r, Qi_Qj, QiQj_rr) = C
            e = qi * qj * K1
            e = e + (-qj * di_r + qi * dj_r) * K2
            e = e - (3.0 * di_r * dj_r * K3 - di_dj * K2)
            e = e + (
                qi * (3.0 * rQj_r * K3 - tr_Q[None, :] * K2)
                + qj * (3.0 * rQi_r * K3 - tr_Q[:, None] * K2))
            t3_i = (-15.0 * di_r * rQj_r * K4
                    + 3.0 * (di_r * tr_Q[None, :] + 2.0 * di_Qj_r) * K3)
            t3_j = (-15.0 * dj_r * rQi_r * K4
                    + 3.0 * (dj_r * tr_Q[:, None] + 2.0 * dj_Qi_r) * K3)
            e = e + (t3_i - t3_j)
            t4 = (105.0 * rQi_r * rQj_r * K5
                  - 15.0 * (rQi_r * tr_Q[None, :] + rQj_r * tr_Q[:, None]
                            + 4.0 * QiQj_rr) * K4
                  + 3.0 * (tr_Q[:, None] * tr_Q[None, :] + 2.0 * Qi_Qj)
                  * K3)
            e = e + t4
            return e

        def tensor_field(C, dr, d_lab, K2, K3, K4):
            """Field at i from site j's multipole with generalized kernels
            (plain: 1/r^3, 1/r^5, 1/r^7)."""
            (qi, qj, di_r, dj_r, di_dj, Qi_r, Qj_r, rQi_r, rQj_r,
             tr_Q, di_Qj_r, dj_Qi_r, Qi_Qj, QiQj_rr) = C
            f_q = qj[:, :, None] * dr * K2[:, :, None]
            f_d = (3.0 * dj_r[:, :, None] * dr * K3[:, :, None]
                   - d_lab[None, :, :] * K2[:, :, None])
            f_quad = 3.0 * (5.0 * rQj_r[:, :, None] * dr * K4[:, :, None]
                            - (2.0 * Qj_r + tr_Q[None, :, None] * dr)
                            * K3[:, :, None])
            return f_q + f_d + f_quad

        def bn_kernels(r, r2s, mask, within):
            ar = alpha * r
            exp2a = jnp.exp(-ar * ar)
            if dt == jnp.float64:
                erfc_ar = jax.scipy.special.erfc(ar)
            else:
                erfc_ar = _erfc_f32_local(ar, exp2a)
            inv_r2 = 1.0 / r2s
            b0 = erfc_ar / r
            alsq2 = 2.0 * alpha * alpha
            alsq2n = (1.0 / (SQRT_PI * alpha)) * alsq2
            b1 = (b0 + alsq2n * exp2a) * inv_r2
            alsq2n = alsq2n * alsq2
            b2 = (3.0 * b1 + alsq2n * exp2a) * inv_r2
            alsq2n = alsq2n * alsq2
            b3 = (5.0 * b2 + alsq2n * exp2a) * inv_r2
            alsq2n = alsq2n * alsq2
            b4 = (7.0 * b3 + alsq2n * exp2a) * inv_r2
            w = (mask & within).astype(dt)
            return (b0 * w, b1 * w, (b2 / 3.0) * w, (b3 / 15.0) * w,
                    (b4 / 105.0) * w)

        def thole_lams(p, r, mask):
            dd = damp[:, None] * damp[None, :]
            dd = jnp.where(dd > 0, dd, 1.0)
            a_th = jnp.minimum(p["thole"][:, None], p["thole"][None, :])
            uu = a_th * (r / dd) ** 3
            expu = jnp.exp(-jnp.minimum(uu, 50.0))
            lam3 = jnp.where(mask, 1.0 - expu, 0.0)
            lam5 = jnp.where(mask, 1.0 - (1.0 + uu) * expu, 0.0)
            lam7 = jnp.where(mask,
                             1.0 - (1.0 + uu + 0.6 * uu * uu) * expu, 0.0)
            return lam3, lam5, lam7

        def fields_and_energy(pos, box, p, gp):
            charge, d_lab, q_lab, dr, r, r2s, mask = pair_data(pos, box, p)
            within = r2s < cutoff * cutoff
            C = contractions(charge, d_lab, q_lab, dr)
            inv_r = 1.0 / r
            inv_r2 = inv_r * inv_r
            inv_r3 = inv_r * inv_r2
            inv_r5 = inv_r3 * inv_r2
            inv_r7 = inv_r5 * inv_r2
            inv_r9 = inv_r7 * inv_r2
            K = bn_kernels(r, r2s, mask, within)
            wplain = mask.astype(dt)
            e_full = tensor_energy(C, *K)
            e_plain = tensor_energy(C, inv_r * wplain, inv_r3 * wplain,
                                    inv_r5 * wplain, inv_r7 * wplain,
                                    inv_r9 * wplain)
            e_real = 0.5 * ONE_4PI_EPS0 * jnp.sum(
                (e_full + (m_s - 1.0) * e_plain).astype(accum))

            # permanent field: full Bn minus (1 - d_s*thole)-damped plain
            lam3, lam5, lam7 = thole_lams(p, r, mask)
            f_full = tensor_field(C, dr, d_lab, K[1], K[2], K[3])
            sub3 = (1.0 - d_s * lam3) * inv_r3 * wplain
            sub5 = (1.0 - d_s * lam5) * inv_r5 * wplain
            sub7 = (1.0 - d_s * lam7) * inv_r7 * wplain
            f_sub = tensor_field(C, dr, d_lab, sub3, sub5, sub7)
            field_real = jnp.sum(f_full - f_sub, axis=1)

            def e_recip_of_dip(dd):
                return recip_energy(pos, box, charge, dd, q_lab)
            e_recip_perm, g_dip = jax.value_and_grad(e_recip_of_dip)(d_lab)
            field_recip = -g_dip / ONE_4PI_EPS0
            self_term = (4.0 / 3.0) * alpha ** 3 / SQRT_PI
            e_field = field_real + field_recip + self_term * d_lab

            # permanent self energy (the induced cross term arrives through
            # e_pol with the self field above)
            a2 = alpha * alpha
            # quad coefficient for OUR (1/3) Theta:grad grad density
            # convention: (ke/2)(1/9) Theta:Theta d4[erf(ar)/r](0) ->
            # -(8/45) a^4 ke a/sqrt(pi) Theta:Theta (the reference's 4/15
            # applies to its 3x-scaled spherical components)
            e_self = (-ONE_4PI_EPS0 * alpha / SQRT_PI) * (
                jnp.sum(charge * charge)
                + (2.0 / 3.0) * a2 * jnp.sum(d_lab * d_lab)
                + (8.0 / 5.0) * a2 * a2 * jnp.sum(q_lab * q_lab))
            e_perm = e_real + e_recip_perm.astype(accum) \
                + e_self.astype(accum)
            geom_cache = (pos, box, charge, q_lab, dr, r, r2s, mask, within,
                          lam3, lam5)
            return e_perm, e_field, geom_cache

        def induce(p, e_field, geom_cache):
            (pos, box, charge, q_lab, dr, r, r2s, mask, within,
             lam3, lam5) = geom_cache
            alpha_pol = p["polarity"][:, None]
            inv_r = 1.0 / r
            inv_r2 = inv_r * inv_r
            inv_r3 = inv_r * inv_r2
            inv_r5 = inv_r3 * inv_r2
            K = bn_kernels(r, r2s, mask, within)
            wplain = mask.astype(dt)
            sub3 = (1.0 - u_sj * lam3) * inv_r3 * wplain
            sub5 = (1.0 - u_sj * lam5) * inv_r5 * wplain
            self_term = (4.0 / 3.0) * alpha ** 3 / SQRT_PI
            zq = jnp.zeros(n, dt)
            zQ = jnp.zeros((n, 3, 3), dt)

            def dipole_field(mu):
                mu_r = jnp.einsum("jk,ijk->ij", mu, dr)

                def fd(k2, k3):
                    return (3.0 * mu_r[:, :, None] * dr * k3[:, :, None]
                            - mu[None, :, :] * k2[:, :, None])
                f_real = jnp.sum(fd(K[1], K[2]) - fd(sub3, sub5), axis=1)

                def e_recip_mu(mm):
                    return recip_energy(pos, box, zq, mm, zQ)
                f_recip = -jax.grad(e_recip_mu)(mu) / ONE_4PI_EPS0
                return f_real + f_recip + self_term * mu

            mu0 = alpha_pol * e_field
            if polarization == AmoebaMultipoleForce.Direct:
                return mu0
            if polarization == AmoebaMultipoleForce.Extrapolated:
                mus = [mu0]
                for _ in range(len(ext_coeffs) - 1):
                    mus.append(alpha_pol * (e_field + dipole_field(mus[-1])))
                return sum(c * m for c, m in zip(ext_coeffs, mus))
            omega = 0.7

            def body(i, mu):
                new = alpha_pol * (e_field + dipole_field(mu))
                return (1 - omega) * mu + omega * new

            return jax.lax.fori_loop(0, max_iter, body, mu0)

        def energy_fn(pos, box, p, gp):
            e_perm, e_field, geom_cache = fields_and_energy(pos, box, p, gp)
            mu = induce(p, e_field, geom_cache)
            e_pol = -0.5 * ONE_4PI_EPS0 * jnp.sum(mu * e_field)
            return e_perm + e_pol.astype(accum)

        cf = CompiledForce(name=self.getName(),
                           force_group=self.getForceGroup(),
                           params=params, energy_fn=energy_fn,
                           uses_pbc=True)

        def induced_fn(pos, box, p, gp):
            _, e_field, geom_cache = fields_and_energy(pos, box, p, gp)
            return induce(p, e_field, geom_cache)

        cf._induced_fn = induced_fn
        return cf


class AmoebaTorsionTorsionForce(Force):
    """Coupled torsion-torsion CMAP-style correction
    (AmoebaTorsionTorsionForce.h:49-139; reference kernel
    AmoebaReferenceTorsionTorsionForce.cpp:355-430): two consecutive
    dihedrals (1-2-3-4, 2-3-4-5) index a bicubic energy grid in degrees;
    a chirality-check atom may flip both angle signs."""

    def __init__(self):
        super().__init__()
        self._torsions = []   # (p1..p5, chiral, gridIndex)
        self._grids = []      # list of (nx, ny, x0, y0, dx, dy, coeffs)
        self._periodic = False

    def getNumTorsionTorsions(self):
        return len(self._torsions)

    def getNumTorsionTorsionGrids(self):
        return len(self._grids)

    def addTorsionTorsion(self, particle1, particle2, particle3, particle4,
                          particle5, chiralCheckAtomIndex, gridIndex):
        self._torsions.append((int(particle1), int(particle2),
                               int(particle3), int(particle4),
                               int(particle5), int(chiralCheckAtomIndex),
                               int(gridIndex)))
        return len(self._torsions) - 1

    def getTorsionTorsionParameters(self, index):
        return self._torsions[index]

    def setTorsionTorsionParameters(self, index, particle1, particle2,
                                    particle3, particle4, particle5,
                                    chiralCheckAtomIndex, gridIndex):
        self._torsions[index] = (int(particle1), int(particle2),
                                 int(particle3), int(particle4),
                                 int(particle5), int(chiralCheckAtomIndex),
                                 int(gridIndex))

    def getTorsionTorsionGrid(self, index):
        return self._grids[index]["raw"]

    def setTorsionTorsionGrid(self, index, grid):
        """grid[x][y] = [angle1, angle2, f(, fx, fy, fxy)]; angles in
        degrees on a uniform axis. Derivatives are fit with periodic
        splines when not supplied (TorsionTorsionForceImpl behavior)."""
        from ..utils.splines import (bicubic_coefficients_from_derivatives,
                                     bicubic_coefficients_periodic)
        while len(self._grids) <= index:
            self._grids.append(None)
        g = np.asarray(grid, np.float64)      # (nx, ny, 3 or 6)
        nx, ny = g.shape[0], g.shape[1]
        x0, y0 = g[0, 0, 0], g[0, 0, 1]
        dx = g[1, 0, 0] - g[0, 0, 0]
        dy = g[0, 1, 1] - g[0, 0, 1]
        if g.shape[2] >= 6:
            coeffs = bicubic_coefficients_from_derivatives(
                g[:, :, 2], g[:, :, 3] * dx, g[:, :, 4] * dy,
                g[:, :, 5] * dx * dy)
        else:
            # values-only grid: endpoints duplicate (-180 == 180); fit
            # doubly periodic splines on the unique points
            core = g[:nx - 1, :ny - 1, 2]
            cp = bicubic_coefficients_periodic(core)
            coeffs = cp
            nx_eff, ny_eff = nx - 1, ny - 1
            self._grids[index] = {
                "raw": grid, "nx": nx_eff, "ny": ny_eff, "x0": x0, "y0": y0,
                "dx": dx, "dy": dy, "coeffs": coeffs, "wrap": True}
            return
        self._grids[index] = {
            "raw": grid, "nx": nx, "ny": ny, "x0": x0, "y0": y0,
            "dx": dx, "dy": dy, "coeffs": coeffs, "wrap": False}

    def setUsesPeriodicBoundaryConditions(self, periodic):
        self._periodic = bool(periodic)

    def usesPeriodicBoundaryConditions(self):
        return self._periodic

    def _bonded_particles(self):
        out = []
        for (p1, p2, p3, p4, p5, chiral, _g) in self._torsions:
            out += [(p1, p2), (p2, p3), (p3, p4), (p4, p5)]
        return out

    def _compile(self, system, cfg):
        if not self._torsions:
            def zero_fn(pos, box, p, gp):
                return jnp.zeros((), cfg.accum_dtype)
            return CompiledForce(name=self.getName(),
                                 force_group=self.getForceGroup(),
                                 params={}, energy_fn=zero_fn)
        arr = np.asarray(self._torsions, np.int64)
        idx = jnp.asarray(arr[:, :5].astype(np.int32))
        chiral = jnp.asarray(arr[:, 5].astype(np.int32))
        has_chiral = jnp.asarray((arr[:, 5] >= 0).astype(np.int32))
        grid_of = arr[:, 6]
        periodic = self._periodic

        # pad all grids to common (max_nx-1, max_ny-1, 4, 4) coefficient
        # tensor; per-grid geometry arrays
        max_cx = max(g["coeffs"].shape[0] for g in self._grids)
        max_cy = max(g["coeffs"].shape[1] for g in self._grids)
        n_g = len(self._grids)
        coeffs = np.zeros((n_g, max_cx, max_cy, 4, 4))
        geom_info = np.zeros((n_g, 6))   # x0 y0 dx dy ncx ncy
        wraps = np.zeros(n_g)
        for gi, g in enumerate(self._grids):
            c = g["coeffs"]
            coeffs[gi, :c.shape[0], :c.shape[1]] = c
            geom_info[gi] = [g["x0"], g["y0"], g["dx"], g["dy"],
                             c.shape[0], c.shape[1]]
            wraps[gi] = 1.0 if g["wrap"] else 0.0
        params = {"coeffs": jnp.asarray(coeffs.astype(cfg.dtype))}
        ginfo = jnp.asarray(geom_info.astype(np.float64))
        gidx = jnp.asarray(grid_of.astype(np.int32))
        rad2deg = 180.0 / math.pi

        def energy_fn(pos, box, p, gp):
            b = box if periodic else None
            a1 = geom.dihedral_angle(pos[idx[:, 0]], pos[idx[:, 1]],
                                     pos[idx[:, 2]], pos[idx[:, 3]],
                                     b) * rad2deg
            a2 = geom.dihedral_angle(pos[idx[:, 1]], pos[idx[:, 2]],
                                     pos[idx[:, 3]], pos[idx[:, 4]],
                                     b) * rad2deg
            # chirality at the central atom flips both angle signs
            # (checkTorsionSign: parallelepiped volume at atom C)
            ca = pos[jnp.maximum(chiral, 0)]
            rb, rc, rd = pos[idx[:, 1]], pos[idx[:, 2]], pos[idx[:, 3]]
            v1 = ca - rc
            v2 = rb - rc
            v3 = rd - rc
            volume = jnp.sum(v1 * jnp.cross(v2, v3), axis=-1)
            flip = jnp.where((has_chiral > 0) & (volume < 0), -1.0, 1.0)
            a1 = a1 * flip
            a2 = a2 * flip
            info = ginfo[gidx]
            x0, y0 = info[:, 0], info[:, 1]
            dx, dy = info[:, 2], info[:, 3]
            ncx, ncy = info[:, 4], info[:, 5]
            tx = (a1 - x0) / dx
            ty = (a2 - y0) / dy
            # wrap periodic (values-only) grids; clamp explicit-derivative
            # grids at the boundary like the reference
            tx = jnp.clip(tx, 0.0, ncx - 1e-6)
            ty = jnp.clip(ty, 0.0, ncy - 1e-6)
            sx = jnp.minimum(jnp.floor(tx), ncx - 1).astype(jnp.int32)
            sy = jnp.minimum(jnp.floor(ty), ncy - 1).astype(jnp.int32)
            da = (tx - sx).astype(pos.dtype)
            db = (ty - sy).astype(pos.dtype)
            c = p["coeffs"][gidx, sx, sy]         # (n_t, 4, 4)
            ta = jnp.stack([jnp.ones_like(da), da, da * da, da ** 3], -1)
            tb = jnp.stack([jnp.ones_like(db), db, db * db, db ** 3], -1)
            e = jnp.einsum("ta,tab,tb->t", ta, c, tb)
            return jnp.sum(e.astype(cfg.accum_dtype))

        return CompiledForce(name=self.getName(),
                             force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn,
                             uses_pbc=periodic,
                             bonded_particles=tuple(self._bonded_particles()))


class AmoebaGeneralizedKirkwoodForce(Force):
    """Generalized Kirkwood implicit solvent for AMOEBA
    (plugins/amoeba/openmmapi/include/openmm/AmoebaGeneralizedKirkwoodForce.h).

    Like the reference, this force evaluates inside the multipole force:
    AmoebaMultipoleForce._compile detects it on the System and folds the
    Grycuk Born radii, the GK reaction-field SCF coupling, the GK pair
    energies, and the cavity term into its own energy function (the
    reference's AmoebaReferenceGeneralizedKirkwoodMultipoleForce). Its own
    _compile therefore contributes no modules."""

    def __init__(self):
        super().__init__()
        self._particles = []   # (charge, radius, scalingFactor)
        self._solvent_dielectric = 78.3
        self._solute_dielectric = 1.0
        self._include_cavity = True
        # reference API ctor defaults (AmoebaGeneralizedKirkwoodForce.cpp:39)
        self._probe_radius = 0.14
        self._surface_area_factor = -6.0 * 3.1415926535 * 0.0216 \
            * 1000.0 * 0.4184

    def getNumParticles(self):
        return len(self._particles)

    def addParticle(self, charge, radius, scalingFactor):
        self._particles.append((float(u.strip(charge, u.elementary_charge)),
                                float(u.strip(radius, u.nanometer)),
                                float(scalingFactor)))
        return len(self._particles) - 1

    def getParticleParameters(self, index):
        c, r, s = self._particles[index]
        return (u.Quantity(c, u.elementary_charge),
                u.Quantity(r, u.nanometer), s)

    def setParticleParameters(self, index, charge, radius, scalingFactor):
        self._particles[index] = (
            float(u.strip(charge, u.elementary_charge)),
            float(u.strip(radius, u.nanometer)), float(scalingFactor))

    def getSolventDielectric(self):
        return self._solvent_dielectric

    def setSolventDielectric(self, dielectric):
        self._solvent_dielectric = float(dielectric)

    def getSoluteDielectric(self):
        return self._solute_dielectric

    def setSoluteDielectric(self, dielectric):
        self._solute_dielectric = float(dielectric)

    def getIncludeCavityTerm(self):
        return int(self._include_cavity)

    def setIncludeCavityTerm(self, include):
        self._include_cavity = bool(include)

    def getProbeRadius(self):
        return u.Quantity(self._probe_radius, u.nanometer)

    def setProbeRadius(self, radius):
        self._probe_radius = float(u.strip(radius, u.nanometer))

    def getSurfaceAreaFactor(self):
        return self._surface_area_factor

    def setSurfaceAreaFactor(self, factor):
        self._surface_area_factor = float(factor)

    def updateParametersInContext(self, context):
        # parameters are folded into the multipole force's compiled module
        for f in context.getSystem().getForces():
            if isinstance(f, AmoebaMultipoleForce):
                context._update_force_parameters(f)

    def usesPeriodicBoundaryConditions(self):
        return False

    def _compile(self, system, cfg):
        for f in system.getForces():
            if isinstance(f, AmoebaMultipoleForce):
                return []
        raise OpenMMException(
            "AmoebaGeneralizedKirkwoodForce requires an "
            "AmoebaMultipoleForce in the System")


class AmoebaWcaDispersionForce(Force):
    """WCA dispersion for implicit solvent (AmoebaWcaDispersionForce.h;
    reference kernel AmoebaReferenceWcaDispersionForce.cpp:40-323): each
    atom's maximum dispersion energy in bulk water minus the part descreened
    by every other atom's occluding sphere, integrated analytically over the
    water O and H site densities. Energy only here — forces via jax.grad."""

    def __init__(self):
        super().__init__()
        self._particles = []   # (radius, epsilon)
        # defaults per AmoebaWcaDispersionForce.cpp:41-48
        self._epso = 0.1100
        self._epsh = 0.0135
        self._rmino = 1.7025
        self._rminh = 1.3275
        self._awater = 0.033428
        self._slevy = 1.0
        self._shctd = 0.81
        self._dispoff = 0.26

    def getNumParticles(self):
        return len(self._particles)

    def addParticle(self, radius, epsilon):
        self._particles.append((float(u.strip(radius, _NM)),
                                float(u.strip(epsilon, _E))))
        return len(self._particles) - 1

    def getParticleParameters(self, index):
        r, e = self._particles[index]
        return u.Quantity(r, _NM), u.Quantity(e, _E)

    def setParticleParameters(self, index, radius, epsilon):
        self._particles[index] = (float(u.strip(radius, _NM)),
                                  float(u.strip(epsilon, _E)))

    def updateParametersInContext(self, context):
        context._update_force_params(self)

    # scalar model parameters
    def getEpso(self):
        return self._epso

    def setEpso(self, v):
        self._epso = float(v)

    def getEpsh(self):
        return self._epsh

    def setEpsh(self, v):
        self._epsh = float(v)

    def getRmino(self):
        return self._rmino

    def setRmino(self, v):
        self._rmino = float(v)

    def getRminh(self):
        return self._rminh

    def setRminh(self, v):
        self._rminh = float(v)

    def getAwater(self):
        return self._awater

    def setAwater(self, v):
        self._awater = float(v)

    def getSlevy(self):
        return self._slevy

    def setSlevy(self, v):
        self._slevy = float(v)

    def getShctd(self):
        return self._shctd

    def setShctd(self, v):
        self._shctd = float(v)

    def getDispoff(self):
        return self._dispoff

    def setDispoff(self, v):
        self._dispoff = float(v)

    def usesPeriodicBoundaryConditions(self):
        return False

    def _pack_params(self, cfg):
        arr = np.asarray(self._particles, np.float64) \
            if self._particles else np.zeros((0, 2))
        return {"radius": jnp.asarray(arr[:, 0].astype(cfg.dtype)),
                "epsilon": jnp.asarray(arr[:, 1].astype(cfg.dtype))}

    def _max_dispersion_energy(self, radius, epsilon):
        """Per-atom bulk-water dispersion (ksolv.f knp loop;
        AmoebaWcaDispersionForceImpl.cpp:64-120)."""
        pi = math.pi
        rmini = radius
        rdisp = radius + self._dispoff
        epso, epsh = self._epso, self._epsh
        emixo = 4.0 * epso * epsilon / (math.sqrt(epso)
                                        + math.sqrt(epsilon)) ** 2
        rmixo = 2.0 * (self._rmino ** 3 + rmini ** 3) \
            / (self._rmino ** 2 + rmini ** 2)
        ao = emixo * rmixo ** 7
        emixh = 4.0 * epsh * epsilon / (math.sqrt(epsh)
                                        + math.sqrt(epsilon)) ** 2
        rmixh = 2.0 * (self._rminh ** 3 + rmini ** 3) \
            / (self._rminh ** 2 + rmini ** 2)
        ah = emixh * rmixh ** 7
        if rdisp < rmixh:
            cdisp = -4.0 * pi * emixh * (rmixh ** 3 - rdisp ** 3) / 3.0 \
                - emixh * 18.0 / 11.0 * rmixh ** 3 * pi
        else:
            cdisp = 2.0 * pi * (2.0 * rmixh ** 7 - 11.0 * rdisp ** 7) * ah \
                / (11.0 * rdisp ** 11)
        cdisp *= 2.0
        if rdisp < rmixo:
            cdisp -= 4.0 * pi * emixo * (rmixo ** 3 - rdisp ** 3) / 3.0
            cdisp -= emixo * 18.0 / 11.0 * rmixo ** 3 * pi
        else:
            cdisp += 2.0 * pi * (2.0 * rmixo ** 7 - 11.0 * rdisp ** 7) * ao \
                / (11.0 * rdisp ** 11)
        return self._slevy * self._awater * cdisp

    def _compile(self, system, cfg):
        n = len(self._particles)
        if n == 0:
            def zero_fn(pos, box, p, gp):
                return jnp.zeros((), cfg.accum_dtype)
            return CompiledForce(name=self.getName(),
                                 force_group=self.getForceGroup(),
                                 params={}, energy_fn=zero_fn)
        max_e = sum(self._max_dispersion_energy(r, e) if e > 0 and r > 0
                    else 0.0 for (r, e) in self._particles)
        pi = math.pi
        epso, epsh = self._epso, self._epsh
        rmino, rminh = self._rmino, self._rminh
        shctd = self._shctd
        slevy_awater = self._slevy * self._awater
        params = self._pack_params(cfg)

        def energy_fn(pos, box, p, gp):
            rmin = p["radius"]
            eps = p["epsilon"]
            # per-solvated-atom water mixing parameters
            emixo = 4.0 * epso * eps / (math.sqrt(epso)
                                        + jnp.sqrt(eps)) ** 2
            rmixo = 2.0 * (rmino ** 3 + rmin ** 3) \
                / (rmino ** 2 + rmin ** 2)
            ao = emixo * rmixo ** 7
            emixh = 4.0 * epsh * eps / (math.sqrt(epsh)
                                        + jnp.sqrt(eps)) ** 2
            rmixh = 2.0 * (rminh ** 3 + rmin ** 3) \
                / (rminh ** 2 + rmin ** 2)
            ah = emixh * rmixh ** 7

            dr = pos[:n, None, :] - pos[None, :n, :]
            r2 = jnp.sum(dr * dr, axis=-1)
            mask = ~jnp.eye(n, dtype=bool)
            r2 = jnp.where(mask, r2, 1.0)
            r = jnp.sqrt(r2)
            sk = (rmin * shctd)[None, :]        # descreening radius of k
            sk2 = sk * sk
            ri = rmin[:, None]                  # solvated atom radius

            active = (ri < r + sk) & mask
            rmax = jnp.maximum(ri, r - sk)

            def shell_low(rmix, emix):
                """descreened shell inside rmix: the 1/r^0 well region."""
                lik = rmax
                uik = jnp.minimum(r + sk, rmix[:, None])
                take = (lik < rmix[:, None]) & active
                lik2, lik3, lik4 = lik * lik, lik ** 3, lik ** 4
                uik2, uik3, uik4 = uik * uik, uik ** 3, uik ** 4
                term = 4.0 * pi / (48.0 * r) * (
                    3.0 * (lik4 - uik4) - 8.0 * r * (lik3 - uik3)
                    + 6.0 * (r2 - sk2) * (lik2 - uik2))
                return jnp.where(take, -emix[:, None] * term, 0.0)

            e_pairs = shell_low(rmixo, emixo) + 2.0 * shell_low(rmixh, emixh)

            # r^-6 attraction + r^-12 repulsion shells outside rmix
            # (reference lines 146-235; a_val = emix*rmix^7)
            def high(rmix, a_val, rmix7, disp_scale, rep_scale):
                uik = r + sk
                take = (uik > rmix[:, None]) & active
                lik = jnp.maximum(rmax, rmix[:, None])
                lik2, lik3 = lik * lik, lik ** 3
                lik4 = lik2 * lik2
                lik5 = lik2 * lik3
                lik10 = lik5 * lik5
                lik11 = lik5 * lik5 * lik
                lik12 = lik5 * lik5 * lik2
                uik2, uik3 = uik * uik, uik ** 3
                uik4 = uik2 * uik2
                uik5 = uik2 * uik3
                uik10 = uik5 * uik5
                uik11 = uik5 * uik5 * uik
                uik12 = uik5 * uik5 * uik2
                term = 4.0 * pi / (120.0 * r * lik5 * uik5) * (
                    15.0 * uik * lik * r * (uik4 - lik4)
                    - 10.0 * uik2 * lik2 * (uik3 - lik3)
                    + 6.0 * (sk2 - r2) * (uik5 - lik5))
                idisp = disp_scale * a_val[:, None] * term
                term2 = 4.0 * pi / (2640.0 * r * lik12 * uik12) * (
                    120.0 * uik * lik * r * (uik11 - lik11)
                    - 66.0 * uik2 * lik2 * (uik10 - lik10)
                    + 55.0 * (sk2 - r2) * (uik12 - lik12))
                irep = rep_scale * (a_val * rmix7)[:, None] * term2
                return jnp.where(take, idisp + irep, 0.0)

            e_pairs = e_pairs + high(rmixo, ao, rmixo ** 7, -2.0, 1.0)
            e_pairs = e_pairs + high(rmixh, ah, rmixh ** 7, -4.0, 2.0)
            total_sum = jnp.sum(e_pairs.astype(cfg.accum_dtype))
            return (jnp.asarray(max_e, cfg.accum_dtype)
                    - slevy_awater * total_sum)

        return CompiledForce(name=self.getName(),
                             force_group=self.getForceGroup(),
                             params=params, energy_fn=energy_fn)
