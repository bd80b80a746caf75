"""HippoNonbondedForce: the HIPPO polarizable force field
(plugins/amoeba/openmmapi/include/openmm/HippoNonbondedForce.h).

One force covers charge-penetration multipole electrostatics, extrapolated
induced-dipole polarization, Pauli (exchange) repulsion, charge transfer,
and damped dispersion, with per-exception scale factors for each component.

TPU design: dense (n, n) lab-frame pair math (ops/hippo_math.py); the
reference's quasi-internal-frame scalars are frame-invariant contractions
evaluated directly in the lab frame, and all forces/torques come from
jax.grad of the energy (replacing ~1500 lines of hand-written QI force and
torque algebra plus the torque-to-force mapping,
AmoebaReferenceHippoNonbondedForce.cpp:685-1305). This round implements the
NoCutoff method (the reference's water-dimer golden test path); the PME
variant reuses these pair kernels with a real-space cutoff + switching and
is gated off until validated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..constants import ONE_4PI_EPS0
from ..exceptions import OpenMMException
from .base import CompiledForce, Force

_E = u.kilojoule_per_mole
_NM = u.nanometer


class HippoNonbondedForce(Force):
    # NonbondedMethod
    NoCutoff = 0
    PME = 1
    # ParticleAxisTypes (HippoNonbondedForce.h:75)
    ZThenX = 0
    Bisector = 1
    ZBisect = 2
    ThreeFold = 3
    ZOnly = 4
    NoAxisType = 5

    def __init__(self):
        super().__init__()
        self._particles = []
        self._exceptions = []
        self._method = HippoNonbondedForce.NoCutoff
        self._cutoff = 1.0
        self._switching = 0.9
        self._ewald_tol = 1e-4
        self._alpha = 0.0
        self._grid = (0, 0, 0)
        self._d_alpha = 0.0
        self._d_grid = (0, 0, 0)
        self._ext_coeffs = [-0.154, 0.017, 0.657, 0.475]

    # ------------------------------------------------------------------ API
    def getNumParticles(self):
        return len(self._particles)

    def addParticle(self, charge, dipole, quadrupole, coreCharge, alpha,
                    epsilon, damping, c6, pauliK, pauliQ, pauliAlpha,
                    polarizability, axisType, multipoleAtomZ,
                    multipoleAtomX, multipoleAtomY):
        self._particles.append({
            "charge": float(u.strip(charge, u.elementary_charge)),
            "dipole": [float(x) for x in dipole],
            "quadrupole": [float(x) for x in quadrupole],
            "coreCharge": float(u.strip(coreCharge, u.elementary_charge)),
            "alpha": float(alpha), "epsilon": float(epsilon),
            "damping": float(damping), "c6": float(c6),
            "pauliK": float(pauliK), "pauliQ": float(pauliQ),
            "pauliAlpha": float(pauliAlpha),
            "polarizability": float(polarizability),
            "axisType": int(axisType), "atomZ": int(multipoleAtomZ),
            "atomX": int(multipoleAtomX), "atomY": int(multipoleAtomY)})
        return len(self._particles) - 1

    def getParticleParameters(self, index):
        p = self._particles[index]
        return (p["charge"], list(p["dipole"]), list(p["quadrupole"]),
                p["coreCharge"], p["alpha"], p["epsilon"], p["damping"],
                p["c6"], p["pauliK"], p["pauliQ"], p["pauliAlpha"],
                p["polarizability"], p["axisType"], p["atomZ"], p["atomX"],
                p["atomY"])

    def setParticleParameters(self, index, charge, dipole, quadrupole,
                              coreCharge, alpha, epsilon, damping, c6,
                              pauliK, pauliQ, pauliAlpha, polarizability,
                              axisType, multipoleAtomZ, multipoleAtomX,
                              multipoleAtomY):
        self._particles[index] = {
            "charge": float(charge), "dipole": [float(x) for x in dipole],
            "quadrupole": [float(x) for x in quadrupole],
            "coreCharge": float(coreCharge), "alpha": float(alpha),
            "epsilon": float(epsilon), "damping": float(damping),
            "c6": float(c6), "pauliK": float(pauliK),
            "pauliQ": float(pauliQ), "pauliAlpha": float(pauliAlpha),
            "polarizability": float(polarizability),
            "axisType": int(axisType), "atomZ": int(multipoleAtomZ),
            "atomX": int(multipoleAtomX), "atomY": int(multipoleAtomY)}

    def getNumExceptions(self):
        return len(self._exceptions)

    def addException(self, particle1, particle2, multipoleMultipoleScale,
                     dipoleMultipoleScale, dipoleDipoleScale,
                     dispersionScale, repulsionScale, chargeTransferScale,
                     replace=False):
        self._exceptions.append((int(particle1), int(particle2),
                                 float(multipoleMultipoleScale),
                                 float(dipoleMultipoleScale),
                                 float(dipoleDipoleScale),
                                 float(dispersionScale),
                                 float(repulsionScale),
                                 float(chargeTransferScale)))
        return len(self._exceptions) - 1

    def getExceptionParameters(self, index):
        return self._exceptions[index]

    def setExceptionParameters(self, index, particle1, particle2, mm, dm,
                               dd, disp, rep, ct):
        self._exceptions[index] = (int(particle1), int(particle2),
                                   float(mm), float(dm), float(dd),
                                   float(disp), float(rep), float(ct))

    def getNonbondedMethod(self):
        return self._method

    def setNonbondedMethod(self, method):
        if method not in (0, 1):
            raise OpenMMException("HippoNonbondedForce: illegal method")
        self._method = int(method)

    def getCutoffDistance(self):
        return u.Quantity(self._cutoff, _NM)

    def setCutoffDistance(self, distance):
        self._cutoff = float(u.strip(distance, _NM))

    def getSwitchingDistance(self):
        return u.Quantity(self._switching, _NM)

    def setSwitchingDistance(self, distance):
        self._switching = float(u.strip(distance, _NM))

    def getExtrapolationCoefficients(self):
        return list(self._ext_coeffs)

    def setExtrapolationCoefficients(self, coeffs):
        self._ext_coeffs = [float(c) for c in coeffs]

    def getEwaldErrorTolerance(self):
        return self._ewald_tol

    def setEwaldErrorTolerance(self, tol):
        self._ewald_tol = float(tol)

    def getPMEParameters(self):
        return self._alpha, *self._grid

    def setPMEParameters(self, alpha, nx, ny, nz):
        self._alpha = float(alpha)
        self._grid = (int(nx), int(ny), int(nz))

    def getDPMEParameters(self):
        return self._d_alpha, *self._d_grid

    def setDPMEParameters(self, alpha, nx, ny, nz):
        self._d_alpha = float(alpha)
        self._d_grid = (int(nx), int(ny), int(nz))

    def getInducedDipoles(self, context):
        mods = context._modules_for_force(self)
        return np.asarray(mods[0]._induced_fn(
            context._state["positions"], context._state["box"],
            mods[0].params, context._state["gp"]))

    def getLabFramePermanentDipoles(self, context):
        mods = context._modules_for_force(self)
        return np.asarray(mods[0]._labdip_fn(
            context._state["positions"], context._state["box"],
            mods[0].params, context._state["gp"]))

    def usesPeriodicBoundaryConditions(self):
        return self._method == HippoNonbondedForce.PME

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _bonded_particles(self):
        return [(e[0], e[1]) for e in self._exceptions]

    # ------------------------------------------------------------- compile
    def _pack_params(self, cfg):
        dt = cfg.dtype
        n = len(self._particles)

        def arr(key):
            return jnp.asarray(np.asarray(
                [p[key] for p in self._particles], np.float64).astype(dt))

        return {"charge": arr("charge"), "core": arr("coreCharge"),
                "alpha": arr("alpha"), "epsilon": arr("epsilon"),
                "damping": arr("damping"), "c6": arr("c6"),
                "pauliK": arr("pauliK"), "pauliQ": arr("pauliQ"),
                "pauliAlpha": arr("pauliAlpha"),
                "polarizability": arr("polarizability"),
                "dipole": jnp.asarray(np.asarray(
                    [p["dipole"] for p in self._particles],
                    np.float64).astype(dt)).reshape(n, 3),
                "quad": jnp.asarray(np.asarray(
                    [p["quadrupole"] for p in self._particles],
                    np.float64).astype(dt)).reshape(n, 3, 3)}

    def _scale_matrices(self, n):
        keys = ("mm", "dm", "dd", "disp", "rep", "ct")
        out = {k: np.ones((n, n)) for k in keys}
        for (p1, p2, mm, dm, dd, disp, rep, ct) in self._exceptions:
            for k, v in zip(keys, (mm, dm, dd, disp, rep, ct)):
                out[k][p1, p2] = v
                out[k][p2, p1] = v
        for k in keys:
            np.fill_diagonal(out[k], 0.0)
        return out

    def _compile(self, system, cfg):
        from ..ops import hippo_math as hm

        n = cfg.n_particles
        if len(self._particles) != n:
            raise OpenMMException(
                "HippoNonbondedForce must have same particle count as the "
                "System")
        if self._method != HippoNonbondedForce.NoCutoff:
            raise OpenMMException(
                "HippoNonbondedForce: only NoCutoff is implemented in this "
                "build")
        dt = cfg.dtype
        accum = cfg.accum_dtype
        params = self._pack_params(cfg)
        scales = {k: jnp.asarray(v.astype(dt))
                  for k, v in self._scale_matrices(n).items()}
        axis_type = jnp.asarray(np.asarray(
            [p["axisType"] for p in self._particles], np.int32))
        atom_z = jnp.asarray(np.asarray(
            [max(p["atomZ"], 0) for p in self._particles], np.int32))
        atom_x = jnp.asarray(np.asarray(
            [max(p["atomX"], 0) for p in self._particles], np.int32))
        atom_y = jnp.asarray(np.asarray(
            [max(p["atomY"], 0) for p in self._particles], np.int32))
        coeffs = list(self._ext_coeffs)
        # partial sums: mu = sum_k (sum_{j>=k} c_j) mu^(k)  (:85-95)
        part = [sum(coeffs[k:]) for k in range(len(coeffs))]
        mask_off = ~np.eye(n, dtype=bool)
        mask_off_j = jnp.asarray(mask_off)

        def rotation_matrices(pos):
            zdir = pos[atom_z] - pos
            xdir = pos[atom_x] - pos
            ydir = pos[atom_y] - pos

            def unit(v):
                return v / jnp.sqrt(jnp.maximum(
                    jnp.sum(v * v, -1, keepdims=True), 1e-20))

            uz = unit(zdir)
            at = axis_type[:, None]
            uz = jnp.where(at == HippoNonbondedForce.Bisector,
                           unit(unit(zdir) + unit(xdir)), uz)
            uz = jnp.where(at == HippoNonbondedForce.ThreeFold,
                           unit(unit(zdir) + unit(xdir) + unit(ydir)), uz)
            ux_raw = jnp.where(at == HippoNonbondedForce.ZBisect,
                               unit(unit(xdir) + unit(ydir)), unit(xdir))
            ux_raw = jnp.where(at == HippoNonbondedForce.ZOnly,
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
            R = jnp.where((at == HippoNonbondedForce.NoAxisType)[..., None],
                          eye, R)
            return R

        def lab_multipoles(pos, p):
            R = rotation_matrices(pos)
            d_lab = jnp.einsum("nij,nj->ni", jnp.swapaxes(R, 1, 2),
                               p["dipole"])
            q_lab = jnp.einsum("nki,nkl,nlj->nij", R, p["quad"], R)
            return d_lab, q_lab

        def pair_geometry(pos):
            dr = pos[None, :, :] - pos[:, None, :]   # Delta = r_k - r_i
            r2 = jnp.sum(dr * dr, -1)
            r2s = jnp.where(mask_off_j, r2, 1.0)
            r = jnp.sqrt(r2s)
            return dr, r

        def contractions(d_lab, q_lab, dr):
            # frame-invariant versions of the reference's QI scalars
            # (Delta = r_k - r_i, QI z axis along Delta)
            # both sites rotate into the SAME QI frame (z along Delta):
            # dkr = d_k . Delta, no sign flip
            dir_ = jnp.einsum("ik,ijk->ij", d_lab, dr)      # d_i . Delta
            dkr = jnp.einsum("jk,ijk->ij", d_lab, dr)       # d_k . Delta
            dik = jnp.einsum("ik,jk->ij", d_lab, d_lab)
            Qi_d = jnp.einsum("ikl,ijl->ijk", q_lab, dr)    # Q_i . Delta
            Qk_d = jnp.einsum("jkl,ijl->ijk", q_lab, dr)
            qir = jnp.einsum("ijk,ijk->ij", Qi_d, dr)       # Delta Q_i Delta
            qkr = jnp.einsum("ijk,ijk->ij", Qk_d, dr)
            qik = jnp.einsum("ijk,ijk->ij", Qi_d, Qk_d)
            diqk = jnp.einsum("ik,ijk->ij", d_lab, Qk_d)
            dkqi = jnp.einsum("jk,ijk->ij", d_lab, Qi_d)
            qiqk = jnp.einsum("ikl,jkl->ij", q_lab, q_lab)
            return dir_, dkr, dik, qir, qkr, qik, diqk, dkqi, qiqk

        def electrostatic_energy(p, C, r):
            """Charge-penetration multipole energy (:685-780)."""
            dir_, dkr, dik, qir, qkr, qik, diqk, dkqi, qiqk = C
            core = p["core"]
            val = p["charge"] - p["core"]
            inv = 1.0 / r
            inv2 = inv * inv
            rr1 = inv
            rr3 = rr1 * inv2
            rr5 = 3 * rr3 * inv2
            rr7 = 5 * rr5 * inv2
            rr9 = 7 * rr7 * inv2
            f = hm.overlap_damping(p["alpha"][:, None], p["alpha"][None, :],
                                   r)
            ci = core[:, None]
            ck = core[None, :]
            vi = val[:, None]
            vk = val[None, :]
            term1 = ci * ck
            term1i = ck * vi
            term2i = ck * dir_
            term3i = ck * qir
            term1k = ci * vk
            term2k = -ci * dkr
            term3k = ci * qkr
            term1ik = vi * vk
            term2ik = vk * dir_ - vi * dkr + dik
            term3ik = vi * qkr + vk * qir - dir_ * dkr \
                + 2 * (dkqi - diqk + qiqk)
            term4ik = dir_ * qkr - dkr * qir - 4 * qik
            term5ik = qir * qkr
            e = (term1 * rr1
                 + term4ik * f["ij7"] * rr7 + term5ik * f["ij9"] * rr9
                 + term1i * f["i1"] * rr1 + term1k * f["j1"] * rr1
                 + term1ik * f["ij1"] * rr1
                 + term2i * f["i3"] * rr3 + term2k * f["j3"] * rr3
                 + term2ik * f["ij3"] * rr3
                 + term3i * f["i5"] * rr5 + term3k * f["j5"] * rr5
                 + term3ik * f["ij5"] * rr5)
            return ONE_4PI_EPS0 * scales["mm"] * e

        def repulsion_energy(p, C, r):
            """Pauli repulsion (:984-1085): the multipole overlap form with
            pauliQ as the monopole and the repulsion damping series."""
            dir_, dkr, dik, qir, qkr, qik, diqk, dkqi, qiqk = C
            qI = p["pauliQ"][:, None]
            qK = p["pauliQ"][None, :]
            f = hm.repulsion_damping(p["pauliAlpha"][:, None],
                                     p["pauliAlpha"][None, :], r)
            eterm1 = qI * qK
            eterm2 = qK * dir_ - qI * dkr + dik
            eterm3 = qI * qkr + qK * qir - dir_ * dkr \
                + 2 * (dkqi - diqk + qiqk)
            eterm4 = dir_ * qkr - dkr * qir - 4 * qik
            eterm5 = qir * qkr
            eterm = (eterm1 * f[1] + eterm2 * f[3] + eterm3 * f[5]
                     + eterm4 * f[7] + eterm5 * f[9])
            sizik = p["pauliK"][:, None] * p["pauliK"][None, :]
            return scales["rep"] * sizik * eterm / r

        def dispersion_energy(p, r):
            fd = hm.dispersion_damping(p["alpha"][:, None],
                                       p["alpha"][None, :], r)
            e = -p["c6"][:, None] * p["c6"][None, :] / r ** 6
            return scales["disp"] * e * fd * fd

        def charge_transfer_energy(p, r):
            t1 = p["epsilon"][:, None] * jnp.exp(-p["damping"][None, :] * r)
            t2 = p["epsilon"][None, :] * jnp.exp(-p["damping"][:, None] * r)
            return scales["ct"] * (-(t1 + t2))

        def fixed_field(p, d_lab, q_lab, dr, r):
            """Damped permanent field at every site (:557-589)."""
            core = p["core"]
            val = p["charge"] - p["core"]
            inv = 1.0 / r
            inv2 = inv * inv
            rInv3 = inv * inv2
            rInv5 = rInv3 * inv2
            rInv7 = rInv5 * inv2
            f3, f5, f7 = hm.direct_field_damping(p["alpha"][None, :], r)
            s = scales["dm"]
            rr3 = s * rInv3
            rr3j = s * f3 * rInv3
            rr5j = s * 3 * f5 * rInv5
            rr7j = s * 15 * f7 * rInv7
            Qk_d = jnp.einsum("jkl,ijl->ijk", q_lab, dr)
            dipdel = jnp.einsum("jk,ijk->ij", d_lab, dr)
            qdel = jnp.einsum("ijk,ijk->ij", Qk_d, dr)
            factor = (rr3 * core[None, :] + rr3j * val[None, :]
                      - rr5j * dipdel + rr7j * qdel)
            field = (factor[:, :, None] * dr
                     + d_lab[None, :, :] * rr3j[:, :, None]
                     - Qk_d * (2 * rr5j)[:, :, None])
            w = mask_off_j.astype(dt)
            return -jnp.sum(field * w[:, :, None], axis=1)

        def induce(p, e_fixed_mu, dr, r):
            """Extrapolated (OPT) induced dipoles (:640-683)."""
            f3, f5 = hm.mutual_field_damping(p["alpha"][:, None],
                                             p["alpha"][None, :], r)
            f3 = f3 * scales["dd"]
            f5 = f5 * scales["dd"]
            inv = 1.0 / r
            inv2 = inv * inv
            rInv3 = inv * inv2
            scale3 = -f3 * rInv3
            scale5 = 3 * f5 * rInv3 * inv2
            w = mask_off_j.astype(dt)

            def dipole_field(mu):
                mu_r = jnp.einsum("jk,ijk->ij", mu, dr)
                contrib = (mu[None, :, :] * scale3[:, :, None]
                           + dr * (scale5 * mu_r)[:, :, None])
                return jnp.sum(contrib * w[:, :, None], axis=1)

            alpha_pol = p["polarizability"][:, None]
            mus = [e_fixed_mu]        # mu^(0) = alpha * E_fixed
            for order in range(1, len(part)):
                mus.append(alpha_pol * dipole_field(mus[-1]))
            mu = sum(c * m for c, m in zip(part, mus))
            return mu, mus[0]

        def energy_fn(pos, box, p, gp):
            d_lab, q_lab = lab_multipoles(pos, p)
            dr, r = pair_geometry(pos)
            C = contractions(d_lab, q_lab, dr)
            e_pair = (electrostatic_energy(p, C, r)
                      + repulsion_energy(p, C, r)
                      + dispersion_energy(p, r)
                      + charge_transfer_energy(p, r))
            e = 0.5 * jnp.sum(jnp.where(mask_off_j, e_pair, 0.0)
                              .astype(accum))
            # polarization: E = -(ke/2) sum (1/alpha) mu_direct . mu
            e_f = fixed_field(p, d_lab, q_lab, dr, r)
            mu, mu0 = induce(p, p["polarizability"][:, None] * e_f, dr, r)
            inv_pol = jnp.where(p["polarizability"] > 0,
                                1.0 / jnp.maximum(p["polarizability"],
                                                  1e-12), 0.0)
            e_pol = -0.5 * ONE_4PI_EPS0 * jnp.sum(
                inv_pol[:, None] * mu0 * mu)
            return e + e_pol.astype(accum)

        cf = CompiledForce(name=self.getName(),
                           force_group=self.getForceGroup(),
                           params=params, energy_fn=energy_fn,
                           uses_pbc=False,
                           bonded_particles=tuple(self._bonded_particles()))

        def induced_fn(pos, box, p, gp):
            d_lab, q_lab = lab_multipoles(pos, p)
            dr, r = pair_geometry(pos)
            e_f = fixed_field(p, d_lab, q_lab, dr, r)
            mu, _ = induce(p, p["polarizability"][:, None] * e_f, dr, r)
            return mu

        def labdip_fn(pos, box, p, gp):
            return lab_multipoles(pos, p)[0]

        cf._induced_fn = induced_fn
        cf._labdip_fn = labdip_fn
        return cf
