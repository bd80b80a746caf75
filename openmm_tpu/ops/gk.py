"""Generalized Kirkwood implicit solvent for AMOEBA multipoles.

Energy-only port of the reference's GK stack; forces come from jax.grad
through Born radii, the solvated SCF, and the pair energies (the reference
hand-codes the 3rd-gradient tensors for forces — autodiff replaces all of
that). Sources:

* Grycuk Born radii: plugins/amoeba/platforms/reference/src/SimTKReference/
  AmoebaReferenceGeneralizedKirkwoodForce.cpp:135-203
* GK auxiliary terms / reaction-potential tensors / pair energies:
  AmoebaReferenceMultipoleForce.cpp:2538-3948 (energy terms only; tensors
  through the 2nd reaction-potential gradient)
* permanent + induced GK reaction fields: same file :2170-2536
* cavity term: :4124-4135
* dielectric factors fc/fd/fq and gkc: :2113-2140

All arrays are dense (n, n) — GK is a NoCutoff implicit-solvent model.
"""
from __future__ import annotations

import jax.numpy as jnp

GKC = 2.455
DIELECTRIC_OFFSET = 0.009
BIG_RADIUS = 1000.0


def grycuk_born_radii(pos, radii, scale_factors):
    """Grycuk pairwise-descreening Born radii (exact port; piecewise branches
    as nested where)."""
    n = pos.shape[0]
    dr = pos[None, :, :] - pos[:, None, :]
    r2 = jnp.sum(dr * dr, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    r = jnp.sqrt(jnp.where(eye, 1.0, r2))
    rho_i = radii[:, None]
    sk = (radii * scale_factors)[None, :]
    sk2 = sk * sk

    engulfed = rho_i > (r + sk)          # no descreening from j
    inside = (rho_i + r) < sk            # i inside j's descreening sphere

    # extra term when i sits inside j's scaled sphere
    lik_in = rho_i
    uik_in = jnp.maximum(sk - r, 1e-10)
    term_in = -(1.0 / uik_in ** 3 - 1.0 / lik_in ** 3)

    uik = r + sk
    lik = jnp.where(inside, jnp.maximum(sk - r, 1e-10),
                    jnp.where(r < rho_i + sk, rho_i, r - sk))
    l2 = lik * lik
    l4 = l2 * l2
    u2 = uik * uik
    u4 = u2 * u2
    term = ((3.0 * (r2 - sk2) + 6.0 * u2 - 8.0 * uik * r) / (u4 * r)
            - (3.0 * (r2 - sk2) + 6.0 * l2 - 8.0 * lik * r) / (l4 * r))
    pair = jnp.where(inside, term_in, 0.0) + term / 16.0
    pair = jnp.where(eye | engulfed | (sk <= 0.0), 0.0, pair)
    born_sum = 1.0 / jnp.maximum(radii, 1e-6) ** 3 - jnp.sum(pair, axis=1)
    born = jnp.where(born_sum <= 0.0, BIG_RADIUS,
                     jnp.maximum(born_sum, 1e-12) ** (-1.0 / 3.0))
    return jnp.where(radii <= 0.0, BIG_RADIUS, born)


def _aux_terms(r2, rb2, gkc):
    """Reaction-potential auxiliary terms a_nm (n = source order, m =
    gradient order), unscaled by the dielectric factors."""
    expterm = jnp.exp(-r2 / (gkc * rb2))
    expc = expterm / gkc
    dexpc = -2.0 / (gkc * rb2)
    gf2 = 1.0 / (r2 + rb2 * expterm)
    gf = jnp.sqrt(gf2)
    gf3 = gf2 * gf
    gf5 = gf3 * gf2
    gf7 = gf5 * gf2
    gf9 = gf7 * gf2
    a00 = gf
    a10 = -gf3
    a20 = 3.0 * gf5
    a30 = -15.0 * gf7
    a40 = 105.0 * gf9
    expc1 = 1.0 - expc
    a01 = expc1 * a10
    a11 = expc1 * a20
    a21 = expc1 * a30
    a31 = expc1 * a40
    expcdexpc = -expc * dexpc
    a02 = expc1 * a11 + expcdexpc * a10
    a12 = expc1 * a21 + expcdexpc * a20
    a22 = expc1 * a31 + expcdexpc * a30
    return {"a00": a00, "a10": a10, "a20": a20,
            "a01": a01, "a11": a11, "a21": a21,
            "a02": a02, "a12": a12, "a22": a22}


def _tensors(dr, aux, fc, fd, fq):
    """Reaction potential tensors through the 2nd gradient, with the
    dielectric factors folded (reference :2693-2945 energy subset).

    Index convention mirrors the reference: slot 1 = potential value,
    2-4 = gradient (x,y,z), 5-10 = 2nd gradient (xx,xy,xz,yy,yz,zz)."""
    xr = dr[..., 0]
    yr = dr[..., 1]
    zr = dr[..., 2]
    xr2, yr2, zr2 = xr * xr, yr * yr, zr * zr
    a00 = fc * aux["a00"]
    a01 = fc * aux["a01"]
    a02 = fc * aux["a02"]
    a10 = fd * aux["a10"]
    a11 = fd * aux["a11"]
    a12 = fd * aux["a12"]
    a20 = fq * aux["a20"]
    a21 = fq * aux["a21"]
    a22 = fq * aux["a22"]

    t = {}
    t["gc1"] = a00
    t["gc"] = jnp.stack([xr * a01, yr * a01, zr * a01], -1)       # 2-4
    # gc5..10: xx, xy, xz, yy, yz, zz
    t["gc2nd"] = jnp.stack([
        a01 + xr2 * a02, xr * yr * a02, xr * zr * a02,
        a01 + yr2 * a02, yr * zr * a02, a01 + zr2 * a02], -1)
    # dipole potential value (gux1, guy1, guz1)
    t["gu1"] = jnp.stack([xr * a10, yr * a10, zr * a10], -1)
    # dipole gradient gu[d][g]: (3,3) per pair, d = dipole comp, g = grad
    gux2 = a10 + xr2 * a11
    gux3 = xr * yr * a11
    gux4 = xr * zr * a11
    guy3 = a10 + yr2 * a11
    guy4 = yr * zr * a11
    guz4 = a10 + zr2 * a11
    t["gu_g"] = jnp.stack([
        jnp.stack([gux2, gux3, gux4], -1),
        jnp.stack([gux3, guy3, guy4], -1),
        jnp.stack([gux4, guy4, guz4], -1)], -2)
    # dipole 2nd gradient gu[d][s] with s = xx,xy,xz,yy,yz,zz
    gux5 = xr * (3.0 * a11 + xr2 * a12)
    gux6 = yr * (a11 + xr2 * a12)
    gux7 = zr * (a11 + xr2 * a12)
    gux8 = xr * (a11 + yr2 * a12)
    gux9 = zr * xr * yr * a12
    gux10 = xr * (a11 + zr2 * a12)
    guy5 = yr * (a11 + xr2 * a12)
    guy6 = xr * (a11 + yr2 * a12)
    guy8 = yr * (3.0 * a11 + yr2 * a12)
    guy9 = zr * (a11 + yr2 * a12)
    guy10 = yr * (a11 + zr2 * a12)
    guz5 = zr * (a11 + xr2 * a12)
    guz7 = xr * (a11 + zr2 * a12)
    guz8 = zr * (a11 + yr2 * a12)
    guz9 = yr * (a11 + zr2 * a12)
    guz10 = zr * (3.0 * a11 + zr2 * a12)
    t["gu_2"] = jnp.stack([
        jnp.stack([gux5, gux6, gux7, gux8, gux9, gux10], -1),
        jnp.stack([guy5, guy6, gux9, guy8, guy9, guy10], -1),
        jnp.stack([guz5, gux9, guz7, guz8, guz9, guz10], -1)], -2)
    # quadrupole potential value gq**1 as symmetric 6-vector (xx,xy,xz,yy,yz,zz)
    t["gq1"] = jnp.stack([xr2 * a20, xr * yr * a20, xr * zr * a20,
                          yr2 * a20, yr * zr * a20, zr2 * a20], -1)
    # quadrupole gradient gq[s][g]
    gqxx2 = xr * (2.0 * a20 + xr2 * a21)
    gqxx3 = yr * xr2 * a21
    gqxx4 = zr * xr2 * a21
    gqyy2 = xr * yr2 * a21
    gqyy3 = yr * (2.0 * a20 + yr2 * a21)
    gqyy4 = zr * yr2 * a21
    gqzz2 = xr * zr2 * a21
    gqzz3 = yr * zr2 * a21
    gqzz4 = zr * (2.0 * a20 + zr2 * a21)
    gqxy2 = yr * (a20 + xr2 * a21)
    gqxy3 = xr * (a20 + yr2 * a21)
    gqxy4 = zr * xr * yr * a21
    gqxz2 = zr * (a20 + xr2 * a21)
    gqxz4 = xr * (a20 + zr2 * a21)
    gqyz3 = zr * (a20 + yr2 * a21)
    gqyz4 = yr * (a20 + zr2 * a21)
    t["gq_g"] = jnp.stack([
        jnp.stack([gqxx2, gqxx3, gqxx4], -1),
        jnp.stack([gqxy2, gqxy3, gqxy4], -1),
        jnp.stack([gqxz2, gqxy4, gqxz4], -1),
        jnp.stack([gqyy2, gqyy3, gqyy4], -1),
        jnp.stack([gqxy4, gqyz3, gqyz4], -1),
        jnp.stack([gqzz2, gqzz3, gqzz4], -1)], -2)
    # quadrupole 2nd gradient gq[s][s'] (reference gq**5..10)
    gqxx5 = 2.0 * a20 + xr2 * (5.0 * a21 + xr2 * a22)
    gqxx6 = yr * xr * (2.0 * a21 + xr2 * a22)
    gqxx7 = zr * xr * (2.0 * a21 + xr2 * a22)
    gqxx8 = xr2 * (a21 + yr2 * a22)
    gqxx9 = zr * yr * xr2 * a22
    gqxx10 = xr2 * (a21 + zr2 * a22)
    gqyy5 = yr2 * (a21 + xr2 * a22)
    gqyy6 = xr * yr * (2.0 * a21 + yr2 * a22)
    gqyy7 = xr * zr * yr2 * a22
    gqyy8 = 2.0 * a20 + yr2 * (5.0 * a21 + yr2 * a22)
    gqyy9 = yr * zr * (2.0 * a21 + yr2 * a22)
    gqyy10 = yr2 * (a21 + zr2 * a22)
    gqzz5 = zr2 * (a21 + xr2 * a22)
    gqzz6 = xr * yr * zr2 * a22
    gqzz7 = xr * zr * (2.0 * a21 + zr2 * a22)
    gqzz8 = zr2 * (a21 + yr2 * a22)
    gqzz9 = yr * zr * (2.0 * a21 + zr2 * a22)
    gqzz10 = 2.0 * a20 + zr2 * (5.0 * a21 + zr2 * a22)
    gqxy5 = xr * yr * (3.0 * a21 + xr2 * a22)
    gqxy6 = a20 + (xr2 + yr2) * a21 + xr2 * yr2 * a22
    gqxy7 = zr * yr * (a21 + xr2 * a22)
    gqxy8 = xr * yr * (3.0 * a21 + yr2 * a22)
    gqxy9 = zr * xr * (a21 + yr2 * a22)
    gqxy10 = xr * yr * (a21 + zr2 * a22)
    gqxz5 = xr * zr * (3.0 * a21 + xr2 * a22)
    gqxz6 = yr * zr * (a21 + xr2 * a22)
    gqxz7 = a20 + (xr2 + zr2) * a21 + xr2 * zr2 * a22
    gqxz8 = xr * zr * (a21 + yr2 * a22)
    gqxz9 = xr * yr * (a21 + zr2 * a22)
    gqxz10 = xr * zr * (3.0 * a21 + zr2 * a22)
    gqyz5 = zr * yr * (a21 + xr2 * a22)
    gqyz6 = xr * zr * (a21 + yr2 * a22)
    gqyz7 = xr * yr * (a21 + zr2 * a22)
    gqyz8 = yr * zr * (3.0 * a21 + yr2 * a22)
    gqyz9 = a20 + (yr2 + zr2) * a21 + yr2 * zr2 * a22
    gqyz10 = yr * zr * (3.0 * a21 + zr2 * a22)
    t["gq_2"] = jnp.stack([
        jnp.stack([gqxx5, gqxx6, gqxx7, gqxx8, gqxx9, gqxx10], -1),
        jnp.stack([gqxy5, gqxy6, gqxy7, gqxy8, gqxy9, gqxy10], -1),
        jnp.stack([gqxz5, gqxz6, gqxz7, gqxz8, gqxz9, gqxz10], -1),
        jnp.stack([gqyy5, gqyy6, gqyy7, gqyy8, gqyy9, gqyy10], -1),
        jnp.stack([gqyz5, gqyz6, gqyz7, gqyz8, gqyz9, gqyz10], -1),
        jnp.stack([gqzz5, gqzz6, gqzz7, gqzz8, gqzz9, gqzz10], -1)], -2)
    return t


def _sym6(q):
    """(n, 3, 3) symmetric matrices -> (n, 6) [xx, xy, xz, yy, yz, zz] with
    the reference's double-weighting of off-diagonal components applied at
    CONTRACTION time, not here."""
    return jnp.stack([q[:, 0, 0], q[:, 0, 1], q[:, 0, 2],
                      q[:, 1, 1], q[:, 1, 2], q[:, 2, 2]], -1)


_OFFD = jnp.asarray([1.0, 2.0, 2.0, 1.0, 2.0, 1.0])


def gk_setup(pos, born, charge, d_lab, q_lab, solvent_dielectric,
             gkc=GKC):
    """Common pair data for the GK energy/field evaluations."""
    eps = solvent_dielectric
    fc = (1.0 - eps) / eps
    fd = 2.0 * (1.0 - eps) / (1.0 + 2.0 * eps)
    fq = 3.0 * (1.0 - eps) / (2.0 + 3.0 * eps)
    dr = pos[None, :, :] - pos[:, None, :]     # dr[i,j] = r_j - r_i
    r2 = jnp.sum(dr * dr, axis=-1)
    rb2 = born[:, None] * born[None, :]
    aux = _aux_terms(r2, rb2, gkc)
    t = _tensors(dr, aux, fc, fd, fq)
    q6 = _sym6(q_lab)
    return {"t": t, "q6": q6, "charge": charge, "d": d_lab}


def gk_permanent_field(setup):
    """GK reaction field of the permanent multipoles at every site (fid
    assembly, reference :2332-2400), summed over all sources incl. self."""
    t = setup["t"]
    q6 = setup["q6"]
    c = setup["charge"]
    d = setup["d"]
    w = _OFFD
    # field at i from source j (dipole part): sum_d d_j[d] * gu_g[i,j,d,g]
    f_d = jnp.einsum("jd,ijdg->ig", d, t["gu_g"])
    # charge part: 0.5 * (c_j * gu1[i,j,g] + c_j * gc[i,j,g])
    f_c = 0.5 * jnp.einsum("j,ijg->ig", c, t["gu1"] + t["gc"])
    # quadrupole part: 0.5 * (q6_j . (gu_2 + gq_g))
    f_q = 0.5 * jnp.einsum("js,s,ijgs->ig", q6, w, t["gu_2"]) \
        + 0.5 * jnp.einsum("js,s,ijsg->ig", q6, w, t["gq_g"])
    return f_d + f_c + f_q


def gk_dipole_field(setup, mu):
    """Reaction field of (induced) dipoles mu at every site, incl. self."""
    return jnp.einsum("jd,ijdg->ig", mu, setup["t"]["gu_g"])


def gk_energy_permanent(setup):
    """esym + 0.5 (ewi + ewk) summed over unordered pairs incl. self
    (reference :3055-3116)."""
    t = setup["t"]
    q6 = setup["q6"]
    c = setup["charge"]
    d = setup["d"]
    w = _OFFD
    cc = c[:, None] * c[None, :]
    esym = cc * t["gc1"] - jnp.einsum("ia,jb,ijab->ij", d, d, t["gu_g"])
    ewi = (jnp.einsum("i,jg,ijg->ij", c, d, t["gc"])
           - jnp.einsum("j,ig,ijg->ij", c, d, t["gu1"])
           + jnp.einsum("i,js,s,ijs->ij", c, q6, w, t["gc2nd"])
           + jnp.einsum("j,is,s,ijs->ij", c, q6, w, t["gq1"])
           - jnp.einsum("ia,js,s,ijas->ij", d, q6, w, t["gu_2"])
           + jnp.einsum("ja,is,s,ijsa->ij", d, q6, w, t["gq_g"])
           + jnp.einsum("is,jp,p,s,ijsp->ij", q6, q6, w, w, t["gq_2"]))
    # ewk is the role-swapped twin; e(i,j) is symmetric after the 0.5
    # symmetrization, so summing the full matrix with 0.5 off-diagonal
    # weight reproduces the reference's (ii, jj>=ii) loop. ewk(i,j) =
    # ewi(j,i) by construction of the tensors (parity in dr).
    e_pair = esym + 0.5 * (ewi + jnp.swapaxes(ewi, 0, 1))
    # reference loop (ii, jj>=ii) with 0.5x self weight == 0.5 * full sum
    return 0.5 * jnp.sum(e_pair)


def gk_energy_induced(setup, mu_s):
    """0.5*(esymi_dbl + 0.5*(ewii+ewki)) — the ENERGY contracts the
    solvated induced dipoles u_S directly (the uS+uPS sums appear only in
    the reference's hand-coded force terms; reference :3585-3620, :3919)."""
    t = setup["t"]
    q6 = setup["q6"]
    c = setup["charge"]
    d = setup["d"]
    w = _OFFD
    s = mu_s
    # esymi is double-sided in the reference; the symmetrized half-sum
    # below restores it from the single-orientation matrix
    esymi = -2.0 * jnp.einsum("ia,jb,ijab->ij", d, s, t["gu_g"])
    ewii = (jnp.einsum("i,jg,ijg->ij", c, s, t["gc"])
            - jnp.einsum("j,ig,ijg->ij", c, s, t["gu1"])
            - jnp.einsum("ia,js,s,ijas->ij", s, q6, w, t["gu_2"])
            + jnp.einsum("ja,is,s,ijsa->ij", s, q6, w, t["gq_g"]))
    e_pair = 0.5 * (esymi + 0.5 * (ewii + jnp.swapaxes(ewii, 0, 1)))
    return 0.5 * jnp.sum(e_pair)


def cavity_energy(radii, born, probe_radius, surface_area_factor,
                  dielectric_offset=DIELECTRIC_OFFSET):
    """ACE-type surface-area term (reference :4124-4135)."""
    r = radii + dielectric_offset + probe_radius
    ratio = (radii + dielectric_offset) / born
    sa = surface_area_factor * r * r * ratio ** 6
    return -jnp.sum(sa) / 6.0
