"""Holonomic distance constraints: SETTLE (analytic 3-site clusters) and CCMA
(matrix-accelerated SHAKE for general constraint networks).

Counterparts of the reference's constraint stack
(platforms/reference/src/SimTKReference/ReferenceSETTLEAlgorithm.cpp — the
Miyamoto & Kollman SETTLE algorithm; ReferenceCCMAAlgorithm.cpp — constraint-
coupling matrix inverted at setup, iteration to tolerance; cluster
identification per platforms/common/src/IntegrationUtilities.cpp:132-199).

TPU design: SETTLE is a closed-form per-cluster computation -> one vmap over
all clusters (ideal VPU work). CCMA's sparse inverse is precomputed with numpy
at setup, sparsified to a fixed row width, and applied as gathers inside a
fixed-iteration lax loop (static shapes, no data-dependent exit).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Cluster identification (host-side)
# ---------------------------------------------------------------------------
def partition_constraints(constraints, masses):
    """Split constraints into SETTLE 3-atom triangle clusters and the rest.

    Returns (settle_clusters, ccma_constraints):
      settle_clusters: list of (a0, a1, a2, d01, d12) with d(a0,a1)==d(a0,a2)
      ccma_constraints: remaining (i, j, d)
    """
    n_cons = len(constraints)
    by_atom = {}
    for ci, (i, j, d) in enumerate(constraints):
        by_atom.setdefault(i, []).append(ci)
        by_atom.setdefault(j, []).append(ci)

    used = [False] * n_cons
    settle = []
    # find triangles: three constraints over exactly three atoms
    for ci in range(n_cons):
        if used[ci]:
            continue
        i, j, d = constraints[ci]
        # look for an atom k constrained to both i and j
        partners_i = {constraints[c][0] if constraints[c][1] == i else constraints[c][1]: c
                      for c in by_atom.get(i, []) if not used[c] and c != ci}
        partners_j = {constraints[c][0] if constraints[c][1] == j else constraints[c][1]: c
                      for c in by_atom.get(j, []) if not used[c] and c != ci}
        common = set(partners_i) & set(partners_j)
        placed = False
        for k in sorted(common):
            c_ik = partners_i[k]
            c_jk = partners_j[k]
            # triangle (i, j, k); pick the central atom: the one whose two
            # constraint distances are equal and whose partners' masses match
            tri = {tuple(sorted((i, j))): d,
                   tuple(sorted((i, k))): constraints[c_ik][2],
                   tuple(sorted((j, k))): constraints[c_jk][2]}

            def dist(a, b):
                return tri[tuple(sorted((a, b)))]

            for center, o1, o2 in ((i, j, k), (j, i, k), (k, i, j)):
                # atoms in the cluster must not take part in other constraints
                if any(not used[c] and c not in (ci, c_ik, c_jk)
                       for a in (i, j, k) for c in by_atom.get(a, [])):
                    continue
                if (abs(dist(center, o1) - dist(center, o2)) < 1e-10
                        and abs(masses[o1] - masses[o2]) < 1e-10
                        and masses[center] > 0 and masses[o1] > 0):
                    settle.append((center, o1, o2, dist(center, o1), dist(o1, o2)))
                    used[ci] = used[c_ik] = used[c_jk] = True
                    placed = True
                    break
            if placed:
                break
    ccma = [constraints[c] for c in range(n_cons) if not used[c]]
    return settle, ccma


def partition_shake_clusters(constraints, masses):
    """Split constraints into SHAKE-H star clusters and the rest.

    A SHAKE cluster (IntegrationUtilities.cpp:44-63,204-259) is a central
    atom with 1-3 peripheral atoms where every peripheral (a) shares the
    cluster's single constraint distance, (b) shares one inverse mass, and
    (c) takes part in no other constraint; the central atom's constraints
    are exactly the cluster's. Such clusters are mutually independent, so
    they solve in parallel with no coupling matrix — this is the entire
    protein-H constraint set under the HBonds option.

    Returns (clusters, rest): clusters = list of
    (central, [peripherals...], distance); rest = remaining (i, j, d).
    """
    n_cons = len(constraints)
    count = {}
    for (i, j, d) in constraints:
        count[i] = count.get(i, 0) + 1
        count[j] = count.get(j, 0) + 1

    by_central = {}
    invalid = set()
    for ci, (i, j, d) in enumerate(constraints):
        if count[i] > 1 and count[j] > 1:
            # both ends multiply constrained: not a star; poison both
            invalid.add(i)
            invalid.add(j)
            continue
        if count[i] > 1:
            central, periph = i, j
        elif count[j] > 1:
            central, periph = j, i
        else:
            central, periph = (i, j) if i < j else (j, i)
        by_central.setdefault(central, []).append((ci, periph, d))

    clusters = []
    used = [False] * n_cons
    for central, members in by_central.items():
        ok = (central not in invalid and len(members) <= 3
              and masses[central] > 0)
        d0 = members[0][2]
        m0 = masses[members[0][1]]
        for (ci, p, d) in members:
            if (p in invalid or p in by_central
                    or abs(d - d0) > 1e-8 * d0
                    or masses[p] <= 0
                    or abs(masses[p] - m0) > 1e-8 * m0):
                ok = False
        if ok:
            clusters.append((central, [p for (_, p, _) in members], d0))
            for (ci, p, d) in members:
                used[ci] = True
    rest = [constraints[c] for c in range(n_cons) if not used[c]]
    return clusters, rest


def make_shake(clusters, masses, dtype, tol=1e-6, max_iter=15):
    """Parallel SHAKE over independent H star clusters.

    The vmapped twin of the reference's applyShakeToPositions /
    applyShakeToVelocities kernels (platforms/common/src/kernels/
    integrationUtilities.cc:99,220): per cluster, iterate the ≤3 bond
    corrections sequentially (central atom delta accumulates); clusters
    are independent so everything is one (K, 3)-shaped VPU program with
    tiny gathers — no coupling matrix, no big scatter.
    """
    if not clusters:
        return None
    K = len(clusters)
    n_atoms = len(masses)
    cent = np.asarray([c[0] for c in clusters], np.int32)
    peri = np.full((K, 3), -1, np.int64)
    pvalid = np.zeros((K, 3), np.float64)
    for k, (c, ps, d) in enumerate(clusters):
        for a, p in enumerate(ps):
            peri[k, a] = p
            pvalid[k, a] = 1.0
    # invalid slots gather the central atom; their corrections are masked
    peri_g = np.where(peri >= 0, peri, cent[:, None]).astype(np.int32)
    d2 = np.asarray([c[2] * c[2] for c in clusters])
    inv_mc = np.asarray([1.0 / masses[c[0]] for c in clusters])
    inv_mp = np.asarray([1.0 / masses[c[1][0]] for c in clusters])
    avg_m = 0.5 / (inv_mc + inv_mp)

    # scatter-free writeback permutation, restricted to the involved atom
    # RANGE (typically the protein prefix of a solvated system): permuting
    # the whole array costs an n-row gather per apply, the window only
    # (hi - lo) rows (each atom sits in exactly one slot)
    lo = int(min(cent.min(), peri[peri >= 0].min()))
    hi = int(max(cent.max(), peri[peri >= 0].max())) + 1
    win = hi - lo
    sel_np = np.arange(win, dtype=np.int32)      # window-local identity
    sel_np[cent - lo] = win + np.arange(K, dtype=np.int32)
    for a in range(3):
        live = peri[:, a] >= 0
        sel_np[peri[np.nonzero(live)[0], a] - lo] = (
            win + (a + 1) * K + np.nonzero(live)[0].astype(np.int32))
    sel = jnp.asarray(sel_np)

    def write_window(x, outc, outp):
        mid = jnp.concatenate([x[lo:hi], outc, outp])[sel]
        return jnp.concatenate([x[:lo], mid, x[hi:]])

    cent_j = jnp.asarray(cent)
    peri_j = jnp.asarray(peri_g)
    pvalid_j = jnp.asarray(pvalid.astype(dtype))      # (K, 3)
    d2_j = jnp.asarray(d2.astype(dtype))
    inv_mc_j = jnp.asarray(inv_mc.astype(dtype))
    inv_mp_j = jnp.asarray(inv_mp.astype(dtype))
    avg_m_j = jnp.asarray(avg_m.astype(dtype))
    tol_j = jnp.asarray(tol, dtype)

    def apply_positions(ref_pos, new_pos):
        rc = ref_pos[cent_j]                          # (K, 3)
        rp = ref_pos[peri_j.reshape(-1)].reshape(K, 3, 3)
        rij = rc[:, None, :] - rp                     # (K, 3, 3)
        rijsq = jnp.sum(rij * rij, axis=-1)           # (K, 3)
        ld = d2_j[:, None] - rijsq
        xpi0 = new_pos[cent_j] - rc
        xpj0 = new_pos[peri_j.reshape(-1)].reshape(K, 3, 3) - rp

        def body(carry, _):
            xpi, xpj = carry
            for a in range(3):
                skip = pvalid_j[:, a] == 0
                rpij = xpi - xpj[:, a, :]
                rpsq = jnp.sum(rpij * rpij, axis=-1)
                rrpr = jnp.sum(rij[:, a, :] * rpij, axis=-1)
                resid = ld[:, a] - 2.0 * rrpr - rpsq
                near = jnp.abs(resid) < d2_j * tol_j
                denom = jnp.where(skip, 1.0, rrpr + rijsq[:, a])
                acor = jnp.where(near | skip, 0.0,
                                 resid * avg_m_j / denom)
                dr = rij[:, a, :] * acor[:, None]
                xpi = xpi + dr * inv_mc_j[:, None]
                xpj = xpj.at[:, a, :].add(-dr * inv_mp_j[:, None])
            return (xpi, xpj), None

        (xpi, xpj), _ = jax.lax.scan(body, (xpi0, xpj0), None,
                                     length=max_iter)
        outc = rc + xpi
        # a-major flatten to match sel's n + (a+1)*K + k slot layout
        outp = (rp + xpj).swapaxes(0, 1).reshape(K * 3, 3)
        return write_window(new_pos, outc, outp)

    def apply_velocities(pos, vel):
        rc = pos[cent_j]
        rp = pos[peri_j.reshape(-1)].reshape(K, 3, 3)
        rij = rc[:, None, :] - rp
        rijsq = jnp.sum(rij * rij, axis=-1)
        vi0 = vel[cent_j]
        vj0 = vel[peri_j.reshape(-1)].reshape(K, 3, 3)

        def body(carry, _):
            vi, vj = carry
            for a in range(3):
                skip = pvalid_j[:, a] == 0
                rpij = vi - vj[:, a, :]
                rrpr = jnp.sum(rpij * rij[:, a, :], axis=-1)
                denom = jnp.where(skip, 1.0, rijsq[:, a])
                delta = jnp.where(skip, 0.0, -2.0 * avg_m_j * rrpr / denom)
                dr = rij[:, a, :] * delta[:, None]
                vi = vi + dr * inv_mc_j[:, None]
                vj = vj.at[:, a, :].add(-dr * inv_mp_j[:, None])
            return (vi, vj), None

        (vi, vj), _ = jax.lax.scan(body, (vi0, vj0), None, length=max_iter)
        return write_window(vel, vi, vj.swapaxes(0, 1).reshape(K * 3, 3))

    return apply_positions, apply_velocities


# ---------------------------------------------------------------------------
# SETTLE
# ---------------------------------------------------------------------------
def _settle_one(apos0, apos1, apos2, p0, p1, p2, m0, m1, m2, d1, d2):
    """One SETTLE cluster: reference positions apos*, proposed positions p*,
    returns constrained proposed positions. Direct implementation of the
    Miyamoto & Kollman (1992) algorithm as realized in
    ReferenceSETTLEAlgorithm::apply."""
    xp0 = p0 - apos0
    xp1 = p1 - apos1
    xp2 = p2 - apos2
    b0 = apos1 - apos0
    c0 = apos2 - apos0
    inv_total = 1.0 / (m0 + m1 + m2)
    com = (xp0 * m0 + (b0 + xp1) * m1 + (c0 + xp2) * m2) * inv_total
    a1v = xp0 - com
    b1v = b0 + xp1 - com
    c1v = c0 + xp2 - com
    # orthonormal frame: Z along b0 x c0, X along a1 x Z, Y = Z x X
    zd = jnp.cross(b0, c0)
    xd = jnp.cross(a1v, zd)
    yd = jnp.cross(zd, xd)
    ex = xd / jnp.linalg.norm(xd)
    ey = yd / jnp.linalg.norm(yd)
    ez = zd / jnp.linalg.norm(zd)

    def to_frame(v):
        return jnp.stack([v @ ex, v @ ey, v @ ez])

    b0d = to_frame(b0)
    c0d = to_frame(c0)
    a1d = to_frame(a1v)
    b1d = to_frame(b1v)
    c1d = to_frame(c1v)

    rc = 0.5 * d2
    rb = jnp.sqrt(d1 * d1 - rc * rc)
    ra = rb * (m1 + m2) * inv_total
    rb = rb - ra
    sinphi = a1d[2] / ra
    cosphi = jnp.sqrt(1.0 - sinphi * sinphi)
    sinpsi = (b1d[2] - c1d[2]) / (2.0 * rc * cosphi)
    cospsi = jnp.sqrt(1.0 - sinpsi * sinpsi)

    ya2d = ra * cosphi
    xb2d = -rc * cospsi
    yb2d = -rb * cosphi - rc * sinpsi * sinphi
    yc2d = -rb * cosphi + rc * sinpsi * sinphi
    xb2d2 = xb2d * xb2d
    hh2 = 4.0 * xb2d2 + (yb2d - yc2d) ** 2 + (b1d[2] - c1d[2]) ** 2
    deltx = 2.0 * xb2d + jnp.sqrt(4.0 * xb2d2 - hh2 + d2 * d2)
    xb2d = xb2d - 0.5 * deltx

    alpha = xb2d * (b0d[0] - c0d[0]) + b0d[1] * yb2d + c0d[1] * yc2d
    beta = xb2d * (c0d[1] - b0d[1]) + b0d[0] * yb2d + c0d[0] * yc2d
    gamma = b0d[0] * b1d[1] - b1d[0] * b0d[1] + c0d[0] * c1d[1] - c1d[0] * c0d[1]
    al2be2 = alpha * alpha + beta * beta
    sintheta = (alpha * gamma
                - beta * jnp.sqrt(jnp.maximum(al2be2 - gamma * gamma, 0.0))) / al2be2
    costheta = jnp.sqrt(1.0 - sintheta * sintheta)

    a3d = jnp.stack([-ya2d * sintheta, ya2d * costheta, a1d[2]])
    b3d = jnp.stack([xb2d * costheta - yb2d * sintheta,
                     xb2d * sintheta + yb2d * costheta, b1d[2]])
    c3d = jnp.stack([-xb2d * costheta - yc2d * sintheta,
                     -xb2d * sintheta + yc2d * costheta, c1d[2]])

    frame = jnp.stack([ex, ey, ez])  # rows

    def from_frame(v):
        return v @ frame

    a3 = from_frame(a3d)
    b3 = from_frame(b3d)
    c3 = from_frame(c3d)
    new_p0 = com + a3 + apos0
    new_p1 = com + b3 - b0 + apos1
    new_p2 = com + c3 - c0 + apos2
    return new_p0, new_p1, new_p2


_settle_batch = jax.vmap(_settle_one, in_axes=(0,) * 9 + (0, 0))


def make_settle(settle_clusters, masses, dtype):
    """Returns (apply_positions, apply_velocities) for all SETTLE clusters."""
    if not settle_clusters:
        return None
    # sort by central atom so the (very common) contiguous water layout
    # becomes a static slice instead of gathers
    settle_clusters = sorted(settle_clusters, key=lambda c: c[0])
    arr = np.asarray([(c[0], c[1], c[2]) for c in settle_clusters], np.int32)
    d1 = np.asarray([c[3] for c in settle_clusters])
    d2 = np.asarray([c[4] for c in settle_clusters])
    m = np.asarray(masses)
    idx = jnp.asarray(arr)
    d1j = jnp.asarray(d1.astype(dtype))
    d2j = jnp.asarray(d2.astype(dtype))
    m0 = jnp.asarray(m[arr[:, 0]].astype(dtype))
    m1 = jnp.asarray(m[arr[:, 1]].astype(dtype))
    m2 = jnp.asarray(m[arr[:, 2]].astype(dtype))

    n_atoms = len(masses)
    n_clusters = arr.shape[0]
    # contiguous fast path: clusters laid out as consecutive (c, c+1, c+2)
    # triples over one atom range (every solvated PDB puts waters this way).
    # Row gathers run at ~0.03 us/row on this hardware, which made SETTLE
    # rival the pair kernel; slices are free.
    start = int(arr[0, 0])
    contig = (np.array_equal(arr[:, 0], start + 3 * np.arange(n_clusters))
              and np.array_equal(arr[:, 1], arr[:, 0] + 1)
              and np.array_equal(arr[:, 2], arr[:, 0] + 2))

    # scatter-free writeback for the general path: XLA scatters are very
    # slow on TPU, so the update is a concat + gather with a precomputed
    # selection permutation (each atom appears in at most one cluster)
    sel_np = np.arange(n_atoms, dtype=np.int32)
    for col in range(3):
        sel_np[arr[:, col]] = n_atoms + col * n_clusters \
            + np.arange(n_clusters, dtype=np.int32)
    sel = jnp.asarray(sel_np)

    def gather_triples(x):
        if contig:
            blk = x[start:start + 3 * n_clusters].reshape(n_clusters, 3, 3)
            return blk[:, 0], blk[:, 1], blk[:, 2]
        return x[idx[:, 0]], x[idx[:, 1]], x[idx[:, 2]]

    def write_triples(x, n0, n1, n2):
        if contig:
            out = jnp.stack([n0, n1, n2], axis=1).reshape(3 * n_clusters, 3)
            return jnp.concatenate(
                [x[:start], out, x[start + 3 * n_clusters:]])
        return jnp.concatenate([x, n0, n1, n2])[sel]

    # The solve runs in f64 (emulated on TPU, negligible: O(clusters)
    # elementwise vs the O(N r^3) pair kernel) and returns a CORRECTION
    # field rather than absolute positions.  Two reasons, both measured on
    # the NVE heating hunt (tools/nve_probe5.py, 2026-08-19):
    #   1. the f32 trig/sqrt chain carries a velocity-correlated
    #      eps-relative bias that heats rigid TIP3P at ~1e-7 kT/dof/step
    #      (dt-independent per step; neutral rigid water heats the same,
    #      exonerating electrostatics);
    #   2. rounding the OUTPUT at eps*|x| (global coords) re-injects the
    #      same box-size-dependent velocity noise the corr-only integrator
    #      recovery removed.  A correction rounds at eps*|corr| instead and
    #      is exactly zero for untouched atoms.
    # The reference solves SETTLE in double on every platform
    # (ReferenceSETTLEAlgorithm.cpp; common kernels use mixed/double math).
    f64 = jnp.float64
    m0d, m1d, m2d = m0.astype(f64), m1.astype(f64), m2.astype(f64)
    d1d, d2d = d1j.astype(f64), d2j.astype(f64)

    def position_corrections(ref_pos, new_pos):
        """f32 correction field c with  constrained = new_pos + c;
        c is identically zero off the SETTLE clusters."""
        a0, a1, a2 = gather_triples(ref_pos)
        p0, p1, p2 = gather_triples(new_pos)
        n0, n1, n2 = _settle_batch(
            a0.astype(f64), a1.astype(f64), a2.astype(f64),
            p0.astype(f64), p1.astype(f64), p2.astype(f64),
            m0d, m1d, m2d, d1d, d2d)
        c0 = (n0 - p0.astype(f64)).astype(new_pos.dtype)
        c1 = (n1 - p1.astype(f64)).astype(new_pos.dtype)
        c2 = (n2 - p2.astype(f64)).astype(new_pos.dtype)
        return write_triples(jnp.zeros_like(new_pos), c0, c1, c2)

    def apply_positions(ref_pos, new_pos):
        return new_pos + position_corrections(ref_pos, new_pos)

    def apply_velocities(pos, vel):
        """Exact velocity constraints per cluster: solve the 3x3 system
        (J M^-1 J^T) lambda = -J v over bond directions (the linear system
        ReferenceSETTLEAlgorithm::applyToVelocities solves)."""
        a0, a1, a2 = gather_triples(pos)
        v0, v1, v2 = gather_triples(vel)
        # bond unit vectors: (0-1), (0-2), (1-2)
        eab = a1 - a0
        eac = a2 - a0
        ebc = a2 - a1
        eab = eab / jnp.linalg.norm(eab, axis=-1, keepdims=True)
        eac = eac / jnp.linalg.norm(eac, axis=-1, keepdims=True)
        ebc = ebc / jnp.linalg.norm(ebc, axis=-1, keepdims=True)
        w0 = 1.0 / m0
        w1 = 1.0 / m1
        w2 = 1.0 / m2
        # J v (relative velocities along bonds)
        g = jnp.stack([
            jnp.sum(eab * (v1 - v0), -1),
            jnp.sum(eac * (v2 - v0), -1),
            jnp.sum(ebc * (v2 - v1), -1)], -1)  # (C,3)
        dotabac = jnp.sum(eab * eac, -1)
        dotabbc = jnp.sum(eab * ebc, -1)
        dotacbc = jnp.sum(eac * ebc, -1)
        A = jnp.stack([
            jnp.stack([w0 + w1, w0 * dotabac, -w1 * dotabbc], -1),
            jnp.stack([w0 * dotabac, w0 + w2, w2 * dotacbc], -1),
            jnp.stack([-w1 * dotabbc, w2 * dotacbc, w1 + w2], -1)], -2)  # (C,3,3)
        lam = _solve3(A, -g)
        dv0 = (-lam[:, 0:1] * eab - lam[:, 1:2] * eac) * w0[:, None]
        dv1 = (lam[:, 0:1] * eab - lam[:, 2:3] * ebc) * w1[:, None]
        dv2 = (lam[:, 1:2] * eac + lam[:, 2:3] * ebc) * w2[:, None]
        return write_triples(vel, v0 + dv0, v1 + dv1, v2 + dv2)

    return apply_positions, apply_velocities, position_corrections


def _solve3(A, b):
    """Batched closed-form 3x3 solve via adjugate (no LU, TPU-friendly)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a10, a11, a12 = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    a20, a21, a22 = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a21
    c01 = a12 * a20 - a10 * a22
    c02 = a10 * a21 - a11 * a20
    det = a00 * c00 + a01 * c01 + a02 * c02
    c10 = a02 * a21 - a01 * a22
    c11 = a00 * a22 - a02 * a20
    c12 = a01 * a20 - a00 * a21
    c20 = a01 * a12 - a02 * a11
    c21 = a02 * a10 - a00 * a12
    c22 = a00 * a11 - a01 * a10
    inv_det = 1.0 / det
    x0 = (c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2]) * inv_det
    x1 = (c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2]) * inv_det
    x2 = (c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], -1)


# ---------------------------------------------------------------------------
# CCMA
# ---------------------------------------------------------------------------
def _ccma_coupling_matrix(cons, masses, angles):
    """Constraint-coupling matrix K (ReferenceCCMAAlgorithm ctor): K[c][c'] for
    constraints sharing an atom, using equilibrium cosines from constrained
    triangles or harmonic-angle equilibria."""
    n = len(cons)
    K = np.eye(n)
    inv_m = np.array([0.0 if m == 0 else 1.0 / m for m in masses])
    dist = {}
    for (i, j, d) in cons:
        dist[(min(i, j), max(i, j))] = d
    angle_map = {}
    for (i, j, k, theta0) in angles:  # j is the central atom
        angle_map[(min(i, k), j, max(i, k))] = theta0
    by_atom = {}
    for ci, (i, j, d) in enumerate(cons):
        by_atom.setdefault(i, []).append(ci)
        by_atom.setdefault(j, []).append(ci)
    for shared, clist in by_atom.items():
        for a_pos in range(len(clist)):
            for b_pos in range(len(clist)):
                if a_pos == b_pos:
                    continue
                ca, cb = clist[a_pos], clist[b_pos]
                ia, ja, da = cons[ca]
                ib, jb, db = cons[cb]
                oa = ja if ia == shared else ia     # other atom of ca
                ob = jb if ib == shared else ib     # other atom of cb
                # cos of angle oa-shared-ob
                key = (min(oa, ob), max(oa, ob))
                if key in dist:
                    d3 = dist[key]
                    cos_t = (da * da + db * db - d3 * d3) / (2 * da * db)
                elif (min(oa, ob), shared, max(oa, ob)) in angle_map:
                    cos_t = math.cos(angle_map[(min(oa, ob), shared, max(oa, ob))])
                else:
                    continue
                scale = inv_m[shared] / (inv_m[ia] + inv_m[ja])
                # The normalized Jacobian entry is w_shared*cos(theta)/(wi+wj)
                # with NO role-dependent sign: the +-1 from same/opposite role
                # in (i,j) ordering exactly cancels the +-1 from expressing
                # the geometric angle in constraint direction vectors.
                K[ca, cb] = scale * cos_t
    return K


def make_ccma(cons, masses, angles, dtype, tol=1e-8, max_iter=40,
              sparsify_cutoff=0.02):
    """Returns (apply_positions, apply_velocities) for general constraints.

    Scatter-free: per-atom gather tables map constraint corrections back to
    atoms (XLA scatters are very slow on TPU); the sparse inverse coupling
    matrix is applied as fixed-width gathered rows."""
    if not cons:
        return None
    n = len(cons)
    idx_g = np.asarray([(c[0], c[1]) for c in cons], np.int32)
    d0 = np.asarray([c[2] for c in cons])
    inv_m_all = np.array([0.0 if m == 0 else 1.0 / m for m in masses])
    red_m = 1.0 / (2.0 * (inv_m_all[idx_g[:, 0]] + inv_m_all[idx_g[:, 1]]))

    # the whole iteration runs on the COMPACT set of atoms that appear in
    # any constraint (protein H's, not the entire solvated system): one
    # gather in, the loop works on (n_inv, 3), one row-scatter out
    involved = np.unique(idx_g.reshape(-1))
    n_inv = len(involved)
    local_of = {int(a): i for i, a in enumerate(involved)}
    idx = np.asarray([[local_of[int(i)], local_of[int(j)]]
                      for (i, j) in idx_g], np.int32)
    inv_m = inv_m_all[involved]

    K = _ccma_coupling_matrix(cons, masses, angles)
    K_inv = np.linalg.inv(K)
    K_inv[np.abs(K_inv) < sparsify_cutoff] = 0.0
    # fixed-width sparse rows
    width = max(1, int((np.abs(K_inv) > 0).sum(axis=1).max()))
    cols = np.zeros((n, width), np.int32)
    vals = np.zeros((n, width))
    for r in range(n):
        nz = np.nonzero(K_inv[r])[0]
        cols[r, :len(nz)] = nz
        vals[r, :len(nz)] = K_inv[r, nz]

    # per-atom gather tables: constraints touching each atom, with the sign
    # of the correction (-1 when the atom is the i side, +1 for the j side)
    per_atom = [[] for _ in range(n_inv)]
    for c, (i, j) in enumerate(idx):
        per_atom[i].append((c, -1.0))
        per_atom[j].append((c, 1.0))
    kmax = max(1, max(len(x) for x in per_atom))
    atom_cons = np.zeros((n_inv, kmax), np.int32)
    atom_sign = np.zeros((n_inv, kmax))
    for a, lst in enumerate(per_atom):
        for k, (c, s) in enumerate(lst):
            atom_cons[a, k] = c
            atom_sign[a, k] = s

    involved_j = jnp.asarray(involved.astype(np.int32))
    idx_j = jnp.asarray(idx)
    d0_j = jnp.asarray(d0.astype(dtype))
    red_m_j = jnp.asarray(red_m.astype(dtype))
    inv_m_j = jnp.asarray(inv_m.astype(dtype))
    cols_j = jnp.asarray(cols)
    vals_j = jnp.asarray(vals.astype(dtype))
    atom_cons_j = jnp.asarray(atom_cons)
    atom_sign_j = jnp.asarray(atom_sign.astype(dtype))

    def sparse_apply(delta):
        return jnp.sum(vals_j * delta[cols_j], axis=1)

    def distribute(dr):
        """(C,3) constraint corrections -> (n_inv,3) atom deltas (gathers)."""
        contrib = dr[atom_cons_j]                      # (n_inv, K, 3)
        return inv_m_j[:, None] * jnp.sum(
            atom_sign_j[:, :, None] * contrib, axis=1)

    def apply_positions(ref_pos, new_pos):
        """Iterate: lambda = Kinv @ violation, apply along REFERENCE directions
        (the CCMA/SHAKE linearization)."""
        ref_loc = ref_pos[involved_j]
        r_ref = ref_loc[idx_j[:, 0]] - ref_loc[idx_j[:, 1]]   # (C,3)

        def body(carry, _):
            pos = carry
            rp = pos[idx_j[:, 0]] - pos[idx_j[:, 1]]
            rp2 = jnp.sum(rp * rp, axis=-1)
            diff = rp2 - d0_j * d0_j
            rrpr = jnp.sum(r_ref * rp, axis=-1)
            g = diff * red_m_j / rrpr
            lam = sparse_apply(g)
            pos = pos + distribute(r_ref * lam[:, None])
            return pos, None

        out, _ = jax.lax.scan(body, new_pos[involved_j], None,
                              length=max_iter)
        return new_pos.at[involved_j].set(out)

    def apply_velocities(pos, vel):
        pos_loc = pos[involved_j]
        r = pos_loc[idx_j[:, 0]] - pos_loc[idx_j[:, 1]]

        def body(carry, _):
            v = carry
            rv = jnp.sum(r * (v[idx_j[:, 0]] - v[idx_j[:, 1]]), axis=-1)
            r2 = jnp.sum(r * r, axis=-1)
            g = rv * red_m_j * 2.0 / r2
            lam = sparse_apply(g)
            v = v + distribute(r * lam[:, None])
            return v, None

        out, _ = jax.lax.scan(body, vel[involved_j], None, length=max_iter)
        return vel.at[involved_j].set(out)

    return apply_positions, apply_velocities
