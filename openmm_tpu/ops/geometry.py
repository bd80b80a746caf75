"""Differentiable molecular geometry primitives (distances, angles, dihedrals)
and periodic minimum-image displacement for reduced triclinic boxes.

Math matches the reference's bonded-force formulations
(/root/reference/docs-source/usersguide/theory/02_standard_forces.rst and
platforms/reference/src/SimTKReference/ReferenceBondIxn.cpp): all functions are
pure jnp and differentiable, so forces come from jax.grad.
"""
from __future__ import annotations

import jax.numpy as jnp


def periodic_delta(dr, box):
    """Minimum-image displacement for a reduced-form triclinic box.

    `dr`: (..., 3) raw displacements; `box`: (3, 3) rows a, b, c in reduced form
    (a ∥ x, b in xy, diagonal positive). The staged reduction c → b → a is the
    same scheme the reference kernels use (e.g. pbc math in
    platforms/common/src/kernels/ and ReferencePME.cpp).
    """
    c = box[2]
    dr = dr - c * jnp.round(dr[..., 2:3] / c[2])
    b = box[1]
    dr = dr - b * jnp.round(dr[..., 1:2] / b[1])
    a = box[0]
    dr = dr - a * jnp.round(dr[..., 0:1] / a[0])
    return dr


def delta(pos_i, pos_j, box=None):
    """pos_i - pos_j, optionally wrapped to the minimum image."""
    dr = pos_i - pos_j
    if box is not None:
        dr = periodic_delta(dr, box)
    return dr


def distance(dr, eps=1e-24):
    """Norm with a tiny clamp so jax.grad at exactly-coincident points yields
    zero force instead of NaN (0/0 in d|r|/dr); the correct limit for r0=0
    harmonic anchors."""
    return jnp.sqrt(jnp.maximum(jnp.sum(dr * dr, axis=-1), eps))


def angle_between(v1, v2):
    """Angle between two vectors via atan2(|v1×v2|, v1·v2) — numerically stable
    and differentiable away from 0/pi."""
    cross = jnp.cross(v1, v2)
    cross_norm = jnp.sqrt(jnp.sum(cross * cross, axis=-1))
    dot = jnp.sum(v1 * v2, axis=-1)
    return jnp.arctan2(cross_norm, dot)


def dihedral_angle(r1, r2, r3, r4, box=None):
    """Signed dihedral angle for atoms 1-2-3-4, matching the reference's sign
    convention (ReferenceBondIxn::getDihedralAngleBetweenThreeVectors)."""
    b1 = delta(r2, r1, box)
    b2 = delta(r3, r2, box)
    b3 = delta(r4, r3, box)
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    b2n = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    # phi = atan2((n1 x n2)·b2_hat, n1·n2); since (n1 x n2) = b2 (b1·n2), the
    # sign equals sign(b1·n2) = sign(dot(v0, cp1)) in the reference kernel.
    x = jnp.sum(n1 * n2, axis=-1)
    y = jnp.sum(jnp.cross(n1, n2) * b2n, axis=-1)
    return jnp.arctan2(y, x)


def bond_vectors(positions, idx, box=None):
    """Gather displacement vectors for an (M, 2) index array."""
    ri = positions[idx[:, 0]]
    rj = positions[idx[:, 1]]
    return delta(ri, rj, box)


def box_volume(box):
    """Volume of a reduced-form box (rows a,b,c lower-triangular): product of
    the diagonal."""
    return box[0, 0] * box[1, 1] * box[2, 2]


def box_inverse(box):
    """Closed-form inverse of the reduced-form (lower-triangular) box matrix.
    Avoids LU decomposition (unsupported for f64 on TPU and needless for 3x3).
    Rows of box are a, b, c with a=(ax,0,0), b=(bx,by,0), c=(cx,cy,cz)."""
    ax = box[0, 0]
    bx, by = box[1, 0], box[1, 1]
    cx, cy, cz = box[2, 0], box[2, 1], box[2, 2]
    inv_ax = 1.0 / ax
    inv_by = 1.0 / by
    inv_cz = 1.0 / cz
    # inverse of lower-triangular [[ax,0,0],[bx,by,0],[cx,cy,cz]]
    m10 = -bx * inv_ax * inv_by
    m20 = (bx * cy - by * cx) * inv_ax * inv_by * inv_cz
    m21 = -cy * inv_by * inv_cz
    zero = jnp.zeros_like(ax)
    return jnp.stack([
        jnp.stack([inv_ax, zero, zero]),
        jnp.stack([m10, inv_by, zero]),
        jnp.stack([m20, m21, inv_cz]),
    ])


def to_fractional(pos, box_inv):
    """pos @ box_inv computed elementwise on the VPU.

    On TPU a (N,3)x(3,3) f32 matmul is routed to the MXU, whose default
    precision truncates inputs to bf16; the resulting fractional-coordinate
    error (~1e-3) is enough to flip floor() at box boundaries and teleport
    atoms by a full box length in wrapped coordinates. Elementwise math
    keeps full f32."""
    bi = box_inv.astype(pos.dtype)
    x, y, z = pos[..., 0], pos[..., 1], pos[..., 2]
    fx = x * bi[0, 0] + y * bi[1, 0] + z * bi[2, 0]
    fy = x * bi[0, 1] + y * bi[1, 1] + z * bi[2, 1]
    fz = x * bi[0, 2] + y * bi[1, 2] + z * bi[2, 2]
    return jnp.stack([fx, fy, fz], axis=-1)


def from_fractional(frac, box):
    """frac @ box, elementwise (see to_fractional)."""
    b = box.astype(frac.dtype)
    x, y, z = frac[..., 0], frac[..., 1], frac[..., 2]
    rx = x * b[0, 0] + y * b[1, 0] + z * b[2, 0]
    ry = x * b[0, 1] + y * b[1, 1] + z * b[2, 1]
    rz = x * b[0, 2] + y * b[1, 2] + z * b[2, 2]
    return jnp.stack([rx, ry, rz], axis=-1)


def wrap_into_box(pos, box):
    """Minimum positive image of every position (full f32 on the VPU)."""
    frac = to_fractional(pos, box_inverse(box))
    return pos - from_fractional(jnp.floor(frac), box)
