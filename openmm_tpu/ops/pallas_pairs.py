"""Pallas TPU kernel for direct-space nonbonded energy + analytic forces.

The hand-scheduled twin of pairs.pair_energy_force_rows (itself the TPU
recast of the reference's warp tile kernel, platforms/cuda/src/kernels/
nonbonded.cu:44-106): a (row-block, candidate-pair) grid where each program
evaluates one 64x128 pair tile fully in VMEM — coordinates, Lorentz-
Berthelot mixing, erfc/RF electrostatics, masks, and the per-row force
reduction — with no (B, B, 3) intermediates and the row accumulator held in
VMEM across the candidate sweep.

Data layout: per-block feature planes (nb+1, 8, 64) f32 with rows
[x, y, z, q, sigma, epsilon, gid, 0]; the final block is a far-away dummy
that invalid candidate slots point to (its pairs land outside the cutoff,
so validity needs no mask). Exclusions are (nb, E, 64) gid planes compared
against candidate gids. Scalars (box, alpha, cutoff^2, n_real, krf, crf,
mode) ride in a scalar-prefetch array.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MODE_EWALD = 0      # erfc(alpha r)/r electrostatics (Ewald / PME direct)
MODE_RF = 1         # reaction field: 1/r + krf r^2 - crf
MODE_PLAIN = 2      # plain 1/r with cutoff

_TWO_OVER_SQRT_PI = 1.1283791670955126


def _erfc_poly(x, exp_x2):
    """Hastings erfc (shared with forces/nonbonded._erfc_f32)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (0.254829592 + (-0.284496736 + (1.421413741 + (-1.453152027
            + 1.061405429 * t) * t) * t) * t) * t
    return poly * exp_x2


def direct_ef_pallas(pos, box, charge, sigma, epsilon, exclusions, n_real,
                     cutoff, max_cols, mode, alpha=0.0, krf=0.0, crf=0.0,
                     block=64, sort_cell=None, interpret=False):
    """Direct-space (energy, forces, overflow) via the Pallas tile kernel.

    pos: (n_pad, 3) padded positions; charge/sigma/epsilon: (n_pad,);
    exclusions: (n_pad, E) int32 global-id table (-1 padded).
    Sorting/culling mirror pairs.pair_energy_force_rows.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from . import geometry as geom
    from .pairs import spatial_sort_keys

    n_pad = pos.shape[0]
    assert n_pad % block == 0 and block == 64
    nb = n_pad // block
    f32 = jnp.float32

    pos = geom.wrap_into_box(pos, box)
    keys = spatial_sort_keys(pos, box, n_real, sort_cell)
    order = jnp.argsort(keys)
    inv_order = jnp.argsort(order)
    pos_s = pos[order]
    if n_real < n_pad:
        pos_s = pos_s.at[n_real:].set(pos_s[n_real - 1])

    blocks = pos_s.reshape(nb, block, 3)
    bmin = jnp.min(blocks, axis=1)
    bmax = jnp.max(blocks, axis=1)
    centers = 0.5 * (bmin + bmax)
    half = 0.5 * (bmax - bmin)
    d = geom.periodic_delta(centers[:, None, :] - centers[None, :, :], box)
    gap = jnp.maximum(jnp.abs(d) - (half[:, None, :] + half[None, :, :]), 0.0)
    close = jnp.sum(gap * gap, axis=-1) < cutoff * cutoff
    col_order = jnp.argsort(~close, axis=1, stable=True)
    cols_per_tile = 16
    max_cols = ((max_cols + cols_per_tile - 1)
                // cols_per_tile) * cols_per_tile
    cand = col_order[:, :max_cols].astype(jnp.int32)
    cand_valid = jnp.take_along_axis(close, cand, axis=1)
    overflow = jnp.sum(close.astype(jnp.int32)) \
        - jnp.sum(cand_valid.astype(jnp.int32))
    # invalid slots -> the dummy far block nb; the kernel skips the tail of
    # the (sorted-valid-first) candidate sweep using the per-row count in
    # the extra trailing column
    nvalid = jnp.sum(cand_valid.astype(jnp.int32), axis=1,
                     dtype=jnp.int32)
    cand = jnp.where(cand_valid, cand, nb)
    cand = jnp.concatenate([cand, nvalid[:, None]],
                           axis=1).astype(jnp.int32)

    gid = order.astype(f32)
    feat = jnp.zeros((nb + 1, 8, block), f32)
    feat = feat.at[:nb, 0].set(pos_s[:, 0].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 1].set(pos_s[:, 1].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 2].set(pos_s[:, 2].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 3].set(charge[order].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 4].set(sigma[order].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 5].set(epsilon[order].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 6].set(gid.reshape(nb, block))
    feat = feat.at[nb, 0:3].set(1.0e7)   # dummy block far outside any box
    feat = feat.at[nb, 6].set(-2.0)

    n_excl = int(exclusions.shape[1]) if exclusions is not None else 0
    if n_excl:
        excl_s = exclusions[order].astype(f32)   # (n_pad, E), -1 padded
        excl_planes = jnp.transpose(
            excl_s.reshape(nb, block, n_excl), (0, 2, 1))   # (nb, E, 64)
    else:
        excl_planes = jnp.zeros((nb, 1, block), f32) - 1.0
        n_excl = 1

    consts = jnp.array([[box[0, 0], box[1, 1], box[2, 2], box[2, 0],
                         box[2, 1], box[1, 0], alpha, cutoff * cutoff,
                         float(n_real), krf, crf, float(mode)]], f32)

    kernel = functools.partial(_kernel_body, n_excl=n_excl,
                               n_cand=max_cols, mode=int(mode),
                               cols_per_tile=cols_per_tile)
    grid = (nb, max_cols // cols_per_tile)

    def col_spec(k):
        # literal indices must stay i32 for the Mosaic transforms: derive
        # zeros from the (i32) grid coordinates
        return pl.BlockSpec(
            (1, 8, block),
            lambda r, c, cand, k=k: (cand[r, cols_per_tile * c + k],
                                     r * 0, r * 0))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 12), lambda r, c, cand: (r * 0, r * 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, block),
                             lambda r, c, cand: (r, r * 0, r * 0)),
            ] + [col_spec(k) for k in range(cols_per_tile)] + [
                pl.BlockSpec((1, n_excl, block),
                             lambda r, c, cand: (r, r * 0, r * 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, block),
                                   lambda r, c, cand: (r, r * 0, r * 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 8, block), f32),
        interpret=interpret,
    )(cand, consts, *([feat] * (cols_per_tile + 1)), excl_planes)

    fx = out[:, 0, :].reshape(n_pad)
    fy = out[:, 1, :].reshape(n_pad)
    fz = out[:, 2, :].reshape(n_pad)
    energy = 0.5 * jnp.sum(out[:, 3, :], dtype=f32)
    forces = jnp.stack([fx, fy, fz], axis=-1).astype(pos.dtype)[inv_order]
    return energy, forces, overflow


def _kernel_body(cand_ref, consts_ref, row_ref, *rest, n_excl, n_cand,
                 mode, cols_per_tile):
    import jax.experimental.pallas as pl

    col_refs = rest[:cols_per_tile]
    excl_ref, out_ref = rest[cols_per_tile:]
    ci = pl.program_id(1)
    ri = pl.program_id(0)
    n_valid = cand_ref[ri, n_cand]

    @pl.when(ci == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    cstart = ci
    for _ in range(cols_per_tile.bit_length() - 1):
        cstart = cstart + cstart

    @pl.when(cstart < n_valid)
    def _():
        _tile_compute(consts_ref, row_ref, col_refs, excl_ref, out_ref,
                      n_excl, mode)


def _tile_compute(consts_ref, row_ref, col_refs, excl_ref, out_ref,
                  n_excl, mode):
    import jax.experimental.pallas as pl  # noqa: F401
    box_ax = consts_ref[0, 0]
    box_by = consts_ref[0, 1]
    box_cz = consts_ref[0, 2]
    box_cx = consts_ref[0, 3]
    box_cy = consts_ref[0, 4]
    box_bx = consts_ref[0, 5]
    alpha = consts_ref[0, 6]
    rc2 = consts_ref[0, 7]
    n_real = consts_ref[0, 8]
    krf = consts_ref[0, 9]
    crf = consts_ref[0, 10]

    row = row_ref[0]                                     # (8, 64)
    cols = jnp.concatenate([ref[0] for ref in col_refs], axis=1)

    def rvec(k):
        return row[k:k + 1, :].reshape(64, 1)

    def cvec(k):
        return cols[k:k + 1, :]

    dx = rvec(0) - cvec(0)
    dy = rvec(1) - cvec(1)
    dz = rvec(2) - cvec(2)
    sc = jnp.round(dz / box_cz)
    dx = dx - sc * box_cx
    dy = dy - sc * box_cy
    dz = dz - sc * box_cz
    sb = jnp.round(dy / box_by)
    dx = dx - sb * box_bx
    dy = dy - sb * box_by
    sa = jnp.round(dx / box_ax)
    dx = dx - sa * box_ax
    r2 = dx * dx + dy * dy + dz * dz

    gi = rvec(6)
    gj = cvec(6)
    mask = (gi != gj) & (gi < n_real) & (gj >= 0.0) \
        & (gj < n_real) & (r2 < rc2)
    for e in range(n_excl):
        mask = mask & (excl_ref[0, e:e + 1, :].reshape(64, 1) != gj)
    r2s = jnp.where(mask, r2, 1.0)

    inv_r = jax.lax.rsqrt(r2s)
    inv_r2 = inv_r * inv_r
    r = r2s * inv_r

    sig = 0.5 * (rvec(4) + cvec(4))
    eps4 = 4.0 * jnp.sqrt(rvec(5) * cvec(5))
    s2 = sig * sig * inv_r2
    s6 = s2 * s2 * s2
    e_lj = eps4 * s6 * (s6 - 1.0)
    de_lj = -3.0 * eps4 * s6 * (2.0 * s6 - 1.0) * inv_r2

    qq = 138.93545764446428 * rvec(3) * cvec(3)
    if mode == MODE_EWALD:
        ar = alpha * r
        exp_a2r2 = jnp.exp(-ar * ar)
        erfc_ar = _erfc_poly(ar, exp_a2r2)
        e_c = qq * inv_r * erfc_ar
        de_c = (-qq * (erfc_ar * inv_r2
                       + _TWO_OVER_SQRT_PI * alpha * exp_a2r2 * inv_r)
                ) * (0.5 * inv_r)
    elif mode == MODE_RF:
        e_c = qq * (inv_r + krf * r2s - crf)
        de_c = qq * (-0.5 * inv_r2 * inv_r + krf)
    else:
        e_c = qq * inv_r
        de_c = -0.5 * qq * inv_r2 * inv_r

    scale = mask.astype(jnp.float32)
    e_pair = (e_lj + e_c) * scale
    dedr2 = (de_lj + de_c) * scale

    fx = -2.0 * jnp.sum(dedr2 * dx, axis=1).reshape(1, 64)
    fy = -2.0 * jnp.sum(dedr2 * dy, axis=1).reshape(1, 64)
    fz = -2.0 * jnp.sum(dedr2 * dz, axis=1).reshape(1, 64)
    erow = jnp.sum(e_pair, axis=1).reshape(1, 64)
    upd = jnp.concatenate(
        [fx, fy, fz, erow, jnp.zeros((4, 64), jnp.float32)], axis=0)
    out_ref[0] = out_ref[0] + upd
