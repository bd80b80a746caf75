"""Pallas TPU kernel for direct-space nonbonded energy + analytic forces.

The hand-scheduled twin of pairs.rows_ef_from_state (itself the TPU
recast of the reference's warp tile kernel, platforms/cuda/src/kernels/
nonbonded.cu:44-106): a (row-block, candidate-pair) grid where each program
evaluates one 64x128 pair tile fully in VMEM — coordinates, Lorentz-
Berthelot mixing, erfc/RF electrostatics, masks, and the per-row force
reduction — with no (B, B, 3) intermediates and the row accumulator held in
VMEM across the candidate sweep.

The candidate state (spatial sort + block bbox culling at reach = cutoff +
skin, findInteractingBlocks.cu:7-79) is built ONCE by `build_tile_state`
and persists across steps in the Context aux state; `eval_tiles` re-fills
only the coordinate planes each step. This splits the reference's
rebuild-on-motion design into the same two halves.

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
COLS_PER_TILE = 16


def _erfc_poly(x, exp_x2):
    """Hastings erfc (shared with forces/nonbonded._erfc_f32)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = (0.254829592 + (-0.284496736 + (1.421413741 + (-1.453152027
            + 1.061405429 * t) * t) * t) * t) * t
    return poly * exp_x2


def _erfc_poly_fast(x, exp_x2):
    """Hastings erfc with the divide replaced by an approximate VPU
    reciprocal plus one Newton step (rel. error ~1e-6, well under the
    1.5e-7-absolute polynomial error budget scale of 1e-4 force tolerance;
    divides cost ~10x a multiply on the VPU)."""
    import jax.experimental.pallas as pl
    d = 1.0 + 0.3275911 * x
    t0 = pl.reciprocal(d, approx=True)
    t = t0 * (2.0 - d * t0)
    poly = (0.254829592 + (-0.284496736 + (1.421413741 + (-1.453152027
            + 1.061405429 * t) * t) * t) * t) * t
    return poly * exp_x2


def build_tile_state(pos, box, charge, sigma, epsilon, exclusions, n_real,
                     reach, max_cols, block=64, sort_cell=None):
    """Persistent candidate state for the tile kernel.

    pos: (n_pad, 3); charge/sigma/epsilon: (n_pad,) padded parameters;
    exclusions: (n_pad, E) int32 original-id table or None; reach = cutoff
    + skin. Returns a dict of device arrays (all static shapes).
    """
    from . import geometry as geom
    from .pairs import build_row_state

    n_pad = pos.shape[0]
    assert n_pad % block == 0 and block in (32, 64)
    nb = n_pad // block
    f32 = jnp.float32

    max_cols = ((max_cols + COLS_PER_TILE - 1)
                // COLS_PER_TILE) * COLS_PER_TILE
    st = build_row_state(pos, box, n_real, reach, max_cols, block=block,
                         periodic=True, sort_cell=sort_cell)
    order = st["order"]
    cand = st["cand"]
    cand_valid = st["cand_valid"]
    if cand.shape[1] < max_cols:
        # fewer blocks than the tile-rounded budget: pad with invalid slots
        pad = max_cols - cand.shape[1]
        cand = jnp.concatenate(
            [cand, jnp.zeros((nb, pad), cand.dtype)], axis=1)
        cand_valid = jnp.concatenate(
            [cand_valid, jnp.zeros((nb, pad), cand_valid.dtype)], axis=1)
    # invalid slots -> the dummy far block nb; the kernel skips the tail of
    # the (sorted-valid-first) candidate sweep using the per-row count in
    # the extra trailing column
    nvalid = jnp.sum(cand_valid.astype(jnp.int32), axis=1, dtype=jnp.int32)
    cand = jnp.where(cand_valid, cand, nb)
    cand = jnp.concatenate([cand, nvalid[:, None]], axis=1).astype(jnp.int32)

    gid = order.astype(f32)
    feat = jnp.zeros((nb + 1, 8, block), f32)
    feat = feat.at[:nb, 3].set(charge[order].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 4].set(sigma[order].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 5].set(epsilon[order].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 6].set(gid.reshape(nb, block))
    feat = feat.at[nb, 0:3].set(1.0e7)   # dummy block far outside any box
    feat = feat.at[nb, 6].set(-2.0)

    if exclusions is not None and int(exclusions.shape[1]) > 0:
        n_excl = int(exclusions.shape[1])
        excl_s = exclusions[order].astype(f32)   # (n_pad, E), -1 padded
        excl_planes = jnp.transpose(
            excl_s.reshape(nb, block, n_excl), (0, 2, 1))   # (nb, E, 64)
    else:
        excl_planes = jnp.zeros((nb, 1, block), f32) - 1.0

    return {"order": order, "inv_order": st["inv_order"], "cand": cand,
            "feat": feat, "excl": excl_planes, "overflow": st["overflow"]}


def eval_tiles(pos, box, st, n_real, cutoff, mode, alpha=0.0, krf=0.0,
               crf=0.0, block=64, interpret=False):
    """Direct-space (energy, forces) from the persistent tile state.

    Per step: wrap positions, permute into the persisted spatial order,
    refresh the coordinate planes, sweep the candidate tiles.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from . import geometry as geom

    feat = st["feat"]
    cand = st["cand"]
    excl_planes = st["excl"]
    order = st["order"]
    inv_order = st["inv_order"]
    nb = feat.shape[0] - 1
    n_pad = nb * block
    n_excl = excl_planes.shape[1]
    max_cols = cand.shape[1] - 1
    f32 = jnp.float32

    pos = geom.wrap_into_box(pos, box)
    pos_s = pos[order]
    if n_real < n_pad:
        pos_s = pos_s.at[n_real:].set(pos_s[n_real - 1])
    feat = feat.at[:nb, 0].set(pos_s[:, 0].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 1].set(pos_s[:, 1].astype(f32).reshape(nb, block))
    feat = feat.at[:nb, 2].set(pos_s[:, 2].astype(f32).reshape(nb, block))

    consts = jnp.array([[box[0, 0], box[1, 1], box[2, 2], box[2, 0],
                         box[2, 1], box[1, 0], alpha, cutoff * cutoff,
                         float(n_real), krf, crf, float(mode),
                         1.0 / box[0, 0], 1.0 / box[1, 1],
                         1.0 / box[2, 2], 0.0]], f32)

    kernel = functools.partial(_kernel_body, n_excl=n_excl,
                               n_cand=max_cols, mode=int(mode),
                               cols_per_tile=COLS_PER_TILE, b=block)
    grid = (nb, max_cols // COLS_PER_TILE)

    def col_spec(k):
        # literal indices must stay i32 for the Mosaic transforms: derive
        # zeros from the (i32) grid coordinates
        return pl.BlockSpec(
            (1, 8, block),
            lambda r, c, cand, k=k: (cand[r, COLS_PER_TILE * c + k],
                                     r * 0, r * 0))

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 16), lambda r, c, cand: (r * 0, r * 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 8, block),
                             lambda r, c, cand: (r, r * 0, r * 0)),
            ] + [col_spec(k) for k in range(COLS_PER_TILE)] + [
                pl.BlockSpec((1, n_excl, block),
                             lambda r, c, cand: (r, r * 0, r * 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, block),
                                   lambda r, c, cand: (r, r * 0, r * 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 8, block), f32),
        interpret=interpret,
    )(cand, consts, *([feat] * (COLS_PER_TILE + 1)), excl_planes)

    fx = out[:, 0, :].reshape(n_pad)
    fy = out[:, 1, :].reshape(n_pad)
    fz = out[:, 2, :].reshape(n_pad)
    energy = 0.5 * jnp.sum(out[:, 3, :], dtype=f32)
    forces = jnp.stack([fx, fy, fz], axis=-1).astype(pos.dtype)[inv_order]
    return energy, forces


def direct_ef_pallas(pos, box, charge, sigma, epsilon, exclusions, n_real,
                     cutoff, max_cols, mode, alpha=0.0, krf=0.0, crf=0.0,
                     block=64, sort_cell=None, interpret=False):
    """One-shot build + sweep (energy, forces, overflow)."""
    st = build_tile_state(pos, box, charge, sigma, epsilon, exclusions,
                          n_real, cutoff, max_cols, block=block,
                          sort_cell=sort_cell)
    e, f = eval_tiles(pos, box, st, n_real, cutoff, mode, alpha=alpha,
                      krf=krf, crf=crf, block=block, interpret=interpret)
    return e, f, st["overflow"]


def _kernel_body(cand_ref, consts_ref, row_ref, *rest, n_excl, n_cand,
                 mode, cols_per_tile, b):
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
                      n_excl, mode, b)


def _tile_compute(consts_ref, row_ref, col_refs, excl_ref, out_ref,
                  n_excl, mode, b):
    import jax.experimental.pallas as pl  # noqa: F401
    box_ax = consts_ref[0, 0]
    box_by = consts_ref[0, 1]
    box_cz = consts_ref[0, 2]
    box_cx = consts_ref[0, 3]
    box_cy = consts_ref[0, 4]
    box_bx = consts_ref[0, 5]
    alpha = consts_ref[0, 6]
    rc2 = consts_ref[0, 7]
    krf = consts_ref[0, 9]
    crf = consts_ref[0, 10]
    inv_ax = consts_ref[0, 12]
    inv_by = consts_ref[0, 13]
    inv_cz = consts_ref[0, 14]

    row = row_ref[0]                                     # (8, B)
    cols = jnp.concatenate([ref[0] for ref in col_refs], axis=1)

    def rvec(k):
        return row[k:k + 1, :].reshape(b, 1)

    def cvec(k):
        return cols[k:k + 1, :]

    dx = rvec(0) - cvec(0)
    dy = rvec(1) - cvec(1)
    dz = rvec(2) - cvec(2)
    sc = jnp.round(dz * inv_cz)
    dx = dx - sc * box_cx
    dy = dy - sc * box_cy
    dz = dz - sc * box_cz
    sb = jnp.round(dy * inv_by)
    dx = dx - sb * box_bx
    dy = dy - sb * box_by
    sa = jnp.round(dx * inv_ax)
    dx = dx - sa * box_ax
    r2 = dx * dx + dy * dy + dz * dz

    # padded atoms carry q=0/eps=0 (zero contribution) and the dummy block
    # carries q=0 too, so only self-pairs and the cutoff need masking; the
    # r2 floor keeps s6^2 finite for coincident zero-parameter pairs
    gi = rvec(6)
    gj = cvec(6)
    mask = (gi != gj) & (r2 < rc2)
    for e in range(n_excl):
        mask = mask & (excl_ref[0, e:e + 1, :].reshape(b, 1) != gj)
    r2s = jnp.where(mask, jnp.maximum(r2, 2e-6), 1.0)

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
        erfc_ar = _erfc_poly_fast(ar, exp_a2r2)
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

    fx = -2.0 * jnp.sum(dedr2 * dx, axis=1).reshape(1, b)
    fy = -2.0 * jnp.sum(dedr2 * dy, axis=1).reshape(1, b)
    fz = -2.0 * jnp.sum(dedr2 * dz, axis=1).reshape(1, b)
    erow = jnp.sum(e_pair, axis=1).reshape(1, b)
    upd = jnp.concatenate(
        [fx, fy, fz, erow, jnp.zeros((4, b), jnp.float32)], axis=0)
    out_ref[0] = out_ref[0] + upd
