"""Pallas TPU kernel for direct-space nonbonded energy + analytic forces.

The hand-scheduled twin of pairs.rows_ef_from_state (itself the TPU recast
of the reference's warp tile kernel, platforms/cuda/src/kernels/
nonbonded.cu:44-106), v2: per-row-block COMPACTED ATOM COLUMN LISTS.

Instead of sweeping whole candidate 64-atom blocks (which evaluates ~14x
more pair slots than land within the cutoff), the build phase culls the
candidate blocks' atoms individually against each row block's bounding box
(the finer per-atom culling of findInteractingBlocks.cu:84-180) and
compacts the survivors into a fixed-capacity column list per row block.
Pair-slot waste drops to the geometric floor of the shared-column design
(~4-5x), and the kernel's inner tile is a dense (64, Ct) sweep with zero
gather work.

Periodic images are resolved at BUILD time: each column slot stores the
integer lattice shift (in fractional basis) that maps its atom to the
minimum image relative to the row block's center. Atoms move less than
skin/2 between rebuilds, so the image choice stays valid and the kernel
needs NO min-image math (the round()/floor() chains of the v1 kernel are
gone); under NPT the shift vectors are re-multiplied by the current box
each step, so box rescaling stays exact.

Parameter folding: rows carry ONE_4PI_EPS0*q, sigma/2, 2*sqrt(eps);
columns carry q, sigma/2, 2*sqrt(eps) — Lorentz-Berthelot mixing inside
the tile is one add and one multiply.

Data layout: all per-step arrays are per-axis (nb, C) / (nb, 64) planes
built by 1-D gathers (no transposed (N,3) relayouts on the step path).
Exclusions are (nb, E, 64) sorted-slot-id planes compared against column
slot ids. Scalars ride in an SMEM consts row; per-row column counts are
scalar-prefetched for tile skipping.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ONE_4PI_EPS0

MODE_EWALD = 0      # erfc(alpha r)/r electrostatics (Ewald / PME direct)
MODE_RF = 1         # reaction field: 1/r + krf r^2 - crf
MODE_PLAIN = 2      # plain 1/r with cutoff

_TWO_OVER_SQRT_PI = 1.1283791670955126


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


def _pick_ct(col_cap):
    for ct in (512, 256, 128, 64):
        if col_cap % ct == 0:
            return ct
    return 64


def default_col_cap(max_cols, block):
    """Fallback column capacity when the caller has no density estimate."""
    cap = max(256, (max_cols * block) // 3)
    return ((cap + 511) // 512) * 512


def build_tile_state(pos, box, charge, sigma, epsilon, exclusions, n_real,
                     reach, max_cols, block=64, sort_cell=None,
                     col_cap=None):
    """Persistent compacted-column state for the tile kernel.

    pos: (n_pad, 3) RAW (unwrapped) positions; charge/sigma/epsilon:
    (n_pad,) padded parameters; exclusions: (n_pad, E) int32 original-id
    table or None; reach = cutoff + skin; col_cap: static column capacity
    per row block (atoms). Returns a dict of device arrays (static shapes).
    """
    from . import geometry as geom
    from .pairs import build_row_state, spatial_sort_keys

    n_pad = pos.shape[0]
    assert n_pad % block == 0 and block == 64
    nb = n_pad // block
    f32 = jnp.float32
    if col_cap is None:
        col_cap = default_col_cap(max_cols, block)
    # capacity can never exceed the candidate pool (max_cols blocks, clamped
    # to nb below) and must tile into ct-wide kernel sweeps
    col_cap = int(min(col_cap, n_pad, min(max_cols, nb) * block))
    ct = _pick_ct(col_cap)
    col_cap = ((col_cap + ct - 1) // ct) * ct

    # ---- wrap bookkeeping: pos = pos_w + W @ box with integer W
    binv = geom.box_inverse(box).astype(f32)
    posf = pos.astype(f32)
    # elementwise VPU transforms: an MXU (N,3)x(3,3) matmul truncates to
    # bf16 and flips floor() at box edges (see geometry.to_fractional)
    frac = geom.to_fractional(posf, binv)
    W = jnp.floor(frac)                                   # (n_pad, 3)
    pos_w = posf - geom.from_fractional(W, box.astype(f32))

    # ---- spatial sort + block bbox cull (block-level candidates)
    if sort_cell is not None:
        keys = spatial_sort_keys(pos_w, box, n_real, sort_cell)
        order = jnp.argsort(keys).astype(jnp.int32)
    else:
        order = jnp.arange(n_pad, dtype=jnp.int32)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    pos_s = pos_w[order]
    W_s = W[order]
    if n_real < n_pad:
        pos_s = pos_s.at[n_real:].set(pos_s[n_real - 1])
        W_s = W_s.at[n_real:].set(W_s[n_real - 1])

    blocks = pos_s.reshape(nb, block, 3)
    bmin = jnp.min(blocks, axis=1)
    bmax = jnp.max(blocks, axis=1)
    centers = 0.5 * (bmin + bmax)                          # (nb, 3)
    half = 0.5 * (bmax - bmin)
    d = centers[:, None, :] - centers[None, :, :]
    d = geom.periodic_delta(d, box)
    gap = jnp.maximum(jnp.abs(d) - (half[:, None, :] + half[None, :, :]), 0.0)
    close = jnp.sum(gap * gap, axis=-1) < reach * reach    # (nb, nb)
    # one-image safety: a second periodic image of some atom could fall
    # within reach of a block whose half-extent + reach exceeds box/2 on
    # any axis; such geometry cannot be represented by per-slot shifts, so
    # flag it through the overflow channel (caller falls back / escalates)
    img_bad = ((half[:, 0] + reach > 0.5 * box[0, 0])
               | (half[:, 1] + reach > 0.5 * box[1, 1])
               | (half[:, 2] + reach > 0.5 * box[2, 2]))
    col_order = jnp.argsort(~close, axis=1, stable=True)
    cand = col_order[:, :max_cols].astype(jnp.int32)       # (nb, max_cols)
    max_cols = cand.shape[1]                               # clamped to nb
    cand_valid = jnp.take_along_axis(close, cand, axis=1)
    blk_overflow = (jnp.sum(close.astype(jnp.int32))
                    - jnp.sum(cand_valid.astype(jnp.int32)))

    # ---- atom-level culling of the candidate blocks' atoms
    m = max_cols * block
    offs = jnp.arange(block, dtype=jnp.int32)
    cand_sid = (cand[:, :, None] * block + offs[None, None, :]
                ).reshape(nb, m)                           # sorted-space ids
    cvalid = jnp.broadcast_to(cand_valid[:, :, None],
                              (nb, max_cols, block)).reshape(nb, m)
    cvalid = cvalid & (cand_sid < n_real)

    cpos = pos_s[cand_sid.reshape(-1)].reshape(nb, m, 3)
    q = cpos - centers[:, None, :]
    # staged min-image (reduced triclinic) with recorded integer shifts
    sc = jnp.round(q[:, :, 2] / box[2, 2])
    qx = q[:, :, 0] - sc * box[2, 0]
    qy = q[:, :, 1] - sc * box[2, 1]
    qz = q[:, :, 2] - sc * box[2, 2]
    sb = jnp.round(qy / box[1, 1])
    qx = qx - sb * box[1, 0]
    qy = qy - sb * box[1, 1]
    sa = jnp.round(qx / box[0, 0])
    qx = qx - sa * box[0, 0]
    dx = jnp.maximum(jnp.abs(qx) - half[:, 0:1], 0.0)
    dy = jnp.maximum(jnp.abs(qy) - half[:, 1:2], 0.0)
    dz = jnp.maximum(jnp.abs(qz) - half[:, 2:3], 0.0)
    within = (dx * dx + dy * dy + dz * dz) < reach * reach
    valid = cvalid & within                                # (nb, m)

    # ---- compact to col_cap slots per row block
    comp = jnp.argsort(~valid, axis=1, stable=True)[:, :col_cap]
    col_valid = jnp.take_along_axis(valid, comp, axis=1)
    col_sid = jnp.take_along_axis(cand_sid, comp, axis=1)  # (nb, C)
    count = jnp.sum(valid, axis=1, dtype=jnp.int32)        # (nb,)
    overflow = (blk_overflow
                + jnp.sum(img_bad.astype(jnp.int32))
                + jnp.sum(jnp.maximum(count - col_cap, 0))).astype(jnp.int32)

    # per-slot combined lattice shift = wrap offset of the atom minus the
    # min-image correction (column coords each step:
    # raw_pos - (Wc @ box) - center_r); invalid slots are pushed far away
    def takec(x):
        return jnp.take_along_axis(x, comp, axis=1)
    far = 1.0e4
    cWa = jnp.where(col_valid, W_s[:, 0][col_sid] + takec(sa), far)
    cWb = jnp.where(col_valid, W_s[:, 1][col_sid] + takec(sb), far)
    cWc = jnp.where(col_valid, W_s[:, 2][col_sid] + takec(sc), far)

    # ---- static per-atom features (sorted space), folded for the kernel
    q_s = charge[order].astype(f32)
    sg_s = (0.5 * sigma[order]).astype(f32)
    ep_s = (2.0 * jnp.sqrt(epsilon[order])).astype(f32)
    if n_real < n_pad:
        q_s = q_s.at[n_real:].set(0.0)
        ep_s = ep_s.at[n_real:].set(0.0)

    col_sid_flat = col_sid.reshape(-1)
    col_gid = jnp.where(col_valid, col_sid, -7).astype(f32)
    # static feature planes packed (nb, 4, C) / (nb, 4, 64) — Mosaic needs
    # sublane-dim blocks divisible by 8 or equal to the array dimension
    col_stat = jnp.stack(
        [q_s[col_sid_flat].reshape(nb, col_cap),
         sg_s[col_sid_flat].reshape(nb, col_cap),
         ep_s[col_sid_flat].reshape(nb, col_cap),
         col_gid], axis=1)                                 # (nb, 4, C)
    row_stat = jnp.stack(
        [(ONE_4PI_EPS0 * q_s).reshape(nb, block),
         sg_s.reshape(nb, block),
         ep_s.reshape(nb, block),
         jnp.zeros((nb, block), f32)], axis=1)             # (nb, 4, 64)

    # exclusions: original-id entries -> sorted slot ids
    if exclusions is not None and int(exclusions.shape[1]) > 0:
        n_excl = int(exclusions.shape[1])
        excl_o = exclusions[order]                          # (n_pad, E)
        excl_slot = jnp.where(excl_o >= 0, inv_order[excl_o], -1)
        excl_planes = jnp.transpose(
            excl_slot.astype(f32).reshape(nb, block, n_excl),
            (0, 2, 1))                                      # (nb, E, 64)
    else:
        excl_planes = jnp.zeros((nb, 1, block), f32) - 1.0

    # per-step position offsets: gather indices in ORIGINAL atom space and
    # the (current-box) lattice/center offsets
    col_oid = order[col_sid_flat].reshape(nb, col_cap)
    row_oid = order.reshape(nb, block)

    return {
        "order": order, "inv_order": inv_order,
        "row_oid": row_oid, "col_oid": col_oid,
        "rWa": W_s[:, 0].reshape(nb, block),
        "rWb": W_s[:, 1].reshape(nb, block),
        "rWc": W_s[:, 2].reshape(nb, block),
        "cWa": cWa, "cWb": cWb, "cWc": cWc,
        "centers": centers,
        "row_stat": row_stat, "col_stat": col_stat,
        "excl": excl_planes,
        "count": count, "overflow": overflow,
    }


def _shift_xyz(Wa, Wb, Wc, box):
    """Cartesian offset of integer lattice shifts (current box)."""
    ox = Wa * box[0, 0] + Wb * box[1, 0] + Wc * box[2, 0]
    oy = Wb * box[1, 1] + Wc * box[2, 1]
    oz = Wc * box[2, 2]
    return ox, oy, oz


def eval_tiles(pos, box, st, n_real, cutoff, mode, alpha=0.0, krf=0.0,
               crf=0.0, block=64, interpret=False):
    """Direct-space (energy, forces) from the persistent compacted-column
    state. Per step: 1-D gathers of the coordinate components into row /
    column planes (with the stored lattice shifts applied), then the dense
    (64, Ct) tile sweep."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nb, _, C = st["col_stat"].shape
    n_pad = nb * block
    n_excl = st["excl"].shape[1]
    ct = _pick_ct(C)
    f32 = jnp.float32
    boxf = box.astype(f32)

    px = pos[:, 0].astype(f32)
    py = pos[:, 1].astype(f32)
    pz = pos[:, 2].astype(f32)
    if pos.shape[0] < n_pad:
        pad = n_pad - pos.shape[0]
        px = jnp.concatenate([px, jnp.broadcast_to(px[0], (pad,))])
        py = jnp.concatenate([py, jnp.broadcast_to(py[0], (pad,))])
        pz = jnp.concatenate([pz, jnp.broadcast_to(pz[0], (pad,))])

    cx0, cy0, cz0 = (st["centers"][:, 0], st["centers"][:, 1],
                     st["centers"][:, 2])
    rox, roy, roz = _shift_xyz(st["rWa"], st["rWb"], st["rWc"], boxf)
    cox, coy, coz = _shift_xyz(st["cWa"], st["cWb"], st["cWc"], boxf)
    row_dyn = jnp.stack(
        [px[st["row_oid"]] - rox - cx0[:, None],
         py[st["row_oid"]] - roy - cy0[:, None],
         pz[st["row_oid"]] - roz - cz0[:, None],
         jnp.zeros((nb, block), f32)], axis=1)             # (nb, 4, 64)
    col_dyn = jnp.stack(
        [px[st["col_oid"]] - cox - cx0[:, None],
         py[st["col_oid"]] - coy - cy0[:, None],
         pz[st["col_oid"]] - coz - cz0[:, None],
         jnp.zeros((nb, C), f32)], axis=1)                 # (nb, 4, C)

    consts = jnp.array([[alpha, cutoff * cutoff, krf, crf,
                         0.0, 0.0, 0.0, 0.0]], f32)

    kernel = functools.partial(_kernel_body, n_excl=n_excl,
                               mode=int(mode), ct=ct, b=block)
    grid = (nb, C // ct)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # literal indices must stay i32 for the Mosaic transforms:
                # derive zeros from the (i32) grid coordinates
                pl.BlockSpec((1, 8), lambda r, c, cnt: (r * 0, r * 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 4, block), lambda r, c, cnt: (r, r * 0, r * 0)),
                pl.BlockSpec((1, 4, block), lambda r, c, cnt: (r, r * 0, r * 0)),
                pl.BlockSpec((1, 4, ct), lambda r, c, cnt: (r, r * 0, c)),
                pl.BlockSpec((1, 4, ct), lambda r, c, cnt: (r, r * 0, c)),
                pl.BlockSpec((1, n_excl, block),
                             lambda r, c, cnt: (r, r * 0, r * 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, block),
                                   lambda r, c, cnt: (r, r * 0, r * 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 8, block), f32),
        interpret=interpret,
    )(st["count"], consts, row_dyn, st["row_stat"], col_dyn,
      st["col_stat"], st["excl"])

    fx = out[:, 0, :].reshape(n_pad)[st["inv_order"]]
    fy = out[:, 1, :].reshape(n_pad)[st["inv_order"]]
    fz = out[:, 2, :].reshape(n_pad)[st["inv_order"]]
    energy = 0.5 * jnp.sum(out[:, 3, :], dtype=f32)
    forces = jnp.stack([fx, fy, fz], axis=-1).astype(pos.dtype)
    return energy, forces


def direct_ef_pallas(pos, box, charge, sigma, epsilon, exclusions, n_real,
                     cutoff, max_cols, mode, alpha=0.0, krf=0.0, crf=0.0,
                     block=64, sort_cell=None, col_cap=None,
                     interpret=False):
    """One-shot build + sweep (energy, forces, overflow)."""
    st = build_tile_state(pos, box, charge, sigma, epsilon, exclusions,
                          n_real, cutoff, max_cols, block=block,
                          sort_cell=sort_cell, col_cap=col_cap)
    e, f = eval_tiles(pos, box, st, n_real, cutoff, mode, alpha=alpha,
                      krf=krf, crf=crf, block=block, interpret=interpret)
    return e, f, st["overflow"]


def _kernel_body(count_ref, consts_ref, rdyn_ref, rstat_ref, cdyn_ref,
                 cstat_ref, excl_ref, out_ref, *, n_excl, mode, ct, b):
    import jax.experimental.pallas as pl

    ri = pl.program_id(0)
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    @pl.when(ci * ct < count_ref[ri])
    def _():
        _tile_compute(consts_ref, rdyn_ref, rstat_ref, cdyn_ref, cstat_ref,
                      excl_ref, out_ref, ri, n_excl=n_excl, mode=mode, b=b)


def _tile_compute(consts_ref, rdyn_ref, rstat_ref, cdyn_ref, cstat_ref,
                  excl_ref, out_ref, ri, *, n_excl, mode, b):
    import jax.experimental.pallas as pl  # noqa: F401

    alpha = consts_ref[0, 0]
    rc2 = consts_ref[0, 1]
    krf = consts_ref[0, 2]
    crf = consts_ref[0, 3]

    rdyn = rdyn_ref[0]                                     # (4, b)
    rstat = rstat_ref[0]
    cdyn = cdyn_ref[0]                                     # (4, ct)
    cstat = cstat_ref[0]

    def rvec(plane, k):
        return plane[k:k + 1, :].reshape(b, 1)

    dx = rvec(rdyn, 0) - cdyn[0:1, :]
    dy = rvec(rdyn, 1) - cdyn[1:2, :]
    dz = rvec(rdyn, 2) - cdyn[2:3, :]
    r2 = dx * dx + dy * dy + dz * dz

    # self-pairs masked via sorted slot ids (rows: ri*b + lane index);
    # exclusions via slot-id planes; padded atoms carry q=0/eps=0
    rgid = (ri * b + jax.lax.broadcasted_iota(jnp.int32, (b, 1), 0)
            ).astype(jnp.float32)
    cgid = cstat[3:4, :]
    mask = (rgid != cgid) & (r2 < rc2)
    for e in range(n_excl):
        mask = mask & (excl_ref[0, e:e + 1, :].reshape(b, 1) != cgid)
    r2s = jnp.where(mask, jnp.maximum(r2, 2e-6), 1.0)

    inv_r = jax.lax.rsqrt(r2s)
    inv_r2 = inv_r * inv_r

    sig = rvec(rstat, 1) + cstat[1:2, :]
    eps4 = rvec(rstat, 2) * cstat[2:3, :]
    s2 = sig * sig * inv_r2
    s6 = s2 * s2 * s2
    es6 = eps4 * s6
    e_lj = es6 * (s6 - 1.0)
    de_lj = -3.0 * es6 * (2.0 * s6 - 1.0) * inv_r2

    qq = rvec(rstat, 0) * cstat[0:1, :]
    if mode == MODE_EWALD:
        r = r2s * inv_r
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
