"""Pallas TPU kernel for direct-space nonbonded energy + analytic forces.

The hand-scheduled twin of pairs.rows_ef_from_state (itself the TPU recast
of the reference's warp tile kernel, platforms/cuda/src/kernels/
nonbonded.cu:44-106), v5: COMPACTED CONTIGUOUS candidate slabs at 16-atom
BRICK granularity (the reference culls 32-atom blocks the same way,
findInteractingBlocks.cu:55-180).

Design notes (what the TPU dictates):
* Candidate column data is COMPACTED into per-row-block contiguous slabs,
  because per-block DMA issue dominates otherwise (~45 ns per DMA issue;
  the v3 scalar-prefetched block-gather design spent ~3.7 ms/step on ~80k
  DMA issues at DHFR scale — measured). Static parameters and exclusion
  bitmasks are compacted once at neighbor-list build; positions are
  re-compacted every step with one XLA block-row gather (768 B rows move
  at ~60 GB/s here, ~0.7 ms at DHFR scale; ELEMENT gathers run at
  0.13 Gelem/s and are unusable). The kernel then reads ~3 fat DMAs per
  (row block, chunk) instead of 17 small ones.
* Minimum image is the staged triclinic reduction per pair inside the
  tile (build-time per-block-pair shifts were tried and rejected: they
  require half_r + half_c + cutoff < box/2 for EVERY close block pair,
  which rare tall straddling blocks violate on legal boxes).
* Lorentz-Berthelot folding: the shared feature planes carry sqrt(k_e)*q,
  sigma/2 and 2*sqrt(eps), so in-tile mixing is one add / one multiply.
* Candidates are ordered [has-exclusions | plain | invalid]: per-row
  scalar counts let the sweep skip the invalid tail entirely and run the
  (expensive) float-parity exclusion unpack only on chunks that can
  contain an excluded pair.

Data layout: row features (nb, 6, 64) f32 planes [x, y, z, sqrt(k_e)q,
sigma/2, 2*sqrt(eps)]; candidate slabs (nb, 3, mc*16) for positions
(refreshed per step) and folded static parameters (built once), where mc
counts 16-atom candidate BRICKS; exclusion bitmasks (nb, ch, 64, KQ) —
ONE float word per (row atom, candidate brick), 16 bits per word, stored
only for the exclusion window (candidates are ordered exclusion-first).
Invalid slots point at a far-away dummy brick whose pairs fail the cutoff.
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
COLS_PER_TILE = 32
# v5: candidate columns are tracked at 16-atom BRICK granularity (quarter
# blocks). Brick bboxes are ~2x tighter than 64-atom block bboxes at DHFR
# scale (measured candidate volume: 7932 -> ~4100 columns/atom), the 192 B
# brick-row gathers run at the same ~50 GB/s as the old 768 B block rows,
# and the exclusion bitmask shrinks to ONE 16-bit word per (row atom,
# brick), expanded in-kernel by an exact f32 MXU matmul.
BRICK = 16
KQ = (COLS_PER_TILE * 64) // BRICK      # bricks per kernel chunk (128)


def _erfc_poly_fast(x, exp_x2):
    """Hastings erfc with the divide replaced by an approximate VPU
    reciprocal plus one Newton step (rel. error ~1e-6, well under the
    1e-4 force tolerance; divides cost ~10x a multiply on the VPU)."""
    import jax.experimental.pallas as pl
    d = 1.0 + 0.3275911 * x
    t0 = pl.reciprocal(d, approx=True)
    t = t0 * (2.0 - d * t0)
    poly = (0.254829592 + (-0.284496736 + (1.421413741 + (-1.453152027
            + 1.061405429 * t) * t) * t) * t) * t
    return poly * exp_x2


def build_tile_state(pos, box, charge, sigma, epsilon, exclusions, n_real,
                     reach, max_cols, block=64, sort_cell=None,
                     col_cap=None, use_shift=False, max_bricks=None,
                     kq=None):
    """Persistent candidate state for the tile kernel.

    pos: (n_pad, 3) RAW (unwrapped) positions; charge/sigma/epsilon:
    (n_pad,) padded parameters; exclusions: (n_pad, E) int32 original-id
    table or None; reach = cutoff + skin. col_cap is accepted for API
    compatibility and ignored (candidates are brick-granular; the
    budget is derived from max_cols below, or passed directly as
    max_bricks). block is the ROW granularity (16/32/64 atoms): smaller
    rows trade more grid programs for geometrically tighter candidate
    sets (a 16-atom row bbox culls ~3x more volume than a 64-atom one
    at liquid density — measured on the DHFR-scale probe). kq sets the
    kernel chunk width in bricks (default KQ); smaller chunks keep the
    [exclusion | needs-image | plain] prefix classes effective when the
    per-row candidate count is small.
    Returns a dict of device arrays (all static shapes).
    """
    from . import geometry as geom
    from .pairs import spatial_sort_keys

    if kq is None:
        kq = KQ
    # kq must be a multiple of 16: the exclusion-mask build packs words in
    # 16-candidate chunks and the kernel layout slices (excl window) // kq
    assert kq % 16 == 0
    n_pad = pos.shape[0]
    assert n_pad % block == 0 and block in (16, 32, 64)
    nb = n_pad // block
    f32 = jnp.float32
    max_cols = min(max_cols, nb)

    # ---- wrap bookkeeping: pos = pos_w + W @ box with integer W
    binv = geom.box_inverse(box).astype(f32)
    posf = pos.astype(f32)
    # elementwise VPU transforms: an MXU (N,3)x(3,3) matmul truncates to
    # bf16 and flips floor() at box edges (see geometry.to_fractional)
    frac = geom.to_fractional(posf, binv)
    W = jnp.floor(frac)                                   # (n_pad, 3)
    pos_w = posf - geom.from_fractional(W, box.astype(f32))

    # ---- spatial sort + block bbox cull
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

    # ---- anchor-unwrap each block: image every atom next to its block's
    # first atom so a spatially-compact cluster straddling the home-box
    # boundary keeps a TIGHT bounding box (wrapped coordinates would smear
    # it across the whole box, poisoning the bbox cull and the per-candidate
    # image shifts below)
    anchor = jnp.repeat(pos_s.reshape(nb, block, 3)[:, :1, :], block, axis=1)
    anchor = anchor.reshape(n_pad, 3)
    d_anch = pos_s - anchor
    d_red = geom.periodic_delta(d_anch, box.astype(f32))
    pos_s = anchor + d_red
    # track the image change in the stored wrap offsets (refresh subtracts
    # W_s @ box from raw positions, so it must include the anchor images)
    kfrac = jnp.round(geom.to_fractional(d_anch - d_red, binv))
    W_s = W_s + kfrac

    # row bboxes at BLOCK granularity (rows stay 64-wide), candidate
    # bboxes at BRICK granularity (16-atom quarter blocks, ~2x tighter)
    blocks = pos_s.reshape(nb, block, 3)
    bmin = jnp.min(blocks, axis=1)
    bmax = jnp.max(blocks, axis=1)
    centers = 0.5 * (bmin + bmax)                          # (nb, 3)
    half = 0.5 * (bmax - bmin)
    nq = n_pad // BRICK
    bricks = pos_s.reshape(nq, BRICK, 3)
    qmin = jnp.min(bricks, axis=1)
    qmax = jnp.max(bricks, axis=1)
    qcenters = 0.5 * (qmin + qmax)                         # (nq, 3)
    qhalf = 0.5 * (qmax - qmin)
    d = centers[:, None, :] - qcenters[None, :, :]         # (nb, nq, 3)
    d = geom.periodic_delta(d, box)
    gap = jnp.maximum(jnp.abs(d) - (half[:, None, :] + qhalf[None, :, :]),
                      0.0)
    close = jnp.sum(gap * gap, axis=-1) < reach * reach    # (nb, nq)

    # candidate budget in bricks: brick close-sets are a subset of the
    # dilated block close-set x(block/BRICK); the measured subset ratio at
    # liquid density is ~0.55 for 64-atom rows, so 0.8 is a safe cap for
    # those; finer rows leave less subset slack (overflow poisons + grows,
    # never silent)
    if max_bricks is not None:
        max_cols_q = min(nq, int(max_bricks))
    else:
        bpb = block // BRICK
        factor = {4: 0.8, 2: 0.9, 1: 1.0}[bpb]
        max_cols_q = min(nq, int(max_cols * bpb * factor) + 8)
    if max_cols >= nb and max_bricks is None:
        # the block-level budget saturates the grid (small box: every block
        # is a candidate) — the subset factor would under-budget the brick
        # conversion AND capacity escalation cannot grow past the clamp, so
        # budget every brick (nq is small exactly when this branch fires)
        max_cols_q = nq
    mc_round = ((max_cols_q + kq - 1) // kq) * kq
    col_order = jnp.argsort(~close, axis=1, stable=True)
    cand = col_order[:, :max_cols_q].astype(jnp.int32)     # (nb, mcq)
    cand_valid = jnp.take_along_axis(close, cand, axis=1)
    count = jnp.sum(close, axis=1, dtype=jnp.int32)        # valid cands
    overflow = (jnp.sum(close.astype(jnp.int32))
                - jnp.sum(cand_valid.astype(jnp.int32))).astype(jnp.int32)
    # invalid slots -> the dummy far brick nq (its pairs fail the cutoff)
    code = jnp.where(cand_valid, cand, nq).astype(jnp.int32)
    max_cols = max_cols_q

    # candidate blocks that can contain an excluded/self pair: blocks whose
    # sorted slots appear in this row block's exclusion entries.  Order the
    # candidate list [exclusion-carrying | plain | invalid] so the kernel
    # only unpacks bitmasks on the leading chunks (excl_count) and can
    # skip the invalid tail (count)
    row_blk = jnp.arange(nb, dtype=jnp.int32)[:, None]
    if exclusions is not None and int(exclusions.shape[1]) > 0:
        excl_o_pre = exclusions[order]
        excl_slot_pre = jnp.where(excl_o_pre >= 0,
                                  inv_order[jnp.clip(excl_o_pre, 0)], -1)
        excl_blk = jnp.where(excl_slot_pre >= 0,
                             excl_slot_pre // BRICK, -1)    # (n_pad, E)
        excl_blk = excl_blk.reshape(nb, block * excl_blk.shape[1])
        has_excl = jnp.any(code[:, :, None]
                           == excl_blk[:, None, :], axis=2)
    else:
        has_excl = jnp.zeros_like(cand_valid)
    has_excl = has_excl | (code // (block // BRICK) == row_blk)  # self
    has_excl = has_excl & cand_valid

    shift = None
    if use_shift:
        # per-(row block, candidate) periodic image shift, baked at build so
        # the kernel can skip the per-pair minimum image: column positions
        # are pre-imaged next to the row block. The center image is only
        # guaranteed to be every atom pair's minimum image when the reduced
        # center delta plus both bbox half-extents stays inside the half box
        # on every axis; candidates violating that bound are classified
        # needs-image below and the kernel runs the per-pair reduction for
        # them only (ordered as a leading window, like exclusions)
        cent_ext = jnp.concatenate(
            [qcenters, jnp.full((1, 3), 1.0e7, f32)], axis=0)  # (nq+1, 3)
        half_ext = jnp.concatenate(
            [qhalf, jnp.zeros((1, 3), f32)], axis=0)
        c_cand = cent_ext[code]                                # (nb, mc, 3)
        d_cent = centers[:, None, :] - c_cand
        d_centred = geom.periodic_delta(d_cent, box.astype(f32))
        shift = d_cent - d_centred                             # (nb, mc, 3)
        is_dummy = (code == nq)[:, :, None]
        shift = jnp.where(is_dummy, 0.0, shift)
        boxf = box.astype(f32)
        widths = jnp.stack([boxf[0, 0], boxf[1, 1], boxf[2, 2]])
        hsum = half[:, None, :] + half_ext[code]
        needs_img = (jnp.abs(d_centred) + hsum) >= (0.5 * widths - 1e-5)
        needs_img = jnp.any(needs_img, axis=2) & ~is_dummy[:, :, 0] \
            & cand_valid
    else:
        needs_img = cand_valid  # no shifts: every live pair gets min-image

    # rank: 0 = exclusion-carrying, 1 = needs-image, 2 = plain, 3 = invalid
    rank = jnp.where(
        cand_valid,
        jnp.where(has_excl, 0, jnp.where(needs_img, 1, 2)), 3)
    reorder = jnp.argsort(rank, axis=1, stable=True).astype(jnp.int32)
    code = jnp.take_along_axis(code, reorder, axis=1)
    excl_count = jnp.sum(has_excl, axis=1, dtype=jnp.int32)
    # image window covers the exclusion window too (min-image on shifted
    # coordinates is idempotent, so over-applying it is just slower)
    img_count = jnp.sum((has_excl | needs_img) & cand_valid, axis=1,
                        dtype=jnp.int32)
    if use_shift:
        shift = jnp.take_along_axis(shift, reorder[:, :, None], axis=1)
    if mc_round > max_cols:                    # pad to a whole chunk count
        code = jnp.pad(code, ((0, 0), (0, mc_round - max_cols)),
                       constant_values=nq)
        if use_shift:
            shift = jnp.pad(shift,
                            ((0, 0), (0, mc_round - max_cols), (0, 0)))
    max_cols = mc_round

    # ---- static feature planes, folded for the kernel
    q_s = charge[order].astype(f32)
    sg_s = (0.5 * sigma[order]).astype(f32)
    ep_s = (2.0 * jnp.sqrt(epsilon[order])).astype(f32)
    if n_real < n_pad:
        q_s = q_s.at[n_real:].set(0.0)
        ep_s = ep_s.at[n_real:].set(0.0)
    feat = jnp.zeros((nb + 1, 6, block), f32)
    # rows and columns share these planes, so each carries HALF of every
    # pair prefactor: sqrt(k_e)*q, sigma/2, 2*sqrt(eps)
    feat = feat.at[:nb, 3].set(
        (jnp.float32(np.sqrt(ONE_4PI_EPS0)) * q_s).reshape(nb, block))
    feat = feat.at[:nb, 4].set(sg_s.reshape(nb, block))
    feat = feat.at[:nb, 5].set(ep_s.reshape(nb, block))
    # dummy block far outside any box
    feat = feat.at[nb, 0:3].set(jnp.float32(1.0e7))

    # exclusions + self pairs -> per-tile packed bitmasks (the reference's
    # tile exclusion masks, nonbonded.cu exclusions[] — one bit per
    # (row atom, column lane), 2 int32 words per row): the kernel pays a
    # constant ~6-op unpack per tile instead of 2*E compares per slot,
    # which keeps protein-scale exclusion lists (E ~ 12-20) free
    if exclusions is not None and int(exclusions.shape[1]) > 0:
        excl_o = exclusions[order]                          # (n_pad, E)
        excl_slot = jnp.where(excl_o >= 0, inv_order[excl_o], -1)
        entries = jnp.concatenate(
            [excl_slot, jnp.arange(n_pad, dtype=jnp.int32)[:, None]], axis=1)
    else:
        entries = jnp.arange(n_pad, dtype=jnp.int32)[:, None]
    e1 = entries.shape[1]
    be = jnp.where(entries >= 0, entries // BRICK, -1)
    le = jnp.where(entries >= 0, entries % BRICK, 0)
    berb = be.reshape(nb, block, e1)
    lerb = le.reshape(nb, block, e1)
    # ONE 16-bit word per (row atom, candidate brick), kept in f32 (exact
    # below 2^24): Mosaic rejects vector shifts and int-bool bitcasts, so
    # the kernel tests bits with float floor/parity arithmetic instead.
    # XLA's exp2 is an approximation; integer shifts are exact.
    sh_f = jnp.left_shift(jnp.int32(1), lerb).astype(f32)   # (nb, 64, E1)

    def mask_chunk(cand_chunk):
        # (nb, mcc, 64, E1) transient, chunked over candidate slots
        m = cand_chunk[:, :, None, None] == berb[:, None, :, :]
        return jnp.sum(jnp.where(m, sh_f[:, None], 0.0), axis=3)

    # bitmasks are stored only for the exclusion WINDOW (candidates are
    # ordered exclusion-first, and only chunks below excl_count unpack
    # masks); a full-width table would dominate build + aux traffic. Rows
    # whose exclusion candidates exceed the capacity poison via overflow.
    exc_cap = min(max_cols, 2 * kq)
    overflow = overflow + jnp.sum(
        jnp.maximum(excl_count - exc_cap, 0)).astype(jnp.int32)
    chunks = []
    step = 16
    for c0 in range(0, exc_cap, step):
        chunks.append(mask_chunk(code[:, c0:c0 + step]))
    words = jnp.concatenate(chunks, axis=1)                # (nb, cap, blk)
    # kernel layout: (nb, chunk, block row lanes, kq bricks)
    excl_bits = words.reshape(nb, exc_cap // kq, kq, block)
    excl_bits = excl_bits.transpose(0, 1, 3, 2)            # (nb, ch, blk, kq)

    # compacted STATIC candidate slab (params don't move): one build-time
    # brick-row gather -> (nb, 3, mc*16) contiguous
    static_q = feat[:nb, 3:6, :].reshape(nb, 3, block // BRICK, BRICK)
    static_q = static_q.transpose(0, 2, 1, 3).reshape(nq, 3 * BRICK)
    static_q = jnp.concatenate(
        [static_q, jnp.zeros((1, 3 * BRICK), f32)], axis=0)  # (nq+1, 48)
    sslab = jnp.take(static_q, code.reshape(-1), axis=0)
    sslab = sslab.reshape(nb, max_cols, 3, BRICK).transpose(0, 2, 1, 3)
    sslab = sslab.reshape(nb, 3, max_cols * BRICK)

    # per-step coordinate refresh data: sorted-frame offsets (current box);
    # indices stored BLOCKED so per-step gathers produce (nb, 64) planes
    # directly (no 1-D -> 2-D relayout on the step path)
    out = {"order": order.reshape(nb, block),
           "inv_order": inv_order,
           "rWa": W_s[:, 0].reshape(nb, block),
           "rWb": W_s[:, 1].reshape(nb, block),
           "rWc": W_s[:, 2].reshape(nb, block),
           "feat": feat, "code": code, "excl_bits": excl_bits,
           "sslab": sslab,
           "count": count, "excl_count": excl_count,
           "img_count": img_count,
           "overflow": overflow}
    if shift is not None:
        out["shift"] = shift
    return out


def eval_tiles(pos, box, st, n_real, cutoff, mode, alpha=0.0, krf=0.0,
               crf=0.0, block=64, want_energy=True, interpret=False,
               mesh=None, switch_dist=-1.0, rows_per_program=1):
    """Direct-space (energy, forces) from the persistent tile state.

    Per step: permute positions into the persisted sorted frame (one
    n-sized gather — cheap), subtract the stored wrap offsets, refresh the
    coordinate planes, sweep the candidate tiles.

    With a mesh, ROW BLOCKS are sharded over the mesh axis via shard_map
    (the reference's setAtomBlockRange partition,
    CudaParallelKernels.cpp:66-248): every device runs the SAME tile kernel
    on its row-block shard with replicated column data; force rows are
    partitioned (no reduction needed) and the energy is psum'd.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    feat = st["feat"]
    code = st["code"]
    excl_bits = st["excl_bits"]                 # (nb, ch, block, kq)
    exc_chunks = excl_bits.shape[1]
    kq = excl_bits.shape[3]
    sslab = st["sslab"]
    order = st["order"]
    inv_order = st["inv_order"]
    nb = feat.shape[0] - 1
    block = feat.shape[2]                       # row granularity (16/32/64)
    n_pad = nb * block
    max_cols = code.shape[1]
    f32 = jnp.float32
    boxf = box.astype(f32)

    posf = pos.astype(f32)
    if pos.shape[0] < n_pad:
        pad = n_pad - pos.shape[0]
        posf = jnp.concatenate(
            [posf, jnp.broadcast_to(posf[0], (pad, 3))], axis=0)
    rox = (st["rWa"] * boxf[0, 0] + st["rWb"] * boxf[1, 0]
           + st["rWc"] * boxf[2, 0])
    roy = st["rWb"] * boxf[1, 1] + st["rWc"] * boxf[2, 1]
    roz = st["rWc"] * boxf[2, 2]
    # one row-gather into the sorted frame (element gathers run at
    # ~0.13 Gelem/s here; row gathers amortize the per-row cost)
    ps = jnp.take(posf, order.reshape(-1), axis=0).reshape(nb, block, 3)
    pxb = ps[:, :, 0] - rox                                # (nb, 64)
    pyb = ps[:, :, 1] - roy
    pzb = ps[:, :, 2] - roz
    feat = feat.at[:nb, 0].set(pxb)
    feat = feat.at[:nb, 1].set(pyb)
    feat = feat.at[:nb, 2].set(pzb)

    # per-step compaction of candidate coordinates: one brick-row gather
    # into a contiguous (nb, 3, mcc*16) slab (see module docstring)
    nq = nb * (block // BRICK)
    pos_q = jnp.stack([pxb, pyb, pzb], axis=1)             # (nb, 3, 64)
    pos_q = pos_q.reshape(nb, 3, block // BRICK, BRICK)
    pos_q = pos_q.transpose(0, 2, 1, 3).reshape(nq, 3 * BRICK)
    pos_q = jnp.concatenate(
        [pos_q, jnp.full((1, 3 * BRICK), 1.0e7, f32)], axis=0)
    pslab = jnp.take(pos_q, code.reshape(-1), axis=0)
    pslab = pslab.reshape(nb, max_cols, 3, BRICK)
    use_shift = "shift" in st
    if use_shift:
        # candidates pre-imaged next to their row block (build-time shifts):
        # the kernel then skips the per-pair minimum image
        pslab = pslab + st["shift"][:, :, :, None]
    pslab = pslab.transpose(0, 2, 1, 3)
    pslab = pslab.reshape(nb, 3, max_cols * BRICK)

    use_switch = switch_dist is not None and switch_dist > 0.0
    inv_sw_width = 1.0 / (cutoff - switch_dist) if use_switch else 0.0
    consts = jnp.array([[alpha, cutoff * cutoff, krf, crf,
                         boxf[0, 0], boxf[1, 0], boxf[1, 1],
                         boxf[2, 0], boxf[2, 1], boxf[2, 2],
                         1.0 / boxf[0, 0], 1.0 / boxf[1, 1],
                         1.0 / boxf[2, 2],
                         (switch_dist if use_switch else 0.0),
                         inv_sw_width, 0.0]], f32)

    gr = max(1, int(rows_per_program))
    kernel = functools.partial(_kernel_body,
                               mode=int(mode), kc=kq, b=block, gr=gr,
                               want_energy=bool(want_energy),
                               use_switch=bool(use_switch))
    grid = (nb, max_cols // kq)

    cw = kq * BRICK
    # per-lane reciprocal bit weights for the float bitmask test (kernels
    # cannot capture array constants; rows identical, read as (1, cw));
    # each brick spans 16 lanes, bit index = lane % 16
    lanebit = jnp.broadcast_to(jnp.asarray(
        np.exp2(-(np.arange(cw) % BRICK)).astype(np.float32)), (8, cw))

    def sweep(count, excl_count, img_count, feat_rows, pslab_s, sslab_s,
              bits_s):
        nb_loc = feat_rows.shape[0]
        assert nb_loc % gr == 0
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(nb_loc // gr, grid[1]),
                in_specs=[
                    pl.BlockSpec((1, 16),
                                 lambda r, c, cnt, ecnt, icnt:
                                     (r * 0, r * 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((8, cw),
                                 lambda r, c, cnt, ecnt, icnt:
                                     (r * 0, r * 0)),
                    pl.BlockSpec((gr, 6, block),
                                 lambda r, c, cnt, ecnt, icnt:
                                     (r, r * 0, r * 0)),
                    pl.BlockSpec((gr, 3, cw),
                                 lambda r, c, cnt, ecnt, icnt:
                                     (r, r * 0, c)),
                    pl.BlockSpec((gr, 3, cw),
                                 lambda r, c, cnt, ecnt, icnt:
                                     (r, r * 0, c)),
                    # bits exist only for the exclusion window; chunks past
                    # it never unpack masks, so clamp the index (re-fetch of
                    # an unchanged block is elided by the pipeline)
                    pl.BlockSpec((gr, 1, block, kq),
                                 lambda r, c, cnt, ecnt, icnt,
                                 _m=exc_chunks - 1:
                                     (r, jnp.minimum(c, _m), r * 0, r * 0)),
                ],
                out_specs=pl.BlockSpec(
                    (gr, 4, block),
                    lambda r, c, cnt, ecnt, icnt: (r, r * 0, r * 0)),
            ),
            out_shape=jax.ShapeDtypeStruct((nb_loc, 4, block), f32),
            interpret=interpret,
        )(count, excl_count, img_count, consts, lanebit, feat_rows,
          pslab_s, sslab_s, bits_s)

    feat_rows = feat[:nb]
    if mesh is None:
        out = sweep(st["count"], st["excl_count"], st["img_count"],
                    feat_rows, pslab, sslab, excl_bits)
    else:
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P
        from ..parallel.mesh import AXIS
        n_dev = mesh.devices.size
        padb = (-nb) % (n_dev * gr)

        def padrows(x, value=0):
            if padb == 0:
                return x
            pad_shape = (padb,) + x.shape[1:]
            return jnp.concatenate(
                [x, jnp.full(pad_shape, value, x.dtype)])

        out = shard_map(
            sweep, mesh=mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                      P(AXIS)),
            out_specs=P(AXIS),
            check_rep=False,
        )(padrows(st["count"]), padrows(st["excl_count"]),
          padrows(st["img_count"]), padrows(feat_rows), padrows(pslab),
          padrows(sslab), padrows(excl_bits))[:nb]

    f_sorted = out[:, 0:3, :].transpose(0, 2, 1).reshape(n_pad, 3)
    forces = jnp.take(f_sorted, inv_order, axis=0).astype(pos.dtype)
    energy = 0.5 * jnp.sum(out[:, 3, :], dtype=f32)
    return energy, forces


def direct_ef_pallas(pos, box, charge, sigma, epsilon, exclusions, n_real,
                     cutoff, max_cols, mode, alpha=0.0, krf=0.0, crf=0.0,
                     block=64, sort_cell=None, col_cap=None,
                     interpret=False, use_shift=False, mesh=None,
                     max_bricks=None, kq=None):
    """One-shot build + sweep (energy, forces, overflow)."""
    st = build_tile_state(pos, box, charge, sigma, epsilon, exclusions,
                          n_real, cutoff, max_cols, block=block,
                          sort_cell=sort_cell, use_shift=use_shift,
                          max_bricks=max_bricks, kq=kq)
    e, f = eval_tiles(pos, box, st, n_real, cutoff, mode, alpha=alpha,
                      krf=krf, crf=crf, block=block, interpret=interpret,
                      mesh=mesh)
    return e, f, st["overflow"]


def _kernel_body(count_ref, exclcnt_ref, imgcnt_ref, consts_ref, lanebit_ref,
                 row_ref, pslab_ref, sslab_ref, bits_ref, out_ref, *, mode,
                 kc, b, gr=1, want_energy=True, use_switch=False):
    """gr row blocks per program: 16-atom rows cull candidates ~3x tighter
    than 64-atom rows (bbox geometry), but one-row-per-program at b=16
    measured fixed-cost-bound (SURVEY §11: 32-atom rows cut pair slots 2.5x
    yet sped the kernel only 1.13x). Processing gr consecutive row blocks
    per program keeps ~64 atoms' worth of tiles per program (DMA issues,
    prologue, pipeline bubbles amortized) while candidate sets stay
    brick-tight. The reference's warp kernel has no such tradeoff (warps
    are free); on TPU the grouping IS the warp analog."""
    import jax.experimental.pallas as pl

    ri = pl.program_id(0)
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    for j in range(gr):
        rj = ri * gr + j
        live = ci * kc < count_ref[rj]
        masked = ci * kc < exclcnt_ref[rj]
        imaged = ci * kc < imgcnt_ref[rj]

        # candidate classes are prefix-ordered [exclusion | needs-image |
        # plain]: chunks that can contain excluded pairs pay the bitmask
        # unpack, chunks in the image window pay the per-pair minimum image
        # (everything, when shifts are not baked), and the remaining chunks
        # run the bare sweep
        @pl.when(jnp.logical_and(live, masked))
        def _(j=j):
            _tile_compute(consts_ref, lanebit_ref, row_ref, pslab_ref,
                          sslab_ref, bits_ref, out_ref, j, ci, mode=mode,
                          kc=kc, b=b, want_energy=want_energy, use_mask=True,
                          use_image=True, use_switch=use_switch)

        @pl.when(jnp.logical_and(live, jnp.logical_and(
                jnp.logical_not(masked), imaged)))
        def _(j=j):
            _tile_compute(consts_ref, lanebit_ref, row_ref, pslab_ref,
                          sslab_ref, bits_ref, out_ref, j, ci, mode=mode,
                          kc=kc, b=b, want_energy=want_energy,
                          use_mask=False, use_image=True,
                          use_switch=use_switch)

        @pl.when(jnp.logical_and(live, jnp.logical_not(imaged)))
        def _(j=j):
            _tile_compute(consts_ref, lanebit_ref, row_ref, pslab_ref,
                          sslab_ref, bits_ref, out_ref, j, ci, mode=mode,
                          kc=kc, b=b, want_energy=want_energy,
                          use_mask=False, use_image=False,
                          use_switch=use_switch)


def _tile_compute(consts_ref, lanebit_ref, row_ref, pslab_ref, sslab_ref,
                  bits_ref, out_ref, j, ci, *, mode, kc, b,
                  want_energy=True, use_mask=True, use_image=True,
                  use_switch=False):
    import jax.experimental.pallas as pl  # noqa: F401

    alpha = consts_ref[0, 0]
    rc2 = consts_ref[0, 1]
    krf = consts_ref[0, 2]
    crf = consts_ref[0, 3]
    box_ax = consts_ref[0, 4]
    box_bx = consts_ref[0, 5]
    box_by = consts_ref[0, 6]
    box_cx = consts_ref[0, 7]
    box_cy = consts_ref[0, 8]
    box_cz = consts_ref[0, 9]
    inv_ax = consts_ref[0, 10]
    inv_by = consts_ref[0, 11]
    inv_cz = consts_ref[0, 12]

    row = row_ref[j]                                       # (6, b)
    cpos = pslab_ref[j]                                    # (3, kc*16)
    cstat = sslab_ref[j]                                   # (3, kc*16)

    def rvec(k):
        return row[k:k + 1, :].reshape(b, 1)

    dx = rvec(0) - cpos[0:1, :]
    dy = rvec(1) - cpos[1:2, :]
    dz = rvec(2) - cpos[2:3, :]
    if use_image:
        # staged triclinic minimum image (reduced box form); the shift
        # variant pre-images candidates at build time and skips this
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

    if use_mask:
        # exclusions + self pairs via the packed per-brick bitmask; padded
        # atoms carry q=0/eps=0 and the dummy brick sits far away, so no
        # other validity test is needed.  One 16-bit word per (row atom,
        # brick), expanded to the brick's 16 lanes by an EXACT f32 matmul
        # (words are integers < 2^16; multiplying by a 0/1 selector and
        # summing one term per lane is exact at HIGHEST precision), then
        # bit j of word w = parity of floor(w * 2^-(lane%16)); all-f32
        # arithmetic (Mosaic rejects vector shifts and int-bool bitcasts)
        cwl = kc * 16
        w = bits_ref[j, 0]                                  # (b, kc) f32
        k_io = jax.lax.broadcasted_iota(jnp.int32, (kc, cwl), 0)
        l_io = jax.lax.broadcasted_iota(jnp.int32, (kc, cwl), 1)
        # int32() guard: the weak literal would promote the floor_divide to
        # int64 under the package x64 flag, whose Mosaic lowering recurses
        sel = (l_io // jnp.int32(16) == k_io).astype(jnp.float32)  # (kc, cwl)
        wexp = jax.lax.dot_general(
            w, sel, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)            # (b, cwl)
        inv_bit = lanebit_ref[0:1, :]
        t = jnp.floor(wexp * inv_bit)
        # words hold exact <2^16 ints: parity is exactly 0.0 or 1.0
        parity = t - 2.0 * jnp.floor(0.5 * t)
        notex = 1.0 - parity                                # (b, kc*16)
        scale = jnp.where(r2 < rc2, notex, 0.0)
    else:
        # f32 literals: Python floats promote to f64 under the global
        # x64 flag, and 64-bit vregs abort the TPU compiler
        scale = jnp.where(r2 < rc2, jnp.float32(1.0), jnp.float32(0.0))
    # plain clamp: excluded/self pairs (r2 ~ 0) are zeroed by `scale`, and
    # the dummy block sits far away, so the branchless max suffices
    r2s = jnp.maximum(r2, 2e-6)

    inv_r = jax.lax.rsqrt(r2s)
    inv_r2 = inv_r * inv_r

    sig = rvec(4) + cstat[1:2, :]
    eps4 = rvec(5) * cstat[2:3, :]
    s2 = sig * sig * inv_r2
    s6 = s2 * s2 * s2
    es6 = eps4 * s6
    de_lj = -3.0 * es6 * (2.0 * s6 - 1.0) * inv_r2
    e_lj = es6 * (s6 - 1.0) if (use_switch or want_energy) else None
    if use_switch:
        # LJ switching function (NonbondedForceImpl semantics): S(r) on
        # [rs, rc], energy e*S and dE/dr2 = de*S + e*dS/dr2
        rs_sw = consts_ref[0, 13]
        inv_w_sw = consts_ref[0, 14]
        r_sw = r2s * inv_r
        t_sw = jnp.clip((r_sw - rs_sw) * inv_w_sw,
                        jnp.float32(0.0), jnp.float32(1.0))
        t2_sw = t_sw * t_sw
        sw = 1.0 - t2_sw * t_sw * (10.0 - 15.0 * t_sw + 6.0 * t2_sw)
        one_m = 1.0 - t_sw
        dsw_dr2 = (-30.0 * t2_sw * one_m * one_m * inv_w_sw) * (0.5 * inv_r)
        de_lj = de_lj * sw + e_lj * dsw_dr2
        e_lj = e_lj * sw

    qq = rvec(3) * cstat[0:1, :]
    if mode == MODE_EWALD:
        r = r2s * inv_r
        ar = alpha * r
        exp_a2r2 = jnp.exp(-ar * ar)
        erfc_ar = _erfc_poly_fast(ar, exp_a2r2)
        de_c = (-qq * (erfc_ar * inv_r2
                       + _TWO_OVER_SQRT_PI * alpha * exp_a2r2 * inv_r)
                ) * (0.5 * inv_r)
    elif mode == MODE_RF:
        de_c = qq * (-0.5 * inv_r2 * inv_r + krf)
    else:
        de_c = -0.5 * qq * inv_r2 * inv_r

    dedr2 = (de_lj + de_c) * scale

    fx = -2.0 * jnp.sum(dedr2 * dx, axis=1).reshape(1, b)
    fy = -2.0 * jnp.sum(dedr2 * dy, axis=1).reshape(1, b)
    fz = -2.0 * jnp.sum(dedr2 * dz, axis=1).reshape(1, b)
    if want_energy:
        if mode == MODE_EWALD:
            e_c = qq * inv_r * erfc_ar
        elif mode == MODE_RF:
            e_c = qq * (inv_r + krf * r2s - crf)
        else:
            e_c = qq * inv_r
        e_pair = (e_lj + e_c) * scale
        erow = jnp.sum(e_pair, axis=1).reshape(1, b)
    else:
        erow = jnp.zeros((1, b), jnp.float32)
    upd = jnp.concatenate([fx, fy, fz, erow], axis=0)
    out_ref[j] = out_ref[j] + upd
