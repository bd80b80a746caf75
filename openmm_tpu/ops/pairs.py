"""Blocked pairwise interaction engine.

The TPU counterpart of the reference's warp-synchronous tile kernel
(platforms/cuda/src/kernels/nonbonded.cu:44-106: atoms in 32-blocks, one warp
per 32x32 tile, exclusion bitmasks) recast as dense BLOCK x BLOCK tiles swept
by a lax.scan, with jax.checkpoint on each tile so reverse-mode forces only
store tile inputs (not the O(B^2) intermediates). Exclusions are padded
per-atom neighbor-index lists compared against global column ids, playing the
role of the reference's 1024-bit tile exclusion masks.

All shapes are static: positions are padded to a block multiple; padded atoms
are masked out by global-index bounds. The same engine serves the O(N^2)
reference path and (with a block-pair culling list) the neighbor-list path.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from . import geometry as geom


def pad_to_block(n, block):
    return ((n + block - 1) // block) * block


def build_exclusion_table(n_atoms, exclusion_pairs, pad_multiple=4):
    """Padded per-atom exclusion lists: (N, MAX_EXCL) int32, -1 padded.
    Each pair (i, j) excludes j from i's neighbors and i from j's."""
    excl = [[] for _ in range(n_atoms)]
    for i, j in exclusion_pairs:
        excl[int(i)].append(int(j))
        excl[int(j)].append(int(i))
    max_e = max((len(e) for e in excl), default=0)
    max_e = max(1, ((max_e + pad_multiple - 1) // pad_multiple) * pad_multiple)
    table = np.full((n_atoms, max_e), -1, dtype=np.int32)
    for i, e in enumerate(excl):
        table[i, :len(e)] = sorted(e)
    return table


def _upper_triangle_block_pairs(n_blocks):
    bi, bj = np.triu_indices(n_blocks)
    return bi.astype(np.int32), bj.astype(np.int32)


def pair_energy_n2(pos, box, pair_fn, per_atom, exclusions, n_real,
                   block=256, periodic=False, accum_dtype=jnp.float32,
                   mesh=None):
    """Sum pair_fn over all unordered pairs (i < j), skipping exclusions.

    pos:        (Np, 3) padded positions
    pair_fn:    (r2_safe, pi, pj) -> (B, B) energies; pi/pj are dicts of
                (B,)-shaped per-atom parameter slices
    per_atom:   dict name -> (Np,) or (Np, k) arrays
    exclusions: (Np, MAX_E) int32 table (-1 padded), or None
    n_real:     number of real atoms (<= Np)
    """
    n_pad = pos.shape[0]
    assert n_pad % block == 0
    n_blocks = n_pad // block
    bi_arr, bj_arr = _upper_triangle_block_pairs(n_blocks)
    bi_arr = jnp.asarray(bi_arr)
    bj_arr = jnp.asarray(bj_arr)

    def slice_atoms(start):
        sl = {k: jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
              for k, v in per_atom.items()}
        p = jax.lax.dynamic_slice(pos, (start, jnp.zeros((), jnp.int32)), (block, 3))
        e = (None if exclusions is None else
             jax.lax.dynamic_slice(exclusions, (start, jnp.zeros((), jnp.int32)),
                                   (block, exclusions.shape[1])))
        return p, sl, e

    col_ids = jnp.arange(block, dtype=jnp.int32)

    @jax.checkpoint
    def tile_energy(bi, bj):
        pos_i, par_i, excl_i = slice_atoms(bi * block)
        pos_j, par_j, _ = slice_atoms(bj * block)
        gi = bi * block + col_ids            # (B,)
        gj = bj * block + col_ids
        dr = pos_i[:, None, :] - pos_j[None, :, :]
        if periodic:
            dr = geom.periodic_delta(dr, box)
        r2 = jnp.sum(dr * dr, axis=-1)
        mask = (gj[None, :] > gi[:, None]) & (gi[:, None] < n_real) & (gj[None, :] < n_real)
        if excl_i is not None:
            is_excl = jnp.any(excl_i[:, :, None] == gj[None, None, :], axis=1)
            mask = mask & ~is_excl
        r2_safe = jnp.where(mask, r2, 1.0)
        e = pair_fn(r2_safe, par_i, par_j)
        e = jnp.where(mask, e, 0.0)
        return jnp.sum(e.astype(accum_dtype))

    if mesh is not None:
        from ..parallel.mesh import sharded_pair_energy
        return sharded_pair_energy(mesh, tile_energy, bi_arr, bj_arr,
                                   accum_dtype)

    def body(acc, idx):
        return acc + tile_energy(bi_arr[idx], bj_arr[idx]), None

    total, _ = jax.lax.scan(body, jnp.zeros((), accum_dtype),
                            jnp.arange(bi_arr.shape[0], dtype=jnp.int32))
    return total


def pair_energy_bonded_list(pos, box, pair_fn, per_pair, idx, periodic=False,
                            accum_dtype=jnp.float32):
    """Sum pair_fn over an explicit (M, 2) pair list (exceptions / 1-4 terms),
    analogous to the reference's nonbondedExceptions.cc bonded-style kernel."""
    if idx.shape[0] == 0:
        return jnp.zeros((), accum_dtype)
    dr = geom.bond_vectors(pos, idx, box if periodic else None)
    r2 = jnp.sum(dr * dr, axis=-1)
    e = pair_fn(r2, per_pair)
    return jnp.sum(e.astype(accum_dtype))


def estimate_block_pairs(pos0, box0, n_real, block, cutoff, periodic,
                         capacity_factor=1.7):
    """Host-side capacity estimate for the culled block-pair list, from the
    initial configuration (the moral equivalent of the reference's
    neighbor-list sizing + overflow retry, ContextImpl.cpp:298)."""
    pos0 = np.asarray(pos0, np.float64)
    n_pad = pad_to_block(max(n_real, 1), block)
    pp = np.zeros((n_pad, 3))
    pp[:n_real] = pos0[:n_real]
    pp[n_real:] = pos0[0] if n_real else 0.0
    nb = n_pad // block
    blocks = pp.reshape(nb, block, 3)
    bmin = blocks.min(axis=1)
    bmax = blocks.max(axis=1)
    centers = 0.5 * (bmin + bmax)
    half = 0.5 * (bmax - bmin)
    bi, bj = np.triu_indices(nb)
    d = centers[bi] - centers[bj]
    if periodic:
        b = np.asarray(box0, np.float64)
        for ax in (2, 1, 0):
            d -= np.round(d[:, ax:ax + 1] / b[ax, ax]) * b[ax][None, :]
    gap = np.abs(d) - (half[bi] + half[bj])
    gap = np.maximum(gap, 0.0)
    n_close = int(np.sum(np.sum(gap * gap, axis=1) < cutoff * cutoff))
    cap = int(np.ceil(n_close * capacity_factor / 8.0) * 8)
    return max(cap, 8)


def pair_energy_neighbor(pos, box, pair_fn, per_atom, exclusions, n_real,
                         cutoff, max_pairs, block=64, periodic=False,
                         accum_dtype=jnp.float32, mesh=None):
    """Culled-tile pairwise sum: per-block bounding boxes -> block-pair
    extraction (fixed capacity) -> tile sweep. Rebuilt every step — the
    rebuild is O(n_blocks^2) comparisons + one sort, negligible next to the
    tile compute, which removes the reference's motion-based rebuild
    predicate entirely (findInteractingBlocks.cu:55-79 recast with static
    shapes)."""
    n_pad = pos.shape[0]
    assert n_pad % block == 0
    nb = n_pad // block
    biu, bju = _upper_triangle_block_pairs(nb)
    biu = jnp.asarray(biu)
    bju = jnp.asarray(bju)

    blocks = pos.reshape(nb, block, 3)
    bmin = jnp.min(blocks, axis=1)
    bmax = jnp.max(blocks, axis=1)
    centers = 0.5 * (bmin + bmax)
    half = 0.5 * (bmax - bmin)
    d = centers[biu] - centers[bju]
    if periodic:
        d = geom.periodic_delta(d, box)
    gap = jnp.maximum(jnp.abs(d) - (half[biu] + half[bju]), 0.0)
    close = jnp.sum(gap * gap, axis=1) < cutoff * cutoff

    # stable partition: interacting pairs first, then take max_pairs
    order = jnp.argsort(~close, stable=True)
    sel = order[:max_pairs]
    bi_list = biu[sel]
    bj_list = bju[sel]
    valid = close[sel].astype(accum_dtype)
    overflow = jnp.sum(close.astype(jnp.int32)) - jnp.sum(
        valid.astype(jnp.int32))

    def slice_atoms(start):
        sl = {k: jax.lax.dynamic_slice_in_dim(v, start, block, axis=0)
              for k, v in per_atom.items()}
        p = jax.lax.dynamic_slice(pos, (start, jnp.zeros((), start.dtype)),
                                  (block, 3))
        e = (None if exclusions is None else
             jax.lax.dynamic_slice(exclusions,
                                   (start, jnp.zeros((), start.dtype)),
                                   (block, exclusions.shape[1])))
        return p, sl, e

    col_ids = jnp.arange(block, dtype=jnp.int32)

    @jax.checkpoint
    def tile_energy(bi, bj):
        pos_i, par_i, excl_i = slice_atoms(bi * block)
        pos_j, par_j, _ = slice_atoms(bj * block)
        gi = bi * block + col_ids
        gj = bj * block + col_ids
        dr = pos_i[:, None, :] - pos_j[None, :, :]
        if periodic:
            dr = geom.periodic_delta(dr, box)
        r2 = jnp.sum(dr * dr, axis=-1)
        mask = (gj[None, :] > gi[:, None]) & (gi[:, None] < n_real) \
            & (gj[None, :] < n_real)
        if excl_i is not None:
            is_excl = jnp.any(excl_i[:, :, None] == gj[None, None, :], axis=1)
            mask = mask & ~is_excl
        r2_safe = jnp.where(mask, r2, 1.0)
        e = pair_fn(r2_safe, par_i, par_j)
        e = jnp.where(mask, e, 0.0)
        return jnp.sum(e.astype(accum_dtype))

    if mesh is not None:
        from ..parallel.mesh import sharded_pair_energy
        total = sharded_pair_energy(mesh, tile_energy, bi_list, bj_list,
                                    accum_dtype, weights=valid)
        return total, overflow

    def body(acc, xs):
        bi, bj, w = xs
        return acc + tile_energy(bi, bj) * w, None

    total, _ = jax.lax.scan(body, jnp.zeros((), accum_dtype),
                            (bi_list, bj_list, valid))
    return total, overflow


def spatial_sort_keys(pos, box, n_real, cell_size, brick=True):
    """Spatial sort key (the role of the reference's Hilbert-curve reorder,
    ComputeContext.cpp:430). Padded atoms sort last.

    brick=True (default): cells of half the given size grouped into 2x2x2
    BRICKS; bricks traverse in boustrophedon (snake) order and cells inside
    a brick in Morton order. A run of ~8 cells then forms a compact CUBE
    instead of a snake strip, tightening 64-atom block bounding boxes by
    ~35% in each dimension — directly shrinking the candidate-block count
    of the tile cull.

    brick=False: plain snake over cells of the given size.
    """
    n_pad = pos.shape[0]
    if brick:
        cell_size = 0.5 * cell_size
    wrapped = geom.wrap_into_box(pos, box)
    # per-axis EXACT tiling: round the cell count and stretch the cells to
    # cover the box, so no thin sliver cell collects a box-spanning slab of
    # atoms (which would blow up that block's bounding box); with bricks the
    # count must be EVEN so no half-width brick column remains at the edge
    quantum = 2 if brick else 1

    def ncells(width):
        return quantum * jnp.maximum(
            jnp.round(width / (quantum * cell_size)).astype(jnp.int32), 1)

    ncx = ncells(box[0, 0])
    ncy = ncells(box[1, 1])
    ncz = ncells(box[2, 2])
    cx = jnp.clip(jnp.floor(
        wrapped[:, 0] * (ncx / box[0, 0])).astype(jnp.int32), 0, ncx - 1)
    cy = jnp.clip(jnp.floor(
        wrapped[:, 1] * (ncy / box[1, 1])).astype(jnp.int32), 0, ncy - 1)
    cz = jnp.clip(jnp.floor(
        wrapped[:, 2] * (ncz / box[2, 2])).astype(jnp.int32), 0, ncz - 1)
    if brick:
        bx, ox = cx // 2, cx % 2
        by, oy = cy // 2, cy % 2
        bz, oz = cz // 2, cz % 2
        nby = (ncy + 1) // 2
        nbz = (ncz + 1) // 2
        by_eff = jnp.where(bx % 2 == 1, nby - 1 - by, by)
        col = bx * nby + by_eff
        bz_eff = jnp.where(col % 2 == 1, nbz - 1 - bz, bz)
        brick_key = col * nbz + bz_eff
        key = brick_key * 8 + (ox * 4 + oy * 2 + oz)
    else:
        cy_eff = jnp.where(cx % 2 == 1, ncy - 1 - cy, cy)
        col = cx * ncy + cy_eff
        cz_eff = jnp.where(col % 2 == 1, ncz - 1 - cz, cz)
        key = col * ncz + cz_eff
    pad_flag = jnp.arange(n_pad, dtype=jnp.int32) >= n_real
    return jnp.where(pad_flag, jnp.iinfo(jnp.int32).max, key)


def needs_rebuild(pos, ref_pos, skin):
    """True when any atom moved more than skin/2 since the last list build
    (the reference's motion predicate, findInteractingBlocks.cu:55-79)."""
    d = pos - ref_pos
    max_d2 = jnp.max(jnp.sum(d * d, axis=-1))
    return max_d2 > (0.5 * skin) ** 2


def build_row_state(pos, box, n_real, reach, max_cols, block=64,
                    periodic=False, sort_cell=None):
    """Build the persistent tile-candidate state: spatial sort + block
    bounding boxes + per-row-block candidate block lists culled at
    `reach` = cutoff + skin (findInteractingBlocks.cu:7-180 recast with
    static shapes).

    Returns a dict {order, inv_order, cand, cand_valid, overflow}; reused
    across steps until the motion predicate fires.
    """
    n_pad = pos.shape[0]
    assert n_pad % block == 0
    nb = n_pad // block

    # ---- spatial sort (role of the Hilbert reorder, ComputeContext.cpp:430)
    if periodic:
        # work on wrapped coordinates: atoms drift outside the primary cell
        # during dynamics, and unwrapped positions blow up the block bounding
        # boxes of boundary cells (every distance below is min-image anyway)
        pos = geom.wrap_into_box(pos, box)
    if sort_cell is not None:
        keys = spatial_sort_keys(pos, box, n_real, sort_cell)
        order = jnp.argsort(keys).astype(jnp.int32)
    else:
        order = jnp.arange(n_pad, dtype=jnp.int32)
    inv_order = jnp.argsort(order).astype(jnp.int32)
    pos_s = pos[order]
    if n_real < n_pad:
        pos_s = pos_s.at[n_real:].set(pos_s[n_real - 1])

    blocks = pos_s.reshape(nb, block, 3)
    bmin = jnp.min(blocks, axis=1)
    bmax = jnp.max(blocks, axis=1)
    centers = 0.5 * (bmin + bmax)
    half = 0.5 * (bmax - bmin)
    d = centers[:, None, :] - centers[None, :, :]
    if periodic:
        d = geom.periodic_delta(d, box)
    gap = jnp.maximum(jnp.abs(d) - (half[:, None, :] + half[None, :, :]), 0.0)
    close = jnp.sum(gap * gap, axis=-1) < reach * reach     # (nb, nb)
    col_order = jnp.argsort(~close, axis=1, stable=True)
    cand = col_order[:, :max_cols].astype(jnp.int32)        # (nb, max_cols)
    cand_valid = jnp.take_along_axis(close, cand, axis=1)
    overflow = (jnp.sum(close.astype(jnp.int32))
                - jnp.sum(cand_valid.astype(jnp.int32))).astype(jnp.int32)
    return {"order": order, "inv_order": inv_order, "cand": cand,
            "cand_valid": cand_valid, "overflow": overflow}


def rows_ef_from_state(pos, box, st, pair_ef_fn, per_atom, exclusions,
                       n_real, cutoff, block=64, periodic=False,
                       accum_dtype=jnp.float32, mesh=None):
    """Tile sweep over a prebuilt candidate state (build_row_state).

    pair_ef_fn(r2_safe, pi, pj) -> (e, dE/dr2), both (..., B, B).
    Returns (energy, forces (n_pad, 3)).

    With a mesh, the ROW-BLOCK dimension is sharded via shard_map: column
    data (positions/parameters of every block) stays replicated, each
    device sweeps its row range, and forces come back row-partitioned —
    the reference's broadcast-posq / setAtomBlockRange / reduce scheme
    (CudaParallelKernels.cpp:66-248) with the reduction implied by the
    output sharding.
    """
    n_pad = pos.shape[0]
    assert n_pad % block == 0
    nb = n_pad // block
    order = st["order"]
    inv_order = st["inv_order"]
    cand = st["cand"]
    cand_valid = st["cand_valid"]
    max_cols = cand.shape[1]

    if periodic:
        pos = geom.wrap_into_box(pos, box)
    pos_s = pos[order]
    if n_real < n_pad:
        pos_s = pos_s.at[n_real:].set(pos_s[n_real - 1])
    per_atom_s = {k: v[order] for k, v in per_atom.items()}
    excl_s = exclusions[order] if exclusions is not None else None
    orig_id = order

    blocks = pos_s.reshape(nb, block, 3)
    par_blocks = {k: v.reshape(nb, block, *v.shape[1:])
                  for k, v in per_atom_s.items()}
    if excl_s is None:
        excl_blocks = jnp.full((nb, block, 1), -1, jnp.int32)
    else:
        excl_blocks = excl_s.reshape(nb, block, excl_s.shape[1])
    gid_blocks = orig_id.reshape(nb, block)
    slot = jnp.arange(n_pad, dtype=jnp.int32).reshape(nb, block)

    # per-component coordinate planes (avoids (nb, B, B, 3) tensors whose
    # 3-wide trailing axis wastes VPU lanes)
    bx = blocks[:, :, 0]
    by = blocks[:, :, 1]
    bz = blocks[:, :, 2]

    # column-side (replicated under sharding) and row-side (shardable)
    C = {"bx": bx, "by": by, "bz": bz, "slot": slot, "gid": gid_blocks,
         "par": par_blocks}
    R = {"bx": bx, "by": by, "bz": bz, "slot": slot, "excl": excl_blocks,
         "par": par_blocks, "cand": cand, "valid": cand_valid}

    def core(R, C):
        def col_step(carry, k):
            e_acc, fx_acc, fy_acc, fz_acc = carry
            bj = R["cand"][:, k]                            # (nbl,)
            valid = R["valid"][:, k]                        # (nbl,) bool
            gid_j = C["gid"][bj]
            slot_j = C["slot"][bj]
            dx = R["bx"][:, :, None] - C["bx"][bj][:, None, :]
            dy = R["by"][:, :, None] - C["by"][bj][:, None, :]
            dz = R["bz"][:, :, None] - C["bz"][bj][:, None, :]
            if periodic:
                # staged triclinic reduction, component-wise
                sc = jnp.round(dz / box[2, 2])
                dx = dx - sc * box[2, 0]
                dy = dy - sc * box[2, 1]
                dz = dz - sc * box[2, 2]
                sb = jnp.round(dy / box[1, 1])
                dx = dx - sb * box[1, 0]
                dy = dy - sb * box[1, 1]
                sa = jnp.round(dx / box[0, 0])
                dx = dx - sa * box[0, 0]
            r2 = dx * dx + dy * dy + dz * dz
            rslot = R["slot"]
            mask = (rslot[:, :, None] != slot_j[:, None, :]) \
                & (rslot[:, :, None] < n_real) \
                & (slot_j[:, None, :] < n_real) \
                & valid[:, None, None]
            is_excl = jnp.any(
                R["excl"][:, :, :, None] == gid_j[:, None, None, :], axis=2)
            mask = mask & ~is_excl
            r2_safe = jnp.where(mask, r2, 1.0)
            pi = {k2: v[:, :, None] for k2, v in R["par"].items()}
            pj = {k2: v[bj][:, None, :] for k2, v in C["par"].items()}
            e, dedr2 = pair_ef_fn(r2_safe, pi, pj)
            e = jnp.where(mask, e, 0.0)
            dedr2 = jnp.where(mask, dedr2, 0.0).astype(pos.dtype)
            fx = -2.0 * jnp.sum(dedr2 * dx, axis=2)
            fy = -2.0 * jnp.sum(dedr2 * dy, axis=2)
            fz = -2.0 * jnp.sum(dedr2 * dz, axis=2)
            e_tile = jnp.sum(e.astype(accum_dtype))
            return (e_acc + e_tile, fx_acc + fx.astype(pos.dtype),
                    fy_acc + fy.astype(pos.dtype),
                    fz_acc + fz.astype(pos.dtype)), None

        nbl = R["bx"].shape[0]
        zf = jnp.zeros((nbl, block), pos.dtype)
        (e2, fx_b, fy_b, fz_b), _ = jax.lax.scan(
            col_step,
            (jnp.zeros((), accum_dtype), zf, zf, zf),
            jnp.arange(max_cols, dtype=jnp.int32))
        return e2, fx_b, fy_b, fz_b

    if mesh is None:
        energy2, fx_b, fy_b, fz_b = core(R, C)
    else:
        import jax.tree_util as jtu
        from jax.sharding import PartitionSpec as P
        from jax.experimental.shard_map import shard_map
        from ..parallel.mesh import AXIS
        n_dev = mesh.devices.size
        nbl = -(-nb // n_dev)
        padb = nbl * n_dev - nb
        if padb:
            def padrow(x, fill=0):
                cfg = [(0, padb)] + [(0, 0)] * (x.ndim - 1)
                return jnp.pad(x, cfg, constant_values=fill)
            R = dict(R)
            R["bx"] = padrow(R["bx"])
            R["by"] = padrow(R["by"])
            R["bz"] = padrow(R["bz"])
            # padded row atoms carry slot >= n_real -> masked out
            R["slot"] = padrow(R["slot"], fill=n_pad)
            R["excl"] = padrow(R["excl"], fill=-1)
            R["par"] = {k: padrow(v) for k, v in R["par"].items()}
            R["cand"] = padrow(R["cand"])
            R["valid"] = padrow(R["valid"], fill=False)

        def core_sharded(R, C):
            e2, fx_b, fy_b, fz_b = core(R, C)
            return jax.lax.psum(e2, AXIS), fx_b, fy_b, fz_b

        rspec = jtu.tree_map(lambda _: P(AXIS), R)
        cspec = jtu.tree_map(lambda _: P(), C)
        energy2, fx_b, fy_b, fz_b = shard_map(
            core_sharded, mesh=mesh,
            in_specs=(rspec, cspec),
            out_specs=(P(), P(AXIS), P(AXIS), P(AXIS)),
            check_rep=False)(R, C)
        if padb:
            fx_b = fx_b[:nb]
            fy_b = fy_b[:nb]
            fz_b = fz_b[:nb]

    energy = 0.5 * energy2
    forces = jnp.stack([fx_b.reshape(n_pad), fy_b.reshape(n_pad),
                        fz_b.reshape(n_pad)], axis=-1)[inv_order]
    return energy, forces


def pair_energy_force_rows(pos, box, pair_ef_fn, per_atom, exclusions,
                           n_real, cutoff, max_cols, block=64, periodic=False,
                           accum_dtype=jnp.float32, sort_cell=None,
                           mesh=None):
    """One-shot build + sweep (the original per-step API): direct-space
    energy AND analytic forces, scatter-free. The warp row kernel
    (nonbonded.cu:106) recast for the VPU. Returns (energy, forces,
    overflow)."""
    st = build_row_state(pos, box, n_real, cutoff, max_cols, block=block,
                         periodic=periodic, sort_cell=sort_cell)
    e, f = rows_ef_from_state(pos, box, st, pair_ef_fn, per_atom, exclusions,
                              n_real, cutoff, block=block, periodic=periodic,
                              accum_dtype=accum_dtype, mesh=mesh)
    return e, f, st["overflow"]
