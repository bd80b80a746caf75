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
