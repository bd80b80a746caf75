"""Device-mesh configuration and the sharded pairwise engine."""
from __future__ import annotations

import numpy as np

_DEFAULT_MESH = None
AXIS = "dp"


def make_mesh(n_devices=None, devices=None):
    import jax
    from jax.sharding import Mesh
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def set_default_mesh(mesh):
    """Install a mesh; Contexts created afterwards shard their pairwise
    sweeps across it. Pass None to return to single-device execution."""
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def get_default_mesh():
    return _DEFAULT_MESH


def sharded_pair_energy(mesh, tile_energy_fn, bi_arr, bj_arr, accum_dtype,
                        weights=None):
    """Sum tile_energy_fn(bi, bj) over all block pairs, sharded over the mesh.

    tile_energy_fn closes over replicated positions/params (the reference's
    broadcast-posq step); each device scans its shard of the block-pair list
    (the setAtomBlockRange partition) and the partial energies are psum'd
    (the sumForces reduction, CudaParallelKernels.cpp:166).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = mesh.devices.size
    n_pairs = bi_arr.shape[0]
    if weights is None:
        weights = jnp.ones(n_pairs, accum_dtype)
    pad = (-n_pairs) % n_dev
    if pad:
        # padding pairs replay pair (0, 0) and are masked by weight 0
        bi_arr = jnp.concatenate([bi_arr, jnp.zeros(pad, bi_arr.dtype)])
        bj_arr = jnp.concatenate([bj_arr, jnp.zeros(pad, bj_arr.dtype)])
        weights = jnp.concatenate([weights, jnp.zeros(pad, accum_dtype)])
    k = bi_arr.shape[0] // n_dev
    sharding = NamedSharding(mesh, P(AXIS))
    bi2 = jax.lax.with_sharding_constraint(bi_arr.reshape(n_dev, k), sharding)
    bj2 = jax.lax.with_sharding_constraint(bj_arr.reshape(n_dev, k), sharding)
    w2 = jax.lax.with_sharding_constraint(weights.reshape(n_dev, k), sharding)

    # Auto-partitioned SPMD: the leading axis is sharded over the mesh, the
    # positions/parameters captured by tile_energy_fn stay replicated, and
    # the final sum lowers to an all-reduce — exactly the reference's
    # broadcast-posq / shard-tiles / reduce-forces scheme, chosen by GSPMD.
    def per_device(bis, bjs, ws):
        def body(acc, xs):
            bi, bj, w = xs
            return acc + tile_energy_fn(bi, bj) * w, None

        total, _ = jax.lax.scan(body, jnp.zeros((), accum_dtype),
                                (bis, bjs, ws))
        return total

    partials = jax.vmap(per_device)(bi2, bj2, w2)
    return jnp.sum(partials)
