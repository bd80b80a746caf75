"""Virtual site position computation and force redistribution.

Counterpart of ReferenceVirtualSites.cpp / the computeVirtualSites and
distributeForces kernels (platforms/common/src/kernels/virtualSites.cc).

In the TPU engine, virtual-site *positions* are computed by a pure function
pos -> pos after every position update. Force *redistribution* is free: since
energies are differentiated through the position computation (the energy fn
composes compute_vsites with the raw positions), jax.grad automatically
applies the chain rule that distributeForces implements by hand.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..system import (LocalCoordinatesSite, OutOfPlaneSite,
                      ThreeParticleAverageSite, TwoParticleAverageSite)


def make_vsite_updater(system, dtype):
    """Build pos -> pos that sets every virtual-site row from its parents.
    Returns None if the system has no virtual sites."""
    if not system._vsites:
        return None
    two, three, oop, local = [], [], [], []
    for index, vs in sorted(system._vsites.items()):
        if isinstance(vs, TwoParticleAverageSite):
            two.append((index, vs._particles[0], vs._particles[1],
                        vs.weights[0], vs.weights[1]))
        elif isinstance(vs, ThreeParticleAverageSite):
            three.append((index, *vs._particles, *vs.weights))
        elif isinstance(vs, OutOfPlaneSite):
            oop.append((index, *vs._particles, vs.weight12, vs.weight13,
                        vs.weightCross))
        elif isinstance(vs, LocalCoordinatesSite):
            local.append((index, vs))
        else:
            raise TypeError("unknown virtual site type: %r" % (vs,))

    # pack each family
    def arr(x, dt=np.float64):
        return np.asarray(x, dt)

    if two:
        a = arr(two)
        t_site = jnp.asarray(a[:, 0].astype(np.int32))
        t_p = jnp.asarray(a[:, 1:3].astype(np.int32))
        t_w = jnp.asarray(a[:, 3:5].astype(dtype))
    if three:
        a = arr(three)
        h_site = jnp.asarray(a[:, 0].astype(np.int32))
        h_p = jnp.asarray(a[:, 1:4].astype(np.int32))
        h_w = jnp.asarray(a[:, 4:7].astype(dtype))
    if oop:
        a = arr(oop)
        o_site = jnp.asarray(a[:, 0].astype(np.int32))
        o_p = jnp.asarray(a[:, 1:4].astype(np.int32))
        o_w = jnp.asarray(a[:, 4:7].astype(dtype))
    if local:
        l_site = jnp.asarray(np.asarray([x[0] for x in local], np.int32))
        max_np = max(len(x[1]._particles) for x in local)
        l_p = np.zeros((len(local), max_np), np.int32)
        l_ow = np.zeros((len(local), max_np))
        l_xw = np.zeros((len(local), max_np))
        l_yw = np.zeros((len(local), max_np))
        l_lp = np.zeros((len(local), 3))
        for r, (_, vs) in enumerate(local):
            k = len(vs._particles)
            l_p[r, :k] = vs._particles
            l_ow[r, :k] = vs.originWeights
            l_xw[r, :k] = vs.xWeights
            l_yw[r, :k] = vs.yWeights
            l_lp[r] = vs.localPosition
        l_p = jnp.asarray(l_p)
        l_ow = jnp.asarray(l_ow.astype(dtype))
        l_xw = jnp.asarray(l_xw.astype(dtype))
        l_yw = jnp.asarray(l_yw.astype(dtype))
        l_lp = jnp.asarray(l_lp.astype(dtype))

    def update(pos):
        if two:
            p = pos[t_p]                                   # (K,2,3)
            newp = jnp.sum(p * t_w[:, :, None], axis=1)
            pos = pos.at[t_site].set(newp)
        if three:
            p = pos[h_p]
            newp = jnp.sum(p * h_w[:, :, None], axis=1)
            pos = pos.at[h_site].set(newp)
        if oop:
            p1 = pos[o_p[:, 0]]
            r12 = pos[o_p[:, 1]] - p1
            r13 = pos[o_p[:, 2]] - p1
            cr = jnp.cross(r12, r13)
            newp = (p1 + o_w[:, 0:1] * r12 + o_w[:, 1:2] * r13
                    + o_w[:, 2:3] * cr)
            pos = pos.at[o_site].set(newp)
        if local:
            p = pos[l_p]                                    # (K,P,3)
            origin = jnp.sum(p * l_ow[:, :, None], axis=1)
            xdir = jnp.sum(p * l_xw[:, :, None], axis=1)
            ydir = jnp.sum(p * l_yw[:, :, None], axis=1)
            zdir = jnp.cross(xdir, ydir)
            # orthonormalize (VirtualSite.h LocalCoordinatesSite docs)
            znorm = zdir / jnp.linalg.norm(zdir, axis=-1, keepdims=True)
            xnorm = xdir / jnp.linalg.norm(xdir, axis=-1, keepdims=True)
            ynorm = jnp.cross(znorm, xnorm)
            newp = (origin + l_lp[:, 0:1] * xnorm + l_lp[:, 1:2] * ynorm
                    + l_lp[:, 2:3] * znorm)
            pos = pos.at[l_site].set(newp)
        return pos

    return update
