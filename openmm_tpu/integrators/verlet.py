"""Leapfrog Verlet integrator.

Math per platforms/common/src/kernels/verlet.cc:5-41 and
ReferenceVerletDynamics.cpp: half-kick accumulate into velocity, tentative
position delta, constrain delta, recover velocity from constrained delta.
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import Integrator, commit_positions, twosum


class VerletIntegrator(Integrator):
    # on the mixed profile the Context adds a vel_lo compensation plane so
    # the leapfrog velocity accumulates with ~f64-equivalent precision (the
    # mixed-precision double-velm semantics of the reference,
    # ComputeContext.h:309 / common/src/kernels/verlet.cc using mixed velm)
    _supports_vel_compensation = True

    def __init__(self, stepSize):
        super().__init__(stepSize)

    def _make_step_fn(self, deps):
        inv_m = deps.inv_masses[:, None]
        moving = (deps.inv_masses != 0)[:, None]

        def step(state, params_list):
            for hook, pidx in deps.update_hooks:
                state = hook(state, params_list)
            pos = state["positions"]
            vel = state["velocities"]
            vlo = state.get("vel_lo")
            dt = state["iparams"]["dt"].astype(pos.dtype)
            _, forces = deps.force_fn(pos, state["box"], params_list, state["gp"],
                                      state["faux"])
            kick = dt * forces * inv_m
            if vlo is None:
                vnew = vel + kick
                delta_lo = None
            else:
                # compensated half-kick: the rounding residual of the f32
                # velocity update rides in vel_lo; the step delta carries
                # both planes so positions see the full-precision velocity.
                # The inner kick+vlo sum must be a twosum as well: kick is
                # |v|-scale for hydrogens, so its addition rounding is the
                # SAME eps*|v| magnitude the outer compensation exists to
                # capture (dropping it measured as systematic NVE cooling)
                s1, e1 = twosum(kick, vlo)
                vnew, e2 = twosum(vel, s1)
                vlo_new = e1 + e2
                delta_lo = jnp.where(moving, vlo_new * dt, 0.0)
            delta = vnew * dt
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            new_pos = deps.apply_position_constraints(pos, new_pos_raw)
            # constrained delta: f32 subtraction of committed positions is
            # exact; the division residual goes back into vel_lo so the
            # (hi, lo) velocity pair stays faithful to the actual move
            dc = new_pos - pos
            vhi = jnp.where(moving, dc / dt, vel)
            if vlo is not None:
                vlo_new = jnp.where(
                    moving, (dc - vhi * dt) / dt + vlo_new, vlo)
                state = dict(state)
                state["vel_lo"] = vlo_new
            else:
                state = dict(state)
            new_pos = deps.compute_vsites(new_pos)
            state = commit_positions(state, pos, new_pos,
                                     extra_lo=delta_lo)
            state["velocities"] = vhi
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
