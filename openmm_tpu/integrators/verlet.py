"""Leapfrog Verlet integrator.

Math per platforms/common/src/kernels/verlet.cc:5-41 and
ReferenceVerletDynamics.cpp: half-kick accumulate into velocity, tentative
position delta, constrain delta, recover velocity from constrained delta.
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import Integrator, commit_positions


class VerletIntegrator(Integrator):
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
            dt = state["iparams"]["dt"].astype(pos.dtype)
            _, forces = deps.force_fn(pos, state["box"], params_list, state["gp"],
                                      state["faux"])
            vnew = vel + dt * forces * inv_m
            delta = vnew * dt
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            new_pos = deps.apply_position_constraints(pos, new_pos_raw)
            vnew = jnp.where(moving, (new_pos - pos) / dt, vel)
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state = commit_positions(state, pos, new_pos)
            state["velocities"] = vnew
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
