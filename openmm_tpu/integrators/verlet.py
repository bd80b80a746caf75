"""Leapfrog Verlet integrator.

Math per platforms/common/src/kernels/verlet.cc:5-41 and
ReferenceVerletDynamics.cpp: half-kick accumulate into velocity, tentative
position delta, constrain delta, recover velocity from constrained delta.
"""
from __future__ import annotations

import jax.numpy as jnp

from .base import Integrator, commit_positions, twoprod, twosum


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
            # Velocity recovery from the CONSTRAINT CORRECTION only.  The
            # textbook (new_pos - pos)/dt re-derives velocity from rounded
            # hi-plane positions: the position-commit rounding r ~ eps*|x|
            # (captured in pos_lo for positions, invisible to velocities)
            # becomes a random velocity kick r/dt every step -- a direct KE
            # injection that scales with BOX SIZE, measured at +0.7 kT/dof/ns
            # on 512 LJ argon (vs +1e-5 on the f64 oracle).  corr is exactly
            # zero on unconstrained atoms (and computed at displacement
            # scale by the f64 SETTLE solve), so unconstrained dynamics
            # inherit the analytic kick velocity with NO re-derivation
            # noise; position jitter (r stays in positions only) feeds back
            # merely as eps-scale force noise, ~1e-13 kT/dof/step.  The
            # reference gets the same effect by loading full mixed hi+lo
            # positions in its recovery (common/src/kernels/verlet.cc,
            # mixed4 loadPos).
            new_pos, corr = deps.apply_position_constraints_corr(
                pos, new_pos_raw)
            state = dict(state)
            if corr is None:
                vhi = jnp.where(moving, vnew, vel)
                if vlo is not None:
                    state["vel_lo"] = jnp.where(moving, vlo_new, vlo)
            else:
                cv = corr / dt
                if vlo is not None:
                    # capture the division rounding of corr/dt exactly
                    # (Dekker two-product; fl(cv*dt) rounds at eps/2*|corr|)
                    # so the (hi, lo) velocity stays faithful to the
                    # constrained move
                    p, perr = twoprod(cv, dt)
                    cv_resid = ((corr - p) - perr) / dt
                    vhi, e3 = twosum(vnew, cv)
                    vlo_out = vlo_new + e3 + cv_resid
                    vhi = jnp.where(moving, vhi, vel)
                    state["vel_lo"] = jnp.where(moving, vlo_out, vlo)
                else:
                    vhi = jnp.where(moving, vnew + cv, vel)
            new_pos = deps.compute_vsites(new_pos)
            state = commit_positions(state, pos, new_pos,
                                     extra_lo=delta_lo)
            state["velocities"] = vhi
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
