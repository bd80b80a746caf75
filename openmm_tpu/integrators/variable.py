"""Adaptive-timestep integrators: VariableVerlet and VariableLangevin.

Step-size selection per platforms/common/src/kernels/verlet.cc:92
(selectVerletStepSize): dt = sqrt(errorTol / sqrt(mean |f/m|^2)), clamped to
at most double the previous dt, held constant within 10% growth, capped by
maxStepSize. The dt lives in the state pytree, so the adaptive loop stays
fully on-device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import unit as u
from ..constants import BOLTZ
from .base import Integrator, commit_positions
from .langevin import _StochasticMixin


def _select_step_size(forces, inv_m, old_dt, error_tol, max_dt):
    n = forces.shape[0]
    err = jnp.sum((forces * inv_m[:, None]) ** 2)
    total_error = jnp.sqrt(err / (n * 3))
    new_dt = jnp.sqrt(error_tol / total_error)
    new_dt = jnp.where(old_dt > 0, jnp.minimum(new_dt, old_dt * 2.0), new_dt)
    new_dt = jnp.where((new_dt > old_dt) & (new_dt < 1.1 * old_dt), old_dt, new_dt)
    return jnp.minimum(new_dt, max_dt)


class VariableVerletIntegrator(Integrator):
    def __init__(self, errorTol):
        super().__init__(0.0)
        self._error_tol = float(errorTol)
        self._max_step_size = 10.0  # ps; effectively unbounded default

    def getErrorTolerance(self):
        return self._error_tol

    def setErrorTolerance(self, tol):
        self._error_tol = float(tol)
        if self._context is not None:
            self._context._sync_integrator_params()

    def getMaximumStepSize(self):
        return u.Quantity(self._max_step_size, u.picosecond)

    def setMaximumStepSize(self, size):
        self._max_step_size = float(u.strip(size, u.picosecond))
        if self._context is not None:
            self._context._sync_integrator_params()

    def _integrator_params(self):
        return {"dt": self._step_size, "errorTol": self._error_tol,
                "maxStepSize": self._max_step_size}

    def _make_step_fn(self, deps):
        inv_m = deps.inv_masses[:, None]
        moving = (deps.inv_masses != 0)[:, None]

        def step(state, params_list):
            for hook, pidx in deps.update_hooks:
                state = hook(state, params_list)
            pos = state["positions"]
            vel = state["velocities"]
            ip = state["iparams"]
            _, forces = deps.force_fn(pos, state["box"], params_list, state["gp"],
                                      state["faux"])
            dt = _select_step_size(forces, deps.inv_masses,
                                   ip["dt"].astype(pos.dtype),
                                   ip["errorTol"].astype(pos.dtype),
                                   ip["maxStepSize"].astype(pos.dtype))
            vnew = vel + dt * forces * inv_m
            delta = vnew * dt
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            # constraint-correction-only velocity recovery (see verlet.py:
            # (new_pos - pos)/dt injects an eps*|x|/dt kick per step)
            new_pos, corr = deps.apply_position_constraints_corr(
                pos, new_pos_raw)
            if corr is not None:
                vnew = vnew + corr / dt
            vnew = jnp.where(moving, vnew, vel)
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state = commit_positions(state, pos, new_pos)
            state["velocities"] = vnew
            state["iparams"] = dict(ip, dt=dt.astype(ip["dt"].dtype))
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step


class VariableLangevinIntegrator(_StochasticMixin, Integrator):
    def __init__(self, temperature, frictionCoeff, errorTol):
        super().__init__(0.0)
        self._temperature = float(u.strip(temperature, u.kelvin))
        self._friction = float(u.strip(frictionCoeff, u.picosecond ** -1))
        self._error_tol = float(errorTol)
        self._max_step_size = 10.0

    def getErrorTolerance(self):
        return self._error_tol

    def setErrorTolerance(self, tol):
        self._error_tol = float(tol)
        if self._context is not None:
            self._context._sync_integrator_params()

    def getMaximumStepSize(self):
        return u.Quantity(self._max_step_size, u.picosecond)

    def setMaximumStepSize(self, size):
        self._max_step_size = float(u.strip(size, u.picosecond))
        if self._context is not None:
            self._context._sync_integrator_params()

    def _integrator_params(self):
        return {"dt": self._step_size, "temperature": self._temperature,
                "friction": self._friction, "errorTol": self._error_tol,
                "maxStepSize": self._max_step_size}

    def _make_step_fn(self, deps):
        inv_m = deps.inv_masses[:, None]
        moving = (deps.inv_masses != 0)[:, None]
        sqrt_inv_m = jnp.sqrt(deps.inv_masses)[:, None]

        def step(state, params_list):
            for hook, pidx in deps.update_hooks:
                state = hook(state, params_list)
            pos = state["positions"]
            vel = state["velocities"]
            ip = state["iparams"]
            gamma = ip["friction"].astype(pos.dtype)
            kT = (BOLTZ * ip["temperature"]).astype(pos.dtype)
            _, forces = deps.force_fn(pos, state["box"], params_list, state["gp"],
                                      state["faux"])
            dt = _select_step_size(forces, deps.inv_masses,
                                   ip["dt"].astype(pos.dtype),
                                   ip["errorTol"].astype(pos.dtype),
                                   ip["maxStepSize"].astype(pos.dtype))
            vscale = jnp.exp(-dt * gamma)
            fscale = jnp.where(gamma == 0, dt,
                               (1.0 - vscale) / jnp.where(gamma == 0, 1.0, gamma))
            noisescale = jnp.sqrt(kT * (1.0 - vscale * vscale))
            key, sub = jax.random.split(state["key"])
            xi = jax.random.normal(sub, pos.shape, dtype=pos.dtype)
            vnew = vscale * vel + fscale * forces * inv_m + noisescale * sqrt_inv_m * xi
            delta = vnew * dt
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            new_pos, corr = deps.apply_position_constraints_corr(
                pos, new_pos_raw)
            if corr is not None:
                vnew = vnew + corr / dt
            vnew = jnp.where(moving, vnew, vel)
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state = commit_positions(state, pos, new_pos)
            state["velocities"] = vnew
            state["key"] = key
            state["iparams"] = dict(ip, dt=dt.astype(ip["dt"].dtype))
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
