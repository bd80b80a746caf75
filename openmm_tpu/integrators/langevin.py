"""Langevin-family integrators: legacy leapfrog Langevin, LangevinMiddle
(LFMiddle / BAOAB), and Brownian (overdamped).

Math per platforms/common/src/kernels/langevin.cc (vscale=exp(-dt*g),
fscale=(1-vscale)/g, noisescale=sqrt(kT(1-vscale^2))),
langevinMiddle.cc:7-95 (B kick, constrain velocities, A-O-A with position
constraint + velocity recovery) with the execute order of
CommonIntegrateLangevinMiddleStepKernel (CommonKernels.cpp:5429-5494), and
brownian.cc (posDelta = (dt/g) f/m + sqrt(2 kT dt/g) xi/sqrt(m)).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import unit as u
from ..constants import BOLTZ
from ..exceptions import OpenMMException
from .base import Integrator, commit_positions


class _StochasticMixin:
    def getTemperature(self):
        return u.Quantity(self._temperature, u.kelvin)

    def setTemperature(self, temp):
        self._temperature = float(u.strip(temp, u.kelvin))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getFriction(self):
        return u.Quantity(self._friction, u.picosecond ** -1)

    def setFriction(self, friction):
        self._friction = float(u.strip(friction, u.picosecond ** -1))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getRandomNumberSeed(self):
        return self._seed

    def setRandomNumberSeed(self, seed):
        self._seed = int(seed)


class LangevinIntegrator(_StochasticMixin, Integrator):
    """Legacy leapfrog Langevin (theory 04_integrators.rst)."""

    def __init__(self, temperature, frictionCoeff, stepSize):
        super().__init__(stepSize)
        self._temperature = float(u.strip(temperature, u.kelvin))
        self._friction = float(u.strip(frictionCoeff, u.picosecond ** -1))

    def _integrator_params(self):
        return {"dt": self._step_size, "temperature": self._temperature,
                "friction": self._friction}

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
            dt = ip["dt"].astype(pos.dtype)
            gamma = ip["friction"].astype(pos.dtype)
            kT = (BOLTZ * ip["temperature"]).astype(pos.dtype)
            vscale = jnp.exp(-dt * gamma)
            # (1-vscale)/gamma, with the gamma->0 limit dt
            fscale = jnp.where(gamma == 0, dt, (1.0 - vscale) / jnp.where(gamma == 0, 1.0, gamma))
            noisescale = jnp.sqrt(kT * (1.0 - vscale * vscale))
            key, sub = jax.random.split(state["key"])
            xi = jax.random.normal(sub, pos.shape, dtype=pos.dtype)
            _, forces = deps.force_fn(pos, state["box"], params_list, state["gp"],
                                      state["faux"])
            vnew = vscale * vel + fscale * forces * inv_m + noisescale * sqrt_inv_m * xi
            delta = vnew * dt
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            # velocity recovery from the constraint correction only: the
            # (new_pos - pos)/dt form injects an eps*|x|/dt velocity kick
            # per step from the position-commit rounding (see verlet.py)
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
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step


class LangevinMiddleIntegrator(_StochasticMixin, Integrator):
    """LFMiddle / BAOAB discretization (LangevinMiddleIntegrator.cpp:78)."""

    def __init__(self, temperature, frictionCoeff, stepSize):
        super().__init__(stepSize)
        self._temperature = float(u.strip(temperature, u.kelvin))
        self._friction = float(u.strip(frictionCoeff, u.picosecond ** -1))

    def _integrator_params(self):
        return {"dt": self._step_size, "temperature": self._temperature,
                "friction": self._friction}

    def _kinetic_energy_shift(self):
        return 0.0

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
            dt = ip["dt"].astype(pos.dtype)
            gamma = ip["friction"].astype(pos.dtype)
            kT = (BOLTZ * ip["temperature"]).astype(pos.dtype)
            vscale = jnp.exp(-dt * gamma)
            noisescale = jnp.sqrt(kT * (1.0 - vscale * vscale))
            key, sub = jax.random.split(state["key"])
            xi = jax.random.normal(sub, pos.shape, dtype=pos.dtype)
            # B: full kick
            _, forces = deps.force_fn(pos, state["box"], params_list, state["gp"],
                                      state["faux"])
            v = vel + dt * forces * inv_m
            v = jnp.where(moving, v, vel)
            # RATTLE velocities before the O step (kernel order: part1,
            # applyVelocityConstraints, part2, applyConstraints, part3)
            v = deps.apply_velocity_constraints(pos, v)
            # A half, O, A half
            delta = 0.5 * dt * v
            v_o = vscale * v + noisescale * sqrt_inv_m * xi
            v_o = jnp.where(moving, v_o, v)
            delta = delta + 0.5 * dt * v_o
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            # velocity recovery from the constraint correction only (the
            # (new_pos - pos - delta)/dt form still carries the eps*|x|
            # position-commit rounding, see verlet.py)
            new_pos, corr = deps.apply_position_constraints_corr(
                pos, new_pos_raw)
            v_final = v_o if corr is None \
                else v_o + jnp.where(moving, corr / dt, 0.0)
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state = commit_positions(state, pos, new_pos)
            state["velocities"] = v_final
            state["key"] = key
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step


class BrownianIntegrator(_StochasticMixin, Integrator):
    """Overdamped Brownian dynamics (brownian.cc)."""

    def __init__(self, temperature, frictionCoeff, stepSize):
        super().__init__(stepSize)
        self._temperature = float(u.strip(temperature, u.kelvin))
        self._friction = float(u.strip(frictionCoeff, u.picosecond ** -1))

    def _integrator_params(self):
        return {"dt": self._step_size, "temperature": self._temperature,
                "friction": self._friction}

    def _kinetic_energy_shift(self):
        return 0.0

    def _make_step_fn(self, deps):
        inv_m = deps.inv_masses[:, None]
        moving = (deps.inv_masses != 0)[:, None]
        sqrt_inv_m = jnp.sqrt(deps.inv_masses)[:, None]

        def step(state, params_list):
            for hook, pidx in deps.update_hooks:
                state = hook(state, params_list)
            pos = state["positions"]
            ip = state["iparams"]
            dt = ip["dt"].astype(pos.dtype)
            gamma = ip["friction"].astype(pos.dtype)
            kT = (BOLTZ * ip["temperature"]).astype(pos.dtype)
            tau_dt = dt / gamma
            noise_amp = jnp.sqrt(2.0 * kT * tau_dt)
            key, sub = jax.random.split(state["key"])
            xi = jax.random.normal(sub, pos.shape, dtype=pos.dtype)
            _, forces = deps.force_fn(pos, state["box"], params_list, state["gp"],
                                      state["faux"])
            delta = tau_dt * forces * inv_m + noise_amp * sqrt_inv_m * xi
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            new_pos, corr = deps.apply_position_constraints_corr(
                pos, new_pos_raw)
            dmove = delta if corr is None else delta + corr
            vnew = jnp.where(moving, dmove / dt, state["velocities"])
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state = commit_positions(state, pos, new_pos)
            state["velocities"] = vnew
            state["key"] = key
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
