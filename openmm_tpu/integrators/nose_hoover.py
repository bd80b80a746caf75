"""NoseHooverIntegrator: MTK chain thermostat with Yoshida-Suzuki splitting.

Math per the reference (openmmapi/src/NoseHooverIntegrator.cpp, chain
propagation kernels platforms/common/src/kernels/noseHooverChain.cc:2-154,
theory docs 04_integrators.rst): LangevinMiddle-style splitting where the O
step is replaced by deterministic chain propagation that rescales velocities.
Chain masses Q_1 = N_f kT tau^2, Q_k = kT tau^2 with tau = 1/frequency.

This round supports the default full-system thermostat (subset/Drude-pair
thermostats land with the Drude plugin).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import unit as u
from ..constants import BOLTZ
from .base import Integrator, commit_positions

_YS_WEIGHTS = {
    1: [1.0],
    3: [0.828981543588751, -0.657963087177502, 0.828981543588751],
    5: [0.2967324292201065, 0.2967324292201065, -0.186929716880426,
        0.2967324292201065, 0.2967324292201065],
    7: [0.784513610477560, 0.235573213359357, -1.17767998417887,
        1.31518632068391, -1.17767998417887, 0.235573213359357,
        0.784513610477560],
}


def propagate_chain(ke2, chain_pos, chain_vel, kT, dof, dt, tau, n_mts,
                    ys_order):
    """Propagate the Nose-Hoover chain; returns (scale, new_pos, new_vel).
    ke2 = 2 * kinetic energy of the thermostated DOFs."""
    m = chain_pos.shape[0]
    q = jnp.full((m,), kT * tau * tau, ke2.dtype)
    q = q.at[0].multiply(dof)
    weights = _YS_WEIGHTS[ys_order]
    scale = jnp.ones((), ke2.dtype)

    for _ in range(n_mts):
        for w in weights:
            wdt = w * dt / n_mts
            # cascade from the top of the chain down
            kes = [None] * m
            kes[0] = ke2
            # top bead force
            for bead in range(m - 1, -1, -1):
                if bead == 0:
                    g = (ke2 - dof * kT) / q[0]
                else:
                    g = (q[bead - 1] * chain_vel[bead - 1] ** 2 - kT) / q[bead]
                if bead == m - 1:
                    chain_vel = chain_vel.at[bead].add(0.25 * wdt * g)
                else:
                    ef = jnp.exp(-0.125 * wdt * chain_vel[bead + 1])
                    chain_vel = chain_vel.at[bead].set(
                        ef * (ef * chain_vel[bead] + 0.25 * wdt * g))
            # scale the particle velocities
            s = jnp.exp(-0.5 * wdt * chain_vel[0])
            scale = scale * s
            ke2 = ke2 * s * s
            chain_pos = chain_pos + 0.5 * wdt * chain_vel
            # cascade back up
            for bead in range(m):
                if bead == 0:
                    g = (ke2 - dof * kT) / q[0]
                else:
                    g = (q[bead - 1] * chain_vel[bead - 1] ** 2 - kT) / q[bead]
                if bead == m - 1:
                    chain_vel = chain_vel.at[bead].add(0.25 * wdt * g)
                else:
                    ef = jnp.exp(-0.125 * wdt * chain_vel[bead + 1])
                    chain_vel = chain_vel.at[bead].set(
                        ef * (ef * chain_vel[bead] + 0.25 * wdt * g))
    return scale, chain_pos, chain_vel


class NoseHooverIntegrator(Integrator):
    def __init__(self, temperature=298.0, collisionFrequency=50.0,
                 stepSize=0.001, chainLength=3, numMTS=3, numYoshidaSuzuki=7):
        # support both NoseHooverIntegrator(stepSize) and the full signature
        if collisionFrequency is None:
            stepSize, temperature = temperature, 298.0
            collisionFrequency = 50.0
        super().__init__(stepSize)
        self._temperature = float(u.strip(temperature, u.kelvin))
        self._frequency = float(u.strip(collisionFrequency, u.picosecond ** -1))
        self._chain_length = int(chainLength)
        self._n_mts = int(numMTS)
        self._n_ys = int(numYoshidaSuzuki)
        if self._n_ys not in _YS_WEIGHTS:
            raise ValueError("numYoshidaSuzuki must be 1, 3, 5, or 7")

    def getTemperature(self):
        return u.Quantity(self._temperature, u.kelvin)

    def setTemperature(self, temp):
        self._temperature = float(u.strip(temp, u.kelvin))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getCollisionFrequency(self):
        return u.Quantity(self._frequency, u.picosecond ** -1)

    def setCollisionFrequency(self, freq):
        self._frequency = float(u.strip(freq, u.picosecond ** -1))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getNumThermostats(self):
        return 1

    def computeHeatBathEnergy(self):
        """Energy of the heat bath (for conserved-quantity checks)."""
        if self._context is None:
            return u.Quantity(0.0, u.kilojoule_per_mole)
        aux = self._context._state["aux"]
        import numpy as np
        cp = np.asarray(aux["nh_pos"])
        cv = np.asarray(aux["nh_vel"])
        kT = BOLTZ * self._temperature
        tau = 1.0 / self._frequency
        deps = self._context._deps
        dof = float(np.sum(np.asarray(deps.inv_masses) != 0) * 3
                    - len(self._context._system._constraints))
        q = np.full(len(cp), kT * tau * tau)
        q[0] *= dof
        e = 0.5 * np.sum(q * cv * cv) + dof * kT * cp[0] \
            + kT * np.sum(cp[1:])
        return u.Quantity(float(e), u.kilojoule_per_mole)

    def _integrator_params(self):
        return {"dt": self._step_size, "temperature": self._temperature,
                "frequency": self._frequency}

    def _kinetic_energy_shift(self):
        return 0.0

    def _init_aux(self, deps):
        m = self._chain_length
        return {"nh_pos": jnp.zeros((m,), deps.dtype),
                "nh_vel": jnp.zeros((m,), deps.dtype)}

    def _make_step_fn(self, deps):
        inv_m = deps.inv_masses[:, None]
        moving = (deps.inv_masses != 0)[:, None]
        masses = deps.masses
        import numpy as np
        n_constraints = 0
        dof = float(np.sum(np.asarray(deps.inv_masses) != 0)) * 3.0
        chain_length = self._chain_length
        n_mts = self._n_mts
        n_ys = self._n_ys

        def step(state, params_list):
            for hook, pidx in deps.update_hooks:
                state = hook(state, params_list)
            pos = state["positions"]
            vel = state["velocities"]
            ip = state["iparams"]
            dt = ip["dt"].astype(pos.dtype)
            kT = (BOLTZ * ip["temperature"]).astype(pos.dtype)
            tau = 1.0 / ip["frequency"].astype(pos.dtype)
            aux = state["aux"]
            # B: full kick
            _, forces = deps.force_fn(pos, state["box"], params_list,
                                      state["gp"], state["faux"])
            v = vel + dt * forces * inv_m
            v = jnp.where(moving, v, vel)
            v = deps.apply_velocity_constraints(pos, v)
            # A half
            delta = 0.5 * dt * v
            # thermostat (replaces the O step)
            ke2 = jnp.sum(masses[:, None] * v * v)
            scale, nh_pos, nh_vel = propagate_chain(
                ke2, aux["nh_pos"], aux["nh_vel"], kT, dof, dt, tau, n_mts,
                n_ys)
            v = jnp.where(moving, v * scale, v)
            # A half
            delta = delta + 0.5 * dt * v
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            new_pos = deps.apply_position_constraints(pos, new_pos_raw)
            v = v + jnp.where(moving,
                              (new_pos - pos - jnp.where(moving, delta, 0.0)) / dt,
                              0.0)
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state = commit_positions(state, pos, new_pos)
            state["velocities"] = v
            state["aux"] = dict(aux, nh_pos=nh_pos, nh_vel=nh_vel)
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
