"""AndersenThermostat: random velocity redraws via an updateContextState hook.

Counterpart of openmmapi/include/openmm/AndersenThermostat.h /
internal/AndersenThermostatImpl.h:55 + kernel andersenThermostat.cc: each
step, every particle independently 'collides' with the heat bath with
probability 1-exp(-freq*dt) and gets a fresh Maxwell-Boltzmann velocity.
Temperature()/CollisionFrequency() are context global parameters, matching
the reference's naming contract.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import unit as u
from ..constants import BOLTZ
from .base import CompiledForce, Force


class AndersenThermostat(Force):
    @staticmethod
    def Temperature():
        return "AndersenTemperature"

    @staticmethod
    def CollisionFrequency():
        return "AndersenCollisionFrequency"

    def __init__(self, defaultTemperature, defaultCollisionFrequency):
        super().__init__()
        self._temperature = float(u.strip(defaultTemperature, u.kelvin))
        self._frequency = float(u.strip(defaultCollisionFrequency, u.picosecond ** -1))
        self._seed = 0

    def getDefaultTemperature(self):
        return u.Quantity(self._temperature, u.kelvin)

    def setDefaultTemperature(self, temp):
        self._temperature = float(u.strip(temp, u.kelvin))

    def getDefaultCollisionFrequency(self):
        return u.Quantity(self._frequency, u.picosecond ** -1)

    def setDefaultCollisionFrequency(self, freq):
        self._frequency = float(u.strip(freq, u.picosecond ** -1))

    def getRandomNumberSeed(self):
        return self._seed

    def setRandomNumberSeed(self, seed):
        self._seed = int(seed)

    def _compile(self, system, cfg):
        def update_state_fn(deps, state, params_list, aux):
            gp = state["gp"]
            temp = gp[AndersenThermostat.Temperature()]
            freq = gp[AndersenThermostat.CollisionFrequency()]
            dt = state["iparams"]["dt"].astype(cfg.dtype)
            p_collide = 1.0 - jnp.exp(-freq.astype(cfg.dtype) * dt)
            key, k1, k2 = jax.random.split(state["key"], 3)
            n = deps.n_particles
            kT = (BOLTZ * temp).astype(cfg.dtype)
            sigma = jnp.sqrt(kT * deps.inv_masses)[:, None]
            v_new = sigma * jax.random.normal(k1, (n, 3), dtype=cfg.dtype)
            collide = (jax.random.uniform(k2, (n, 1)) < p_collide) \
                & (deps.inv_masses != 0)[:, None]
            vel = jnp.where(collide, v_new, state["velocities"])
            state = dict(state)
            state["velocities"] = vel
            state["key"] = key
            return state, aux

        def energy_fn(pos, box, p, gp):
            return jnp.zeros((), cfg.accum_dtype)

        return CompiledForce(
            name=self.getName(), force_group=self.getForceGroup(),
            params={}, energy_fn=energy_fn, update_state_fn=update_state_fn,
            global_defaults={AndersenThermostat.Temperature(): self._temperature,
                             AndersenThermostat.CollisionFrequency(): self._frequency})
