"""Drude integrators: dual-thermostat dynamics for polarizable systems.

Counterparts of the drude plugin integrators (plugins/drude/openmmapi/
include/openmm/Drude{Langevin,SCF,NoseHoover}Integrator.h; pair-space
Langevin math per drudeLangevin.cc: each (drude, parent) pair is thermostated
in center-of-mass coordinates at T and in relative coordinates at
T_drude, with independent friction constants).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..constants import BOLTZ
from ..exceptions import OpenMMException
from .base import Integrator
from .nose_hoover import propagate_chain


def _find_drude_pairs(system):
    from ..forces.drude import DrudeForce
    for force in system.getForces():
        if isinstance(force, DrudeForce):
            return force._drude_pairs()
    raise OpenMMException("The System does not contain a DrudeForce")


class _DrudeBase(Integrator):
    def getRandomNumberSeed(self):
        return self._seed

    def setRandomNumberSeed(self, seed):
        self._seed = int(seed)

    def getTemperature(self):
        return u.Quantity(self._temperature, u.kelvin)

    def setTemperature(self, temp):
        self._temperature = float(u.strip(temp, u.kelvin))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getDrudeTemperature(self):
        return u.Quantity(self._drude_temperature, u.kelvin)

    def setDrudeTemperature(self, temp):
        self._drude_temperature = float(u.strip(temp, u.kelvin))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getMaxDrudeDistance(self):
        return u.Quantity(self._max_drude_distance, u.nanometer)

    def setMaxDrudeDistance(self, distance):
        self._max_drude_distance = float(u.strip(distance, u.nanometer))

    def _pair_arrays(self, deps):
        pairs = np.asarray(_find_drude_pairs(self._context._system), np.int32)
        n = deps.n_particles
        is_pair = np.zeros(n, bool)
        is_pair[pairs[:, 0]] = True
        is_pair[pairs[:, 1]] = True
        normal = np.where(~is_pair)[0].astype(np.int32)
        # scatter-free writeback permutation (normal kept, pairs replaced)
        sel = np.arange(n, dtype=np.int32)
        n_pairs = len(pairs)
        sel[pairs[:, 0]] = n + np.arange(n_pairs)
        sel[pairs[:, 1]] = n + n_pairs + np.arange(n_pairs)
        return (jnp.asarray(pairs), jnp.asarray(normal), jnp.asarray(sel))

    def _kinetic_energy_shift(self):
        return 0.0


class DrudeLangevinIntegrator(_DrudeBase):
    def __init__(self, temperature, frictionCoeff, drudeTemperature,
                 drudeFrictionCoeff, stepSize):
        super().__init__(stepSize)
        self._temperature = float(u.strip(temperature, u.kelvin))
        self._friction = float(u.strip(frictionCoeff, u.picosecond ** -1))
        self._drude_temperature = float(u.strip(drudeTemperature, u.kelvin))
        self._drude_friction = float(u.strip(drudeFrictionCoeff,
                                             u.picosecond ** -1))
        self._max_drude_distance = 0.0

    def getFriction(self):
        return u.Quantity(self._friction, u.picosecond ** -1)

    def getDrudeFriction(self):
        return u.Quantity(self._drude_friction, u.picosecond ** -1)

    def _integrator_params(self):
        return {"dt": self._step_size, "temperature": self._temperature,
                "friction": self._friction,
                "drudeTemperature": self._drude_temperature,
                "drudeFriction": self._drude_friction}

    def _make_step_fn(self, deps):
        pairs, normal, sel = self._pair_arrays(deps)
        inv_m = deps.inv_masses
        masses = deps.masses
        moving = (deps.inv_masses != 0)[:, None]
        n = deps.n_particles
        n_pairs = pairs.shape[0]

        def step(state, params_list):
            for hook, pidx in deps.update_hooks:
                state = hook(state, params_list)
            pos = state["positions"]
            vel = state["velocities"]
            ip = state["iparams"]
            dt = ip["dt"].astype(pos.dtype)
            kT = (BOLTZ * ip["temperature"]).astype(pos.dtype)
            kT_d = (BOLTZ * ip["drudeTemperature"]).astype(pos.dtype)
            gamma = ip["friction"].astype(pos.dtype)
            gamma_d = ip["drudeFriction"].astype(pos.dtype)
            vscale = jnp.exp(-dt * gamma)
            fscale = (1.0 - vscale) / gamma
            noisescale = jnp.sqrt(kT * (1.0 - vscale * vscale))
            vscale_d = jnp.exp(-dt * gamma_d)
            fscale_d = (1.0 - vscale_d) / gamma_d
            noisescale_d = jnp.sqrt(kT_d * (1.0 - vscale_d * vscale_d))
            key, k1, k2, k3 = jax.random.split(state["key"], 4)
            _, forces = deps.force_fn(pos, state["box"], params_list,
                                      state["gp"], state["faux"])
            # normal particles: standard Langevin update
            xi_all = jax.random.normal(k1, pos.shape, pos.dtype)
            sqrt_inv_m = jnp.sqrt(inv_m)[:, None]
            v_norm = (vscale * vel + fscale * forces * inv_m[:, None]
                      + noisescale * sqrt_inv_m * xi_all)
            # Drude pairs: COM / relative split (drudeLangevin.cc math)
            i1 = pairs[:, 0]   # drude
            i2 = pairs[:, 1]   # parent
            m1 = masses[i1][:, None]
            m2 = masses[i2][:, None]
            inv_total = 1.0 / (m1 + m2)
            inv_red = (m1 + m2) * inv_m[i1][:, None] * inv_m[i2][:, None]
            f1 = forces[i1]
            f2 = forces[i2]
            v1 = vel[i1]
            v2 = vel[i2]
            m1f = m1 * inv_total
            m2f = m2 * inv_total
            cm_vel = v1 * m1f + v2 * m2f
            rel_vel = v2 - v1
            cm_force = f1 + f2
            rel_force = f2 * m1f - f1 * m2f
            r1 = jax.random.normal(k2, (n_pairs, 3), pos.dtype)
            r2 = jax.random.normal(k3, (n_pairs, 3), pos.dtype)
            cm_vel = (vscale * cm_vel + fscale * inv_total * cm_force
                      + noisescale * jnp.sqrt(inv_total) * r1)
            rel_vel = (vscale_d * rel_vel + fscale_d * inv_red * rel_force
                       + noisescale_d * jnp.sqrt(inv_red) * r2)
            v1_new = cm_vel - rel_vel * m2f
            v2_new = cm_vel + rel_vel * m1f
            v_full = jnp.concatenate([v_norm, v1_new, v2_new])[sel]
            v_full = jnp.where(moving, v_full, vel)
            delta = v_full * dt
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            # constraint-correction-only velocity recovery (see verlet.py)
            new_pos, corr = deps.apply_position_constraints_corr(
                pos, new_pos_raw)
            if corr is not None:
                v_full = v_full + corr / dt
            v_full = jnp.where(moving, v_full, vel)
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state["positions"] = new_pos
            state["velocities"] = v_full
            state["key"] = key
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step


class DrudeSCFIntegrator(_DrudeBase):
    """Verlet on real atoms + self-consistent minimization of Drude positions
    each step (DrudeSCFIntegrator.h). The minimization uses the known spring
    constant as a diagonal preconditioner: x_drude += F_drude / k, iterated a
    fixed number of times inside the step."""

    def __init__(self, stepSize):
        super().__init__(stepSize)
        self._temperature = 1.0
        self._drude_temperature = 1.0
        self._max_drude_distance = 0.0
        self._minimization_tolerance = 1.0  # kJ/mol/nm, fixed iter count here
        self._scf_iterations = 12

    def getMinimizationErrorTolerance(self):
        return u.Quantity(self._minimization_tolerance,
                          u.kilojoule_per_mole / u.nanometer)

    def setMinimizationErrorTolerance(self, tol):
        self._minimization_tolerance = float(
            u.strip(tol, u.kilojoule_per_mole / u.nanometer))

    def _integrator_params(self):
        return {"dt": self._step_size}

    def _make_step_fn(self, deps):
        pairs, normal, sel = self._pair_arrays(deps)
        from ..forces.drude import DrudeForce
        drude_force = next(f for f in self._context._system.getForces()
                           if isinstance(f, DrudeForce))
        from ..constants import ONE_4PI_EPS0
        ks = np.asarray([ONE_4PI_EPS0 * p[5] * p[5] / p[6]
                         for p in drude_force._particles])
        k_spring = jnp.asarray(ks.astype(deps.dtype))[:, None]
        inv_m = deps.inv_masses[:, None]
        moving = (deps.inv_masses != 0)[:, None]
        drude_idx = pairs[:, 0]
        n = deps.n_particles
        n_pairs = pairs.shape[0]
        scf_iters = self._scf_iterations
        # writeback permutation for drude rows only
        sel_d = np.arange(n, dtype=np.int32)
        sel_d[np.asarray(drude_idx)] = n + np.arange(n_pairs)
        sel_d = jnp.asarray(sel_d)

        def minimize_drude(pos, box, params_list, gp, faux=None):
            def body(i, pos):
                _, forces = deps.force_fn(pos, box, params_list, gp, faux)
                new_drude = pos[drude_idx] + forces[drude_idx] / k_spring
                return jnp.concatenate([pos, new_drude])[sel_d]

            return jax.lax.fori_loop(0, scf_iters, body, pos)

        def step(state, params_list):
            for hook, pidx in deps.update_hooks:
                state = hook(state, params_list)
            pos = state["positions"]
            vel = state["velocities"]
            dt = state["iparams"]["dt"].astype(pos.dtype)
            _, forces = deps.force_fn(pos, state["box"], params_list,
                                      state["gp"], state["faux"])
            vnew = vel + dt * forces * inv_m
            vnew = jnp.where(moving, vnew, vel)
            # zero velocity of drude relative dof (they carry no dynamics)
            delta = vnew * dt
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            # constraint-correction-only velocity recovery (see verlet.py)
            new_pos, corr = deps.apply_position_constraints_corr(
                pos, new_pos_raw)
            if corr is not None:
                vnew = vnew + corr / dt
            vnew = jnp.where(moving, vnew, vel)
            new_pos = minimize_drude(new_pos, state["box"], params_list,
                                     state["gp"], state["faux"])
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state["positions"] = new_pos
            state["velocities"] = vnew
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step


class DrudeNoseHooverIntegrator(_DrudeBase):
    """Dual Nose-Hoover chains: one on pair-COM + normal dofs at T, one on
    relative Drude dofs at T_drude (DrudeNoseHooverIntegrator.h)."""

    def __init__(self, temperature, collisionFrequency, drudeTemperature,
                 drudeCollisionFrequency, stepSize, chainLength=3, numMTS=3,
                 numYoshidaSuzuki=7):
        super().__init__(stepSize)
        self._temperature = float(u.strip(temperature, u.kelvin))
        self._frequency = float(u.strip(collisionFrequency, u.picosecond ** -1))
        self._drude_temperature = float(u.strip(drudeTemperature, u.kelvin))
        self._drude_frequency = float(u.strip(drudeCollisionFrequency,
                                              u.picosecond ** -1))
        self._max_drude_distance = 0.0
        self._chain_length = int(chainLength)
        self._n_mts = int(numMTS)
        self._n_ys = int(numYoshidaSuzuki)

    def _integrator_params(self):
        return {"dt": self._step_size, "temperature": self._temperature,
                "frequency": self._frequency,
                "drudeTemperature": self._drude_temperature,
                "drudeFrequency": self._drude_frequency}

    def _init_aux(self, deps):
        m = self._chain_length
        return {"nh_pos": jnp.zeros((m,), deps.dtype),
                "nh_vel": jnp.zeros((m,), deps.dtype),
                "nh_pos_d": jnp.zeros((m,), deps.dtype),
                "nh_vel_d": jnp.zeros((m,), deps.dtype)}

    def _make_step_fn(self, deps):
        pairs, normal, sel = self._pair_arrays(deps)
        inv_m = deps.inv_masses
        masses = deps.masses
        moving = (deps.inv_masses != 0)[:, None]
        n_pairs = pairs.shape[0]
        import numpy as _np
        n_moving = int(_np.sum(_np.asarray(deps.inv_masses) != 0))
        dof_com = 3.0 * (n_moving - n_pairs)   # com + normal dofs
        dof_rel = 3.0 * n_pairs
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
            kT_d = (BOLTZ * ip["drudeTemperature"]).astype(pos.dtype)
            tau = 1.0 / ip["frequency"].astype(pos.dtype)
            tau_d = 1.0 / ip["drudeFrequency"].astype(pos.dtype)
            aux = state["aux"]
            _, forces = deps.force_fn(pos, state["box"], params_list,
                                      state["gp"], state["faux"])
            v = vel + dt * forces * inv_m[:, None]
            v = jnp.where(moving, v, vel)
            v = deps.apply_velocity_constraints(pos, v)
            delta = 0.5 * dt * v
            # split KE into COM/normal and relative parts
            i1 = pairs[:, 0]
            i2 = pairs[:, 1]
            m1 = masses[i1][:, None]
            m2 = masses[i2][:, None]
            inv_total = 1.0 / (m1 + m2)
            red_mass = m1 * m2 * inv_total
            cm_vel = (v[i1] * m1 + v[i2] * m2) * inv_total
            rel_vel = v[i2] - v[i1]
            pair_mask = jnp.zeros(v.shape[0], bool).at[i1].set(True) \
                .at[i2].set(True)
            ke2_normal = jnp.sum(jnp.where(pair_mask[:, None], 0.0,
                                           masses[:, None] * v * v))
            ke2_com = jnp.sum((m1 + m2) * cm_vel * cm_vel)
            ke2_rel = jnp.sum(red_mass * rel_vel * rel_vel)
            scale, nh_pos, nh_vel = propagate_chain(
                ke2_normal + ke2_com, aux["nh_pos"], aux["nh_vel"], kT,
                dof_com, dt, tau, n_mts, n_ys)
            scale_d, nh_pos_d, nh_vel_d = propagate_chain(
                ke2_rel, aux["nh_pos_d"], aux["nh_vel_d"], kT_d, dof_rel,
                dt, tau_d, n_mts, n_ys)
            cm_vel = cm_vel * scale
            rel_vel = rel_vel * scale_d
            v1_new = cm_vel - rel_vel * m2 * inv_total
            v2_new = cm_vel + rel_vel * m1 * inv_total
            v_norm = v * scale
            v = jnp.concatenate([v_norm, v1_new, v2_new])[sel]
            v = jnp.where(moving, v, vel)
            delta = delta + 0.5 * dt * v
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            # constraint-correction-only velocity recovery (see verlet.py)
            new_pos, corr = deps.apply_position_constraints_corr(
                pos, new_pos_raw)
            if corr is not None:
                v = v + jnp.where(moving, corr / dt, 0.0)
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state["positions"] = new_pos
            state["velocities"] = v
            state["aux"] = dict(aux, nh_pos=nh_pos, nh_vel=nh_vel,
                                nh_pos_d=nh_pos_d, nh_vel_d=nh_vel_d)
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
