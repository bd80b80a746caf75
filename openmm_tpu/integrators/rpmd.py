"""RPMDIntegrator: ring-polymer molecular dynamics.

Counterpart of the rpmd plugin (plugins/rpmd/openmmapi/include/openmm/
RPMDIntegrator.h:69-92; kernel math per rpmd.cc: free-ring-polymer evolution
in normal-mode (FFT) space with exact harmonic rotation at frequencies
w_k = 2 (n kT / hbar) sin(k pi / n), and the PILE-L thermostat — local
Langevin on the centroid mode, critically damped white noise on the
internal modes).

TPU design: the n copies are a leading array axis; forces are computed for
all copies with jax.vmap over the fused force function (the 'many-replica'
workload that maps directly onto batching, SURVEY §2.10 P6). Ring-polymer
contraction (RPMDIntegrator.h:69-92) evaluates selected force groups on a
smaller number of beads: positions are normal-mode truncated to M copies
(kernels/rpmdContraction.cc contractPositions, POS_SCALE = 1/K), the
group's forces run on the contracted configurations, and the transposed
truncation expands them back onto all K beads (contractForces,
FORCE_SCALE = 1/M).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..constants import AVOGADRO, BOLTZ
from ..exceptions import OpenMMException
from ..state import State
from .base import Integrator

HBAR = 1.054571628e-34 * AVOGADRO / (1000 * 1e-12)  # kJ/mol * ps (rpmd.cc:138)


class RPMDIntegrator(Integrator):
    def __init__(self, numCopies, temperature, frictionCoeff, stepSize,
                 contractions=None):
        super().__init__(stepSize)
        self._n_copies = int(numCopies)
        self._temperature = float(u.strip(temperature, u.kelvin))
        self._friction = float(u.strip(frictionCoeff, u.picosecond ** -1))
        self._apply_thermostat = True
        self._contractions = dict(contractions or {})

    def getNumCopies(self):
        return self._n_copies

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

    def getApplyThermostat(self):
        return self._apply_thermostat

    def setApplyThermostat(self, apply):  # noqa: A002
        self._apply_thermostat = bool(apply)

    def getRandomNumberSeed(self):
        return self._seed

    def setRandomNumberSeed(self, seed):
        self._seed = int(seed)

    def getContractions(self):
        return dict(self._contractions)

    # -- copy state access (RPMDIntegrator.h setPositions/getState) ----------
    def setPositions(self, copy, positions):
        ctx = self._require_context()
        pos = np.asarray(u.strip(positions, u.nanometer), np.float64)
        aux = ctx._state["aux"]
        aux["rp_pos"] = aux["rp_pos"].at[copy].set(
            jnp.asarray(pos.astype(ctx._dtype)))
        # per-copy positions are now authoritative (hasSetPosition
        # semantics): the first step must not re-broadcast them
        aux["rp_init"] = jnp.ones((), jnp.int32)
        if copy == 0:
            ctx.setPositions(positions)
        else:
            ctx._positions_set = True

    def setVelocities(self, copy, velocities):
        ctx = self._require_context()
        vel = np.asarray(u.strip(velocities, u.nanometer / u.picosecond),
                         np.float64)
        aux = ctx._state["aux"]
        aux["rp_vel"] = aux["rp_vel"].at[copy].set(
            jnp.asarray(vel.astype(ctx._dtype)))
        aux["rp_init_v"] = jnp.ones((), jnp.int32)
        if copy == 0:
            ctx.setVelocities(velocities)

    def getState(self, copy, types=0, enforcePeriodicBox=False, groups=-1,
                 **kwargs):
        ctx = self._require_context()
        aux = ctx._state["aux"]
        saved_pos = ctx._state["positions"]
        saved_vel = ctx._state["velocities"]
        ctx._state["positions"] = aux["rp_pos"][copy]
        ctx._state["velocities"] = aux["rp_vel"][copy]
        try:
            return ctx.getState(types, enforcePeriodicBox, groups, **kwargs)
        finally:
            ctx._state["positions"] = saved_pos
            ctx._state["velocities"] = saved_vel

    def getTotalEnergy(self):
        """Potential + kinetic + ring-polymer spring energy over all copies."""
        ctx = self._require_context()
        aux = ctx._state["aux"]
        pos = np.asarray(aux["rp_pos"], np.float64)
        vel = np.asarray(aux["rp_vel"], np.float64)
        masses = np.asarray(ctx._masses_dev, np.float64)
        k = self._n_copies
        kT = BOLTZ * self._temperature
        wn = k * kT / HBAR
        e = 0.0
        for c in range(k):
            e += float(self.getState(c, State.Energy)
                       .getPotentialEnergy()._value)
        e += 0.5 * np.sum(masses[None, :, None] * vel * vel)
        springs = pos - np.roll(pos, 1, axis=0)
        e += 0.5 * wn * wn * np.sum(masses[None, :, None] * springs * springs)
        return u.Quantity(e, u.kilojoule_per_mole)

    def _require_context(self):
        if self._context is None:
            raise OpenMMException("Integrator is not bound to a context")
        return self._context

    # -- engine ----------------------------------------------------------------
    def _integrator_params(self):
        return {"dt": self._step_size, "temperature": self._temperature,
                "friction": self._friction}

    def _kinetic_energy_shift(self):
        return 0.0

    def _init_aux(self, deps):
        k = self._n_copies
        n = deps.n_particles
        return {"rp_pos": jnp.zeros((k, n, 3), deps.dtype),
                "rp_vel": jnp.zeros((k, n, 3), deps.dtype),
                "rp_init": jnp.zeros((), jnp.int32),
                "rp_init_v": jnp.zeros((), jnp.int32)}

    def _make_step_fn(self, deps):
        k = self._n_copies
        contractions = {int(g): int(m)
                        for g, m in self._contractions.items()}
        for g, m in contractions.items():
            if m > k:
                raise OpenMMException(
                    "RPMDIntegrator: Number of copies for contraction "
                    "cannot be greater than the total number of copies")
        if contractions:
            factory = deps._force_fn_factory
            all_mask = self._force_groups & 0xffffffff
            cont_bits = 0
            for g in contractions:
                cont_bits |= (1 << g)
            _, force_fn_base = factory(all_mask & ~cont_bits,
                                       want_energy=False)
            contracted_fns = []
            for g, m in sorted(contractions.items()):
                _, ef_g = factory(1 << g, want_energy=False)
                contracted_fns.append((g, m, ef_g))
        else:
            force_fn_base = deps.force_fn
            contracted_fns = []

        def _contract(pos_all, m):
            # contractPositions: truncate the K-bead spectrum to M modes
            # (split at (M+1)/2) and transform back at size M; numpy-norm
            # FFTs make the kernel's 1/K scale come out as M/K
            spec = jnp.fft.fft(pos_all, axis=0)
            start = (m + 1) // 2
            keep = jnp.concatenate([spec[:start], spec[k - (m - start):]],
                                   axis=0)
            return (jnp.fft.ifft(keep, axis=0).real
                    * (m / k)).astype(pos_all.dtype)

        def _expand(f_c, k_out):
            # contractForces: pad the M-bead force spectrum back to K modes
            # (transpose of the truncation); FORCE_SCALE = 1/M -> K/M here
            m = f_c.shape[0]
            spec = jnp.fft.fft(f_c, axis=0)
            start = (m + 1) // 2
            zeros = jnp.zeros((k_out - m,) + spec.shape[1:], spec.dtype)
            padded = jnp.concatenate(
                [spec[:start], zeros, spec[start:]], axis=0)
            return (jnp.fft.ifft(padded, axis=0).real
                    * (k_out / m)).astype(f_c.dtype)

        inv_m = deps.inv_masses[:, None]
        moving = (deps.inv_masses != 0)[:, None]
        sqrt_inv_m = jnp.sqrt(deps.inv_masses)[:, None]
        apply_thermostat = self._apply_thermostat
        # normal-mode index frequencies
        mode = np.arange(k)
        mode_k = np.where(mode <= k // 2, mode, k - mode)
        sin_fac = np.sin(mode_k * np.pi / k)
        sin_fac_j = jnp.asarray(sin_fac)
        is_centroid = jnp.asarray(mode == 0)

        def nm_fft(x):
            return jnp.fft.fft(x, axis=0, norm="ortho")

        def nm_ifft(x):
            return jnp.fft.ifft(x, axis=0, norm="ortho").real

        def pile_half(vel, kT, dt, gamma, key):
            """PILE-L half step in normal-mode space (rpmd.cc:20-80).
            Orthonormal FFT matches the reference's SCALE=1/sqrt(n); hermitian
            noise comes from the FFT of real white noise, so every mode
            (including conjugate pairing) gets exactly the nkT/m stationary
            variance."""
            nkT = k * kT
            twown = 2.0 * nkT / HBAR
            v_nm = nm_fft(vel)
            c1_0 = jnp.exp(-0.5 * dt * gamma)
            wk = twown * sin_fac_j
            c1_k = jnp.exp(-wk * dt)   # critical damping, full dt
            c1 = jnp.where(is_centroid, c1_0, c1_k)[:, None, None]
            c2 = jnp.sqrt(1.0 - c1 * c1)
            key, sub = jax.random.split(key)
            sigma = jnp.sqrt(nkT) * sqrt_inv_m[None]
            xi = jax.random.normal(sub, vel.shape).astype(vel.dtype)
            eta = nm_fft(xi)           # hermitian, unit variance per mode
            v_nm = c1 * v_nm + c2 * sigma * eta
            return nm_ifft(v_nm), key

        def free_evolve(pos, vel, kT, dt):
            """Exact harmonic evolution of the free ring polymer (rpmd.cc:130)."""
            nkT = k * kT
            twown = 2.0 * nkT / HBAR
            q_nm = nm_fft(pos)
            v_nm = nm_fft(vel)
            wk = (twown * sin_fac_j)[:, None, None]
            wt = wk * dt
            coswt = jnp.cos(wt)
            sinwt = jnp.sin(wt)
            wk_safe = jnp.where(wk == 0, 1.0, wk)
            q_new = jnp.where(wk == 0, q_nm + v_nm * dt,
                              v_nm * (sinwt / wk_safe) + q_nm * coswt)
            v_new = jnp.where(wk == 0, v_nm,
                              v_nm * coswt - q_nm * wk * sinwt)
            return nm_ifft(q_new), nm_ifft(v_new)

        def step(state, params_list):
            aux = state["aux"]
            # first use: seed all copies from the context positions
            pos_all = jnp.where(aux["rp_init"] > 0,
                                aux["rp_pos"],
                                jnp.broadcast_to(state["positions"],
                                                 aux["rp_pos"].shape))
            vel_all = jnp.where(aux["rp_init_v"] > 0,
                                aux["rp_vel"],
                                jnp.broadcast_to(state["velocities"],
                                                 aux["rp_vel"].shape))
            # barostat / updateContextState hooks act on the seeded copies
            if deps.update_hooks:
                state = dict(state)
                state["aux"] = dict(aux, rp_pos=pos_all, rp_vel=vel_all,
                                    rp_init=jnp.ones((), jnp.int32),
                                    rp_init_v=jnp.ones((), jnp.int32))
                for hook, pidx in deps.update_hooks:
                    state = hook(state, params_list)
                aux = state["aux"]
                pos_all = aux["rp_pos"]
                vel_all = aux["rp_vel"]

            ip = state["iparams"]
            dt = ip["dt"].astype(pos_all.dtype)
            kT = (BOLTZ * ip["temperature"]).astype(pos_all.dtype)
            gamma = ip["friction"].astype(pos_all.dtype)
            key = state["key"]

            if apply_thermostat:
                vel_all, key = pile_half(vel_all, kT, dt, gamma, key)

            def copy_forces(pos):
                # faux deliberately omitted: replicas have distinct
                # coordinates, so a shared persistent neighbor list would be
                # wrong — each bead rebuilds inline (vmapped)
                _, f = force_fn_base(pos, state["box"], params_list,
                                     state["gp"])
                return f

            def all_forces(pos_all):
                forces = jax.vmap(copy_forces)(pos_all)
                for (grp, m, ef_g) in contracted_fns:
                    pos_c = _contract(pos_all, m)

                    def fg(pos, ef_g=ef_g):
                        _, f = ef_g(pos, state["box"], params_list,
                                    state["gp"])
                        return f

                    f_c = jax.vmap(fg)(pos_c)
                    forces = forces + _expand(f_c, k)
                return forces

            forces = all_forces(pos_all)
            vel_all = vel_all + 0.5 * dt * forces * inv_m[None]
            pos_all, vel_all = free_evolve(pos_all, vel_all, kT, dt)
            forces = all_forces(pos_all)
            vel_all = vel_all + 0.5 * dt * forces * inv_m[None]
            if apply_thermostat:
                vel_all, key = pile_half(vel_all, kT, dt, gamma, key)
            vel_all = jnp.where(moving[None], vel_all, 0.0)

            state = dict(state)
            state["aux"] = dict(aux, rp_pos=pos_all, rp_vel=vel_all,
                                rp_init=jnp.ones((), jnp.int32),
                                rp_init_v=jnp.ones((), jnp.int32))
            state["positions"] = pos_all[0]
            state["velocities"] = vel_all[0]
            state["key"] = key
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
