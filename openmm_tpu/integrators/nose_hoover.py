"""NoseHooverIntegrator: MTK chain thermostat with Yoshida-Suzuki splitting.

Math per the reference (openmmapi/src/NoseHooverIntegrator.cpp, chain
propagation kernels platforms/common/src/kernels/noseHooverChain.cc:2-154,
theory docs 04_integrators.rst): LangevinMiddle-style splitting where the O
step is replaced by deterministic chain propagation that rescales velocities.
Chain masses Q_1 = N_f kT tau^2, Q_k = kT tau^2 with tau = 1/frequency.

Supports the default full-system thermostat plus subsystem and
connected-pair thermostats (NoseHooverIntegrator.h:92-180
addThermostat/addSubsystemThermostat): a pair's center-of-mass motion is
thermostated at `temperature` and its relative motion independently at
`relativeTemperature` — the dual-temperature scheme Drude models use.
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


class NoseHooverChain:
    """Public description of one Nose-Hoover heat-bath chain
    (openmmapi/include/openmm/NoseHooverChain.h): a plain data object the
    integrator hands out via getThermostat(); mutations through its setters
    write back to the owning integrator's chain (the reference returns a
    C++ reference with the same semantics).
    """

    def __init__(self, temperature, relativeTemperature, collisionFrequency,
                 relativeCollisionFrequency, numDOFs, chainLength, numMTS,
                 numYoshidaSuzuki, chainID, thermostatedAtoms,
                 thermostatedPairs, _backing=None):
        if _backing is not None:
            self._d = _backing
        else:
            self._d = {
                "particles": [int(p) for p in thermostatedAtoms],
                "pairs": [(int(a), int(b)) for (a, b) in thermostatedPairs],
                "temperature": float(u.strip(temperature, u.kelvin)),
                "frequency": float(u.strip(collisionFrequency,
                                           u.picosecond ** -1)),
                "rel_temperature": float(u.strip(relativeTemperature,
                                                 u.kelvin)),
                "rel_frequency": float(u.strip(relativeCollisionFrequency,
                                               u.picosecond ** -1)),
                "chain_length": int(chainLength),
                "n_mts": int(numMTS),
                "n_ys": int(numYoshidaSuzuki)}
        self._d.setdefault("num_dofs", int(numDOFs) if numDOFs else 0)
        self._d.setdefault("chain_id", int(chainID) if chainID else 0)
        self._sync = None          # owning integrator's param-sync hook

    def _maybe_sync(self):
        if self._sync is not None:
            self._sync()

    def getTemperature(self):
        return u.Quantity(self._d["temperature"], u.kelvin)

    def setTemperature(self, temperature):
        self._d["temperature"] = float(u.strip(temperature, u.kelvin))
        self._maybe_sync()

    def getRelativeTemperature(self):
        return u.Quantity(self._d["rel_temperature"], u.kelvin)

    def setRelativeTemperature(self, temperature):
        self._d["rel_temperature"] = float(u.strip(temperature, u.kelvin))
        self._maybe_sync()

    def getCollisionFrequency(self):
        return u.Quantity(self._d["frequency"], u.picosecond ** -1)

    def setCollisionFrequency(self, frequency):
        self._d["frequency"] = float(u.strip(frequency, u.picosecond ** -1))
        self._maybe_sync()

    def getRelativeCollisionFrequency(self):
        return u.Quantity(self._d["rel_frequency"], u.picosecond ** -1)

    def setRelativeCollisionFrequency(self, frequency):
        self._d["rel_frequency"] = float(
            u.strip(frequency, u.picosecond ** -1))
        self._maybe_sync()

    def getNumDegreesOfFreedom(self):
        return self._d["num_dofs"]

    def setNumDegreesOfFreedom(self, numDOF):
        self._d["num_dofs"] = int(numDOF)

    def getChainLength(self):
        return self._d["chain_length"]

    def getNumMultiTimeSteps(self):
        return self._d["n_mts"]

    def getNumYoshidaSuzukiTimeSteps(self):
        return self._d["n_ys"]

    def getChainID(self):
        return self._d["chain_id"]

    def getThermostatedAtoms(self):
        return list(self._d["particles"])

    def setThermostatedAtoms(self, atomIDs):
        self._d["particles"] = [int(p) for p in atomIDs]

    def getThermostatedPairs(self):
        return list(self._d["pairs"])

    def setThermostatedPairs(self, pairIDs):
        self._d["pairs"] = [(int(a), int(b)) for (a, b) in pairIDs]

    def usesChainForAbsoluteMotion(self):
        # a chain with pairs still thermostats the pair COMs absolutely
        return True


class NoseHooverIntegrator(Integrator):
    def __init__(self, temperature=298.0, collisionFrequency=50.0,
                 stepSize=0.001, chainLength=3, numMTS=3, numYoshidaSuzuki=7):
        # support both NoseHooverIntegrator(stepSize) and the full signature
        if collisionFrequency is None:
            stepSize, temperature = temperature, 298.0
            collisionFrequency = 50.0
        super().__init__(stepSize)
        self._thermostats = []
        self.addThermostat(temperature, collisionFrequency, chainLength,
                           numMTS, numYoshidaSuzuki)

    # -- thermostat management (NoseHooverIntegrator.h:92-180) ---------------
    def addThermostat(self, temperature, collisionFrequency, chainLength=3,
                      numMTS=3, numYoshidaSuzuki=7):
        """Thermostat over ALL particles (one per integrator by default)."""
        return self.addSubsystemThermostat(
            [], [], temperature, collisionFrequency, temperature,
            collisionFrequency, chainLength, numMTS, numYoshidaSuzuki)

    def addSubsystemThermostat(self, thermostatedParticles,
                               thermostatedPairs, temperature,
                               collisionFrequency, relativeTemperature,
                               relativeCollisionFrequency, chainLength=3,
                               numMTS=3, numYoshidaSuzuki=7):
        if int(numYoshidaSuzuki) not in _YS_WEIGHTS:
            raise ValueError("numYoshidaSuzuki must be 1, 3, 5, or 7")
        if self._context is not None:
            raise ValueError(
                "Thermostats must be added before creating a Context")
        self._thermostats.append({
            "particles": [int(p) for p in thermostatedParticles],
            "pairs": [(int(a), int(b)) for (a, b) in thermostatedPairs],
            "temperature": float(u.strip(temperature, u.kelvin)),
            "frequency": float(u.strip(collisionFrequency,
                                       u.picosecond ** -1)),
            "rel_temperature": float(u.strip(relativeTemperature, u.kelvin)),
            "rel_frequency": float(u.strip(relativeCollisionFrequency,
                                           u.picosecond ** -1)),
            "chain_length": int(chainLength),
            "n_mts": int(numMTS),
            "n_ys": int(numYoshidaSuzuki),
            "chain_id": len(self._thermostats)})
        return len(self._thermostats) - 1

    def getNumThermostats(self):
        return len(self._thermostats)

    def getThermostat(self, chainID=0):
        """The public NoseHooverChain object for one chain
        (NoseHooverIntegrator.h:197): setters write through to this
        integrator, matching the reference's returned C++ reference."""
        d = self._thermostats[chainID]
        if self._context is not None:
            d["num_dofs"] = int(self._chain_dof(chainID, self._context._deps))
        chain = NoseHooverChain(None, None, None, None, None, None, None,
                                None, None, [], [], _backing=d)
        if self._context is not None:
            chain._sync = self._context._sync_integrator_params
        return chain

    def hasSubsystemThermostats(self):
        return any(th["particles"] or th["pairs"]
                   for th in self._thermostats)

    def getTemperature(self, chainID=0):
        return u.Quantity(self._thermostats[chainID]["temperature"],
                          u.kelvin)

    def setTemperature(self, temp, chainID=0):
        self._thermostats[chainID]["temperature"] = float(
            u.strip(temp, u.kelvin))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getRelativeTemperature(self, chainID=0):
        return u.Quantity(self._thermostats[chainID]["rel_temperature"],
                          u.kelvin)

    def setRelativeTemperature(self, temp, chainID=0):
        self._thermostats[chainID]["rel_temperature"] = float(
            u.strip(temp, u.kelvin))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getCollisionFrequency(self, chainID=0):
        return u.Quantity(self._thermostats[chainID]["frequency"],
                          u.picosecond ** -1)

    def setCollisionFrequency(self, freq, chainID=0):
        self._thermostats[chainID]["frequency"] = float(
            u.strip(freq, u.picosecond ** -1))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getRelativeCollisionFrequency(self, chainID=0):
        return u.Quantity(self._thermostats[chainID]["rel_frequency"],
                          u.picosecond ** -1)

    def setRelativeCollisionFrequency(self, freq, chainID=0):
        self._thermostats[chainID]["rel_frequency"] = float(
            u.strip(freq, u.picosecond ** -1))
        if self._context is not None:
            self._context._sync_integrator_params()

    # backwards-compatible single-thermostat aliases (serialization reads
    # these for the default chain)
    @property
    def _temperature(self):
        return self._thermostats[0]["temperature"]

    @property
    def _frequency(self):
        return self._thermostats[0]["frequency"]

    @property
    def _chain_length(self):
        return self._thermostats[0]["chain_length"]

    @property
    def _n_mts(self):
        return self._thermostats[0]["n_mts"]

    @property
    def _n_ys(self):
        return self._thermostats[0]["n_ys"]

    def computeHeatBathEnergy(self):
        """Energy of the heat baths (for conserved-quantity checks)."""
        if self._context is None:
            return u.Quantity(0.0, u.kilojoule_per_mole)
        import numpy as np
        aux = self._context._state["aux"]
        deps = self._context._deps
        e = 0.0
        for i, th in enumerate(self._thermostats):
            for tag, temp in (("", th["temperature"]),
                              ("r", th["rel_temperature"])):
                key = "nh%s%d_pos" % (tag, i)
                if key not in aux:
                    continue
                cp = np.asarray(aux[key])
                cv = np.asarray(aux["nh%s%d_vel" % (tag, i)])
                kT = BOLTZ * temp
                freq = th["frequency"] if tag == "" else th["rel_frequency"]
                tau = 1.0 / freq
                dof = self._chain_dof(i, deps, relative=(tag == "r"))
                q = np.full(len(cp), kT * tau * tau)
                q[0] *= dof
                e += 0.5 * np.sum(q * cv * cv) + dof * kT * cp[0] \
                    + kT * np.sum(cp[1:])
        return u.Quantity(float(e), u.kilojoule_per_mole)

    def _chain_dof(self, i, deps, relative=False):
        import numpy as np
        th = self._thermostats[i]
        if relative:
            return 3.0 * len(th["pairs"])
        if th["particles"] or th["pairs"]:
            return 3.0 * (len(th["particles"]) + len(th["pairs"]))
        n_cons = len(self._context._system._constraints) \
            if self._context is not None else 0
        return float(np.sum(np.asarray(deps.inv_masses) != 0)) * 3.0 \
            - n_cons

    def _integrator_params(self):
        p = {"dt": self._step_size}
        for i, th in enumerate(self._thermostats):
            p["temperature%d" % i] = th["temperature"]
            p["frequency%d" % i] = th["frequency"]
            p["rtemperature%d" % i] = th["rel_temperature"]
            p["rfrequency%d" % i] = th["rel_frequency"]
        return p

    def _kinetic_energy_shift(self):
        return 0.0

    def _init_aux(self, deps):
        aux = {}
        for i, th in enumerate(self._thermostats):
            m = th["chain_length"]
            aux["nh%d_pos" % i] = jnp.zeros((m,), deps.dtype)
            aux["nh%d_vel" % i] = jnp.zeros((m,), deps.dtype)
            if th["pairs"]:
                aux["nhr%d_pos" % i] = jnp.zeros((m,), deps.dtype)
                aux["nhr%d_vel" % i] = jnp.zeros((m,), deps.dtype)
        return aux

    def _make_step_fn(self, deps):
        import numpy as np
        inv_m = deps.inv_masses[:, None]
        moving = (deps.inv_masses != 0)[:, None]
        masses = deps.masses
        thermostats = []
        for i, th in enumerate(self._thermostats):
            singles = np.asarray(th["particles"], np.int32)
            pairs = np.asarray(th["pairs"], np.int32).reshape(-1, 2)
            full = not th["particles"] and not th["pairs"]
            thermostats.append({
                "i": i, "full": full,
                "singles": jnp.asarray(singles),
                "pairs": jnp.asarray(pairs),
                "has_pairs": len(th["pairs"]) > 0,
                "dof_abs": self._chain_dof(i, deps),
                "dof_rel": self._chain_dof(i, deps, relative=True),
                "chain_length": th["chain_length"],
                "n_mts": th["n_mts"], "n_ys": th["n_ys"]})

        def apply_thermostats(v, state, aux, dt):
            ip = state["iparams"]
            new_aux = dict(aux)
            for th in thermostats:
                i = th["i"]
                kT = (BOLTZ * ip["temperature%d" % i]).astype(v.dtype)
                tau = 1.0 / ip["frequency%d" % i].astype(v.dtype)
                if th["full"]:
                    ke2 = jnp.sum(masses[:, None] * v * v)
                    scale, cp, cv = propagate_chain(
                        ke2, aux["nh%d_pos" % i], aux["nh%d_vel" % i], kT,
                        th["dof_abs"], dt, tau, th["n_mts"], th["n_ys"])
                    v = jnp.where(moving, v * scale, v)
                    new_aux["nh%d_pos" % i] = cp
                    new_aux["nh%d_vel" % i] = cv
                    continue
                # subsystem: absolute motion = single atoms + pair COMs
                s_idx = th["singles"]
                p_idx = th["pairs"]
                ke2 = jnp.zeros((), v.dtype)
                if s_idx.shape[0]:
                    ke2 = ke2 + jnp.sum(masses[s_idx, None] * v[s_idx] ** 2)
                if th["has_pairs"]:
                    m1 = masses[p_idx[:, 0], None]
                    m2 = masses[p_idx[:, 1], None]
                    mtot = m1 + m2
                    v_com = (m1 * v[p_idx[:, 0]] + m2 * v[p_idx[:, 1]]) / mtot
                    v_rel = v[p_idx[:, 0]] - v[p_idx[:, 1]]
                    ke2 = ke2 + jnp.sum(mtot * v_com * v_com)
                scale, cp, cv = propagate_chain(
                    ke2, aux["nh%d_pos" % i], aux["nh%d_vel" % i], kT,
                    th["dof_abs"], dt, tau, th["n_mts"], th["n_ys"])
                new_aux["nh%d_pos" % i] = cp
                new_aux["nh%d_vel" % i] = cv
                if s_idx.shape[0]:
                    v = v.at[s_idx].multiply(scale)
                if th["has_pairs"]:
                    # relative motion gets its own chain at relT
                    rkT = (BOLTZ * ip["rtemperature%d" % i]).astype(v.dtype)
                    rtau = 1.0 / ip["rfrequency%d" % i].astype(v.dtype)
                    mu = m1 * m2 / mtot
                    ke2r = jnp.sum(mu * v_rel * v_rel)
                    rscale, rcp, rcv = propagate_chain(
                        ke2r, aux["nhr%d_pos" % i], aux["nhr%d_vel" % i],
                        rkT, th["dof_rel"], dt, rtau, th["n_mts"],
                        th["n_ys"])
                    new_aux["nhr%d_pos" % i] = rcp
                    new_aux["nhr%d_vel" % i] = rcv
                    v_com = v_com * scale
                    v_rel = v_rel * rscale
                    v = v.at[p_idx[:, 0]].set(v_com + (m2 / mtot) * v_rel)
                    v = v.at[p_idx[:, 1]].set(v_com - (m1 / mtot) * v_rel)
            return v, new_aux

        def step(state, params_list):
            for hook, pidx in deps.update_hooks:
                state = hook(state, params_list)
            pos = state["positions"]
            vel = state["velocities"]
            ip = state["iparams"]
            dt = ip["dt"].astype(pos.dtype)
            aux = state["aux"]
            # B: full kick
            _, forces = deps.force_fn(pos, state["box"], params_list,
                                      state["gp"], state["faux"])
            v = vel + dt * forces * inv_m
            v = jnp.where(moving, v, vel)
            v = deps.apply_velocity_constraints(pos, v)
            # A half
            delta = 0.5 * dt * v
            # thermostats (replace the O step)
            v, aux = apply_thermostats(v, state, aux, dt)
            # A half
            delta = delta + 0.5 * dt * v
            new_pos_raw = pos + jnp.where(moving, delta, 0.0)
            # constraint-correction-only velocity recovery (see verlet.py:
            # re-deriving from rounded positions injects eps*|x|/dt kicks —
            # a real NVE-class leak for a deterministic thermostat chain)
            new_pos, corr = deps.apply_position_constraints_corr(
                pos, new_pos_raw)
            if corr is not None:
                v = v + jnp.where(moving, corr / dt, 0.0)
            new_pos = deps.compute_vsites(new_pos)
            state = dict(state)
            state = commit_positions(state, pos, new_pos)
            state["velocities"] = v
            state["aux"] = aux
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
