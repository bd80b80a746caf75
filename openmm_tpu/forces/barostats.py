"""Monte Carlo barostats: isotropic, anisotropic, and membrane.

Counterparts of openmmapi/include/openmm/MonteCarloBarostat.h (+Anisotropic,
+Membrane) and MonteCarloBarostatImpl::updateContextState
(openmmapi/src/MonteCarloBarostatImpl.cpp:64-115): every `frequency` steps,
propose a volume move dV ~ U(-s, s), scale molecule centers of mass, accept
with probability exp(-w/kT) where w = dE + P dV - N_mol kT ln(Vn/Vo); the
proposal width s self-tunes every 10 attempts toward 25-75% acceptance.

The whole accept/reject (including the two potential-energy evaluations)
runs inside the jitted step via lax.cond — the TPU translation of the
reference's host-side loop that calls getState(Energy) twice.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import unit as u
from ..constants import AVOGADRO, BOLTZ
from ..exceptions import OpenMMException
from .base import CompiledForce, Force

PRESSURE_UNIT_FACTOR = AVOGADRO * 1e-25  # bar -> kJ/mol/nm^3


def _scale_molecules(pos, mol_id, n_mol, masses, scale_vec):
    """Scale molecule centers of mass by scale_vec (3,), keeping internal
    geometry rigid (the scaleCoordinates kernel, monteCarloBarostat.cc)."""
    w = masses
    com_num = jax.ops.segment_sum(w[:, None] * pos, mol_id, num_segments=n_mol)
    com_den = jax.ops.segment_sum(w, mol_id, num_segments=n_mol)
    com = com_num / com_den[:, None]
    offset = com * (scale_vec[None, :] - 1.0)
    return pos + offset[mol_id]


class _BarostatBase(Force):
    def getFrequency(self):
        return self._frequency

    def setFrequency(self, freq):
        self._frequency = int(freq)

    def getDefaultTemperature(self):
        return u.Quantity(self._temperature, u.kelvin)

    def setDefaultTemperature(self, temp):
        self._temperature = float(u.strip(temp, u.kelvin))

    def getRandomNumberSeed(self):
        return self._seed

    def setRandomNumberSeed(self, seed):
        self._seed = int(seed)

    def usesPeriodicBoundaryConditions(self):
        return True


class MonteCarloBarostat(_BarostatBase):
    @staticmethod
    def Pressure():
        return "MonteCarloPressure"

    @staticmethod
    def Temperature():
        return "MonteCarloTemperature"

    def __init__(self, defaultPressure, defaultTemperature, frequency=25):
        super().__init__()
        self._pressure = float(u.strip(defaultPressure, u.bar))
        self._temperature = float(u.strip(defaultTemperature, u.kelvin))
        self._frequency = int(frequency)
        self._seed = 0

    def getDefaultPressure(self):
        return u.Quantity(self._pressure, u.bar)

    def setDefaultPressure(self, pressure):
        self._pressure = float(u.strip(pressure, u.bar))

    def _compile(self, system, cfg):
        freq = self._frequency
        dtype = cfg.dtype

        def init_aux(deps):
            box = system._box_array()
            vol = float(box[0][0] * box[1][1] * box[2][2])
            return {"volumeScale": jnp.asarray(0.01 * vol, dtype),
                    "numAttempted": jnp.zeros((), jnp.int32),
                    "numAccepted": jnp.zeros((), jnp.int32)}

        def update_state_fn(deps, state, params_list, aux):
            def attempt(operand):
                state, aux = operand
                pos = state["positions"]
                box = state["box"]
                gp = state["gp"]
                key, k1, k2 = jax.random.split(state["key"], 3)
                e0 = deps.energy_fn(pos, box, params_list, gp)
                vol = box[0, 0] * box[1, 1] * box[2, 2]
                dv = aux["volumeScale"] * 2.0 * (jax.random.uniform(k1, dtype=dtype) - 0.5)
                new_vol = vol + dv
                ls = (new_vol / vol) ** (1.0 / 3.0)
                scale_vec = jnp.array([ls, ls, ls], dtype)
                new_pos = _scale_molecules(pos, deps.molecule_id,
                                           deps.n_molecules, deps.masses,
                                           scale_vec)
                new_box = box * ls
                e1 = deps.energy_fn(new_pos, new_box, params_list, gp)
                p_md = gp[MonteCarloBarostat.Pressure()] * PRESSURE_UNIT_FACTOR
                kT = BOLTZ * gp[MonteCarloBarostat.Temperature()]
                w = (e1 - e0 + p_md * dv
                     - deps.n_molecules * kT * jnp.log(new_vol / vol))
                accept = (w <= 0) | (jax.random.uniform(k2, dtype=dtype)
                                     <= jnp.exp(-w / kT))
                pos_out = jnp.where(accept, new_pos, pos)
                box_out = jnp.where(accept, new_box, box)
                n_att = aux["numAttempted"] + 1
                n_acc = aux["numAccepted"] + accept.astype(jnp.int32)
                # self-tuning every 10 attempts (MonteCarloBarostatImpl.cpp:103)
                tune = n_att >= 10
                low = n_acc < 0.25 * n_att
                high = n_acc > 0.75 * n_att
                vs = aux["volumeScale"]
                vs = jnp.where(tune & low, vs / 1.1, vs)
                vs = jnp.where(tune & high,
                               jnp.minimum(vs * 1.1, vol * 0.3), vs)
                reset = tune & (low | high)
                n_att = jnp.where(reset, 0, n_att)
                n_acc = jnp.where(reset, 0, n_acc)
                new_state = dict(state)
                new_state["positions"] = pos_out
                new_state["box"] = box_out
                new_state["key"] = key
                return new_state, {"volumeScale": vs, "numAttempted": n_att,
                                   "numAccepted": n_acc}

            do = freq > 0 and True
            if not do:
                return state, aux
            trigger = (state["step"] % freq) == (freq - 1) if freq > 1 else True
            if freq == 1:
                return attempt((state, aux))
            return jax.lax.cond(trigger, attempt, lambda op: op, (state, aux))

        def energy_fn(pos, box, p, gp):
            return jnp.zeros((), cfg.accum_dtype)

        return CompiledForce(
            name=self.getName(), force_group=self.getForceGroup(),
            params={}, energy_fn=energy_fn, update_state_fn=update_state_fn,
            moves_positions=True,
            global_defaults={MonteCarloBarostat.Pressure(): self._pressure,
                             MonteCarloBarostat.Temperature(): self._temperature},
        )._with_init_aux(init_aux)


class MonteCarloAnisotropicBarostat(_BarostatBase):
    @staticmethod
    def PressureX():
        return "MonteCarloPressureX"

    @staticmethod
    def PressureY():
        return "MonteCarloPressureY"

    @staticmethod
    def PressureZ():
        return "MonteCarloPressureZ"

    @staticmethod
    def Temperature():
        return "MonteCarloTemperature"

    def __init__(self, defaultPressure, defaultTemperature, scaleX=True,
                 scaleY=True, scaleZ=True, frequency=25):
        super().__init__()
        p = u.strip(defaultPressure, u.bar)
        self._pressure = [float(p[0]), float(p[1]), float(p[2])]
        self._temperature = float(u.strip(defaultTemperature, u.kelvin))
        self._scale = [bool(scaleX), bool(scaleY), bool(scaleZ)]
        self._frequency = int(frequency)
        self._seed = 0
        if not any(self._scale):
            raise OpenMMException("No axes are being scaled")

    def getDefaultPressure(self):
        from ..vec3 import Vec3
        return u.Quantity(Vec3(*self._pressure), u.bar)

    def setDefaultPressure(self, pressure):
        p = u.strip(pressure, u.bar)
        self._pressure = [float(p[0]), float(p[1]), float(p[2])]

    def getScaleX(self):
        return self._scale[0]

    def getScaleY(self):
        return self._scale[1]

    def getScaleZ(self):
        return self._scale[2]

    def _compile(self, system, cfg):
        freq = self._frequency
        dtype = cfg.dtype
        axes = [i for i in range(3) if self._scale[i]]
        pressure_names = [MonteCarloAnisotropicBarostat.PressureX(),
                          MonteCarloAnisotropicBarostat.PressureY(),
                          MonteCarloAnisotropicBarostat.PressureZ()]

        def init_aux(deps):
            box = system._box_array()
            vol = float(box[0][0] * box[1][1] * box[2][2])
            return {"volumeScale": jnp.full((3,), 0.01 * vol, dtype),
                    "numAttempted": jnp.zeros((3,), jnp.int32),
                    "numAccepted": jnp.zeros((3,), jnp.int32)}

        def update_state_fn(deps, state, params_list, aux):
            def attempt(operand):
                state, aux = operand
                pos = state["positions"]
                box = state["box"]
                gp = state["gp"]
                key, k0, k1, k2 = jax.random.split(state["key"], 4)
                # pick a random enabled axis
                ax_choice = jax.random.randint(k0, (), 0, len(axes))
                axis = jnp.asarray(axes)[ax_choice]
                e0 = deps.energy_fn(pos, box, params_list, gp)
                vol = box[0, 0] * box[1, 1] * box[2, 2]
                dv = aux["volumeScale"][axis] * 2.0 * (jax.random.uniform(k1, dtype=dtype) - 0.5)
                new_vol = vol + dv
                ls = new_vol / vol
                scale_vec = jnp.ones(3, dtype).at[axis].set(ls)
                new_pos = _scale_molecules(pos, deps.molecule_id,
                                           deps.n_molecules, deps.masses,
                                           scale_vec)
                new_box = box * scale_vec[None, :]
                e1 = deps.energy_fn(new_pos, new_box, params_list, gp)
                p_all = jnp.stack([gp[nm] for nm in pressure_names])
                p_md = p_all[axis] * PRESSURE_UNIT_FACTOR
                kT = BOLTZ * gp[MonteCarloAnisotropicBarostat.Temperature()]
                w = (e1 - e0 + p_md * dv
                     - deps.n_molecules * kT * jnp.log(new_vol / vol))
                accept = (w <= 0) | (jax.random.uniform(k2, dtype=dtype)
                                     <= jnp.exp(-w / kT))
                pos_out = jnp.where(accept, new_pos, pos)
                box_out = jnp.where(accept, new_box, box)
                n_att = aux["numAttempted"].at[axis].add(1)
                n_acc = aux["numAccepted"].at[axis].add(accept.astype(jnp.int32))
                tune = n_att[axis] >= 10
                low = n_acc[axis] < 0.25 * n_att[axis]
                high = n_acc[axis] > 0.75 * n_att[axis]
                vs_ax = aux["volumeScale"][axis]
                vs_ax = jnp.where(tune & low, vs_ax / 1.1, vs_ax)
                vs_ax = jnp.where(tune & high, jnp.minimum(vs_ax * 1.1, vol * 0.3), vs_ax)
                vs = aux["volumeScale"].at[axis].set(vs_ax)
                reset = tune & (low | high)
                n_att = jnp.where(reset, n_att.at[axis].set(0), n_att)
                n_acc = jnp.where(reset, n_acc.at[axis].set(0), n_acc)
                new_state = dict(state)
                new_state["positions"] = pos_out
                new_state["box"] = box_out
                new_state["key"] = key
                return new_state, {"volumeScale": vs, "numAttempted": n_att,
                                   "numAccepted": n_acc}

            if freq == 1:
                return attempt((state, aux))
            trigger = (state["step"] % freq) == (freq - 1)
            return jax.lax.cond(trigger, attempt, lambda op: op, (state, aux))

        def energy_fn(pos, box, p, gp):
            return jnp.zeros((), cfg.accum_dtype)

        defaults = {pressure_names[i]: self._pressure[i] for i in range(3)}
        defaults[MonteCarloAnisotropicBarostat.Temperature()] = self._temperature
        return CompiledForce(
            name=self.getName(), force_group=self.getForceGroup(),
            params={}, energy_fn=energy_fn, update_state_fn=update_state_fn,
            moves_positions=True,
            global_defaults=defaults)._with_init_aux(init_aux)


class MonteCarloMembraneBarostat(_BarostatBase):
    # XYMode
    XYIsotropic = 0
    XYAnisotropic = 1
    # ZMode
    ZFree = 0
    ZFixed = 1
    ConstantVolume = 2

    @staticmethod
    def Pressure():
        return "MonteCarloPressure"

    @staticmethod
    def SurfaceTension():
        return "MonteCarloSurfaceTension"

    @staticmethod
    def Temperature():
        return "MonteCarloTemperature"

    def __init__(self, defaultPressure, defaultSurfaceTension,
                 defaultTemperature, xymode=0, zmode=0, frequency=25):
        super().__init__()
        self._pressure = float(u.strip(defaultPressure, u.bar))
        self._tension = float(u.strip(defaultSurfaceTension, u.bar * u.nanometer))
        self._temperature = float(u.strip(defaultTemperature, u.kelvin))
        self._xymode = int(xymode)
        self._zmode = int(zmode)
        self._frequency = int(frequency)
        self._seed = 0

    def getDefaultPressure(self):
        return u.Quantity(self._pressure, u.bar)

    def getDefaultSurfaceTension(self):
        return u.Quantity(self._tension, u.bar * u.nanometer)

    def getXYMode(self):
        return self._xymode

    def getZMode(self):
        return self._zmode

    def _compile(self, system, cfg):
        freq = self._frequency
        dtype = cfg.dtype
        xymode = self._xymode
        zmode = self._zmode

        def init_aux(deps):
            box = system._box_array()
            vol = float(box[0][0] * box[1][1] * box[2][2])
            return {"volumeScale": jnp.full((2,), 0.01 * vol, dtype),
                    "numAttempted": jnp.zeros((2,), jnp.int32),
                    "numAccepted": jnp.zeros((2,), jnp.int32)}

        def update_state_fn(deps, state, params_list, aux):
            def attempt(operand):
                state, aux = operand
                pos = state["positions"]
                box = state["box"]
                gp = state["gp"]
                key, k0, k1, k2 = jax.random.split(state["key"], 4)
                slot = jax.random.randint(k0, (), 0, 2)  # 0: xy move, 1: z move
                e0 = deps.energy_fn(pos, box, params_list, gp)
                lx, ly, lz = box[0, 0], box[1, 1], box[2, 2]
                vol = lx * ly * lz
                dv = aux["volumeScale"][slot] * 2.0 * (jax.random.uniform(k1, dtype=dtype) - 0.5)
                new_vol = vol + dv
                s = new_vol / vol
                sxy = jnp.sqrt(s)
                if zmode == MonteCarloMembraneBarostat.ZFixed:
                    scale_xy = jnp.array([sxy, sxy, 1.0], dtype)
                    scale_z = jnp.array([1.0, 1.0, 1.0], dtype)  # no z moves
                elif zmode == MonteCarloMembraneBarostat.ConstantVolume:
                    scale_xy = jnp.array([sxy, sxy, 1.0 / s], dtype)
                    scale_z = jnp.array([1.0, 1.0, 1.0], dtype)
                else:
                    scale_xy = jnp.array([sxy, sxy, 1.0], dtype)
                    scale_z = jnp.array([1.0, 1.0, s], dtype)
                scale_vec = jnp.where(slot == 0, scale_xy, scale_z)
                new_pos = _scale_molecules(pos, deps.molecule_id,
                                           deps.n_molecules, deps.masses,
                                           scale_vec)
                new_box = box * scale_vec[None, :]
                e1 = deps.energy_fn(new_pos, new_box, params_list, gp)
                p_md = gp[MonteCarloMembraneBarostat.Pressure()] * PRESSURE_UNIT_FACTOR
                gamma = gp[MonteCarloMembraneBarostat.SurfaceTension()] * PRESSURE_UNIT_FACTOR
                kT = BOLTZ * gp[MonteCarloMembraneBarostat.Temperature()]
                new_area = new_box[0, 0] * new_box[1, 1]
                d_area = new_area - lx * ly
                dv_eff = new_box[0, 0] * new_box[1, 1] * new_box[2, 2] - vol
                w = (e1 - e0 + p_md * dv_eff - gamma * d_area
                     - deps.n_molecules * kT * jnp.log(new_vol / vol))
                accept = (w <= 0) | (jax.random.uniform(k2, dtype=dtype)
                                     <= jnp.exp(-w / kT))
                pos_out = jnp.where(accept, new_pos, pos)
                box_out = jnp.where(accept, new_box, box)
                n_att = aux["numAttempted"].at[slot].add(1)
                n_acc = aux["numAccepted"].at[slot].add(accept.astype(jnp.int32))
                tune = n_att[slot] >= 10
                low = n_acc[slot] < 0.25 * n_att[slot]
                high = n_acc[slot] > 0.75 * n_att[slot]
                vs_s = aux["volumeScale"][slot]
                vs_s = jnp.where(tune & low, vs_s / 1.1, vs_s)
                vs_s = jnp.where(tune & high, jnp.minimum(vs_s * 1.1, vol * 0.3), vs_s)
                vs = aux["volumeScale"].at[slot].set(vs_s)
                reset = tune & (low | high)
                n_att = jnp.where(reset, n_att.at[slot].set(0), n_att)
                n_acc = jnp.where(reset, n_acc.at[slot].set(0), n_acc)
                new_state = dict(state)
                new_state["positions"] = pos_out
                new_state["box"] = box_out
                new_state["key"] = key
                return new_state, {"volumeScale": vs, "numAttempted": n_att,
                                   "numAccepted": n_acc}

            if freq == 1:
                return attempt((state, aux))
            trigger = (state["step"] % freq) == (freq - 1)
            return jax.lax.cond(trigger, attempt, lambda op: op, (state, aux))

        def energy_fn(pos, box, p, gp):
            return jnp.zeros((), cfg.accum_dtype)

        return CompiledForce(
            name=self.getName(), force_group=self.getForceGroup(),
            params={}, energy_fn=energy_fn, update_state_fn=update_state_fn,
            moves_positions=True,
            global_defaults={
                MonteCarloMembraneBarostat.Pressure(): self._pressure,
                MonteCarloMembraneBarostat.SurfaceTension(): self._tension,
                MonteCarloMembraneBarostat.Temperature(): self._temperature,
            })._with_init_aux(init_aux)


class RPMDUpdater:
    """Marker base for forces designed to work with RPMDIntegrator
    (plugins/rpmd/openmmapi/include/openmm/RPMDUpdater.h): their state
    update runs ONCE at the start of each RPMD step over the full
    ring-polymer state (all copies), instead of once per copy the way
    updateContextState would.  The RPMD integrator applies the update
    hooks of such forces to the seeded per-copy state (integrators/
    rpmd.py step fn), which is exactly updateRPMDState's contract."""

    def updateRPMDState(self, context):
        """Invoked by RPMDIntegrator at the start of each step.  The
        default implementation is a no-op: the compiled update hook runs
        inside the jitted step (the TPU-native form of this callback)."""


class RPMDMonteCarloBarostat(RPMDUpdater, _BarostatBase):
    """Monte Carlo barostat for ring-polymer MD (RPMDMonteCarloBarostatImpl
    .cpp:51-156): a volume move scales the molecule COMs of the CENTROID and
    applies the same rigid offset to every copy; acceptance uses the mean
    potential energy over copies at the integrator's temperature."""

    @staticmethod
    def Pressure():
        return "RPMDMonteCarloPressure"

    def __init__(self, defaultPressure, frequency=25):
        super().__init__()
        self._pressure = float(u.strip(defaultPressure, u.bar))
        self._frequency = int(frequency)
        self._seed = 0

    def getDefaultPressure(self):
        return u.Quantity(self._pressure, u.bar)

    def setDefaultPressure(self, pressure):
        self._pressure = float(u.strip(pressure, u.bar))

    def _compile(self, system, cfg):
        freq = self._frequency
        dtype = cfg.dtype

        def init_aux(deps):
            box = system._box_array()
            vol = float(box[0][0] * box[1][1] * box[2][2])
            return {"volumeScale": jnp.asarray(0.01 * vol, dtype),
                    "numAttempted": jnp.zeros((), jnp.int32),
                    "numAccepted": jnp.zeros((), jnp.int32)}

        def update_state_fn(deps, state, params_list, aux):
            if "rp_pos" not in state["aux"]:
                raise OpenMMException(
                    "RPMDMonteCarloBarostat must be used with an "
                    "RPMDIntegrator")

            def attempt(operand):
                state, aux = operand
                rp_pos = state["aux"]["rp_pos"]      # (k, n, 3)
                box = state["box"]
                gp = state["gp"]
                key, k1, k2 = jax.random.split(state["key"], 3)

                def copy_energy(p):
                    return deps.energy_fn(p, box, params_list, gp)

                e0 = jnp.sum(jax.vmap(copy_energy)(rp_pos))
                centroid = jnp.mean(rp_pos, axis=0)
                vol = box[0, 0] * box[1, 1] * box[2, 2]
                dv = aux["volumeScale"] * 2.0 * (
                    jax.random.uniform(k1, dtype=dtype) - 0.5)
                new_vol = vol + dv
                ls = (new_vol / vol) ** (1.0 / 3.0)
                scale_vec = jnp.array([ls, ls, ls], dtype)
                new_centroid = _scale_molecules(
                    centroid, deps.molecule_id, deps.n_molecules,
                    deps.masses, scale_vec)
                delta = new_centroid - centroid
                new_rp = rp_pos + delta[None]
                new_box = box * ls

                def copy_energy_new(p):
                    return deps.energy_fn(p, new_box, params_list, gp)

                e1 = jnp.sum(jax.vmap(copy_energy_new)(new_rp))
                k_copies = rp_pos.shape[0]
                p_md = gp[RPMDMonteCarloBarostat.Pressure()] \
                    * PRESSURE_UNIT_FACTOR
                kT = BOLTZ * state["iparams"]["temperature"]
                w = (e1 - e0) / k_copies + p_md * dv \
                    - deps.n_molecules * kT * jnp.log(new_vol / vol)
                accept = (w <= 0) | (jax.random.uniform(k2, dtype=dtype)
                                     <= jnp.exp(-w / kT))
                rp_out = jnp.where(accept, new_rp, rp_pos)
                box_out = jnp.where(accept, new_box, box)
                n_att = aux["numAttempted"] + 1
                n_acc = aux["numAccepted"] + accept.astype(jnp.int32)
                tune = n_att >= 10
                low = n_acc < 0.25 * n_att
                high = n_acc > 0.75 * n_att
                vs = aux["volumeScale"]
                vs = jnp.where(tune & low, vs / 1.1, vs)
                vs = jnp.where(tune & high,
                               jnp.minimum(vs * 1.1, vol * 0.3), vs)
                reset = tune & (low | high)
                n_att = jnp.where(reset, 0, n_att)
                n_acc = jnp.where(reset, 0, n_acc)
                new_state = dict(state)
                new_state["aux"] = dict(state["aux"], rp_pos=rp_out)
                new_state["positions"] = rp_out[0]
                new_state["box"] = box_out
                new_state["key"] = key
                return new_state, {"volumeScale": vs, "numAttempted": n_att,
                                   "numAccepted": n_acc}

            if freq <= 0:
                return state, aux
            trigger = (state["step"] % freq) == (freq - 1) if freq > 1 \
                else True
            if freq == 1:
                return attempt((state, aux))
            return jax.lax.cond(trigger, attempt, lambda op: op,
                                (state, aux))

        def energy_fn(pos, box, p, gp):
            return jnp.zeros((), cfg.accum_dtype)

        return CompiledForce(
            name=self.getName(), force_group=self.getForceGroup(),
            params={}, energy_fn=energy_fn, update_state_fn=update_state_fn,
            moves_positions=True,
            global_defaults={
                RPMDMonteCarloBarostat.Pressure(): self._pressure},
        )._with_init_aux(init_aux)
