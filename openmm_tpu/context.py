"""Context: binds a System + Integrator to device state and jitted programs.

TPU-native counterpart of Context/ContextImpl
(/root/reference/openmmapi/src/ContextImpl.cpp): where the reference selects a
platform, instantiates 36 kernels and drives them per step (ContextImpl.cpp
:113-190, :293-323), this Context compiles every Force into a differentiable
energy module, fuses them into one step(state, params) function per
force-group mask, jits it once, and drives n steps with lax.fori_loop — the
hot loop never leaves the device (the property the reference's launch-only
loop approximates, SURVEY §3.2).

Covers: platform/precision selection, molecule detection
(ContextImpl.cpp:345-429), constraint setup (SETTLE/CCMA partition per
IntegrationUtilities.cpp:132-199), virtual sites, global parameters,
updateParametersInContext, getState incl. per-molecule wrapping
(Context.cpp:122-143), checkpoints (ContextImpl.cpp:445-490),
setVelocitiesToTemperature, applyConstraints.
"""
from __future__ import annotations

import io
import os

import numpy as np

from . import unit as u
from .constants import BOLTZ
from .exceptions import OpenMMException
from .forces.base import CompileConfig, CompiledForce
from .integrators.base import StepDeps
from .platform import Platform
from .state import State
from .vec3 import Vec3

_F64_SUPPORT_CACHE = {}


def _jnp():
    import jax.numpy as jnp
    return jnp


def _backend_supports_f64(device):
    key = device.platform
    if key not in _F64_SUPPORT_CACHE:
        import jax
        import jax.numpy as jnp
        try:
            x = jax.device_put(np.zeros((), np.float64), device)
            (x + 1.0).block_until_ready()
            _F64_SUPPORT_CACHE[key] = True
        except Exception:
            _F64_SUPPORT_CACHE[key] = False
    return _F64_SUPPORT_CACHE[key]


class Context(object):
    def __init__(self, system, integrator, platform=None, properties=None):
        import jax
        import jax.numpy as jnp

        self._system = system
        self._integrator = integrator
        if platform is None:
            platform = Platform.findPlatform()
        elif isinstance(platform, str):
            platform = Platform.getPlatformByName(platform)
        self._platform = platform
        self._properties = dict(properties or {})
        for prop in self._properties:
            if prop not in platform.getPropertyNames():
                raise OpenMMException("Illegal property name: " + prop)

        # --- device & precision profile -----------------------------------
        pname = platform.getName()
        precision = self._properties.get(
            "Precision", platform.getPropertyDefaultValue("Precision"))
        if pname in ("Reference", "CPU"):
            self._device = jax.devices("cpu")[0]
        else:
            self._device = jax.devices()[0]
        if precision == "double":
            if not _backend_supports_f64(self._device):
                self._device = jax.devices("cpu")[0]
            self._dtype = jnp.float64
            self._accum_dtype = jnp.float64
        elif precision == "mixed":
            self._dtype = jnp.float32
            # compensated (f32x2) position accumulation — the TPU-native
            # analog of the reference's posq correction arrays
            # (ComputeContext.h:309): forces stay f32, integrated positions
            # keep ~f64-equivalent precision
            self._pos_compensated = True
            # f64 accumulation only where it's native (CPU); on TPU f64 is
            # emulated and would dominate the step cost — mixed there means
            # f32 compute + f64 scalar bookkeeping (time), like the
            # reference's f32+fixed-point design (ComputeContext.h:309)
            self._accum_dtype = (jnp.float64
                                 if self._device.platform == "cpu"
                                 else jnp.float32)
        else:
            self._dtype = jnp.float32
            self._accum_dtype = jnp.float32
        if not hasattr(self, "_pos_compensated"):
            self._pos_compensated = False
        self._time_dtype = (jnp.float64 if _backend_supports_f64(self._device)
                            else jnp.float32)

        n = system.getNumParticles()
        if n == 0:
            raise OpenMMException("Cannot create a Context for a System with no particles")
        self._n = n

        # --- validation (ContextImpl.cpp:63-92) ----------------------------
        masses = system._masses_array()
        for idx in system._vsites:
            if masses[idx] != 0.0:
                raise OpenMMException(
                    "Virtual site at index %d must have mass 0" % idx)
        for (p1, p2, d) in system._constraints:
            if masses[p1] == 0.0 or masses[p2] == 0.0:
                raise OpenMMException(
                    "A constraint cannot involve a massless particle")

        # --- compile forces -------------------------------------------------
        from .parallel import get_default_mesh
        cfg = CompileConfig(
            n_particles=n, dtype=self._dtype, accum_dtype=self._accum_dtype,
            masses=masses, uses_pbc=system.usesPeriodicBoundaryConditions(),
            platform_name=pname,
            pair_block=256 if pname != "Reference" else 128,
            mesh=get_default_mesh())
        self._cfg = cfg
        self._modules = []
        self._module_force = []   # parallel list: owning Force object
        with jax.default_device(self._device):
            for force in system.getForces():
                compiled = force._compile(system, cfg)
                if isinstance(compiled, CompiledForce):
                    compiled = [compiled]
                for m in compiled:
                    self._modules.append(m)
                    self._module_force.append(force)

        # --- global parameters ----------------------------------------------
        self._gp_defaults = {}
        for m in self._modules:
            for name, val in m.global_defaults.items():
                self._gp_defaults[name] = val

        # --- molecules (union-find over constraints/bonds/vsites) ------------
        self._molecule_id, self._n_molecules = self._detect_molecules()

        # --- constraints ------------------------------------------------------
        from .ops import constraints as cons_mod
        settle_clusters, rest_cons = cons_mod.partition_constraints(
            system._constraints, masses)
        shake_clusters, ccma_cons = cons_mod.partition_shake_clusters(
            rest_cons, masses)
        angles = []
        from .forces.bonded import HarmonicAngleForce
        for force in system.getForces():
            if isinstance(force, HarmonicAngleForce):
                for (p1, p2, p3, theta0, k) in force._angles:
                    angles.append((p1, p2, p3, theta0))
        with jax.default_device(self._device):
            self._settle = cons_mod.make_settle(settle_clusters, masses, self._dtype)
            self._shake = cons_mod.make_shake(shake_clusters, masses, self._dtype)
            self._ccma = cons_mod.make_ccma(ccma_cons, masses, angles, self._dtype)
        self._has_constraints = bool(system._constraints)

        # --- virtual sites -----------------------------------------------------
        from .ops.vsites import make_vsite_updater
        with jax.default_device(self._device):
            self._vsite_update = make_vsite_updater(system, self._dtype)

        # --- masses on device ---------------------------------------------------
        with jax.default_device(self._device):
            self._masses_dev = jnp.asarray(masses.astype(self._dtype))
            inv = np.where(masses == 0.0, 0.0, 1.0 / np.where(masses == 0, 1.0, masses))
            self._inv_masses_dev = jnp.asarray(inv.astype(self._dtype))
            self._params = [m.params for m in self._modules]
            self._molecule_id_dev = jnp.asarray(self._molecule_id)

        # --- initial state ---------------------------------------------------------
        seed = getattr(integrator, "_seed", 0) or 0
        if seed == 0:
            seed = int(np.random.randint(1, 2 ** 31 - 1))
        with jax.default_device(self._device):
            self._state = {
                "positions": jnp.zeros((n, 3), self._dtype),
                "velocities": jnp.zeros((n, 3), self._dtype),
                "box": jnp.asarray(system._box_array().astype(self._dtype)),
                "time": jnp.zeros((), self._time_dtype),
                "step": jnp.zeros((), jnp.int64 if _backend_supports_f64(self._device) else jnp.int32),
                "key": jax.random.PRNGKey(seed),
                "gp": {k: jnp.asarray(v, self._dtype)
                       for k, v in self._gp_defaults.items()},
                "iparams": {},
                "faux": {},
            }
            if self._pos_compensated:
                self._state["pos_lo"] = jnp.zeros((n, 3), self._dtype)
                if getattr(integrator, "_supports_vel_compensation", False):
                    # f32x2 velocity plane (reference mixed precision keeps
                    # velm in double; integrators that opt in accumulate the
                    # leapfrog velocity as a compensated pair)
                    self._state["vel_lo"] = jnp.zeros((n, 3), self._dtype)
        self._positions_set = False

        # --- deps bundle + jit caches --------------------------------------------
        self._deps = self._make_deps()
        # per-force aux state
        with jax.default_device(self._device):
            for i, m in enumerate(self._modules):
                if m.init_aux is not None:
                    self._state["faux"][str(i)] = m.init_aux(self._deps)
            # integrator-local variables (chain positions, custom variables...)
            self._state["aux"] = integrator._init_aux(self._deps)
        self._sync_integrator_params()
        self._step_fn_cache = {}
        self._ef_fn_cache = {}
        self._ke_fn_cache = {}
        integrator._bind(self)

    # ------------------------------------------------------------------ deps
    def _make_deps(self):
        import jax
        import jax.numpy as jnp
        deps = StepDeps(
            n_particles=self._n, dtype=self._dtype,
            masses=self._masses_dev, inv_masses=self._inv_masses_dev,
            molecule_id=self._molecule_id_dev, n_molecules=self._n_molecules,
            has_constraints=self._has_constraints)

        settle, ccma, vsite = self._settle, self._ccma, self._vsite_update
        shake = self._shake

        def apply_position_constraints(ref, new):
            if settle is not None:
                new = settle[0](ref, new)
            if shake is not None:
                new = shake[0](ref, new)
            if ccma is not None:
                new = ccma[0](ref, new)
            return new

        def apply_position_constraints_corr(ref, new):
            """(constrained, corr) with constrained == new + corr and corr
            EXACTLY zero on unconstrained atoms (None when the system has no
            constraints).  Integrators recover velocity from corr alone:
            re-deriving v from rounded positions injects an eps*|x|/dt
            velocity kick per step (measured +0.7 kT/dof/ns on 512 LJ
            argon)."""
            if settle is None and shake is None and ccma is None:
                return new, None
            corr = None
            if settle is not None:
                c = settle[2](ref, new)
                new = new + c
                corr = c
            for stage in (shake, ccma):
                if stage is not None:
                    out = stage[0](ref, new)
                    c = out - new  # Sterbenz-exact f32 difference
                    new = out
                    corr = c if corr is None else corr + c
            return new, corr

        def apply_velocity_constraints(pos, vel):
            if settle is not None:
                vel = settle[1](pos, vel)
            if shake is not None:
                vel = shake[1](pos, vel)
            if ccma is not None:
                vel = ccma[1](pos, vel)
            return vel

        def compute_vsites(pos):
            if vsite is not None:
                pos = vsite(pos)
            return pos

        deps.apply_position_constraints = apply_position_constraints
        deps.apply_position_constraints_corr = apply_position_constraints_corr
        deps.apply_velocity_constraints = apply_velocity_constraints
        deps.compute_vsites = compute_vsites
        # jitted variants for host-initiated calls (setPositions,
        # applyConstraints, setVelocitiesToTemperature): eager op-by-op
        # execution would trigger one XLA compile per op on remote backends
        self._jit_pos_constraints = jax.jit(apply_position_constraints)
        self._jit_vel_constraints = jax.jit(apply_velocity_constraints)
        self._jit_vsites = jax.jit(compute_vsites)

        modules = self._modules

        def potential_energy(pos, box, params_list, gp, groups=-1):
            pos_full = compute_vsites(pos)
            e = jnp.zeros((), self._accum_dtype)
            for m, p in zip(modules, params_list):
                if m.energy_fn is None:
                    continue
                if m.force_group >= 0 and not (groups & (1 << m.force_group)):
                    continue
                if m.force_group < 0 and not (groups & (1 << 0)):
                    # merged recip modules with group -1 follow group 0
                    continue
                e = e + m.energy_fn(pos_full, box, p, gp).astype(self._accum_dtype)
            return e

        def module_active(m, groups):
            if m.force_group >= 0:
                return bool(groups & (1 << m.force_group))
            return bool(groups & 1)

        # analytic ef_fn shortcuts are valid only when no virtual sites exist
        # (autodiff composes the vsite chain rule; hand-written forces do not)
        allow_fast = self._vsite_update is None

        def force_fn_factory(groups, want_energy=True):
            def pe(pos, box, params_list, gp):
                return potential_energy(pos, box, params_list, gp, groups)

            fast = [(m, i) for i, m in enumerate(modules)
                    if m.ef_fn is not None and module_active(m, groups)] \
                if allow_fast else []
            fast_idx = {i for _, i in fast}

            def ef(pos, box, params_list, gp, faux=None):
                e_total = jnp.zeros((), self._accum_dtype)
                f_total = jnp.zeros_like(pos)
                for m, i in fast:
                    kw = ({"want_energy": want_energy}
                          if m.ef_takes_want_energy else {})
                    if m.needs_aux:
                        aux = None if faux is None else faux.get(str(i))
                        e_m, f_m = m.ef_fn(pos, box, params_list[i], gp, aux,
                                           **kw)
                    else:
                        e_m, f_m = m.ef_fn(pos, box, params_list[i], gp, **kw)
                    e_total = e_total + e_m.astype(self._accum_dtype)
                    f_total = f_total + f_m

                def pe_rest(pos):
                    pos_full = compute_vsites(pos)
                    e = jnp.zeros((), self._accum_dtype)
                    for i, m in enumerate(modules):
                        if m.energy_fn is None or i in fast_idx \
                                or not module_active(m, groups):
                            continue
                        e = e + m.energy_fn(pos_full, box, params_list[i],
                                            gp).astype(self._accum_dtype)
                    return e

                e_rest, g = jax.value_and_grad(pe_rest)(pos)
                return e_total + e_rest, f_total - g

            return pe, ef

        deps._potential_energy = potential_energy
        deps._force_fn_factory = force_fn_factory
        # all-groups closures for hooks (barostat); integrator steps consume
        # only forces, so the default force_fn skips the energy lanes
        pe_all, _ = force_fn_factory(-1)
        _, ef_fast = force_fn_factory(-1, want_energy=False)
        deps.energy_fn = pe_all
        deps.force_fn = ef_fast

        # update hooks; cache refreshers (neighbor lists) run LAST so they
        # see positions after any barostat/thermostat state mutation
        hooks = []

        def make_hook(fn, i):
            def hook(state, params_list):
                aux = state["faux"].get(str(i))
                new_state, new_aux = fn(deps, state, params_list, aux)
                if new_aux is not None:
                    new_state = dict(new_state)
                    new_state["faux"] = dict(new_state["faux"])
                    new_state["faux"][str(i)] = new_aux
                return new_state
            return hook

        for i, m in enumerate(modules):
            if m.update_state_fn is not None:
                hooks.append((make_hook(m.update_state_fn, i), i))
        refreshers = []
        for i, m in enumerate(modules):
            if m.refresh_fn is not None:
                # refreshers need their own params entry; record the index
                m.refresh_fn.param_index = i
                refreshers.append((make_hook(m.refresh_fn, i), i))
        deps.update_hooks = hooks + refreshers
        deps.refresh_hooks = refreshers
        return deps

    def _deps_for_groups(self, groups):
        """A shallow copy of deps with force_fn restricted to `groups`."""
        import copy
        deps = copy.copy(self._deps)
        pe, _ = self._deps._force_fn_factory(groups)
        _, ef = self._deps._force_fn_factory(groups, want_energy=False)
        deps.force_fn = ef
        # energy_fn (used by barostat) stays all-groups semantics?  The
        # reference passes the integrator's groups to the barostat energy
        # evaluation (MonteCarloBarostatImpl.cpp:71-72), so restrict both.
        deps.energy_fn = pe
        return deps

    def _refresh_aux(self):
        """Bring cache-type faux entries (neighbor lists) up to date with the
        current positions before a host-initiated force evaluation; a cheap
        predicate-only no-op when nothing moved since the last build."""
        import jax
        if not self._deps.refresh_hooks:
            return
        if not hasattr(self, "_jit_refresh"):
            hooks = self._deps.refresh_hooks

            def refresh(state, params_list):
                for hook, _ in hooks:
                    state = hook(state, params_list)
                return state

            with jax.default_device(self._device):
                self._jit_refresh = jax.jit(refresh)
        with jax.default_device(self._device):
            self._state = self._jit_refresh(self._state, self._params)

    # ---------------------------------------------------- capacity escalation
    def _neighbor_overflowed(self):
        """True when any persistent neighbor list recorded a capacity
        overflow (the `valid` flag of the reference's retry loop,
        ContextImpl.cpp:298-307)."""
        for i, m in enumerate(self._modules):
            if not m.needs_aux:
                continue
            aux = self._state["faux"].get(str(i))
            if aux is not None and "overflow" in aux \
                    and int(aux["overflow"]) > 0:
                return True
        return False

    def _escalate_neighbor_capacity(self):
        """Grow neighbor capacities and recompile (the resize half of the
        reference's overflow retry)."""
        import jax
        for force in set(self._module_force):
            if hasattr(force, "_escalate_nl_capacity"):
                force._escalate_nl_capacity()
        with jax.default_device(self._device):
            modules, module_force = [], []
            for force in self._system.getForces():
                compiled = force._compile(self._system, self._cfg)
                if isinstance(compiled, CompiledForce):
                    compiled = [compiled]
                for m in compiled:
                    modules.append(m)
                    module_force.append(force)
        self._modules = modules
        self._module_force = module_force
        with jax.default_device(self._device):
            self._params = [m.params for m in self._modules]
        self._deps = self._make_deps()
        # re-init aux entries whose shapes changed; keep matching ones
        # (barostat statistics survive an unrelated neighbor resize)
        import jax.tree_util as jtu
        with jax.default_device(self._device):
            old_faux = self._state["faux"]
            faux = {}
            for i, m in enumerate(self._modules):
                if m.init_aux is None:
                    continue
                fresh = m.init_aux(self._deps)
                old = old_faux.get(str(i))
                same = (old is not None
                        and jtu.tree_structure(old) == jtu.tree_structure(fresh)
                        and all(getattr(a, "shape", None) == getattr(b, "shape", None)
                                for a, b in zip(jtu.tree_leaves(old),
                                                jtu.tree_leaves(fresh))))
                faux[str(i)] = old if same else fresh
            self._state = dict(self._state)
            self._state["faux"] = faux
        self._step_fn_cache.clear()
        self._ef_fn_cache.clear()
        self._ke_fn_cache.clear()
        if hasattr(self, "_jit_refresh"):
            del self._jit_refresh

    # ------------------------------------------------------------ accessors
    def getSystem(self):
        return self._system

    def getIntegrator(self):
        return self._integrator

    def getPlatform(self):
        return self._platform

    def setTime(self, time):
        jnp = _jnp()
        self._state["time"] = jnp.asarray(
            float(u.strip(time, u.picosecond)), self._time_dtype)

    def getTime(self):
        return u.Quantity(float(self._state["time"]), u.picosecond)

    def setStepCount(self, count):
        jnp = _jnp()
        self._state["step"] = jnp.asarray(int(count), self._state["step"].dtype)

    def getStepCount(self):
        return int(self._state["step"])

    def setPositions(self, positions):
        jnp = _jnp()
        pos = np.asarray(u.strip(positions, u.nanometer), np.float64)
        if pos.shape != (self._n, 3):
            raise OpenMMException(
                "setPositions: expected %d positions, got %s" % (self._n, pos.shape))
        with __import__("jax").default_device(self._device):
            arr = jnp.asarray(pos.astype(self._dtype))
            if self._vsite_update is not None:
                arr = self._jit_vsites(arr)
        self._state["positions"] = arr
        if self._pos_compensated:
            # keep the f64 residual the f32 cast dropped
            lo = pos - np.asarray(arr, np.float64)
            with __import__("jax").default_device(self._device):
                self._state["pos_lo"] = jnp.asarray(
                    lo.astype(self._dtype))
        self._positions_set = True

    def setVelocities(self, velocities):
        jnp = _jnp()
        vel = np.asarray(u.strip(velocities, u.nanometer / u.picosecond), np.float64)
        if vel.shape != (self._n, 3):
            raise OpenMMException("setVelocities: wrong shape")
        self._state["velocities"] = jnp.asarray(vel.astype(self._dtype))
        if "vel_lo" in self._state:
            lo = vel - np.asarray(self._state["velocities"], np.float64)
            self._state["vel_lo"] = jnp.asarray(lo.astype(self._dtype))

    def setVelocitiesToTemperature(self, temperature, randomSeed=None):
        import jax
        jnp = _jnp()
        temp = float(u.strip(temperature, u.kelvin))
        if randomSeed is None:
            randomSeed = int(np.random.randint(1, 2 ** 31 - 1))
        if not hasattr(self, "_jit_sample_velocities"):
            def _sample(key, temp_val, pos):
                kT = BOLTZ * temp_val
                sigma = jnp.sqrt(kT * self._inv_masses_dev)[:, None]
                v = sigma * jax.random.normal(key, (self._n, 3),
                                              dtype=self._dtype)
                return self._deps.apply_velocity_constraints(pos, v)
            with jax.default_device(self._device):
                self._jit_sample_velocities = jax.jit(_sample)
        with jax.default_device(self._device):
            key = jax.random.PRNGKey(int(randomSeed))
            self._state["velocities"] = self._jit_sample_velocities(
                key, jnp.asarray(temp, self._dtype),
                self._state["positions"])
            if "vel_lo" in self._state:
                self._state["vel_lo"] = jnp.zeros_like(
                    self._state["vel_lo"])

    def setPeriodicBoxVectors(self, a, b, c):
        jnp = _jnp()
        from .system import _validate_box
        av = Vec3(*u.strip(a, u.nanometer))
        bv = Vec3(*u.strip(b, u.nanometer))
        cv = Vec3(*u.strip(c, u.nanometer))
        _validate_box(av, bv, cv)
        self._state["box"] = jnp.asarray(
            np.asarray([av, bv, cv], np.float64).astype(self._dtype))

    def getParameter(self, name):
        if name not in self._state["gp"]:
            raise OpenMMException("Called getParameter() with invalid parameter name: " + name)
        return float(self._state["gp"][name])

    def getParameters(self):
        return {k: float(v) for k, v in self._state["gp"].items()}

    def setParameter(self, name, value):
        jnp = _jnp()
        if name not in self._state["gp"]:
            raise OpenMMException("Called setParameter() with invalid parameter name: " + name)
        self._state["gp"] = dict(self._state["gp"],
                                 **{name: jnp.asarray(float(u.strip(value)), self._dtype)})

    def setState(self, state):
        """Restore a Context from a State object (Context::setState)."""
        types = state.getDataTypes()
        if state._box is not None:
            b = np.asarray(state._box)
            self.setPeriodicBoxVectors(Vec3(*b[0]), Vec3(*b[1]), Vec3(*b[2]))
        self.setTime(state._time)
        self.setStepCount(state._stepCount)
        if types & State.Positions:
            self.setPositions(state.getPositions(asNumpy=True))
        if types & State.Velocities:
            self.setVelocities(state.getVelocities(asNumpy=True))
        if types & State.Parameters:
            for k, v in state.getParameters().items():
                if k in self._state["gp"]:
                    self.setParameter(k, v)
        if types & State.IntegratorParameters:
            jnp = _jnp()
            ip = dict(self._state["iparams"])
            for k, v in state.getIntegratorParameters().items():
                ip[k] = jnp.asarray(v, self._dtype)
            self._state["iparams"] = ip

    def getMolecules(self):
        out = [[] for _ in range(self._n_molecules)]
        for atom, mol in enumerate(self._molecule_id):
            out[mol].append(atom)
        return out

    # ------------------------------------------------------------- stepping
    def _sync_integrator_params(self):
        jnp = _jnp()
        ip = self._integrator._integrator_params()
        self._state["iparams"] = {
            k: jnp.asarray(v, self._dtype) for k, v in ip.items()}

    def _step(self, n_steps):
        self._step_with_cache_key(n_steps, extra_key=None)

    def _step_with_cache_key(self, n_steps, extra_key=None):
        import jax
        if not self._positions_set:
            raise OpenMMException("Particle positions have not been set")
        groups = self._integrator.getIntegrationForceGroups()

        def get_fn():
            cache_key = ("step", groups, extra_key)
            if cache_key not in self._step_fn_cache:
                deps = self._deps_for_groups(groups)
                deps.update_hooks = self._deps.update_hooks
                step_fn = self._integrator._make_step_fn(deps)

                def run(state, params_list, n):
                    def body(i, s):
                        return step_fn(s, params_list)
                    return jax.lax.fori_loop(0, n, body, state)

                with jax.default_device(self._device):
                    self._step_fn_cache[cache_key] = jax.jit(run)
            return self._step_fn_cache[cache_key]

        # cap the steps per device dispatch: a single very long fori_loop
        # execution can exceed the remote-tunnel RPC deadline and take the
        # worker down; chunking costs one dispatch (~0.03 ms) per chunk
        chunk = int(os.environ.get("OMM_TPU_STEP_CHUNK", "500"))
        check_overflow = any(m.needs_aux for m in self._modules)
        with jax.default_device(self._device):
            remaining = n_steps
            retries = 0
            while remaining > 0:
                this = min(remaining, chunk) if chunk > 0 else remaining
                snapshot = self._state
                self._state = get_fn()(self._state, self._params, this)
                if check_overflow and self._neighbor_overflowed():
                    # the reference's neighbor-overflow retry
                    # (ContextImpl.cpp:298-307): restore the pre-chunk state,
                    # grow capacity, recompile, and redo the chunk
                    retries += 1
                    if retries > 6:
                        raise OpenMMException(
                            "Neighbor list capacity escalation failed to "
                            "converge")
                    self._state = snapshot
                    self._escalate_neighbor_capacity()
                    continue
                remaining -= this

    # --------------------------------------------------------------- getState
    def _energy_forces(self, groups, need_derivs=False):
        import jax
        self._refresh_aux()
        key = (groups, need_derivs)
        if key not in self._ef_fn_cache:
            deriv_names = sorted({d for m in self._modules
                                  for d in m.requested_derivs})

            pe_g, ef_g = self._deps._force_fn_factory(groups)

            def fn(pos, box, params_list, gp, faux):
                e, f = ef_g(pos, box, params_list, gp, faux)
                derivs = {}
                if need_derivs and deriv_names:
                    def pe(gp):
                        return self._deps._potential_energy(
                            pos, box, params_list, gp, groups)
                    g = jax.grad(pe)(gp)
                    derivs = {k: g[k] for k in deriv_names}
                return e, f, derivs

            with jax.default_device(self._device):
                self._ef_fn_cache[key] = jax.jit(fn)
        s = self._state
        # the call must also be pinned: arrays created under default_device
        # are uncommitted, so an unpinned jit call would follow the process
        # default device (the TPU under axon) even for CPU-profile contexts
        with jax.default_device(self._device):
            return self._ef_fn_cache[key](s["positions"], s["box"],
                                          self._params, s["gp"], s["faux"])

    def _make_position_energy_fn(self, groups=-1):
        """(pos ndarray) -> (energy, forces) with current params/box/gp; used
        by LocalEnergyMinimizer."""
        import jax
        import jax.numpy as jnp
        key = ("posEF", groups)
        if key not in self._ef_fn_cache:
            def fn(pos, box, params_list, gp):
                def pe(pos):
                    return self._deps._potential_energy(pos, box, params_list,
                                                        gp, groups)
                e, neg_f = jax.value_and_grad(pe)(pos)
                return e, -neg_f
            with jax.default_device(self._device):
                self._ef_fn_cache[key] = jax.jit(fn)
        compiled = self._ef_fn_cache[key]

        def evaluate(pos):
            import jax as _jax
            jnp_mod = _jnp()
            s = self._state
            with _jax.default_device(self._device):
                pos_dev = jnp_mod.asarray(np.asarray(pos).astype(
                    np.dtype(self._dtype)))
                e, f = compiled(pos_dev, s["box"], self._params, s["gp"])
            return float(e), np.asarray(f, np.float64)

        return evaluate

    def _kinetic_energy(self, forces=None):
        return float(self._integrator._kinetic_energy(
            self._state, self._deps, self._params, forces))

    def getState(self, types=0, enforcePeriodicBox=False, groups=-1, **kwargs):
        # keyword-style API (python wrappers): getPositions=True, etc.
        if kwargs.get("getPositions"):
            types |= State.Positions
        if kwargs.get("getVelocities"):
            types |= State.Velocities
        if kwargs.get("getForces"):
            types |= State.Forces
        if kwargs.get("getEnergy"):
            types |= State.Energy
        if kwargs.get("getParameters"):
            types |= State.Parameters
        if kwargs.get("getParameterDerivatives"):
            types |= State.ParameterDerivatives
        if kwargs.get("getIntegratorParameters"):
            types |= State.IntegratorParameters
        if isinstance(groups, (set, frozenset, list, tuple)):
            mask = 0
            for g in groups:
                mask |= (1 << g)
            groups = mask

        s = self._state
        kw = {"time": float(s["time"]), "stepCount": int(s["step"]),
              "boxVectors": np.asarray(s["box"], np.float64)}
        forces_arr = None
        if types & (State.Forces | State.Energy):
            need_derivs = bool(types & State.ParameterDerivatives)
            e, f, derivs = self._energy_forces(groups, need_derivs)
            forces_arr = np.asarray(f, np.float64)
            if types & State.Forces:
                kw["forces"] = forces_arr
            if types & State.Energy:
                kw["potentialEnergy"] = float(e)
                if self._integrator._kinetic_energy_requires_force():
                    kw["kineticEnergy"] = self._kinetic_energy(f)
                else:
                    kw["kineticEnergy"] = self._kinetic_energy(None)
            if types & State.ParameterDerivatives:
                kw["paramDerivs"] = {k: float(v) for k, v in derivs.items()}
        elif types & State.ParameterDerivatives:
            _, _, derivs = self._energy_forces(groups, True)
            kw["paramDerivs"] = {k: float(v) for k, v in derivs.items()}
        if types & State.Positions:
            pos = np.asarray(s["positions"], np.float64)
            if "pos_lo" in s:
                pos = pos + np.asarray(s["pos_lo"], np.float64)
            if enforcePeriodicBox and self._system.usesPeriodicBoundaryConditions():
                pos = self._wrap_positions(pos, np.asarray(s["box"], np.float64))
            kw["positions"] = pos
        if types & State.Velocities:
            vel = np.asarray(s["velocities"], np.float64)
            if "vel_lo" in s:
                vel = vel + np.asarray(s["vel_lo"], np.float64)
            kw["velocities"] = vel
        if types & State.Parameters:
            kw["parameters"] = self.getParameters()
        if types & State.IntegratorParameters:
            kw["integratorParams"] = {k: float(v)
                                      for k, v in s["iparams"].items()}
        return State(**kw)

    def _wrap_positions(self, pos, box):
        """Per-molecule wrapping into the home box (Context.cpp:122-143)."""
        mol = self._molecule_id
        m = np.asarray(self._system._masses_array())
        w = np.where(m == 0, 1e-10, m)
        num = np.zeros((self._n_molecules, 3))
        den = np.zeros(self._n_molecules)
        np.add.at(num, mol, w[:, None] * pos)
        np.add.at(den, mol, w)
        center = num / den[:, None]
        # reduce center into the home box (staged triclinic reduction)
        diff = np.zeros_like(center)
        for vec_idx in (2, 1, 0):
            v = box[vec_idx]
            scale = np.floor(center[:, vec_idx] / box[vec_idx][vec_idx])
            center -= scale[:, None] * v[None, :]
            diff += scale[:, None] * v[None, :]
        return pos - diff[mol]

    # ------------------------------------------------------------ parameters
    def _modules_for_force(self, force):
        return [m for m, f in zip(self._modules, self._module_force) if f is force]

    def _update_force_parameters(self, force):
        import jax
        jnp = _jnp()
        new_params = None
        for i, (m, f) in enumerate(zip(self._modules, self._module_force)):
            if f is force:
                if new_params is None:
                    with jax.default_device(self._device):
                        new_params = force._pack_params(self._cfg)
                self._modules[i].params = new_params
                self._params[i] = new_params
                # invalidate persistent caches built from the old parameters
                # (e.g. baked tile parameter planes): an infinite reference
                # position forces a rebuild at the next refresh
                aux = self._state["faux"].get(str(i))
                if aux is not None and "ref_pos" in aux:
                    with jax.default_device(self._device):
                        aux = dict(aux)
                        aux["ref_pos"] = jnp.full_like(aux["ref_pos"], jnp.inf)
                        faux = dict(self._state["faux"])
                        faux[str(i)] = aux
                        self._state = dict(self._state)
                        self._state["faux"] = faux

    # --------------------------------------------------------- constraints API
    def applyConstraints(self, tol=None):
        import jax
        with jax.default_device(self._device):
            pos = self._state["positions"]
            new = self._jit_pos_constraints(pos, pos)
            self._state["positions"] = self._jit_vsites(new)

    def applyVelocityConstraints(self, tol=None):
        import jax
        with jax.default_device(self._device):
            self._state["velocities"] = self._jit_vel_constraints(
                self._state["positions"], self._state["velocities"])

    def computeVirtualSites(self):
        self._state["positions"] = self._jit_vsites(
            self._state["positions"])

    # ------------------------------------------------------------- checkpoints
    def createCheckpoint(self):
        """Binary checkpoint (ContextImpl.cpp:445-490): platform + particle
        count + full state pytree + parameters, stored as a plain npz archive
        of leaf arrays (no code-execution surface — the reference's checkpoint
        is likewise a dumb binary format, ContextImpl.cpp:445)."""
        import jax
        s_leaves = jax.tree_util.tree_leaves(self._state)
        p_leaves = jax.tree_util.tree_leaves(self._params)
        arrays = {"s%d" % i: np.asarray(x) for i, x in enumerate(s_leaves)}
        arrays.update({"p%d" % i: np.asarray(x)
                       for i, x in enumerate(p_leaves)})
        arrays["header"] = np.array(
            ["OMMTPU2", self._platform.getName(), str(self._n),
             str(len(s_leaves)), str(len(p_leaves))])
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        return buf.getvalue()

    def loadCheckpoint(self, checkpoint):
        """Restore from createCheckpoint data. Leaves are validated against
        the live Context's pytree structure — the file carries no executable
        objects (never unpickled)."""
        import jax
        jnp = _jnp()
        with np.load(io.BytesIO(checkpoint), allow_pickle=False) as data:
            if "header" not in data or data["header"][0] != "OMMTPU2":
                raise OpenMMException("Invalid checkpoint data")
            header = data["header"]
            if int(header[2]) != self._n:
                raise OpenMMException("Checkpoint has wrong number of particles")
            n_s, n_p = int(header[3]), int(header[4])
            s_leaves_cur, s_def = jax.tree_util.tree_flatten(self._state)
            p_leaves_cur, p_def = jax.tree_util.tree_flatten(self._params)
            if n_s != len(s_leaves_cur) or n_p != len(p_leaves_cur):
                raise OpenMMException(
                    "Checkpoint does not match this Context's structure")
            s_new, p_new = [], []
            for i, cur in enumerate(s_leaves_cur):
                arr = data["s%d" % i]
                if tuple(arr.shape) != tuple(np.shape(cur)):
                    raise OpenMMException(
                        "Checkpoint leaf %d has wrong shape" % i)
                s_new.append(arr)
            for i, cur in enumerate(p_leaves_cur):
                arr = data["p%d" % i]
                if tuple(arr.shape) != tuple(np.shape(cur)):
                    raise OpenMMException(
                        "Checkpoint param leaf %d has wrong shape" % i)
                p_new.append(arr)
        with jax.default_device(self._device):
            self._state = jax.tree_util.tree_map(
                jnp.asarray, jax.tree_util.tree_unflatten(s_def, s_new))
            self._params = jax.tree_util.tree_map(
                jnp.asarray, jax.tree_util.tree_unflatten(p_def, p_new))
        for m, p in zip(self._modules, self._params):
            m.params = p
        self._positions_set = True

    def reinitialize(self, preserveState=False):
        checkpoint = self.createCheckpoint() if preserveState else None
        integrator = self._integrator
        integrator._unbind()
        self.__init__(self._system, integrator, self._platform, self._properties)
        if checkpoint is not None:
            try:
                self.loadCheckpoint(checkpoint)
            except OpenMMException:
                pass

    # ------------------------------------------------------------ molecules
    def _detect_molecules(self):
        parent = list(range(self._n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(a, b):
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb

        for (p1, p2, d) in self._system._constraints:
            union(p1, p2)
        for idx, vs in self._system._vsites.items():
            for k in range(vs.getNumParticles()):
                union(idx, vs.getParticle(k))
        for force in self._system.getForces():
            for (p1, p2) in force._bonded_particles():
                union(p1, p2)
        roots = {}
        mol_id = np.zeros(self._n, np.int32)
        for i in range(self._n):
            r = find(i)
            if r not in roots:
                roots[r] = len(roots)
            mol_id[i] = roots[r]
        return mol_id, len(roots)
