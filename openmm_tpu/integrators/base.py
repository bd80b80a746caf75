"""Integrator base class and the Context<->Integrator contract.

The reference deliberately has no IntegratorImpl layer
(docs-source/developerguide/02_core_library.rst:45): each Integrator drives
kernels directly. Here each Integrator builds a pure
step(state, params_list) -> state from the `StepDeps` bundle the Context
hands it; the Context jits the result.

State pytree (all device arrays):
  positions (N,3), velocities (N,3), box (3,3), time (f64 scalar),
  step (i64 scalar), key (PRNG key), gp {name: scalar}, aux {integrator vars}
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax.numpy as jnp

from .. import unit as u
from ..constants import BOLTZ
from ..exceptions import OpenMMException


@dataclass
class StepDeps:
    """Everything an integrator step needs from the Context."""
    n_particles: int
    dtype: Any
    masses: Any                     # (N,) jnp
    inv_masses: Any                 # (N,) jnp, 0 for massless/frozen
    # force_fn(pos, box, params_list, gp) -> (potential_energy, forces)
    force_fn: Callable = None
    # energy_fn(pos, box, params_list, gp) -> potential_energy
    energy_fn: Callable = None
    # constraints (or identity passthroughs)
    apply_position_constraints: Callable = None   # (ref, new) -> constrained
    # (ref, new) -> (constrained, corr) with constrained == new + corr and
    # corr exactly zero on unconstrained atoms (None if no constraints)
    apply_position_constraints_corr: Callable = None
    apply_velocity_constraints: Callable = None   # (pos, vel) -> constrained
    compute_vsites: Callable = None               # pos -> pos
    # updateContextState hooks: [(hook, params_index)]; cache refreshers
    # (neighbor lists) are appended last and also listed separately
    update_hooks: list = field(default_factory=list)
    refresh_hooks: list = field(default_factory=list)
    params_struct: Any = None
    has_constraints: bool = False
    # molecule partition (ContextImpl::getMolecules): for barostat COM scaling
    molecule_id: Any = None         # (N,) int32 molecule index per atom
    n_molecules: int = 0


def commit_positions(state, old_pos, new_pos, extra_lo=None):
    """Write integrated positions into the state.

    When the Context carries a `pos_lo` compensation plane (mixed
    precision), the update runs as a TwoSum so positions accumulate with
    ~f64-equivalent precision while forces stay f32 — the TPU-native analog
    of the reference's posq correction arrays (ComputeContext.h:309).
    `extra_lo` carries a below-f32-precision position increment (the lo
    half of a compensated step delta). Mutates and returns `state`
    (callers pass their own dict copy).
    """
    if "pos_lo" not in state:
        state["positions"] = new_pos
        return state
    d = new_pos - old_pos
    s = old_pos + d
    bp = s - d
    err = (old_pos - bp) + (d - (s - bp))
    lo = state["pos_lo"] + err
    if extra_lo is not None:
        lo = lo + extra_lo
    hi = s + lo
    lo = lo - (hi - s)
    state["positions"] = hi
    state["pos_lo"] = lo
    return state


def twosum(hi, small):
    """(s, err): s = fl(hi + small), err the exact rounding residual
    (Neumaier variant, valid for any magnitudes)."""
    s = hi + small
    bp = s - hi
    err = (hi - (s - bp)) + (small - bp)
    return s, err


def twoprod(a, b):
    """(p, err): p = fl(a * b), err the exact rounding residual, via the
    Veltkamp split + Dekker product (no FMA on the TPU VPU).  The split
    constant is 2^ceil(prec/2)+1 for the operand dtype (4097 for f32)."""
    import numpy as np
    p = a * b
    prec = np.finfo(np.dtype(jnp.result_type(a, b))).nmant + 1
    split = jnp.asarray(float(2 ** ((prec + 1) // 2) + 1), p.dtype)
    ca = split * a
    ahi = ca - (ca - a)
    alo = a - ahi
    cb = split * b
    bhi = cb - (cb - b)
    blo = b - bhi
    err = ((ahi * bhi - p) + ahi * blo + alo * bhi) + alo * blo
    return p, err


class Integrator(object):
    """Base integrator (openmmapi/include/openmm/Integrator.h)."""

    def __init__(self, stepSize):
        self._step_size = float(u.strip(stepSize, u.picosecond))
        self._constraint_tol = 1e-5
        self._force_groups = -1
        self._context = None
        self._seed = 0

    # -- common API -----------------------------------------------------------
    def getStepSize(self):
        return u.Quantity(self._step_size, u.picosecond)

    def setStepSize(self, size):
        self._step_size = float(u.strip(size, u.picosecond))
        if self._context is not None:
            self._context._sync_integrator_params()

    def getConstraintTolerance(self):
        return self._constraint_tol

    def setConstraintTolerance(self, tol):
        self._constraint_tol = float(tol)

    def getIntegrationForceGroups(self):
        return self._force_groups

    def setIntegrationForceGroups(self, groups):
        if isinstance(groups, (set, frozenset, list, tuple)):
            mask = 0
            for g in groups:
                mask |= (1 << g)
            groups = mask
        self._force_groups = int(groups)

    def step(self, steps):
        if self._context is None:
            raise OpenMMException(
                "This Integrator is not bound to a context!")
        self._context._step(int(steps))

    # -- contract with Context ---------------------------------------------------
    def _bind(self, context):
        if self._context is not None and self._context is not context:
            raise OpenMMException(
                "This Integrator is already bound to a context")
        self._context = context

    def _unbind(self):
        self._context = None

    def _init_aux(self, deps):
        """Initial integrator-local state variables (aux pytree)."""
        return {}

    def _integrator_params(self):
        """Host-adjustable scalars folded into state (no recompile on change)."""
        return {"dt": self._step_size}

    def _make_step_fn(self, deps):
        raise NotImplementedError

    def _kinetic_energy_shift(self):
        """Time shift (in units of dt) for computeKineticEnergy; 0.5 for
        leapfrog-style integrators (Integrator.h:142)."""
        return 0.5

    def _kinetic_energy_requires_force(self):
        return self._kinetic_energy_shift() != 0.0

    def _kinetic_energy(self, state, deps, params_list, forces=None):
        """0.5 sum m (v + shift*dt*f/m)^2 (computeShiftedKineticEnergy)."""
        vel = state["velocities"]
        if "vel_lo" in state:
            vel = vel + state["vel_lo"]
        shift = self._kinetic_energy_shift()
        if shift != 0.0 and forces is not None:
            dt = state["iparams"]["dt"].astype(vel.dtype)
            vel = vel + shift * dt * forces * deps.inv_masses[:, None]
        m = deps.masses
        ke = 0.5 * jnp.sum(m[:, None] * vel * vel)
        return ke

    def getVelocitiesForTemperature(self, deps, key, temperature):
        import jax
        kT = BOLTZ * temperature
        sigma = jnp.sqrt(kT * deps.inv_masses)[:, None]
        v = sigma * jax.random.normal(key, (deps.n_particles, 3),
                                      dtype=deps.dtype)
        return v

    def __getstate__(self):
        d = dict(self.__dict__)
        d["_context"] = None
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)
