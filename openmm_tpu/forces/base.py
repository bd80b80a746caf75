"""Force base class and the compile contract between Forces and the Context.

The reference routes every Force through ForceImpl
(openmmapi/include/openmm/internal/ForceImpl.h:58 — initialize,
calcForcesAndEnergy, updateContextState, getDefaultParameters,
getBondedParticles) and a named platform kernel. Here the whole contract is a
`CompiledForce`: a pytree of parameter arrays plus a pure
`energy_fn(positions, box, params, globals) -> scalar`; forces fall out of
jax.grad, and thermostats/barostats provide `update_state_fn` (the
updateContextState hook).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from ..exceptions import OpenMMException


@dataclass
class CompileConfig:
    """Everything a Force needs to know about the Context it is compiling into."""
    n_particles: int
    dtype: Any                      # jnp dtype for parameters / compute
    accum_dtype: Any                # dtype for energy accumulation
    masses: Any                     # (N,) numpy array, amu
    uses_pbc: bool                  # system-level periodic flag
    platform_name: str = "Reference"
    # neighbor-list / tiling configuration for pairwise forces
    pair_block: int = 128           # tile edge for blocked N^2 / neighbor tiles
    use_neighbor_list: bool = True
    # device mesh for sharded pairwise sweeps (parallel/mesh.py); None = local
    mesh: Any = None


@dataclass
class CompiledForce:
    """The compiled form of one Force inside one Context."""
    name: str
    force_group: int
    params: Any = None                              # pytree of jnp arrays
    energy_fn: Optional[Callable] = None            # (pos, box, params, gp) -> E
    update_state_fn: Optional[Callable] = None      # (deps, state, params, gp) -> state
    uses_pbc: bool = False
    # pairs used for molecule detection (ForceImpl::getBondedParticles)
    bonded_particles: tuple = ()
    # names of global parameters this force defines: {name: default}
    global_defaults: dict = field(default_factory=dict)
    # global parameter names for which dE/dparam was requested
    requested_derivs: tuple = ()
    # optional per-force auxiliary state initializer: deps -> pytree
    init_aux: Optional[Callable] = None
    # optional analytic energy+force path (pos, box, params, gp[, aux]) ->
    # (E, F): bypasses reverse-mode for the hot kernel (the row-kernel design)
    ef_fn: Optional[Callable] = None
    # True when ef_fn takes a 5th `aux` argument (the module's faux entry,
    # e.g. a persistent neighbor list); None is always a legal aux value and
    # means "recompute the cache inline"
    needs_aux: bool = False
    # optional cache refresher run at the START of every step AFTER all
    # update_state_fn hooks (so it sees barostat-scaled positions):
    # (deps, state, params_list, aux) -> (state, new_aux). Unlike
    # update_state_fn this must not mutate physical state — it maintains
    # derived caches (neighbor lists) only.
    refresh_fn: Optional[Callable] = None
    # True when ef_fn accepts a want_energy keyword: integrator steps
    # consume only forces, and the kernel can skip the energy lanes
    ef_takes_want_energy: bool = False
    # True when update_state_fn can move particle positions or the box
    # (barostats); refresh hooks run after such modules so rebuilt caches
    # see the post-move geometry
    moves_positions: bool = False

    def _with_init_aux(self, fn):
        self.init_aux = fn
        return self


class Force(object):
    """Base class for all forces (openmmapi/include/openmm/Force.h)."""

    def __init__(self):
        self._force_group = 0
        self._name = type(self).__name__

    def getForceGroup(self):
        return self._force_group

    def setForceGroup(self, group):
        if group < 0 or group > 31:
            raise OpenMMException("Force group must be between 0 and 31")
        self._force_group = int(group)

    def getName(self):
        return self._name

    def setName(self, name):
        self._name = str(name)

    def usesPeriodicBoundaryConditions(self):
        return False

    # -- compile contract ------------------------------------------------------
    def _compile(self, system, cfg: CompileConfig) -> CompiledForce:
        raise NotImplementedError(type(self).__name__)

    def _bonded_particles(self):
        """Pairs that bind particles into one molecule (for molecule detection,
        ContextImpl.cpp:345-429)."""
        return ()

    def __getstate__(self):
        return self.__dict__

    def __setstate__(self, d):
        self.__dict__.update(d)
