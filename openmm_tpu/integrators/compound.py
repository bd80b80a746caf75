"""CompoundIntegrator: switch between member integrators at runtime
(openmmapi/src/CompoundIntegrator.cpp)."""
from __future__ import annotations

from ..exceptions import OpenMMException
from .base import Integrator


class CompoundIntegrator(Integrator):
    def __init__(self):
        super().__init__(0.0)
        self._integrators = []
        self._current = 0

    def addIntegrator(self, integrator):
        if self._context is not None:
            raise OpenMMException(
                "cannot add integrators after binding to a Context")
        self._integrators.append(integrator)
        return len(self._integrators) - 1

    def getNumIntegrators(self):
        return len(self._integrators)

    def getIntegrator(self, index):
        return self._integrators[index]

    def getCurrentIntegrator(self):
        return self._current

    def setCurrentIntegrator(self, index):
        if index < 0 or index >= len(self._integrators):
            raise OpenMMException("invalid integrator index")
        self._current = int(index)
        if self._context is not None:
            self._context._sync_integrator_params()

    def getStepSize(self):
        return self._integrators[self._current].getStepSize()

    def setStepSize(self, size):
        self._integrators[self._current].setStepSize(size)
        if self._context is not None:
            self._context._sync_integrator_params()

    def getConstraintTolerance(self):
        return self._integrators[self._current].getConstraintTolerance()

    def setConstraintTolerance(self, tol):
        for integ in self._integrators:
            integ.setConstraintTolerance(tol)

    def _bind(self, context):
        super()._bind(context)
        for integ in self._integrators:
            integ._context = context

    def _init_aux(self, deps):
        # merge member auxes under per-member keys
        return {"member_%d" % i: integ._init_aux(deps)
                for i, integ in enumerate(self._integrators)}

    def _integrator_params(self):
        out = {"dt": float(self._integrators[self._current]
                           ._step_size if self._integrators else 0.0)}
        out.update(self._integrators[self._current]._integrator_params())
        return out

    def _kinetic_energy_shift(self):
        return self._integrators[self._current]._kinetic_energy_shift()

    def _kinetic_energy(self, state, deps, params_list, forces=None):
        return self._integrators[self._current]._kinetic_energy(
            state, deps, params_list, forces)

    def _make_step_fn(self, deps):
        # compiled per current index; Context caches per integration groups —
        # include current index via closure and bust the cache on switch
        current = self._current
        member = self._integrators[current]
        inner = member._make_step_fn(deps)
        key = "member_%d" % current

        def step(state, params_list):
            sub = dict(state)
            sub["aux"] = state["aux"][key]
            sub = inner(sub, params_list)
            out = dict(sub)
            out["aux"] = dict(state["aux"], **{key: sub["aux"]})
            return out

        return step

    def step(self, steps):
        if self._context is None:
            raise OpenMMException("This Integrator is not bound to a context!")
        # cache key must reflect the current member
        self._context._sync_integrator_params()
        self._context._step_with_cache_key(
            int(steps), extra_key=("compound", self._current))
