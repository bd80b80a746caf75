"""CustomCVForce: energy as a function of collective variables, each CV
itself a Force (CustomCVForce.h, internal/CustomCVForceImpl.h:66-73).

The reference evaluates each CV in a nested inner Context and propagates
forces via dE/dCV; here the CV forces compile into the same program and
jax.grad composes through them — no inner context, no force copying. This is
the basis for metadynamics (app/metadynamics.py in the reference).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..exceptions import OpenMMException
from ..expressions import compile_energy_expression
from .base import CompiledForce, CompileConfig, Force
from .custom import _CustomMixin


class CustomCVForce(Force, _CustomMixin):
    def __init__(self, energy):
        super().__init__()
        self._init_custom(energy)
        self._cvs = []   # (name, Force)

    def getNumCollectiveVariables(self):
        return len(self._cvs)

    def addCollectiveVariable(self, name, variable):
        self._cvs.append((str(name), variable))
        return len(self._cvs) - 1

    def getCollectiveVariable(self, index):
        return self._cvs[index][1]

    def getCollectiveVariableName(self, index):
        return self._cvs[index][0]

    def getCollectiveVariableValues(self, context):
        import numpy as np
        mods = context._modules_for_force(self)
        if not mods:
            raise OpenMMException("force is not part of this context")
        s = context._state
        vals = mods[0]._cv_values_fn(s["positions"], s["box"],
                                     mods[0].params, s["gp"])
        return [float(v) for v in vals]

    def usesPeriodicBoundaryConditions(self):
        return any(v.usesPeriodicBoundaryConditions() for _, v in self._cvs)

    def updateParametersInContext(self, context):
        context._update_force_parameters(self)

    def _pack_params(self, cfg):
        # params of the inner CV forces, keyed by index
        return {"cv_%d" % i: [m.params for m in self._compile_cv(i, cfg)]
                for i in range(len(self._cvs))}

    def _compile_cv(self, i, cfg):
        compiled = self._cvs[i][1]._compile(self._system_ref, cfg)
        if isinstance(compiled, CompiledForce):
            compiled = [compiled]
        return compiled

    def _compile(self, system, cfg):
        self._system_ref = system
        fns = self._compiled_functions(cfg.dtype)
        expr_fn = compile_energy_expression(self._energy_expr, fns)
        cv_modules = []   # list of (name, [CompiledForce])
        global_defaults = self._gp_defaults()
        for i, (name, force) in enumerate(self._cvs):
            mods = self._compile_cv(i, cfg)
            cv_modules.append((name, mods))
            for m in mods:
                global_defaults.update(m.global_defaults)
        params = {"cv_%d" % i: [m.params for m in mods]
                  for i, (name, mods) in enumerate(cv_modules)}

        def cv_values(pos, box, p, gp):
            vals = []
            for i, (name, mods) in enumerate(cv_modules):
                v = jnp.zeros((), cfg.accum_dtype)
                for m, mp in zip(mods, p["cv_%d" % i]):
                    v = v + m.energy_fn(pos, box, mp, gp).astype(cfg.accum_dtype)
                vals.append(v)
            return vals

        def energy_fn(pos, box, p, gp):
            vals = cv_values(pos, box, p, gp)
            env = {}
            for (name, _), v in zip(cv_modules, vals):
                env[name] = v
            for k, v in gp.items():
                env[k] = v
            return expr_fn(env).astype(cfg.accum_dtype)

        cf = CompiledForce(name=self.getName(), force_group=self.getForceGroup(),
                           params=params, energy_fn=energy_fn,
                           uses_pbc=self.usesPeriodicBoundaryConditions(),
                           global_defaults=global_defaults,
                           requested_derivs=tuple(self._deriv_requests))
        cf._cv_values_fn = cv_values
        return cf
