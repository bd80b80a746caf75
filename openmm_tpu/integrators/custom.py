"""CustomIntegrator: user-programmable integration algorithms.

API per openmmapi/include/openmm/CustomIntegrator.h:133-179 (ComputeGlobal /
ComputePerDof / ComputeSum / ConstrainPositions / ConstrainVelocities /
UpdateContextState / if / while blocks, validation rules in
CustomIntegratorUtilities.cpp). The reference's platform implementation
analyzes force/energy validity per step, caches force buffers, and JIT-
compiles each step (CommonKernels.cpp:7062-7219, codegen :6555); here the
whole step program is traced once into a single XLA program — laziness and
force-buffer reuse fall out of the static trace, if/while become
lax.cond/lax.while_loop.

Expression variables: x, v, f, f0..f31, m, dt, uniform, gaussian, energy,
energy0..31, global/per-dof variables, and context parameters.
"""
from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

from .. import unit as u
from ..exceptions import OpenMMException
from ..expressions import compile_energy_expression
from ..expressions.parser import parse_expression, variables_in
from .base import Integrator

# computation-step type codes (CustomIntegrator.h ComputationType)
ComputeGlobal = 0
ComputePerDof = 1
ComputeSum = 2
ConstrainPositions = 3
ConstrainVelocities = 4
UpdateContextState = 5
IfBlockStart = 6
WhileBlockStart = 7
BlockEnd = 8

_COND_RE = re.compile(r"^(.*?)(<=|>=|!=|=|<|>)(.*)$")


class CustomIntegrator(Integrator):
    def __init__(self, stepSize):
        super().__init__(stepSize)
        self._global_vars = []   # (name, initial)
        self._perdof_vars = []   # (name, initial scalar or (N,3) array)
        self._steps = []         # (type, variable, expression)
        self._ke_expression = "m*v*v/2"
        self._perdof_initial_values = {}

    # ------------------------------------------------------------- variables
    def getNumGlobalVariables(self):
        return len(self._global_vars)

    def addGlobalVariable(self, name, initialValue):
        self._global_vars.append([str(name), float(u.strip(initialValue))])
        return len(self._global_vars) - 1

    def getGlobalVariableName(self, index):
        return self._global_vars[index][0]

    def getGlobalVariable(self, index):
        if self._context is not None:
            return float(self._context._state["aux"]["cg"][
                self._global_vars[index][0]])
        return self._global_vars[index][1]

    def getGlobalVariableByName(self, name):
        for i, (n, v) in enumerate(self._global_vars):
            if n == name:
                return self.getGlobalVariable(i)
        raise OpenMMException("unknown global variable: " + name)

    def setGlobalVariable(self, index, value):
        self._global_vars[index][1] = float(u.strip(value))
        if self._context is not None:
            aux = self._context._state["aux"]
            name = self._global_vars[index][0]
            aux["cg"] = dict(aux["cg"], **{
                name: jnp.asarray(float(u.strip(value)),
                                  self._context._dtype)})

    def setGlobalVariableByName(self, name, value):
        for i, (n, v) in enumerate(self._global_vars):
            if n == name:
                return self.setGlobalVariable(i, value)
        raise OpenMMException("unknown global variable: " + name)

    def getNumPerDofVariables(self):
        return len(self._perdof_vars)

    def addPerDofVariable(self, name, initialValue):
        self._perdof_vars.append([str(name), float(u.strip(initialValue))])
        return len(self._perdof_vars) - 1

    def getPerDofVariableName(self, index):
        return self._perdof_vars[index][0]

    def getPerDofVariable(self, index, asNumpy=False):
        name = self._perdof_vars[index][0]
        if self._context is not None:
            arr = np.asarray(self._context._state["aux"]["cd"][name])
        else:
            arr = self._perdof_initial_values.get(name)
            if arr is None:
                raise OpenMMException("integrator not bound to a context")
        from ..vec3 import Vec3
        if asNumpy:
            return arr
        return [Vec3(*row) for row in arr]

    def getPerDofVariableByName(self, name, asNumpy=False):
        for i, (n, v) in enumerate(self._perdof_vars):
            if n == name:
                return self.getPerDofVariable(i, asNumpy)
        raise OpenMMException("unknown per-dof variable: " + name)

    def setPerDofVariable(self, index, values):
        name = self._perdof_vars[index][0]
        arr = np.asarray(u.strip(values), np.float64)
        if self._context is not None:
            aux = self._context._state["aux"]
            aux["cd"] = dict(aux["cd"], **{
                name: jnp.asarray(arr.astype(self._context._dtype))})
        else:
            self._perdof_initial_values[name] = arr

    def setPerDofVariableByName(self, name, values):
        for i, (n, v) in enumerate(self._perdof_vars):
            if n == name:
                return self.setPerDofVariable(i, values)
        raise OpenMMException("unknown per-dof variable: " + name)

    # ------------------------------------------------------------- program
    def getNumComputations(self):
        return len(self._steps)

    def getComputationStep(self, index):
        return self._steps[index]

    def addComputeGlobal(self, variable, expression):
        self._steps.append((ComputeGlobal, str(variable), str(expression)))
        return len(self._steps) - 1

    def addComputePerDof(self, variable, expression):
        self._steps.append((ComputePerDof, str(variable), str(expression)))
        return len(self._steps) - 1

    def addComputeSum(self, variable, expression):
        self._steps.append((ComputeSum, str(variable), str(expression)))
        return len(self._steps) - 1

    def addConstrainPositions(self):
        self._steps.append((ConstrainPositions, "", ""))
        return len(self._steps) - 1

    def addConstrainVelocities(self):
        self._steps.append((ConstrainVelocities, "", ""))
        return len(self._steps) - 1

    def addUpdateContextState(self):
        self._steps.append((UpdateContextState, "", ""))
        return len(self._steps) - 1

    def beginIfBlock(self, condition):
        self._steps.append((IfBlockStart, "", str(condition)))
        return len(self._steps) - 1

    def beginWhileBlock(self, condition):
        self._steps.append((WhileBlockStart, "", str(condition)))
        return len(self._steps) - 1

    def endBlock(self):
        self._steps.append((BlockEnd, "", ""))
        return len(self._steps) - 1

    def getKineticEnergyExpression(self):
        return self._ke_expression

    def setKineticEnergyExpression(self, expression):
        self._ke_expression = str(expression)

    def setRandomNumberSeed(self, seed):
        self._seed = int(seed)

    def getRandomNumberSeed(self):
        return self._seed

    # ------------------------------------------------------------ aux state
    def _init_aux(self, deps):
        cg = {name: jnp.asarray(val, deps.dtype)
              for name, val in self._global_vars}
        cd = {}
        for name, val in self._perdof_vars:
            if name in self._perdof_initial_values:
                cd[name] = jnp.asarray(
                    self._perdof_initial_values[name].astype(deps.dtype))
            else:
                cd[name] = jnp.full((deps.n_particles, 3), val, deps.dtype)
        return {"cg": cg, "cd": cd}

    def _integrator_params(self):
        return {"dt": self._step_size}

    # -------------------------------------------------- expression machinery
    @staticmethod
    def _needed_groups(expr_text):
        """Which force groups an expression references: -1 for f/energy,
        g for fN/energyN."""
        names = variables_in(*parse_expression(expr_text))
        groups = set()
        for n in names:
            if n == "f" or n == "energy":
                groups.add(-1)
            elif re.fullmatch(r"f\d+", n):
                groups.add(int(n[1:]))
            elif re.fullmatch(r"energy\d+", n):
                groups.add(int(n[6:]))
        return groups

    def _kinetic_energy_requires_force(self):
        try:
            return bool(self._needed_groups(self._ke_expression))
        except Exception:
            return False

    def _kinetic_energy_shift(self):
        return 0.0

    def _kinetic_energy(self, state, deps, params_list, forces=None):
        env = {
            "m": deps.masses[:, None] * jnp.ones((1, 3), deps.dtype),
            "v": state["velocities"],
            "dt": state["iparams"]["dt"].astype(deps.dtype),
            "x": state["positions"],
        }
        if forces is not None:
            env["f"] = forces
        for k, v in state["aux"]["cg"].items():
            env[k] = v
        for k, v in state["aux"]["cd"].items():
            env[k] = v
        for k, v in state["gp"].items():
            env[k] = v
        expr = compile_energy_expression(self._ke_expression)
        val = expr(env)
        moving = (deps.inv_masses != 0)[:, None]
        val = jnp.broadcast_to(val, (deps.n_particles, 3))
        return jnp.sum(jnp.where(moving, val, 0.0))

    # ----------------------------------------------------------- step builder
    def _make_step_fn(self, deps):
        steps = list(self._steps)
        n = deps.n_particles
        dtype = deps.dtype
        moving = (deps.inv_masses != 0)[:, None]
        masses_col = deps.masses[:, None]

        # group the program into a tree of blocks
        def parse_blocks(i):
            """Returns (list of nodes, next index); node = ('op', step) |
            ('if'/'while', condition, [children])."""
            nodes = []
            while i < len(steps):
                t, var, expr = steps[i]
                if t == BlockEnd:
                    return nodes, i + 1
                if t in (IfBlockStart, WhileBlockStart):
                    children, i2 = parse_blocks(i + 1)
                    nodes.append(("if" if t == IfBlockStart else "while",
                                  expr, children))
                    i = i2
                else:
                    nodes.append(("op", (t, var, expr)))
                    i += 1
            return nodes, i

        tree, _ = parse_blocks(0)

        # which groups' forces/energies each expression needs
        group_masks = {}

        def group_mask(g):
            return -1 if g == -1 else (1 << g)

        def eval_forces(carry, groups_needed):
            """Ensure (energy, forces) for each needed group in carry cache."""
            state, cache, key = carry
            for g in sorted(groups_needed):
                if g not in cache:
                    pe, ef = deps._force_fn_factory(group_mask(g))
                    e, f = ef(state["positions"], state["box"],
                              eval_forces.params, state["gp"], state["faux"])
                    cache[g] = (e, f)
            return cache

        def build_env(state, cache, key, perdof, groups_needed):
            env = {}
            ip = state["iparams"]
            env["dt"] = ip["dt"].astype(dtype)
            env["x"] = state["positions"]
            env["v"] = state["velocities"]
            env["m"] = masses_col * jnp.ones((1, 3), dtype)
            for g in groups_needed:
                e, f = cache[g]
                if g == -1:
                    env["energy"] = e.astype(dtype)
                    env["f"] = f
                else:
                    env["energy%d" % g] = e.astype(dtype)
                    env["f%d" % g] = f
            for k, v in state["aux"]["cg"].items():
                env[k] = v
            for k, v in state["aux"]["cd"].items():
                env[k] = v
            for k, v in state["gp"].items():
                env[k] = v
            key, k1, k2 = jax.random.split(key, 3)
            if perdof:
                env["gaussian"] = jax.random.normal(k1, (n, 3), dtype)
                env["uniform"] = jax.random.uniform(k2, (n, 3), dtype=dtype)
            else:
                env["gaussian"] = jax.random.normal(k1, (), dtype)
                env["uniform"] = jax.random.uniform(k2, (), dtype=dtype)
            return env, key

        def exec_op(op, carry):
            state, cache, key = carry
            t, var, expr_text = op
            if t == UpdateContextState:
                for hook, pidx in deps.update_hooks:
                    state = hook(state, exec_op.params)
                cache = {}  # hooks may move positions / change box
                return (state, cache, key)
            if t == ConstrainPositions:
                pos = deps.apply_position_constraints(
                    state["aux"]["cd"].get("__xref", state["positions"]),
                    state["positions"])
                pos = deps.compute_vsites(pos)
                state = dict(state)
                state["positions"] = pos
                return (state, {}, key)
            if t == ConstrainVelocities:
                v = deps.apply_velocity_constraints(state["positions"],
                                                    state["velocities"])
                state = dict(state)
                state["velocities"] = v
                return (state, cache, key)
            groups = self._needed_groups(expr_text)
            cache = eval_forces((state, cache, key), groups)
            perdof = t in (ComputePerDof, ComputeSum)
            env, key = build_env(state, cache, key, perdof, groups)
            expr = compile_energy_expression(expr_text)
            val = expr(env)
            state = dict(state)
            if t == ComputeGlobal:
                if var in state["aux"]["cg"]:
                    state["aux"] = dict(state["aux"])
                    state["aux"]["cg"] = dict(state["aux"]["cg"],
                                              **{var: jnp.asarray(val, dtype)})
                elif var in state["gp"]:
                    state["gp"] = dict(state["gp"],
                                       **{var: jnp.asarray(val, dtype)})
                else:
                    raise OpenMMException("unknown global variable: " + var)
            elif t == ComputeSum:
                val = jnp.broadcast_to(val, (n, 3))
                total = jnp.sum(jnp.where(moving, val, 0.0))
                if var in state["aux"]["cg"]:
                    state["aux"] = dict(state["aux"])
                    state["aux"]["cg"] = dict(state["aux"]["cg"],
                                              **{var: total.astype(dtype)})
                elif var in state["gp"]:
                    state["gp"] = dict(state["gp"], **{var: total.astype(dtype)})
                else:
                    raise OpenMMException("unknown sum variable: " + var)
            else:  # ComputePerDof
                val = jnp.broadcast_to(val, (n, 3)).astype(dtype)
                if var == "x":
                    # remember pre-move reference for ConstrainPositions
                    state["aux"] = dict(state["aux"])
                    state["aux"]["cd"] = dict(state["aux"]["cd"],
                                              __xref=state["positions"])
                    new_pos = jnp.where(moving, val, state["positions"])
                    new_pos = deps.compute_vsites(new_pos)
                    state["positions"] = new_pos
                    cache = {}
                elif var == "v":
                    state["velocities"] = jnp.where(moving, val,
                                                    state["velocities"])
                elif var in state["aux"]["cd"]:
                    state["aux"] = dict(state["aux"])
                    state["aux"]["cd"] = dict(state["aux"]["cd"], **{var: val})
                else:
                    raise OpenMMException("unknown per-dof variable: " + var)
            return (state, cache, key)

        def eval_condition(cond_text, carry):
            state, cache, key = carry
            m = _COND_RE.match(cond_text)
            if m is None:
                raise OpenMMException("invalid condition: " + cond_text)
            lhs, op, rhs = m.group(1), m.group(2), m.group(3)
            groups = self._needed_groups(lhs) | self._needed_groups(rhs)
            cache = eval_forces((state, cache, key), groups)
            env, key = build_env(state, cache, key, False, groups)
            lv = compile_energy_expression(lhs)(env)
            rv = compile_energy_expression(rhs)(env)
            if op == "=":
                res = lv == rv
            elif op == "!=":
                res = lv != rv
            elif op == "<":
                res = lv < rv
            elif op == "<=":
                res = lv <= rv
            elif op == ">":
                res = lv > rv
            else:
                res = lv >= rv
            return res, (state, cache, key)

        def exec_nodes(nodes, carry):
            for node in nodes:
                if node[0] == "op":
                    exec_op.params = exec_nodes.params
                    eval_forces.params = exec_nodes.params
                    carry = exec_op(node[1], carry)
                elif node[0] == "if":
                    pred, carry = eval_condition(node[1], carry)
                    state, cache, key = carry

                    def true_branch(operand):
                        st, ky = operand
                        c = exec_nodes(node[2], (st, {}, ky))
                        return (c[0], c[2])

                    def false_branch(operand):
                        return operand

                    new_state, new_key = jax.lax.cond(
                        pred, true_branch, false_branch, (state, key))
                    carry = (new_state, {}, new_key)
                else:  # while
                    state, cache, key = carry

                    def cond_fn(operand):
                        st, ky = operand
                        pred, _ = eval_condition(node[1], (st, {}, ky))
                        return pred

                    def body_fn(operand):
                        st, ky = operand
                        c = exec_nodes(node[2], (st, {}, ky))
                        return (c[0], c[2])

                    new_state, new_key = jax.lax.while_loop(
                        cond_fn, body_fn, (state, key))
                    carry = (new_state, {}, new_key)
            return carry

        def step(state, params_list):
            exec_nodes.params = params_list
            # neighbor-list refreshers run every step even when the program
            # has no UpdateContextState op (stale lists silently drop pairs)
            for hook, pidx in deps.refresh_hooks:
                state = hook(state, params_list)
            key = state["key"]
            carry = (state, {}, key)
            state, cache, key = exec_nodes(tree, carry)
            state = dict(state)
            # drop the constraint reference scratch if present
            if "__xref" in state["aux"].get("cd", {}):
                aux = dict(state["aux"])
                cd = dict(aux["cd"])
                cd.pop("__xref", None)
                aux["cd"] = cd
                state["aux"] = aux
            state["key"] = key
            dt = state["iparams"]["dt"].astype(dtype)
            state["time"] = state["time"] + dt.astype(state["time"].dtype)
            state["step"] = state["step"] + 1
            return state

        return step
