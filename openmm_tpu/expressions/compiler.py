"""AST -> jnp function emission.

Function set matches Lepton's Operation catalog
(libraries/lepton/include/lepton/Operation.h): sqrt, exp, log, sin, cos, sec,
csc, tan, cot, asin, acos, atan, atan2, sinh, cosh, tanh, erf, erfc, min, max,
abs, floor, ceil, step, delta, select, square, cube, recip. Custom named
functions (tabulated functions) are supplied as callables.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .parser import ExpressionError, parse_expression


def _step(x):
    return jnp.where(x >= 0, 1.0, 0.0)


def _delta(x):
    return jnp.where(x == 0, 1.0, 0.0)


def _select(x, y, z):
    return jnp.where(x != 0, y, z)


_FUNCS_1 = {
    "sqrt": jnp.sqrt, "exp": jnp.exp, "log": jnp.log, "sin": jnp.sin,
    "cos": jnp.cos, "tan": jnp.tan, "asin": jnp.arcsin, "acos": jnp.arccos,
    "atan": jnp.arctan, "sinh": jnp.sinh, "cosh": jnp.cosh, "tanh": jnp.tanh,
    "erf": jax.scipy.special.erf, "erfc": jax.scipy.special.erfc,
    "abs": jnp.abs, "floor": jnp.floor, "ceil": jnp.ceil, "step": _step,
    "delta": _delta,
    "sec": lambda x: 1.0 / jnp.cos(x), "csc": lambda x: 1.0 / jnp.sin(x),
    "cot": lambda x: 1.0 / jnp.tan(x),
    "square": lambda x: x * x, "cube": lambda x: x * x * x,
    "recip": lambda x: 1.0 / x,
}
_FUNCS_2 = {
    "min": jnp.minimum, "max": jnp.maximum, "atan2": jnp.arctan2,
    "pow": jnp.power,
}
_FUNCS_3 = {"select": _select}


def _emit(ast, env, defs, functions, stack):
    kind = ast[0]
    if kind == "num":
        return ast[1]
    if kind == "var":
        name = ast[1]
        if name in env:
            return env[name]
        if name in defs:
            if name in stack:
                raise ExpressionError("circular definition of %r" % name)
            return _emit(defs[name], env, defs, functions, stack | {name})
        raise ExpressionError("unknown variable %r" % name)
    if kind == "neg":
        return -_emit(ast[1], env, defs, functions, stack)
    if kind == "call":
        name = ast[1]
        args = [_emit(a, env, defs, functions, stack) for a in ast[2]]
        if name in functions:
            return functions[name](*args)
        if name in _FUNCS_1 and len(args) == 1:
            return _FUNCS_1[name](args[0])
        if name in _FUNCS_2 and len(args) == 2:
            return _FUNCS_2[name](args[0], args[1])
        if name in _FUNCS_3 and len(args) == 3:
            return _FUNCS_3[name](*args)
        raise ExpressionError("unknown function %r with %d args" % (name, len(args)))
    a = _emit(ast[1], env, defs, functions, stack)
    b = _emit(ast[2], env, defs, functions, stack)
    if kind == "+":
        return a + b
    if kind == "-":
        return a - b
    if kind == "*":
        return a * b
    if kind == "/":
        return a / b
    if kind == "^":
        # integer exponents lower to repeated multiplication (x^2 of a
        # negative base must work, and integer powers are cheaper on the VPU)
        if isinstance(b, (int, float)) and float(b).is_integer() and abs(b) <= 8:
            n = int(b)
            if n == 0:
                return jnp.ones_like(a) if hasattr(a, "shape") else 1.0
            out = a
            for _ in range(abs(n) - 1):
                out = out * a
            return out if n > 0 else 1.0 / out
        return jnp.power(a, b)
    raise ExpressionError("unknown AST node %r" % (kind,))


def compile_expression(text, variable_names, functions=None):
    """Compile `text` into fn(*values) following variable_names order.
    `functions`: dict name -> callable for tabulated/custom functions."""
    main, defs = parse_expression(text)
    functions = functions or {}

    def fn(*values):
        env = dict(zip(variable_names, values))
        return _emit(main, env, defs, functions, frozenset())

    return fn


def compile_energy_expression(text, functions=None):
    """Compile into fn(env_dict) -> value; free variables resolved from the
    dict at call time (used by custom forces where the variable set is rich:
    per-particle params, globals, r/theta/phi, x1,y1,z1...)."""
    main, defs = parse_expression(text)
    functions = functions or {}

    def fn(env):
        return _emit(main, env, defs, functions, frozenset())

    return fn


def expression_variables(text):
    from .parser import variables_in
    main, defs = parse_expression(text)
    return variables_in(main, defs)
