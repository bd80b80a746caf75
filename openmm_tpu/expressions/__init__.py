"""Energy-expression compiler: Lepton-equivalent grammar -> JAX functions.

The reference embeds Lepton (libraries/lepton: parser, symbolic derivatives,
interpreter + x86 JIT via asmjit) and a GPU string-codegen twin
(ExpressionUtilities.h). Here the whole stack collapses: parse once into an
AST, emit a pure jnp function, and get every derivative from jax.grad —
XLA is the JIT (SURVEY §2.6).

Grammar (libraries/lepton/src/Parser.cpp): + - * / ^ (right-assoc power),
unary minus, parentheses, semicolon-separated named subexpressions after the
main expression ("k*d^2; d=r-r0"), the standard function set incl. step/
delta/select, and user-supplied named functions (tabulated functions).
"""
from .parser import parse_expression, ExpressionError
from .compiler import compile_expression, compile_energy_expression

__all__ = ["parse_expression", "compile_expression",
           "compile_energy_expression", "ExpressionError"]
