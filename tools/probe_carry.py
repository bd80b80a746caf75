"""Does a closure-captured large array in a lax.while_loop cost a
per-iteration copy on this backend, like a carried one does?

Variants (all run N iterations of a trivial body):
  small   — 1 MB carry only (baseline loop overhead)
  closure — 1 MB carry + 80 MB captured read-only in the body
  carried — 80 MB rides the carry untouched (identity pass-through)
  arg     — 80 MB captured read-only, loop body READS one row per iter

Run on the TPU. Prints ms/iteration for each.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 400
AUX_MB = 80


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / N * 1000.0


def main():
    aux = jnp.ones((AUX_MB * 1024 * 1024 // 4,), jnp.float32)
    x = jnp.ones((256 * 1024,), jnp.float32)

    @jax.jit
    def small(x):
        def body(i, c):
            return c * 1.000001
        return jax.lax.fori_loop(0, N, body, x)

    @jax.jit
    def closure(x, aux):
        def body(i, c):
            return c * 1.000001 + aux[0]
        return jax.lax.fori_loop(0, N, body, x)

    @jax.jit
    def carried(x, aux):
        def body(i, c):
            xx, aa = c
            return (xx * 1.000001, aa)
        return jax.lax.fori_loop(0, N, body, (x, aux))[0]

    @jax.jit
    def argread(x, aux):
        def body(i, c):
            return c * 1.000001 + jax.lax.dynamic_slice(
                aux, (i * 256,), (256 * 1024,))[:1][0]
        return jax.lax.fori_loop(0, N, body, x)

    print("small   : %.3f ms/iter" % timeit(small, x))
    print("closure : %.3f ms/iter" % timeit(closure, x, aux))
    print("carried : %.3f ms/iter" % timeit(carried, x, aux))
    print("argread : %.3f ms/iter" % timeit(argread, x, aux))


if __name__ == "__main__":
    main()
