"""Micro-probes for O(N) step plumbing on the real chip: (n,3) layout cost,
CMMotion hook, RNG, commit_positions, constraint applies — all loop-amortized
inside one dispatch so the tunnel latency doesn't pollute the numbers."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = int(os.environ.get("N", "23558"))
LOOP = 200


def timeit_loop(fn, *args, n=LOOP):
    """fn must return something shaped like its first arg (carried)."""
    def run(x, *rest):
        def body(i, x):
            return fn(x, *rest)
        return jax.lax.fori_loop(0, n, body, x)
    runj = jax.jit(run)
    out = runj(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = runj(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.RandomState(0)
    vel = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    velT = jnp.asarray(np.asarray(vel).T.copy())
    m = jnp.asarray(rng.rand(N).astype(np.float32) + 0.5)
    inv_m = 1.0 / m

    print("elementwise (n,3) x*1.0001+0.001:",
          "%.4f ms" % timeit_loop(lambda v: v * 1.0001 + 0.001, vel))
    print("elementwise (3,n):",
          "%.4f ms" % timeit_loop(lambda v: v * 1.0001 + 0.001, velT))

    def cm_remove(v):
        mom = jnp.sum(m[:, None] * v, axis=0)
        v_cm = mom / jnp.sum(m)
        return v - v_cm[None, :] * 0.9999

    print("CM remove math (n,3): %.4f ms" % timeit_loop(cm_remove, vel))

    def cm_remove_cond(v):
        return jax.lax.cond(True, cm_remove, lambda x: x, v)
    print("CM remove + cond: %.4f ms" % timeit_loop(cm_remove_cond, vel))

    def cm_removeT(v):
        mom = jnp.sum(m[None, :] * v, axis=1)
        return v - (mom / jnp.sum(m))[:, None] * 0.9999
    print("CM remove math (3,n): %.4f ms" % timeit_loop(cm_removeT, velT))

    # kick + where (integrator-style ops)
    moving = (inv_m != 0)[:, None]

    def kick(v):
        f = v * 0.1
        return jnp.where(moving, v + 0.002 * f * inv_m[:, None], v)
    print("kick+where (n,3): %.4f ms" % timeit_loop(kick, vel))

    # RNG normal
    def rng_step(key):
        key, sub = jax.random.split(key)
        x = jax.random.normal(sub, (N, 3), dtype=jnp.float32)
        return key + x[0, 0].astype(jnp.uint32)
    print("split+normal (n,3): %.4f ms"
          % timeit_loop(rng_step, jax.random.PRNGKey(0)))

    # row gather benchmark
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    print("row gather (n,3)[perm]: %.4f ms"
          % timeit_loop(lambda v: v[perm] * 1.0001, vel))
    wide = jnp.asarray(rng.randn(N, 64).astype(np.float32))
    print("row gather (n,64)[perm]: %.4f ms"
          % timeit_loop(lambda v: v[perm] * 1.0001, wide))

    # reduction to scalar
    print("sum (n,3): %.4f ms"
          % timeit_loop(lambda v: v + jnp.sum(v) * 1e-9, vel))


if __name__ == "__main__":
    main()
