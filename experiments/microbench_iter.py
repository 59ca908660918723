"""Decompose the per-while-iteration cost of the lifecycle at two batch
sizes: sort, locate gather, rho gather, scatter-add, elementwise, and a
whole fused while_loop — to find out why wall time is flat in N."""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(out):
    # block_until_ready is a NO-OP on the tunneled axon backend; a
    # device-to-host fetch is the only reliable execution barrier
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf).ravel()[:1]


def timeit(fn, *args, nrep=10):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / nrep


def main():
    S = 85
    ncells = 32 * 32 * 16
    nl = 4
    for logn in (20,):
        n = 1 << logn
        key = jax.random.key(0)
        t = jax.random.uniform(key, (n, S), jnp.float32)
        cells = jax.random.randint(key, (n, S), 0, ncells)
        rho = jax.random.uniform(key, (ncells,), jnp.float32)
        ell = jnp.arange(n, dtype=jnp.int32) % nl
        labs = jnp.zeros((ncells * nl,), jnp.float32)

        r = {}
        r["sort"] = timeit(jax.jit(lambda x: jnp.sort(x, axis=-1)), t)
        r["gather_rho"] = timeit(jax.jit(lambda c: rho[c]), cells)
        r["cumsum"] = timeit(jax.jit(lambda x: jnp.cumsum(x, axis=1)), t)
        idx = cells * nl + ell[:, None]

        def scat(l, i, v):
            return l.at[i].add(v, mode="drop")

        r["scatter_add"] = timeit(jax.jit(scat), labs, idx, t)
        r["exp"] = timeit(jax.jit(lambda x: jnp.exp(-x) * (-jnp.expm1(-x))), t)

        def loop16(x):
            def body(i, c):
                return c * 0.99 + jnp.float32(i)
            return jax.lax.fori_loop(0, 16, body, x)

        r["fori16_ew"] = timeit(jax.jit(loop16), t)

        print(f"N=2^{logn}:", {k: f"{v*1e3:.2f}ms" for k, v in r.items()})


if __name__ == "__main__":
    main()
