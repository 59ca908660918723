"""TRUE on-device per-op costs via differential fori timing.

Isolated per-op dispatches are transfer-bound on the tunneled TPU (the
tunnel streams inputs/outputs per call at ~0.5 GB/s), so each op is timed
INSIDE a jitted fori_loop with a data dependency chain and a scalar
output; cost = (t(K2) - t(K1)) / (K2 - K1).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1 << 20
S = 88
NCELLS = 16384
K1, K2 = 2, 6


def _sync(out):
    return np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def run(fn, *args, nrep=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / nrep


def measure(name, make_body, init_fn):
    try:
        ts = {}
        for K in (K1, K2):
            @jax.jit
            def f(x0):
                body = make_body()
                out = jax.lax.fori_loop(0, K, body, x0)
                return jax.tree.map(
                    lambda a: a.ravel()[:1].astype(jnp.float32), out)

            ts[K] = run(f, init_fn())
        per = (ts[K2] - ts[K1]) / (K2 - K1)
        print(f"{name}: {per*1e3:.2f}ms/op "
              f"({per/(N*S)*1e9:.3f} ns/elem)", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)


key = jax.random.key(0)
rho_np = np.random.default_rng(0).random(NCELLS).astype(np.float32)


def init_f32():
    return jax.random.uniform(key, (N, S), jnp.float32)


def init_cells():
    return jax.random.randint(key, (N, S), 0, NCELLS, dtype=jnp.int32)


# 1. elementwise chain
measure("exp_chain",
        lambda: (lambda i, x: jnp.exp(-x) * (-jnp.expm1(-x)) + 1e-3),
        init_f32)

# 2. cumsum rows
measure("cumsum",
        lambda: (lambda i, x: jnp.cumsum(x, axis=1) * 1e-3),
        init_f32)

# 3. per-row sort
measure("sort",
        lambda: (lambda i, x: jnp.sort(x, axis=1) * 0.999 + 1e-6),
        init_f32)

# 4. gather (index dependency via xor with i)
def gather_body():
    rho = rho_np

    def body(i, c):
        v = jnp.asarray(rho)[c]
        return jax.lax.bitwise_xor(c + i, v.astype(jnp.int32) + 1) % NCELLS

    return body


measure("gather", gather_body, init_cells)

# 5. scatter-add
def scatter_body():
    def body(i, carry):
        labs, c = carry
        v = (c % 7).astype(jnp.float32)
        labs = labs.at[c % (NCELLS * 4)].add(v, mode="drop")
        c = (c + labs[0].astype(jnp.int32) + i) % NCELLS
        return labs, c

    return body


measure("scatter_add", scatter_body,
        lambda: (jnp.zeros((NCELLS * 4,), jnp.float32), init_cells()))

# 6. locate (arithmetic floor) + flatten
def locate_body():
    def body(i, x):
        ix = jnp.floor(x * 31.9).astype(jnp.int32)
        return x + (ix % 3).astype(jnp.float32) * 1e-6

    return body


measure("locate_arith", locate_body, init_f32)
