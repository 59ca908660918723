"""When are XLA table gathers fast on this TPU?

microbench_gather.py (fori-chained, C=16k, N=2^17) measures ~80 Gelem/s;
a single flat 2^23 gather from C=32k measured ~0.02 Gelem/s.  Sweep
table size C, batch N, and op structure (single op vs fori chain) with
a scalar-reduced output so the tunnel fetch is 4 bytes.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.key(0)


def timeit(fn, *args, nrep=3):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / nrep


def single(C, N):
    table = jax.random.uniform(key, (C,), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, C)

    @jax.jit
    def f(table, idx):
        return jnp.sum(table[idx])

    t = timeit(f, table, idx)
    print(f"single   C=2^{int(np.log2(C)):2d} N=2^{int(np.log2(N)):2d}: "
          f"{t*1e3:8.2f}ms ({N/t/1e9:7.2f} Gelem/s)", flush=True)


def chained(C, N, steps=64):
    table = jax.random.uniform(key, (C,), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, C)

    @jax.jit
    def f(table, idx):
        def body(i, acc):
            j = (idx + i) % C
            return acc + table[j]
        return jnp.sum(jax.lax.fori_loop(0, steps, body,
                                         jnp.zeros((N,), jnp.float32)))

    t = timeit(f, table, idx)
    tot = N * steps
    print(f"chain{steps:3d} C=2^{int(np.log2(C)):2d} N=2^{int(np.log2(N)):2d}: "
          f"{t*1e3:8.2f}ms ({tot/t/1e9:7.2f} Gelem/s)", flush=True)


def single2d(C, N, P):
    """(N,P) gather — the analytic_rows table-mode shape."""
    table = jax.random.uniform(key, (C,), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N, P), 0, C)

    @jax.jit
    def f(table, idx):
        return jnp.sum(table[idx])

    t = timeit(f, table, idx)
    print(f"2d       C=2^{int(np.log2(C)):2d} (N=2^{int(np.log2(N)):2d},P={P}): "
          f"{t*1e3:8.2f}ms ({N*P/t/1e9:7.2f} Gelem/s)", flush=True)


for C in (1 << 14, 1 << 15, 1 << 18, 1 << 21):
    single(C, 1 << 23)
for C in (1 << 14, 1 << 15, 1 << 18, 1 << 21):
    chained(C, 1 << 17)
for C in (1 << 15, 1 << 18):
    single2d(C, 1 << 17, 32)
    single2d(C, 1 << 20, 32)
chained(1 << 15, 1 << 23, steps=4)
