"""Brick row-gather cost: the table-mode propagation redesign primitive.

Plan: 4x4x4-brick tables T (nbricks, 64); a ray's P=32 panel lookups
touch ~K distinct bricks -> K row gathers (256 B each) + VPU one-hot
selects replace P scalar gathers.  Measures:
  scalar  : (N*P,) scalar gathers               (the baseline 8.3 ns/elem)
  row64   : (N,K) row gathers from (512, 64)    (cost per descriptor?)
  row64sel: row gathers + fused one-hot select back to (N,P)
  rowbf16 : same with bf16 table rows
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.key(0)
N = 1 << 17
P = 32
K = 18
NB = 512


def timeit(fn, *args, nrep=3):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / nrep


def scalar():
    tab = jax.random.uniform(key, (NB * 64,), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N, P), 0, NB * 64)

    @jax.jit
    def f(tab, idx):
        return jnp.sum(tab[idx])

    t = timeit(f, tab, idx)
    print(f"scalar (N,P)=({N},{P}): {t*1e3:7.2f}ms "
          f"({t/(N*P)*1e9:6.2f} ns/lookup)", flush=True)


def row(dt, sel):
    tab = jax.random.uniform(key, (NB, 64), dt)
    bidx = jax.random.randint(jax.random.fold_in(key, 1), (N, K), 0, NB)
    slot = jax.random.randint(jax.random.fold_in(key, 2), (N, P), 0, K)
    loc = jax.random.randint(jax.random.fold_in(key, 3), (N, P), 0, 64)

    @jax.jit
    def f(tab, bidx, slot, loc):
        rows = tab[bidx]                      # (N, K, 64)
        if not sel:
            return jnp.sum(rows.astype(jnp.float32))
        # panel p reads rows[n, slot[n,p], loc[n,p]]
        oh = (slot[:, :, None] == jnp.arange(K)[None, None, :])[..., None] \
            & (loc[:, :, None] == jnp.arange(64)[None, None, :])[:, :, None]
        vals = jnp.sum(jnp.where(oh, rows[:, None, :, :].astype(jnp.float32),
                                 0.0), axis=(2, 3))
        return jnp.sum(vals)

    t = timeit(f, tab, bidx, slot, loc)
    name = f"row64 {np.dtype(dt).name} sel={sel}"
    print(f"{name}: {t*1e3:7.2f}ms ({t/(N*K)*1e9:6.2f} ns/descriptor, "
          f"{t/(N*P)*1e9:6.2f} ns/panel-lookup)", flush=True)


scalar()
for dt in (jnp.float32, jnp.bfloat16):
    row(dt, False)
row(jnp.float32, True)
row(jnp.bfloat16, True)
