"""Cost of per-lane sort + batched segment ops for the crossings design."""

import os
import sys
import time

import jax
import jax.numpy as jnp

cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.2f} ms")
    return dt


def main():
    key = jax.random.key(0)
    for N, S in ((1 << 17, 96), (1 << 17, 128), (1 << 18, 96), (1 << 17, 392)):
        x = jax.random.uniform(key, (N, S), jnp.float32)

        @jax.jit
        def srt(x):
            return jnp.sort(x, axis=-1)

        timed(f"sort (N={N}, S={S}) minor axis", srt, x)

    N, S = 1 << 17, 96
    x = jax.random.uniform(key, (N, S), jnp.float32)
    v = jax.random.uniform(jax.random.fold_in(key, 1), (N, S), jnp.float32)

    @jax.jit
    def sort2(x, v):
        return jax.lax.sort((x, v), dimension=1, num_keys=1)

    timed("sort_key_val (N=131k, S=96)", sort2, x, v)

    @jax.jit
    def seg_physics(ts, krows):
        ds = jnp.diff(ts, axis=-1)
        dtau = krows[:, :-1] * ds
        cum = jnp.cumsum(dtau, axis=-1)
        cum_prev = cum - dtau
        expfac = jnp.exp(-cum_prev) * (-jnp.expm1(-dtau))
        return expfac.sum(axis=-1), cum[:, -1]

    timed("segment physics (diff+cumsum+2exp)", seg_physics, x, v)

    idx = jax.random.randint(jax.random.fold_in(key, 2), (N, S), 0, 16384)
    table = jax.random.uniform(jax.random.fold_in(key, 3), (16384,), jnp.float32)

    @jax.jit
    def big_gather(table, idx):
        return table[idx]

    timed("batched gather (N*S=12.6M)", big_gather, table, idx)

    tally = jnp.zeros((16384 * 4,), jnp.float32)

    @jax.jit
    def big_scatter(tally, idx, v):
        return tally.at[idx.ravel() * 4].add(v.ravel(), mode="drop")

    timed("batched scatter-add (12.6M)", big_scatter, tally, idx, v)

    # batched per-lane searchsorted into a 33-entry border table
    borders = jnp.linspace(0.0, 1.0, 33)

    @jax.jit
    def ss(x):
        return jnp.searchsorted(borders, x.ravel()).reshape(x.shape)

    timed("batched searchsorted (12.6M into 33)", ss, x)

    # take_along_axis for propagation inversion
    ih = jax.random.randint(jax.random.fold_in(key, 4), (N,), 0, S)

    @jax.jit
    def taa(x, ih):
        return jnp.take_along_axis(x, ih[:, None], axis=1)[:, 0]

    timed("take_along_axis (131k rows)", taa, x, ih)


if __name__ == "__main__":
    main()
