"""Bisect which sub-op of record_paths degrades later gathers."""

import gc
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 17
C = 16384


def bench_gather(g, table, idx, reps=3):
    out = g(table, idx)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(table, idx)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    key = jax.random.key(0)
    table = jax.random.uniform(key, (C,), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N, 96), 0, C)

    @jax.jit
    def g(table, idx):
        return table[idx]

    print(f"baseline gather: {bench_gather(g, table, idx):.2f} ms", flush=True)

    from skirt_tpu.constants import KPC
    from skirt_tpu.grids import CartesianGrid

    half = 12 * KPC
    b = np.linspace(-half, half, 33)
    bz = np.linspace(-2 * KPC, 2 * KPC, 17)
    grid = CartesianGrid(b, b, bz)
    pos = jax.random.uniform(key, (N, 3), jnp.float32,
                             jnp.float32(-0.4), jnp.float32(0.4))
    pos = pos * jnp.asarray([2 * half, 2 * half, 4 * KPC], jnp.float32)
    d = jax.random.normal(jax.random.fold_in(key, 3), (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    print(f"after grid import: {bench_gather(g, table, idx):.2f} ms",
          flush=True)

    # step 1: crossings only
    @jax.jit
    def crossings(p, dd):
        return grid.crossings(p, dd)

    out = jax.block_until_ready(crossings(pos, d))
    print(f"after crossings: {bench_gather(g, table, idx):.2f} ms", flush=True)
    del out
    gc.collect()
    print(f"after del: {bench_gather(g, table, idx):.2f} ms", flush=True)

    # step 2: + sort
    @jax.jit
    def crosort(p, dd):
        t_all, t0_, t1_ = grid.crossings(p, dd)
        return jnp.sort(jnp.clip(t_all, t0_[:, None], t1_[:, None]), axis=-1)

    out = jax.block_until_ready(crosort(pos, d))
    print(f"after crossings+sort: {bench_gather(g, table, idx):.2f} ms",
          flush=True)
    del out
    gc.collect()

    # step 3: + locate (full record_paths)
    from skirt_tpu.engine import vector_traversal as vt
    out = jax.block_until_ready(
        jax.jit(lambda p, dd: vt.record_paths(grid, p, dd))(pos, d))
    print(f"after record_paths: {bench_gather(g, table, idx):.2f} ms",
          flush=True)
    del out
    gc.collect()
    print(f"after del + gc: {bench_gather(g, table, idx):.2f} ms", flush=True)

    # fresh arrays entirely
    table2 = jax.random.uniform(jax.random.fold_in(key, 9), (C,), jnp.float32)
    idx2 = jax.random.randint(jax.random.fold_in(key, 10), (N, 96), 0, C)
    print(f"fresh-input gather: {bench_gather(g, table2, idx2):.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
