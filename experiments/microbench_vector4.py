"""Order experiment: does running record_paths degrade later gathers?"""

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


def timed(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.key(0)
    table = jax.random.uniform(key, (C,), jnp.float32)
    idx96 = jax.random.randint(jax.random.fold_in(key, 1), (N, 96), 0, C)
    idx82 = jax.random.randint(jax.random.fold_in(key, 2), (N, 82), 0, C)

    @jax.jit
    def g(table, idx):
        return table[idx]

    timed("gather (N,96) FIRST", g, table, idx96)
    timed("gather (N,82) first-ish", g, table, idx82)

    # now import the grid machinery and run record_paths once
    from skirt_tpu.constants import KPC
    from skirt_tpu.engine import vector_traversal as vt
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
    cells, ds_r, te = jax.block_until_ready(
        jax.jit(lambda p, dd: vt.record_paths(grid, p, dd))(pos, d))

    timed("gather (N,96) AFTER record_paths", g, table, idx96)
    timed("gather (N,82) after", g, table, idx82)
    timed("gather real cells after", g, table, jnp.clip(cells, 0))


if __name__ == "__main__":
    main()
