"""Which property of the real cell rows makes gather/scatter 2000x slower?"""

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

from skirt_tpu.constants import KPC  # noqa: E402
from skirt_tpu.engine import vector_traversal as vt  # noqa: E402
from skirt_tpu.grids import CartesianGrid  # noqa: E402

N = 1 << 17


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
    half = 12 * KPC
    b = np.linspace(-half, half, 33)
    bz = np.linspace(-2 * KPC, 2 * KPC, 17)
    grid = CartesianGrid(b, b, bz)

    key = jax.random.key(0)
    pos = jax.random.uniform(key, (N, 3), jnp.float32,
                             jnp.float32(-0.4), jnp.float32(0.4))
    pos = pos * jnp.asarray([2 * half, 2 * half, 4 * KPC], jnp.float32)
    d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rho = jax.random.uniform(jax.random.fold_in(key, 2),
                             (grid.ncells,), jnp.float32) * 1e-22

    cells, ds_r, te = jax.jit(lambda p, dd: vt.record_paths(grid, p, dd))(
        pos, d)
    cells = jax.block_until_ready(cells)
    S = cells.shape[1]
    print("cells shape", cells.shape, "dtype", cells.dtype)

    @jax.jit
    def g_plain(table, idx):
        return table[idx]

    @jax.jit
    def g_clip(table, idx):
        return table[jnp.clip(idx, 0)]

    idx_rand82 = jax.random.randint(jax.random.fold_in(key, 3),
                                    (N, S), 0, grid.ncells)
    idx_rand96 = jax.random.randint(jax.random.fold_in(key, 3),
                                    (N, 96), 0, grid.ncells)
    cells_pos = jnp.clip(cells, 0)  # same values, precomputed clip

    timed("gather randint (N,82)", g_plain, rho, idx_rand82)
    timed("gather randint (N,96)", g_plain, rho, idx_rand96)
    timed("gather real cells, precomputed clip", g_plain, rho, cells_pos)
    timed("gather real cells, clip inside", g_clip, rho, cells)
    # same distribution as real cells but shuffled (breaks coherence)
    perm = jax.random.permutation(jax.random.fold_in(key, 4),
                                  cells_pos.ravel()).reshape(cells_pos.shape)
    perm = jax.block_until_ready(perm)
    timed("gather shuffled real values", g_plain, rho, perm)

    # int64? index dtype check
    print("idx dtypes:", idx_rand82.dtype, cells_pos.dtype)


if __name__ == "__main__":
    main()
