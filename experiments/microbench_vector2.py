"""Bisect the 178 ms vector event: which piece blows up."""

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
    print(f"{name:46s} {dt*1e3:9.2f} ms")
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
    nl = 4
    ell = jnp.asarray(np.arange(N, dtype=np.int32) % nl)
    kpk = jnp.full((N,), 2600.0, jnp.float32)
    L = jnp.ones((N,), jnp.float32)
    labs = jnp.zeros((grid.ncells * nl,), jnp.float32)

    # precompute record outside the timing
    cells, ds_r, te = jax.jit(lambda p, dd: vt.record_paths(grid, p, dd))(
        pos, d)
    cells = jax.block_until_ready(cells)

    @jax.jit
    def physics_only(cells, ds_r, L):
        safe = jnp.clip(cells, 0)
        kext_rows = jnp.where(cells >= 0, kpk[:, None] * rho[safe], 0.0)
        dtau = kext_rows * ds_r
        cum = jnp.cumsum(dtau, axis=1)
        cum_prev = cum - dtau
        expfac = jnp.exp(-cum_prev) * (-jnp.expm1(-dtau))
        return L[:, None] * expfac, cum

    Lint, cum = jax.block_until_ready(physics_only(cells, ds_r, L))

    @jax.jit
    def scatter2d(labs, cells, Lint):
        idx = jnp.where(cells >= 0, cells * nl + ell[:, None], -1)
        return labs.at[idx].add(0.4 * Lint, mode="drop")

    @jax.jit
    def scatter1d(labs, cells, Lint):
        idx = jnp.where(cells >= 0, cells * nl + ell[:, None], -1)
        return labs.at[idx.ravel()].add(0.4 * Lint.ravel(), mode="drop")

    @jax.jit
    def invert(cum, ds_r, te, cells):
        return vt.invert_tau(cum, ds_r, te, cells, 0.5 * cum[:, -1])

    @jax.jit
    def gather_rows(cells):
        safe = jnp.clip(cells, 0)
        return jnp.where(cells >= 0, kpk[:, None] * rho[safe], 0.0)

    timed("gather rows (N,82)", gather_rows, cells)
    timed("physics only", physics_only, cells, ds_r, L)
    timed("labs scatter 2D idx", scatter2d, labs, cells, Lint)
    timed("labs scatter raveled 1D idx", scatter1d, labs, cells, Lint)
    timed("invert_tau", invert, cum, ds_r, te, cells)


if __name__ == "__main__":
    main()
