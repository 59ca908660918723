"""Locate the slowdown of the vector lifecycle on the real chip.

Times each piece of the vector event at N=131k on the bench grid, alone
and inside a while_loop, to find what behaves differently in composition.
"""

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

    @jax.jit
    def cross_only(pos, d):
        return grid.crossings(pos, d)

    @jax.jit
    def rec(pos, d):
        return vt.record_paths(grid, pos, d)

    @jax.jit
    def rec_sorted_only(pos, d):
        t_all, t0, t1 = grid.crossings(pos, d)
        t = jnp.clip(t_all, t0[:, None], t1[:, None])
        return jnp.sort(t, axis=-1)

    @jax.jit
    def full_event(pos, d, L, labs):
        cells, ds_r, te = vt.record_paths(grid, pos, d)
        safe = jnp.clip(cells, 0)
        kext_rows = jnp.where(cells >= 0, kpk[:, None] * rho[safe], 0.0)
        dtau = kext_rows * ds_r
        cum = jnp.cumsum(dtau, axis=1)
        cum_prev = cum - dtau
        expfac = jnp.exp(-cum_prev) * (-jnp.expm1(-dtau))
        Lint = L[:, None] * expfac
        idx = jnp.where(cells >= 0, cells * nl + ell[:, None], -1)
        labs = labs.at[idx].add(0.4 * Lint, mode="drop")
        taupath = cum[:, -1]
        tau = 0.5 * taupath
        s, cell_at, _ = vt.invert_tau(cum, ds_r, te, cells, tau)
        return s, cell_at, labs, taupath

    @jax.jit
    def looped_event(pos, d, L, labs, iters):
        def body(c):
            i, p, L_, lb = c
            s, cell_at, lb, tp = full_event(p, d, L_, lb)
            p = p + s[:, None] * d * 0.01
            return (i + 1, p, L_ * 0.9, lb)

        def cond(c):
            return c[0] < iters

        out = jax.lax.while_loop(cond, body, (jnp.int32(0), pos, L, labs))
        return out[3]

    L = jnp.ones((N,), jnp.float32)
    labs = jnp.zeros((grid.ncells * nl,), jnp.float32)

    timed("crossings only", cross_only, pos, d)
    timed("crossings + sort", rec_sorted_only, pos, d)
    timed("record_paths (sort + locate)", rec, pos, d)
    timed("full event (no loop)", full_event, pos, d, L, labs)
    t = timed("while_loop 25 events", looped_event, pos, d, L, labs,
              jnp.int32(25), reps=2)
    print(f"  -> per event in loop: {t/25*1e3:.2f} ms")


if __name__ == "__main__":
    main()
