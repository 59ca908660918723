"""Scaling study: sweep cost vs (steps, lanes) + piecewise step cost.

Determines whether the per-step millisecond is throughput (scales with N),
latency (flat in N), or a specific op inside the step.
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
from skirt_tpu.grids import CartesianGrid  # noqa: E402


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    half = 12 * KPC
    b = np.linspace(-half, half, 33)
    bz = np.linspace(-2 * KPC, 2 * KPC, 17)
    grid = CartesianGrid(b, b, bz)

    key = jax.random.key(0)
    rho = jax.random.uniform(jax.random.fold_in(key, 2),
                             (grid.ncells,), jnp.float32) * 1e-22

    def make_sweep(nsteps, with_gather=True, with_state_where=True,
                   fori=True):
        def kr(cell):
            return jnp.where(cell >= 0, rho[jnp.clip(cell, 0)], 0.0)

        @jax.jit
        def run(pos, d):
            state0 = grid.start(pos)
            tau0 = jnp.zeros(pos.shape[0], jnp.float32)

            def body(i, carry):
                state, tau = carry
                cell = grid.cell_of(state)
                ds, nstate = grid.step(state, pos, d)
                live = cell >= 0
                if with_gather:
                    tau = tau + kr(jnp.where(live, cell, -1)) * \
                        jnp.where(live, ds, 0.0)
                else:
                    tau = tau + jnp.where(live, ds, 0.0)
                if with_state_where:
                    nstate = jax.tree.map(
                        lambda new, old: jnp.where(live, new, old),
                        nstate, state)
                return (nstate, tau)

            if fori:
                state, tau = jax.lax.fori_loop(0, nsteps, body, (state0, tau0))
            else:
                c = (state0, tau0)
                for i in range(nsteps):
                    c = body(i, c)
                state, tau = c
            return tau

        return run

    for N in (1 << 13, 1 << 15, 1 << 17):
        pos = jax.random.uniform(key, (N, 3), jnp.float32,
                                 jnp.float32(-0.4), jnp.float32(0.4))
        pos = pos * jnp.asarray([2 * half, 2 * half, 4 * KPC], jnp.float32)
        d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3), jnp.float32)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        for S in (8, 32, 84):
            dt = timed(make_sweep(S), pos, d)
            print(f"N={N:7d} S={S:3d} fori            "
                  f"{dt*1e3:8.2f} ms  ({dt/S*1e6:7.1f} us/step)")

    N = 1 << 17
    pos = jax.random.uniform(key, (N, 3), jnp.float32,
                             jnp.float32(-0.4), jnp.float32(0.4))
    pos = pos * jnp.asarray([2 * half, 2 * half, 4 * KPC], jnp.float32)
    d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    dt = timed(make_sweep(84, with_gather=False), pos, d)
    print(f"no-gather S=84                  {dt*1e3:8.2f} ms")
    dt = timed(make_sweep(84, with_state_where=False), pos, d)
    print(f"no-state-where S=84             {dt*1e3:8.2f} ms")
    dt = timed(make_sweep(84, fori=False), pos, d)
    print(f"unrolled python loop S=84       {dt*1e3:8.2f} ms")
    dt = timed(make_sweep(84, with_gather=False, with_state_where=False), pos, d)
    print(f"neither S=84                    {dt*1e3:8.2f} ms")

    # pure elementwise chain for reference: 84 dependent multiply-adds
    @jax.jit
    def chain(x):
        def body(i, x):
            return x * 1.0000001 + 1e-7
        return jax.lax.fori_loop(0, 84, body, x)

    dt = timed(chain, pos[:, 0])
    print(f"84 chained fma (131k lanes)     {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
