"""Find the exact op that flips the axon runtime into the slow mode."""

import os
import sys
import time

import jax
import jax.numpy as jnp

cache = os.environ.get("JAX_CACHE_DIR", "/tmp/jax_compile_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 1 << 17
C = 16384
BIG = 3.4e38


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

    print(f"baseline: {bench_gather(g, table, idx):.2f} ms", flush=True)
    print("devices of out:", jax.jit(lambda t, i: t[i])(table, idx).devices(),
          flush=True)

    x = jax.random.uniform(jax.random.fold_in(key, 2), (N,), jnp.float32)
    b33 = jnp.linspace(0.0, 1.0, 33)

    candidates = {
        "broadcast sub (N,33)":
            lambda: (b33[None, :] - x[:, None]),
        "division by where":
            lambda: x / jnp.where(jnp.abs(x) > 1e-30, x, 1.0),
        "where with BIG":
            lambda: jnp.where(x > 0.5, x, BIG),
        "concatenate 3x(N,33)":
            lambda: jnp.concatenate([
                (b33[None, :] - x[:, None]),
                (b33[None, :] + x[:, None]),
                (b33[None, :] * x[:, None])], axis=-1),
        "clip 2d by column":
            lambda: jnp.clip((b33[None, :] - x[:, None]), x[:, None] * 0,
                             x[:, None]),
        "min/max tree":
            lambda: jnp.maximum(jnp.minimum(x, 0.3), -0.3),
        "floor->int":
            lambda: jnp.floor(x * 100).astype(jnp.int32),
    }

    for name, fn in candidates.items():
        f = jax.jit(fn)
        out = jax.block_until_ready(f())
        dt = bench_gather(g, table, idx)
        print(f"after {name:28s}: {dt:8.2f} ms", flush=True)
        if dt > 10:
            print("TRIGGERED by", name, flush=True)
            break
        del out


if __name__ == "__main__":
    main()
