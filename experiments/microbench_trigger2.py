"""Characterize the degradation: alignment? global? resettable?"""

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


def bench(f, *args, reps=3):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    key = jax.random.key(0)
    table = jax.random.uniform(key, (C,), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N, 96), 0, C)
    x = jax.random.uniform(jax.random.fold_in(key, 2), (N,), jnp.float32)

    g = jax.jit(lambda t, i: t[i])
    srt = jax.jit(lambda a: jnp.sort(a, axis=-1))
    ew = jax.jit(lambda a: a * 1.000001 + 1e-9)
    big2d = jax.random.uniform(jax.random.fold_in(key, 3), (N, 96),
                               jnp.float32)

    print(f"gather baseline : {bench(g, table, idx):7.2f} ms", flush=True)
    print(f"sort baseline   : {bench(srt, big2d):7.2f} ms", flush=True)
    print(f"elemwise (N,96) : {bench(ew, big2d):7.2f} ms", flush=True)

    mk = {
        "(8,33) small unaligned": jax.jit(
            lambda v: (jnp.linspace(0., 1., 33)[None, :] - v[:8, None])),
        "(N,32) aligned": jax.jit(
            lambda v: (jnp.linspace(0., 1., 32)[None, :] - v[:, None])),
        "(N,33) unaligned": jax.jit(
            lambda v: (jnp.linspace(0., 1., 33)[None, :] - v[:, None])),
    }
    for name, f in mk.items():
        out = jax.block_until_ready(f(x))
        del out
        print(f"after {name:24s}: gather {bench(g, table, idx):7.2f} ms, "
              f"sort {bench(srt, big2d):7.2f} ms, "
              f"elemwise {bench(ew, big2d):7.2f} ms", flush=True)

    # is it recoverable by running lots of aligned work?
    for _ in range(10):
        jax.block_until_ready(ew(big2d))
    print(f"after flush     : gather {bench(g, table, idx):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
