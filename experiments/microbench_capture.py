"""Confirm: executing a jit that closure-captures a DEVICE array flips the
axon runtime into a persistent slow mode; np-array captures (HLO literals)
and explicit args do not.
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
    which = sys.argv[1] if len(sys.argv) > 1 else "np"
    key = jax.random.key(0)
    table = jax.random.uniform(key, (C,), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (N, 96), 0, C)
    g = jax.jit(lambda t, i: t[i])
    print(f"gather baseline: {bench(g, table, idx):7.2f} ms", flush=True)

    x = jax.random.uniform(jax.random.fold_in(key, 2), (N,), jnp.float32)

    if which == "np":
        b = np.linspace(0.0, 1.0, 33).astype(np.float32)  # np capture
        f = jax.jit(lambda v: jnp.asarray(b)[None, :] - v[:, None])
    elif which == "jnp_small":
        b = jnp.linspace(0.0, 1.0, 33)  # small device capture
        f = jax.jit(lambda v: b[None, :] - v[:, None])
    elif which == "jnp_scalar":
        b = jnp.float32(3.0)  # scalar device capture
        f = jax.jit(lambda v: v * b)
    elif which == "arg":
        b = jnp.linspace(0.0, 1.0, 33)
        f = jax.jit(lambda bb, v: bb[None, :] - v[:, None])
        out = jax.block_until_ready(f(b, x))
        print(f"after arg-passed: gather {bench(g, table, idx):7.2f} ms",
              flush=True)
        return

    out = jax.block_until_ready(f(x))
    print(f"after capture[{which}]: gather {bench(g, table, idx):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
