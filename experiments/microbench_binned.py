"""binned_add MXU kernel vs XLA scatter, correctness + speed on TPU."""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
from skirt_tpu.ops import binned_add  # noqa: E402


def _sync(o):
    return np.asarray(jax.tree.leaves(o)[0]).ravel()[:1]


def timeit(fn, *args, nrep=5):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / nrep


N = 1 << 21
key = jax.random.key(0)
for nbins in (4096, 65536):
    idx = jax.random.randint(key, (N,), -10, nbins, dtype=jnp.int32)
    val = jax.random.uniform(key, (N,), jnp.float32)
    tally = jnp.zeros((nbins,), jnp.float32)

    f_mxu = jax.jit(lambda t, i, v: binned_add(t, i, v))
    f_xla = jax.jit(lambda t, i, v: t.at[i].add(v, mode="drop"))

    got = np.asarray(f_mxu(tally, idx, val))
    want = np.asarray(f_xla(tally, idx, val))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-9)
    ok = rel.max() < 0.01
    t_m = timeit(f_mxu, tally, idx, val)
    t_x = timeit(f_xla, tally, idx, val)
    print(f"nbins={nbins}: mxu={t_m*1e3:.2f}ms xla={t_x*1e3:.2f}ms "
          f"correct={ok} maxrel={rel.max():.2e} maxdiff={np.abs(got-want).max():.2e}", flush=True)
