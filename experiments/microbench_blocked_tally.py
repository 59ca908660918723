"""Lambda-blocked MXU tally vs serial scatter at the 128-lambda flagship
shape (Ncells=16384 cells x 128 lambda = 2.1M bins, 2^17 lanes)."""
import time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")
from skirt_tpu.ops.binned import (binned_add, binned_add_lm,
                                  blocked_layout, drop_add)

def sync(x):
    return float(np.asarray(x).ravel()[:2].sum())

def bench(f, tally, idx, vals, reps=30):
    # chain reps in ONE dispatch (per-call tunnel latency otherwise
    # dominates: ~15 ms/dispatch measured)
    @jax.jit
    def many(t, i, v):
        def body(k, acc):
            return f(acc, i, v)
        return jax.lax.fori_loop(0, reps, body, t)
    o = many(tally, idx, vals); sync(o)
    t0 = time.perf_counter()
    o = many(tally, idx, vals)
    sync(o)
    return (time.perf_counter() - t0) / reps

nl, ncells, n = 128, 16384, 1 << 17
lay = blocked_layout(nl, ncells, n)
Q, R, rows_pb = lay
rs = np.random.default_rng(1)
cells = jnp.asarray(rs.integers(0, ncells, n).astype(np.int32))
vals = jnp.asarray(rs.uniform(0, 1, n).astype(np.float32))
bins_cm = cells * nl + jnp.asarray(rs.integers(0, nl, n).astype(np.int32))
tally_cm = jnp.zeros((ncells * nl,), jnp.float32)
tally_lm = jnp.zeros((nl * Q * R,), jnp.float32)

f_sc = lambda t, i, v: drop_add(t, i, v)
f_lm = lambda t, c, v: binned_add_lm(t, c, v, nlambda=nl,
                                    ncells=ncells)
t_sc = bench(f_sc, tally_cm, bins_cm, vals)
t_lm = bench(f_lm, tally_lm, cells, vals)
print(f"serial scatter (2.1M bins): {t_sc*1e3:.3f} ms/call")
print(f"lambda-blocked MXU:         {t_lm*1e3:.3f} ms/call "
      f"({t_sc/t_lm:.1f}x)")
# also the 4-lambda MXU reference point
bins4 = cells * 4 + jnp.asarray(rs.integers(0, 4, n).astype(np.int32))
t4 = jnp.zeros((ncells * 4,), jnp.float32)
f4 = lambda t, i, v: binned_add(t, i, v)
print(f"4-lambda MXU contraction:   {bench(f4, t4, bins4, vals)*1e3:.3f} "
      f"ms/call")
