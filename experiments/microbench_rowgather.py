"""Row gathers vs element gathers for the Voronoi block-candidate scan.

Design question for the direct-table fast path (grids/voronoi.py
_nearest_blocks): per locate point, is it cheaper to
  (a) gather the candidate-index row (K ints) then K per-site element
      gathers of (3,) coordinates (current scheme), or
  (b) gather ONE contiguous (K, 4) f32 row from a coordinate-baked
      table [x, y, z, bitcast(idx)] and do the distance scan in VPU
      registers?
If the serial gather unit charges per DESCRIPTOR (row) rather than per
element, (b) wins by ~K.  Measured with the repo's fetch-sync timing
discipline (block_until_ready is a no-op on the tunneled TPU).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

key = jax.random.key(0)


def timeit(fn, *args, nrep=3):
    out = fn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(nrep):
        out = fn(*args)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / nrep


def bench(nrows, K, M):
    """nrows blocks, K candidates/row, M locate points."""
    rows = jax.random.uniform(key, (nrows, K, 4), jnp.float32)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (M,), 0, nrows)
    pts = jax.random.uniform(jax.random.fold_in(key, 2), (M, 3),
                             jnp.float32)
    sites = jax.random.uniform(jax.random.fold_in(key, 3), (nrows, 3),
                               jnp.float32)
    cand = jax.random.randint(jax.random.fold_in(key, 4), (nrows, K),
                              0, nrows)

    @jax.jit
    def row_baked(rows, idx, pts):
        r = rows[idx]                              # (M, K, 4) row gather
        d = jnp.sum((pts[:, None, :] - r[:, :, :3]) ** 2, axis=-1)
        k = jnp.argmin(d, axis=1)
        sel = jnp.arange(K)[None, :] == k[:, None]
        best = jnp.sum(jnp.where(sel, r[:, :, 3], 0.0), axis=1)
        return jnp.sum(best)

    CK = min(64, K)

    @jax.jit
    def elem(cand, idx, pts, sites):
        # the current _nearest_blocks scheme: row gather of the index row,
        # then CK-chunked per-site element gathers with a running best
        cc = cand[idx]                             # (M, K) row gather
        cc_c = cc.reshape(M, K // CK, CK).swapaxes(0, 1)

        def body(carry, ck):
            best_d, best_i = carry
            cs = sites[ck]                         # (M, CK, 3) elem gathers
            d = jnp.sum((pts[:, None, :] - cs) ** 2, axis=-1)
            k = jnp.argmin(d, axis=1)
            dmin = jnp.min(d, axis=1)
            sel = jnp.arange(CK)[None, :] == k[:, None]
            ci = jnp.sum(jnp.where(sel, ck, 0), axis=1)
            better = dmin < best_d
            return (jnp.where(better, dmin, best_d),
                    jnp.where(better, ci, best_i)), None

        init = (jnp.full((M,), jnp.inf, jnp.float32),
                jnp.zeros((M,), jnp.int32))
        (_, best), _ = jax.lax.scan(body, init, cc_c)
        return jnp.sum(best).astype(jnp.float32)

    flat = jax.random.uniform(key, (nrows, 4 * K), jnp.float32)

    @jax.jit
    def row_flat(flat, idx, pts):
        # [X(K) | Y(K) | Z(K) | I(K)] layout: one 2D row gather, static
        # column slices — no tiny trailing dim, no (…, 3) lane padding
        r = flat[idx]                              # (M, 4K) row gather
        d = ((pts[:, 0:1] - r[:, :K]) ** 2
             + (pts[:, 1:2] - r[:, K:2 * K]) ** 2
             + (pts[:, 2:3] - r[:, 2 * K:3 * K]) ** 2)
        k = jnp.argmin(d, axis=1)
        sel = jnp.arange(K)[None, :] == k[:, None]
        best = jnp.sum(jnp.where(sel, r[:, 3 * K:], 0.0), axis=1)
        return jnp.sum(best)

    ta = timeit(row_baked, rows, idx, pts)
    tc = timeit(row_flat, flat, idx, pts)
    tb = timeit(elem, cand, idx, pts, sites)
    print(f"nrows={nrows:7d} K={K:3d} M=2^{int(np.log2(M)):2d}: "
          f"row-baked {ta*1e3:8.2f}ms ({ta/M*1e9:6.1f} ns/pt)  "
          f"row-flat {tc*1e3:8.2f}ms ({tc/M*1e9:6.1f} ns/pt)  "
          f"elem {tb*1e3:8.2f}ms ({tb/M*1e9:6.1f} ns/pt)", flush=True)


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}", flush=True)
    for K in (16, 32, 64):
        bench(884736, K, 1 << 20)      # nb=96 blocks (33k sites, nb=3N^1/3)
    bench(32768, 64, 1 << 20)          # nb=32 (current scheme's block count)
    bench(884736, 32, 1 << 21)         # panel-batch scale M
