"""Micro-benchmark: the traversal sweep itself, on the flagship bench grid.

Times (a) one raw optical-depth sweep, (b) one recorded sweep,
(c) a full lifecycle batch with path_record on/off, to locate where the
millisecond-per-step cost comes from.
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

# after jax backend init: a PYTHONPATH entry here breaks axon plugin discovery
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from skirt_tpu.constants import KPC  # noqa: E402
from skirt_tpu.engine import traversal  # noqa: E402
from skirt_tpu.grids import CartesianGrid  # noqa: E402

N = 1 << 17
NC = 32


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:42s} {dt*1e3:9.2f} ms")
    return dt


def main():
    half = 12 * KPC
    b = np.linspace(-half, half, NC + 1)
    bz = np.linspace(-2 * KPC, 2 * KPC, NC // 2 + 1)
    grid = CartesianGrid(b, b, bz)
    print("max_steps =", grid.max_steps)

    key = jax.random.key(0)
    pos = jax.random.uniform(key, (N, 3), jnp.float32,
                             jnp.float32(-0.5), jnp.float32(0.5))
    pos = pos * jnp.asarray([2 * half, 2 * half, 4 * KPC], jnp.float32)
    d = jax.random.normal(jax.random.fold_in(key, 1), (N, 3), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rho = jax.random.uniform(jax.random.fold_in(key, 2),
                             (grid.ncells,), jnp.float32) * 1e-22

    def kr(cell):
        return jnp.where(cell >= 0, rho[jnp.clip(cell, 0)], 0.0)

    @jax.jit
    def tau_sweep(pos, d):
        return traversal.optical_depth(grid, kr, pos, d)

    @jax.jit
    def tau_recorded(pos, d):
        carry0 = dict(tau=jnp.zeros(N, jnp.float32))

        def seg(carry, cell, ds, t_exit):
            t = carry["tau"] + kr(cell) * ds
            return dict(tau=t), jnp.ones(N, bool), t

        carry, path = traversal.sweep_tau_recorded(grid, pos, d, seg, carry0)
        return carry["tau"], path

    @jax.jit
    def tau_sweep_noexit(pos, d):
        # same sweep but check_every = max_steps: no early exit at all
        def seg(tau, cell, ds, t_exit):
            return tau + kr(cell) * ds, jnp.ones_like(tau, bool)
        tau0 = jnp.zeros(N, jnp.float32)
        tau, _ = traversal.sweep(grid, pos, d, seg, tau0,
                                 check_every=grid.max_steps)
        return tau

    t1 = timed("one tau sweep (check_every=8)", tau_sweep, pos, d)
    timed("one tau sweep (no early exit)", tau_sweep_noexit, pos, d)
    t2 = timed("one recorded sweep", tau_recorded, pos, d)
    print(f"  -> per max_step: sweep {t1/grid.max_steps*1e6:.1f} us, "
          f"recorded {t2/grid.max_steps*1e6:.1f} us")

    import __graft_entry__ as ge

    for rec in (True, False):
        import skirt_tpu.engine.lifecycle as lc
        orig = lc.LifecycleOptions
        run_batch, zero_tallies, ell, L0 = ge._build(
            nlambda=4, ncells=32, packets=N, n_instruments=2,
            store_absorption=True, max_scatt=64)
        # monkey-patch path_record through options is awkward; rebuild inline
        fn = jax.jit(lambda k, e, l: run_batch(k, e, l, zero_tallies()))
        if rec:
            timed("full lifecycle batch (auto path-record)", fn,
                  jax.random.key(4357), ell, L0, reps=2)
        break

    # lifecycle with path_record explicitly off
    from skirt_tpu.engine.lifecycle import LifecycleOptions, make_lifecycle
    from skirt_tpu.geometry import ExpDiskGeometry
    from skirt_tpu.instruments import SEDInstrument, SimpleInstrument
    from skirt_tpu.media import (DustComponent, DustSystem,
                                 OpticalDepthNormalization,
                                 SimpleOligoDustMix)
    from skirt_tpu.sources.stellar import (LuminosityStellarComponent,
                                           StellarSystem)
    from skirt_tpu.wavelengths import OligoWavelengthGrid

    nlambda = 4
    wg = OligoWavelengthGrid(list(np.linspace(0.4e-6, 1.2e-6, nlambda)))
    ss = StellarSystem([LuminosityStellarComponent(
        ExpDiskGeometry(4 * KPC, 0.35 * KPC), wg, [1e36] * nlambda)])
    mix = SimpleOligoDustMix(wg, [2600.0] * nlambda, [0.6] * nlambda,
                             [0.5] * nlambda)
    comp = DustComponent(ExpDiskGeometry(4 * KPC, 0.2 * KPC), mix,
                         OpticalDepthNormalization("z", wg.lambdav[0], 1.0))
    dsys = DustSystem(grid, [comp], samples_per_cell=4)
    instruments = [
        SEDInstrument("sed", 3.08e23, nlambda, inclination=1.0),
        SimpleInstrument("img", 3.08e23, nlambda, 16, 16,
                         fov_x=24 * KPC, fov_y=24 * KPC,
                         inclination=np.pi / 2),
    ]
    ell = jnp.asarray(np.arange(N, dtype=np.int32) % nlambda)
    L0 = jnp.full((N,), 1e36 / N, jnp.float32)

    for pr, ms in ((False, 64), (True, 64), (False, 16), (True, 16)):
        opts = LifecycleOptions(store_absorption=True, max_scatt_events=ms,
                                path_record=pr)
        rb = make_lifecycle(grid, dsys, ss, instruments, opts, nlambda)

        def zt():
            t = {"instruments": [i.zero_tallies() for i in instruments]}
            t["labs"] = jnp.zeros((grid.ncells * nlambda,), jnp.float32)
            return t

        fn = jax.jit(lambda k, e, l, rb=rb: rb(k, e, l, zt()))
        timed(f"lifecycle path_record={pr} max_scatt={ms}", fn,
              jax.random.key(4357), ell, L0, reps=2)


if __name__ == "__main__":
    main()
