"""Hardware-configuration smoke test for the fused megakernel.

Runs ON THE REAL TPU (tests/ forces CPU via conftest, so this lives in
experiments/).  Compiles and executes the fused event megakernel in the
exact flagship bench configuration classes:

  1. fused + refill (threefry uniforms)  — the bench default
  2. fused + refill + fused_hw_rng=True  — the opt-in on-core PRNG path

and asserts the two agree on detected flux / absorbed energy within MC
tolerance (different event RNG streams, same physics).  Run this before
committing any change to engine/fused.py:

    python experiments/tpu_smoke.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    assert jax.default_backend() == "tpu", (
        f"smoke test needs the real TPU, got {jax.default_backend()}")

    from __graft_entry__ import _build, _enable_compile_cache

    _enable_compile_cache()

    kw = dict(nlambda=4, ncells=16, packets=1 << 15, n_instruments=2,
              store_absorption=True, max_scatt=64, deposition="sampled",
              quadrature_panels=32, peel_panels=8, refill_batches=8,
              fused=True)
    key = jax.random.key(4357)

    results = {}
    for name, hw in (("threefry", False), ("hw_rng", True)):
        t0 = time.perf_counter()
        run, zeros, ell, L0 = _build(fused_hw_rng=hw, **kw)
        out = jax.jit(lambda k: run(k, ell, L0, zeros()))(key)
        ftot = np.asarray(out["instruments"][0]["Ftot"], np.float64)
        labs = float(np.asarray(out["labs"], np.float64).sum())
        assert np.all(np.isfinite(ftot)) and np.isfinite(labs), name
        assert ftot.sum() > 0 and labs > 0, name
        results[name] = (ftot, labs)
        print(f"  {name}: Ftot={ftot.sum():.4e} labs={labs:.4e} "
              f"({time.perf_counter() - t0:.1f}s)")

    f_a, l_a = results["threefry"]
    f_b, l_b = results["hw_rng"]
    rel_f = abs(f_a.sum() - f_b.sum()) / f_a.sum()
    rel_l = abs(l_a - l_b) / l_a
    assert rel_f < 0.02, f"flux mismatch {rel_f:.4f}"
    assert rel_l < 0.05, f"absorption mismatch {rel_l:.4f}"
    print(f"OK: hw_rng vs threefry rel flux {rel_f:.2e}, labs {rel_l:.2e}")


if __name__ == "__main__":
    main()
