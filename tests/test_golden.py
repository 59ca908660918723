"""Golden regression values for the flagship bench configuration.

Pins the exact CPU outputs of __graft_entry__._build at the default seed:
any change to the RNG discipline, the analytic quadrature, the sampled
deposition, or the instrument pipeline shows up here before it shows up
as a silent benchmark or physics drift.  (ref: the reference's fixed-seed
determinism for regression comparison, SKIRTcore/Random.cpp:21.)

Tolerances are float32-reduction-order loose (cross-platform XLA codegen
may reorder sums) but far tighter than any physics change.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "/root/repo")

from skirt_tpu import rng


# re-pinned 2026-08-19: gather-free launch samplers (quantile-table
# inverse CDF + closed-form ExpDisk Gamma(2) radius) changed the random
# stream; physics drift was cross-checked against the previous pins
# (all deltas < 0.6%, consistent with the stream change at 2^14 packets)
GOLDEN_F = np.array([2.36452766914265e+35, 2.380970483920454e+35,
                     2.3859808729178562e+35, 2.3849237711595097e+35])
GOLDEN_LABS = 1.1405006894059934e+35
GOLDEN_CUBE = 4.4077348294067616e+35

# reference-exact estimator chain (gridded densities + path deposition),
# pinned 2026-08-21; within 0.7% of the fast-path pins above (MC-level
# agreement of the two estimator chains at 2^14 packets)
GOLDEN_EXACT_F = np.array([2.3790814864557078e+35, 2.3905911596945613e+35,
                           2.4007248378209483e+35, 2.400642836672746e+35])
GOLDEN_EXACT_LABS = 1.13722559523806e+35
GOLDEN_EXACT_CUBE = 4.441337473833124e+35


class TestFlagshipGolden:
    def test_fast_path_outputs_pinned(self):
        from __graft_entry__ import _build
        run, zeros, ell, L0 = _build(nlambda=4, ncells=16, packets=1 << 14,
                                     quadrature_panels=32)
        out = jax.jit(lambda k, e, l: run(k, e, l, zeros()))(
            rng.root_key(4357), ell, L0)
        F = np.asarray(out["instruments"][0]["Ftot"], np.float64)
        np.testing.assert_allclose(F, GOLDEN_F, rtol=2e-4)
        labs = float(np.asarray(out["labs"]).sum())
        assert labs == pytest.approx(GOLDEN_LABS, rel=2e-4)
        cube = float(np.asarray(out["instruments"][1]["ftot"]).sum())
        assert cube == pytest.approx(GOLDEN_CUBE, rel=2e-4)

    def test_reference_exact_outputs_pinned(self):
        """Same pin for the reference-exact chain (gridded + path): drift
        in the traversal sweep, the kappa-row gathers, or the per-segment
        deposits shows up here (VERDICT r1 item 9)."""
        from __graft_entry__ import _build
        run, zeros, ell, L0 = _build(nlambda=4, ncells=16, packets=1 << 14,
                                     density_mode="gridded",
                                     deposition="path")
        out = jax.jit(lambda k, e, l: run(k, e, l, zeros()))(
            rng.root_key(4357), ell, L0)
        F = np.asarray(out["instruments"][0]["Ftot"], np.float64)
        np.testing.assert_allclose(F, GOLDEN_EXACT_F, rtol=2e-4)
        labs = float(np.asarray(out["labs"]).sum())
        assert labs == pytest.approx(GOLDEN_EXACT_LABS, rel=2e-4)
        cube = float(np.asarray(out["instruments"][1]["ftot"]).sum())
        assert cube == pytest.approx(GOLDEN_EXACT_CUBE, rel=2e-4)
