"""Fused TABLE-mode event kernel (engine/fused_table.py) parity.

The voxelized octree torus traced through (a) the unfused XLA table path
and (b) the fused table kernel must agree within MC noise (the two share
the launch/emission-peel stream; event streams differ).  Runs the Pallas
kernel in interpreter mode on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt_tpu import rng
from skirt_tpu.engine.lifecycle import LifecycleOptions, make_lifecycle
from skirt_tpu.instruments import SEDInstrument

from test_voxelize import _torus_setup


N = 1 << 13


def _table_setup():
    wg, ss, grid, dsys = _torus_setup()
    vds, fold = dsys.voxelized()
    tds = vds.as_table()
    ins = [SEDInstrument("sed", 3.08e23, 2, inclination=1.2, azimuth=0.7)]
    ell = jnp.asarray(np.arange(N, dtype=np.int32) % 2)
    L0 = jnp.full((N,), 1e36 / N, jnp.float32)
    return wg, ss, tds, ins, ell, L0


def _run(tds, ss, ins, ell, L0, **opt_kw):
    opts = LifecycleOptions(store_absorption=True, max_scatt_events=48,
                            deposition="sampled", quadrature_panels=24,
                            peel_panels=8, **opt_kw)
    run = jax.jit(make_lifecycle(tds.grid, tds, ss, ins, opts, 2))
    t = run(rng.root_key(4357), ell, L0, {
        "instruments": [ins[0].zero_tallies()],
        "labs": jnp.zeros((tds.grid.ncells * 2,), jnp.float32)})
    return t


@pytest.fixture(scope="module")
def trio():
    wg, ss, tds, ins, ell, L0 = _table_setup()
    tx = _run(tds, ss, ins, ell, L0)
    tf = _run(tds, ss, ins, ell, L0, fused=True, table_peel="staged")
    tm = _run(tds, ss, ins, ell, L0, fused=True, table_peel="taumap")
    return tx, tf, tm


class TestFusedTableParity:
    def test_sed_matches_unfused(self, trio):
        tx, tf, _ = trio
        fx = np.asarray(tx["instruments"][0]["Ftot"], np.float64)
        ff = np.asarray(tf["instruments"][0]["Ftot"], np.float64)
        np.testing.assert_allclose(ff, fx, rtol=0.05)

    def test_absorption_matches_unfused(self, trio):
        tx, tf, _ = trio
        lx = float(np.asarray(tx["labs"]).sum())
        lf = float(np.asarray(tf["labs"]).sum())
        assert lf == pytest.approx(lx, rel=0.05)

    def test_taumap_peel_close_to_staged(self, trio):
        """The density-path-map peel (2 gathers) vs the exact staged
        quadrature: same event stream, so the only difference is the
        cell-scale lateral approximation of the maps — measured ~5% on
        this 16^3-voxel tau_x=3 torus (why 'staged' is the default)."""
        _, tf, tm = trio
        ff = np.asarray(tf["instruments"][0]["Ftot"], np.float64)
        fm = np.asarray(tm["instruments"][0]["Ftot"], np.float64)
        np.testing.assert_allclose(fm, ff, rtol=0.10)

    def test_everything_finite(self, trio):
        for t in trio:
            for leaf in jax.tree.leaves(t):
                assert np.isfinite(np.asarray(leaf)).all()


class TestFusedTableRefill:
    def test_refill_normalization(self, trio):
        """K packets on N/K persistent lanes reproduces the plain run."""
        tx, _, _ = trio
        wg, ss, tds, ins, _, _ = _table_setup()
        n = N // 4
        ell = jnp.asarray(np.arange(n, dtype=np.int32) % 2)
        L0 = jnp.full((n,), 1e36 / N, jnp.float32)
        tr = _run(tds, ss, ins, ell, L0, fused=True, table_peel="staged",
                  refill_batches=4)
        fx = np.asarray(tx["instruments"][0]["Ftot"], np.float64)
        fr = np.asarray(tr["instruments"][0]["Ftot"], np.float64)
        np.testing.assert_allclose(fr, fx, rtol=0.06)
        lx = float(np.asarray(tx["labs"]).sum())
        lr = float(np.asarray(tr["labs"]).sum())
        assert lr == pytest.approx(lx, rel=0.06)
