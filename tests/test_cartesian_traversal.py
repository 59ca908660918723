"""Cartesian grid traversal tests against closed-form ray geometry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt_tpu.grids import CartesianGrid
from skirt_tpu.engine import traversal


def make_grid(n=8, half=1.0):
    b = np.linspace(-half, half, n + 1)
    return CartesianGrid(b, b, b)


def random_rays(n, seed=0, half=1.0):
    rs = np.random.default_rng(seed)
    pos = rs.uniform(-0.9 * half, 0.9 * half, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(pos), jnp.asarray(d.astype(np.float32))


def box_exit_distance(pos, d, half=1.0):
    """Analytic distance to the box boundary."""
    pos, d = np.asarray(pos), np.asarray(d)
    with np.errstate(divide="ignore"):
        t1 = (-half - pos) / d
        t2 = (half - pos) / d
    tfar = np.min(np.maximum(t1, t2), axis=1)
    return tfar


class TestLocate:
    def test_locate_center_and_outside(self):
        g = make_grid(4)
        cells = np.asarray(g.locate(jnp.asarray([
            [0.01, 0.01, 0.01],   # cell (2,2,2)
            [-0.99, -0.99, -0.99],  # cell (0,0,0)
            [1.5, 0.0, 0.0],      # outside
        ], jnp.float32)))
        assert cells[0] == (2 * 4 + 2) * 4 + 2
        assert cells[1] == 0
        assert cells[2] == -1

    def test_volumes(self):
        g = make_grid(4, half=2.0)
        v = g.cell_volumes()
        assert v.size == 64
        np.testing.assert_allclose(v, 1.0)


class TestTraversal:
    def test_chord_length_equals_sum_ds(self):
        g = make_grid(8)
        pos, d = random_rays(500)

        def seg(carry, cell, ds, t):
            return carry + ds, jnp.ones_like(carry, dtype=bool)

        total, _ = traversal.sweep(g, pos, d, seg, jnp.zeros(pos.shape[0]))
        expected = box_exit_distance(pos, d)
        np.testing.assert_allclose(np.asarray(total), expected, rtol=2e-4, atol=1e-5)

    def test_cells_visited_once(self):
        g = make_grid(8)
        pos, d = random_rays(200, seed=1)
        counts0 = jnp.zeros((g.ncells,))

        def seg(carry, cell, ds, t):
            upd = jnp.where(cell >= 0, 1.0, 0.0)
            return carry.at[cell].add(upd, mode="drop"), jnp.ones(pos.shape[0], bool)

        counts, _ = traversal.sweep(g, pos, d, seg, counts0)
        # each ray crosses at most nx+ny+nz-2 cells; total visits bounded
        assert float(counts.sum()) <= 200 * (8 * 3)
        assert float(counts.sum()) >= 200 * 3  # several cells per ray on average

    def test_optical_depth_uniform_medium(self):
        g = make_grid(8)
        pos, d = random_rays(300, seed=2)
        kr = 2.5  # 1/m
        kapparho = lambda cell: jnp.where(cell >= 0, kr, 0.0)
        tau = traversal.optical_depth(g, kapparho, pos, d)
        expected = kr * box_exit_distance(pos, d)
        np.testing.assert_allclose(np.asarray(tau), expected, rtol=2e-4, atol=1e-5)

    def test_optical_depth_nonuniform(self):
        # density 1 for x<0, 3 for x>=0; ray along +x through the middle
        g = make_grid(8)
        rho = np.where(g.cell_centers()[:, 0] < 0, 1.0, 3.0).astype(np.float32)
        rho_dev = jnp.asarray(rho)
        kapparho = lambda cell: jnp.where(cell >= 0, rho_dev[jnp.clip(cell, 0)], 0.0)
        pos = jnp.asarray([[-0.95, 0.01, 0.01]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        tau = traversal.optical_depth(g, kapparho, pos, d)
        assert float(tau[0]) == pytest.approx(0.95 * 1.0 + 1.0 * 3.0, rel=1e-4)

    def test_enter_from_outside(self):
        g = make_grid(8)
        pos = jnp.asarray([[-5.0, 0.01, 0.01], [-5.0, 3.0, 0.0]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
        s0, state = g.enter(pos, d)
        assert float(s0[0]) == pytest.approx(4.0, rel=1e-5)
        assert int(g.cell_of(state)[0]) >= 0
        # second ray misses the box
        assert int(g.cell_of(state)[1]) == -1

    def test_propagate_to_tau(self):
        g = make_grid(8)
        kr = 2.0
        kapparho = lambda cell: jnp.where(cell >= 0, kr, 0.0)
        pos = jnp.asarray([[-0.95, 0.01, 0.01]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        s, cell = traversal.propagate_to_tau(g, kapparho, pos, d,
                                             jnp.asarray([1.0], jnp.float32))
        assert float(s[0]) == pytest.approx(0.5, rel=1e-4)
        assert int(cell[0]) >= 0

    def test_propagate_matches_optical_depth(self):
        g = make_grid(8)
        rho = np.abs(g.cell_centers()[:, 0] + 1.2).astype(np.float32)
        rho_dev = jnp.asarray(rho)
        kapparho = lambda cell: jnp.where(cell >= 0, rho_dev[jnp.clip(cell, 0)], 0.0)
        pos, d = random_rays(100, seed=3)
        taupath = traversal.optical_depth(g, kapparho, pos, d)
        target = 0.5 * taupath
        s, cell = traversal.propagate_to_tau(g, kapparho, pos, d, target)
        # integrate tau to distance s by a fine manual quadrature
        for i in range(0, 100, 17):
            svals = np.linspace(0, float(s[i]), 4000)
            pts = np.asarray(pos)[i] + svals[:, None] * np.asarray(d)[i]
            cells = np.asarray(g.locate(jnp.asarray(pts, jnp.float32)))
            kr = np.where(cells >= 0, rho[np.clip(cells, 0, None)], 0.0)
            tau_num = np.trapezoid(kr, svals)
            assert tau_num == pytest.approx(float(target[i]), rel=2e-3, abs=1e-4)


class TestTwoPhaseGrid:
    """ref: SKIRTcore/TwoPhaseDustGrid.cpp — random clumpy-medium weights."""

    def test_weights_normalized_and_two_valued(self):
        from skirt_tpu.grids import TwoPhaseGrid
        b = np.linspace(-1, 1, 17)
        ff, C = 0.3, 25.0
        g = TwoPhaseGrid(b, b, b, filling_factor=ff, contrast=C, seed=1)
        norm = C * ff + 1.0 - ff
        vals = np.unique(g.cell_weights)
        np.testing.assert_allclose(sorted(vals), [1.0 / norm, C / norm])
        # expectation of the weight is exactly 1 -> mean close to 1
        assert g.cell_weights.mean() == pytest.approx(1.0, abs=0.05)

    def test_dust_system_applies_weights(self):
        from skirt_tpu.grids import TwoPhaseGrid
        from skirt_tpu.media import (DustComponent, DustMassNormalization,
                                     DustSystem)
        from skirt_tpu.media.mix import DustMix
        from skirt_tpu.geometry import BoxGeometry
        from skirt_tpu.wavelengths import OligoWavelengthGrid

        wg = OligoWavelengthGrid([0.55e-6])
        mix = DustMix(wg, np.array([100.0]), np.array([0.0]), np.array([0.0]))
        b = np.linspace(-1, 1, 9)
        g = TwoPhaseGrid(b, b, b, filling_factor=0.2, contrast=10.0, seed=2)
        comp = DustComponent(BoxGeometry(-1, 1, -1, 1, -1, 1), mix,
                             DustMassNormalization(5.0))
        ds = DustSystem(g, [comp], samples_per_cell=1)
        plain = DustSystem(CartesianGrid(b, b, b), [comp], samples_per_cell=1)
        ratio = ds.rho64[0] / plain.rho64[0]
        np.testing.assert_allclose(ratio, g.cell_weights, rtol=1e-12)
        # the volume-averaged weight is ~1, so total mass is preserved
        assert ds.gridded_mass() == pytest.approx(plain.gridded_mass(),
                                                  rel=0.1)

    def test_validation(self):
        from skirt_tpu.grids import TwoPhaseGrid
        b = np.linspace(-1, 1, 5)
        with pytest.raises(ValueError):
            TwoPhaseGrid(b, b, b, filling_factor=1.5, contrast=2.0)
        with pytest.raises(ValueError):
            TwoPhaseGrid(b, b, b, filling_factor=0.5, contrast=-1.0)


class TestCrossingsWithX:
    """crossings() == crossings_with_x(full x borders) by construction;
    a slab's x-border subset clips the span to the slab."""

    def test_full_equals_default(self):
        import jax.numpy as jnp
        b = np.linspace(-1, 1, 9)
        g = CartesianGrid(b, b, np.linspace(-1, 1, 5))
        rs = np.random.default_rng(3)
        pos = jnp.asarray(rs.uniform(-0.9, 0.9, (32, 3)), jnp.float32)
        d = rs.normal(size=(32, 3))
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True),
                        jnp.float32)
        t1 = g.crossings(pos, d)
        t2 = g.crossings_with_x(jnp.asarray(g.xb), pos, d)
        for a, bb in zip(t1, t2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))

    def test_slab_subset_clips_span(self):
        import jax.numpy as jnp
        b = np.linspace(-1, 1, 9)
        g = CartesianGrid(b, b, b)
        # slab = x in [0, 0.5] (borders 4..6)
        xb_l = jnp.asarray(g.xb[4:7])
        pos = jnp.asarray([[-2.0, 0.1, 0.1]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        _, t_start, t_stop = g.crossings_with_x(xb_l, pos, d)
        assert float(t_start[0]) == pytest.approx(2.0, rel=1e-5)
        assert float(t_stop[0]) == pytest.approx(2.5, rel=1e-5)
