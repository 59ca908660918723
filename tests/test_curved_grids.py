"""Cylinder2D and Sphere1D grid traversal tests + cross-grid validation."""

import numpy as np
import jax.numpy as jnp
import pytest

from skirt_tpu import rng
from skirt_tpu.engine import traversal
from skirt_tpu.grids import CartesianGrid, Cylinder2DGrid, Sphere1DGrid


def random_rays(n, rmax, seed=0, inside=True):
    rs = np.random.default_rng(seed)
    if inside:
        pos = rs.uniform(-0.4 * rmax, 0.4 * rmax, size=(n, 3))
    else:
        pos = rs.uniform(-3 * rmax, 3 * rmax, size=(n, 3))
        pos[:, 0] += np.sign(pos[:, 0]) * 2 * rmax
    d = rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(pos, jnp.float32), jnp.asarray(d, jnp.float32)


def chord_sum(grid, pos, d):
    def seg(carry, cell, ds, t):
        return carry + ds, jnp.ones_like(carry, dtype=bool)
    total, _ = traversal.sweep(grid, pos, d, seg, jnp.zeros(pos.shape[0]))
    return np.asarray(total)


class TestSphere1D:
    def test_chord_through_sphere(self):
        R = 2.0
        g = Sphere1DGrid(np.linspace(0, R, 9))
        pos, d = random_rays(400, R, seed=1)
        total = chord_sum(g, pos, d)
        # analytic chord: from inside point to sphere surface
        p, dd = np.asarray(pos, np.float64), np.asarray(d, np.float64)
        b = 2 * np.sum(p * dd, axis=1)
        c = np.sum(p * p, axis=1) - R * R
        expected = (-b + np.sqrt(b * b - 4 * c)) / 2
        np.testing.assert_allclose(total, expected, rtol=1e-3, atol=1e-4)

    def test_radial_ray_crosses_all_shells(self):
        R = 1.0
        n = 10
        g = Sphere1DGrid(np.linspace(0, R, n + 1))
        rho = jnp.asarray(np.arange(1, n + 1, dtype=np.float32))
        kapparho = lambda cell: jnp.where(cell >= 0, rho[jnp.clip(cell, 0)], 0.0)
        pos = jnp.asarray([[0.001, 0.0, 0.0]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        tau = traversal.optical_depth(g, kapparho, pos, d)
        expected = np.sum(np.arange(1, n + 1) * 0.1) - 0.001 * 1
        assert float(tau[0]) == pytest.approx(expected, rel=1e-3)

    def test_enter_from_outside(self):
        R = 1.0
        g = Sphere1DGrid(np.linspace(0, R, 5))
        pos = jnp.asarray([[-10.0, 0.0, 0.0], [-10.0, 5.0, 0.0]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
        s0, state = g.enter(pos, d)
        assert float(s0[0]) == pytest.approx(9.0, rel=1e-4)
        assert int(g.cell_of(state)[0]) == 3  # outermost shell
        assert int(g.cell_of(state)[1]) == -1  # misses

    def test_propagate_to_tau(self):
        R = 1.0
        g = Sphere1DGrid(np.linspace(0, R, 9))
        kapparho = lambda cell: jnp.where(cell >= 0, 3.0, 0.0)
        pos = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        s, cell = traversal.propagate_to_tau(g, kapparho, pos, d,
                                             jnp.asarray([1.5], jnp.float32))
        assert float(s[0]) == pytest.approx(0.5, rel=1e-3)


class TestCylinder2D:
    def test_chord_through_cylinder(self):
        R, zmax = 2.0, 1.0
        g = Cylinder2DGrid(np.linspace(0, R, 9), np.linspace(-zmax, zmax, 9))
        pos, d = random_rays(400, 0.8, seed=2)
        pos = pos.at[:, 2].multiply(0.5)
        total = chord_sum(g, pos, d)
        # analytic: min(t to outer cylinder, t to z planes)
        p, dd = np.asarray(pos, np.float64), np.asarray(d, np.float64)
        a = dd[:, 0] ** 2 + dd[:, 1] ** 2
        b = 2 * (p[:, 0] * dd[:, 0] + p[:, 1] * dd[:, 1])
        c = p[:, 0] ** 2 + p[:, 1] ** 2 - R * R
        with np.errstate(divide="ignore", invalid="ignore"):
            t_cyl = np.where(a > 1e-12, (-b + np.sqrt(b * b - 4 * a * c)) / (2 * a),
                             np.inf)
            t_z = np.where(np.abs(dd[:, 2]) > 1e-12,
                           (np.sign(dd[:, 2]) * zmax - p[:, 2]) / dd[:, 2], np.inf)
        expected = np.minimum(t_cyl, t_z)
        np.testing.assert_allclose(total, expected, rtol=2e-3, atol=1e-4)

    def test_vertical_ray(self):
        g = Cylinder2DGrid(np.linspace(0, 1, 5), np.linspace(-1, 1, 11))
        kapparho = lambda cell: jnp.where(cell >= 0, 2.0, 0.0)
        pos = jnp.asarray([[0.3, 0.2, -0.95]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        tau = traversal.optical_depth(g, kapparho, pos, d)
        assert float(tau[0]) == pytest.approx(2.0 * 1.95, rel=1e-3)

    def test_ray_through_axis(self):
        # ray passing through the axis must cross inner shells symmetrically
        g = Cylinder2DGrid(np.linspace(0, 1, 5), np.linspace(-1, 1, 3))
        rho = jnp.asarray([4.0, 3.0, 2.0, 1.0] * 2, jnp.float32)  # (nr*nz)
        rho = jnp.asarray(np.repeat([4.0, 3.0, 2.0, 1.0], 2).astype(np.float32))
        kapparho = lambda cell: jnp.where(cell >= 0, rho[jnp.clip(cell, 0)], 0.0)
        pos = jnp.asarray([[-0.999, 0.0, 0.1]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        tau = traversal.optical_depth(g, kapparho, pos, d)
        # crossing: [1,0.75]x2, [0.75,0.5]x2... tau = 2*(1*0.25+2*0.25+3*0.25+4*0.25)
        expected = 2 * 0.25 * (1 + 2 + 3 + 4) - 0.001 * 1.0
        assert float(tau[0]) == pytest.approx(expected, rel=2e-3)

    def test_matches_cartesian_optical_depth(self):
        # same uniform medium on both grid types -> same tau for any ray
        R = 1.0
        cyl = Cylinder2DGrid(np.linspace(0, R, 17), np.linspace(-R, R, 17))
        pos, d = random_rays(200, 0.5, seed=3)
        kr = 1.7
        kapparho = lambda cell: jnp.where(cell >= 0, jnp.float32(kr), 0.0)
        tau_cyl = np.asarray(traversal.optical_depth(cyl, kapparho, pos, d))
        # analytic cylinder chord
        p, dd = np.asarray(pos, np.float64), np.asarray(d, np.float64)
        a = dd[:, 0] ** 2 + dd[:, 1] ** 2
        b = 2 * (p[:, 0] * dd[:, 0] + p[:, 1] * dd[:, 1])
        c = p[:, 0] ** 2 + p[:, 1] ** 2 - R * R
        with np.errstate(divide="ignore", invalid="ignore"):
            t_cyl = np.where(a > 1e-12, (-b + np.sqrt(b * b - 4 * a * c)) / (2 * a),
                             np.inf)
            t_z = np.where(np.abs(dd[:, 2]) > 1e-12,
                           (np.sign(dd[:, 2]) * R - p[:, 2]) / dd[:, 2], np.inf)
        expected = kr * np.minimum(t_cyl, t_z)
        np.testing.assert_allclose(tau_cyl, expected, rtol=3e-3, atol=1e-3)


class TestSphere2D:
    def test_chord_and_volumes(self):
        from skirt_tpu.grids import Sphere2DGrid
        R = 2.0
        g = Sphere2DGrid(np.linspace(0, R, 7), ntheta=6)
        np.testing.assert_allclose(g.cell_volumes().sum(),
                                   4 / 3 * np.pi * R ** 3, rtol=1e-12)
        pos, d = random_rays(300, 0.8, seed=7)
        total = chord_sum(g, pos, d)
        p, dd = np.asarray(pos, np.float64), np.asarray(d, np.float64)
        b = 2 * np.sum(p * dd, axis=1)
        c = np.sum(p * p, axis=1) - R * R
        expected = (-b + np.sqrt(b * b - 4 * c)) / 2
        np.testing.assert_allclose(total, expected, rtol=5e-3, atol=5e-3)

    def test_optical_depth_theta_structure(self):
        # two polar caps with dust, equatorial belt empty
        from skirt_tpu.grids import Sphere2DGrid
        g = Sphere2DGrid(np.linspace(0, 1, 3), thetaborders=np.array(
            [0.0, np.pi / 3, 2 * np.pi / 3, np.pi]))
        # cells: (ir, it): it=0 top cap, it=1 belt, it=2 bottom cap
        rho = np.zeros(g.ncells, np.float32)
        for ir in range(g.nr):
            rho[ir * g.nt + 0] = 2.0
            rho[ir * g.nt + 2] = 2.0
        rho_dev = jnp.asarray(rho)
        kr = lambda cell: jnp.where(cell >= 0, rho_dev[jnp.clip(cell, 0)], 0.0)
        # vertical near-axis ray: the theta borders are cones through the
        # origin, so the empty belt pinches to ~nothing near the axis and
        # the ray is inside cap material almost the whole way
        pos = jnp.asarray([[0.01, 0.0, -0.99]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
        tau = traversal.optical_depth(g, kr, pos, d)
        expected = 2.0 * (0.99 + 1.0)  # minus the tiny belt pinch
        assert float(tau[0]) == pytest.approx(expected, rel=0.01)
        # a z=0 ray (offset in y to avoid the origin) stays in the belt
        pos2 = jnp.asarray([[-0.9, 0.3, 0.0]], jnp.float32)
        d2 = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        tau2 = traversal.optical_depth(g, kr, pos2, d2)
        assert float(tau2[0]) == pytest.approx(0.0, abs=1e-3)

    def test_locate(self):
        from skirt_tpu.grids import Sphere2DGrid
        g = Sphere2DGrid(np.linspace(0, 1, 3), ntheta=4)
        # point near +z pole, r ~ 0.75 -> ir=1, it=0
        cell = int(g.locate(jnp.asarray([[0.05, 0.0, 0.75]], jnp.float32))[0])
        assert cell == 1 * g.nt + 0
        # point near -z pole
        cell2 = int(g.locate(jnp.asarray([[0.05, 0.0, -0.75]], jnp.float32))[0])
        assert cell2 == 1 * g.nt + (g.nt - 1)
