"""Geometry tests: normalization, sampling statistics, closed-form checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skirt_tpu import rng
from skirt_tpu.constants import PC
from skirt_tpu.geometry import (
    PlummerGeometry, GammaGeometry, EinastoGeometry, GaussianGeometry,
    ShellGeometry, SersicGeometry, ExpDiskGeometry, RingGeometry,
    TorusGeometry, TTauriDiskGeometry, PointGeometry, BoxGeometry,
    UniformSphereGeometry, OffsetGeometryDecorator, RotateGeometryDecorator,
    SpheroidalGeometryDecorator, TriaxialGeometryDecorator,
    SphericalCavityDecorator, CombineGeometryDecorator,
    ClumpyGeometryDecorator, SpiralStructureDecorator,
)


def mc_total_mass(geom, rmax, n=200000, seed=7):
    """MC estimate of the density integral over a box of half-size rmax."""
    rs = np.random.default_rng(seed)
    pos = rs.uniform(-rmax, rmax, size=(n, 3))
    rho = np.asarray(geom.density(pos))
    return rho.mean() * (2 * rmax) ** 3


def sample_radii(geom, n=100000, seed=1):
    pos = geom.generate_position(rng.root_key(seed), n)
    return np.linalg.norm(np.asarray(pos), axis=1)


class TestSpherical:
    def test_plummer_mass_normalization(self):
        a = 1.0 * PC
        g = PlummerGeometry(a)
        assert mc_total_mass(g, 10 * a) == pytest.approx(1.0, rel=0.05)

    def test_plummer_sampling_median(self):
        # Plummer half-mass radius: r_h = a / sqrt(2^(2/3) - 1) ~ 1.30 a
        a = 2.0
        g = PlummerGeometry(a)
        r = sample_radii(g)
        rh = a / np.sqrt(2 ** (2.0 / 3.0) - 1.0)
        assert np.median(r) == pytest.approx(rh, rel=0.02)

    def test_gaussian_sampling_moments(self):
        s = 3.0
        g = GaussianGeometry(s)
        r = sample_radii(g)
        # E[r] for Maxwell distribution = 2 sigma sqrt(2/pi)
        assert r.mean() == pytest.approx(2 * s * np.sqrt(2 / np.pi), rel=0.02)

    def test_shell_bounds_and_mass(self):
        g = ShellGeometry(1.0, 4.0, 2.0)
        r = sample_radii(g)
        assert r.min() >= 0.999 and r.max() <= 4.001
        # p = 2: mass CDF uniform in r -> mean radius 2.5
        assert r.mean() == pytest.approx(2.5, rel=0.02)
        assert mc_total_mass(g, 4.0) == pytest.approx(1.0, rel=0.05)

    def test_gamma_einasto_sersic_normalized(self):
        # integrate each profile over its full tabulated support
        for g in [GammaGeometry(1.0, 1.0), EinastoGeometry(1.0, 2.0),
                  SersicGeometry(1.0, 4.0)]:
            r = np.logspace(-6, np.log10(g.max_radius), 400000)
            rho = np.asarray(g.radial_density(r))
            total = 4 * np.pi * np.trapezoid(rho * r * r, r)
            assert total == pytest.approx(1.0, rel=0.02), type(g).__name__


class TestAxial:
    def test_expdisk_normalization(self):
        g = ExpDiskGeometry(2.0, 0.5)
        # direct cylindrical quadrature of the jax density
        R = np.linspace(0.001, 30, 400)
        z = np.linspace(-8, 8, 401)
        RR, ZZ = np.meshgrid(R, z, indexing="ij")
        rho = np.asarray(g.density_rz(jnp.asarray(RR), jnp.asarray(ZZ)))
        total = 2 * np.pi * np.trapezoid(np.trapezoid(rho * RR, z, axis=1), R)
        assert total == pytest.approx(1.0, rel=0.01)

    def test_expdisk_sampling_moments(self):
        hR, hz = 2.0, 0.5
        g = ExpDiskGeometry(hR, hz)
        pos = np.asarray(g.generate_position(rng.root_key(3), 200000))
        R = np.hypot(pos[:, 0], pos[:, 1])
        # E[R] for p(R) ∝ R exp(-R/hR) is 2 hR; E[|z|] = hz
        assert R.mean() == pytest.approx(2 * hR, rel=0.02)
        assert np.abs(pos[:, 2]).mean() == pytest.approx(hz, rel=0.02)
        assert pos[:, 2].mean() == pytest.approx(0.0, abs=0.02)

    def test_expdisk_truncation(self):
        g = ExpDiskGeometry(2.0, 0.5, radial_trunc=5.0, axial_trunc=1.0,
                            inner_radius=1.0)
        pos = np.asarray(g.generate_position(rng.root_key(4), 50000))
        R = np.hypot(pos[:, 0], pos[:, 1])
        assert R.min() >= 0.999 and R.max() <= 5.001
        assert np.abs(pos[:, 2]).max() <= 1.001

    def test_ring_peak(self):
        g = RingGeometry(5.0, 0.5, 0.3)
        pos = np.asarray(g.generate_position(rng.root_key(5), 100000))
        R = np.hypot(pos[:, 0], pos[:, 1])
        assert R.mean() == pytest.approx(5.0, rel=0.02)

    def test_torus_bounds(self):
        g = TorusGeometry(1.0, 1.0, np.deg2rad(30), 1.0, 10.0)
        pos = np.asarray(g.generate_position(rng.root_key(6), 50000))
        r = np.linalg.norm(pos, axis=1)
        mu = np.abs(pos[:, 2]) / r
        assert r.min() >= 0.99 and r.max() <= 10.01
        assert mu.max() <= np.sin(np.deg2rad(30)) + 1e-5
        # density zero outside the wedge
        outside = np.array([[0.0, 0.0, 5.0]])
        assert float(g.density(outside)[0]) == 0.0

    def test_ttauri_bounds(self):
        g = TTauriDiskGeometry(0.1, 10.0, 1.0, 0.1)
        pos = np.asarray(g.generate_position(rng.root_key(7), 20000))
        R = np.hypot(pos[:, 0], pos[:, 1])
        assert R.min() >= 0.099 and R.max() <= 10.01


class TestGeneral:
    def test_point(self):
        g = PointGeometry()
        pos = np.asarray(g.generate_position(rng.root_key(0), 10))
        assert np.all(pos == 0)

    def test_box_uniform(self):
        g = BoxGeometry(-1, 1, -2, 2, -0.5, 0.5)
        pos = np.asarray(g.generate_position(rng.root_key(1), 100000))
        assert pos[:, 0].min() >= -1 and pos[:, 0].max() <= 1
        assert pos[:, 1].min() >= -2 and pos[:, 1].max() <= 2
        rho = float(g.density(np.zeros((1, 3)))[0])
        assert rho == pytest.approx(1.0 / 8.0)

    def test_uniform_sphere(self):
        g = UniformSphereGeometry(2.0)
        r = sample_radii(g, 100000)
        assert r.max() <= 2.0001
        # E[r] = 3/4 rmax
        assert r.mean() == pytest.approx(1.5, rel=0.01)


class TestDecorators:
    def test_offset(self):
        g = OffsetGeometryDecorator(GaussianGeometry(1.0), [5.0, 0.0, 0.0])
        pos = np.asarray(g.generate_position(rng.root_key(2), 50000))
        assert pos[:, 0].mean() == pytest.approx(5.0, abs=0.03)
        # density peak moved to (5,0,0)
        d0 = float(g.density(np.array([[5.0, 0.0, 0.0]]))[0])
        d1 = float(g.density(np.array([[0.0, 0.0, 0.0]]))[0])
        assert d0 > d1

    def test_rotate_consistency(self):
        base = ExpDiskGeometry(2.0, 0.2)
        g = RotateGeometryDecorator(base, 0.0, np.pi / 2, 0.0)  # disk into x-z? plane
        pos = np.asarray(g.generate_position(rng.root_key(3), 50000))
        # originally thin in z; after beta=90deg rotation about x, thin in y
        assert np.abs(pos[:, 1]).mean() < np.abs(pos[:, 2]).mean()
        # density transforms consistently with sampling
        p = np.array([[1.0, 0.1, 3.0]])
        rho_dec = float(g.density(p)[0])
        inv = g.R.T @ np.array([1.0, 0.1, 3.0])
        rho_base = float(base.density(inv[None, :])[0])
        assert rho_dec == pytest.approx(rho_base, rel=1e-4)

    def test_spheroidal_flattening(self):
        g = SpheroidalGeometryDecorator(PlummerGeometry(1.0), 0.5)
        pos = np.asarray(g.generate_position(rng.root_key(4), 100000))
        assert np.abs(pos[:, 2]).mean() == pytest.approx(
            0.5 * np.abs(pos[:, 0]).mean(), rel=0.05)
        # mass is preserved
        assert mc_total_mass(g, 8.0) == pytest.approx(1.0, rel=0.06)

    def test_triaxial_mass(self):
        g = TriaxialGeometryDecorator(PlummerGeometry(1.0), 0.7, 0.4)
        assert mc_total_mass(g, 8.0) == pytest.approx(1.0, rel=0.06)

    def test_spherical_cavity(self):
        g = SphericalCavityDecorator(GaussianGeometry(1.0), 0.5,
                                     mc_samples=1 << 16)
        r = sample_radii(g, 50000)
        assert r.min() >= 0.499
        assert float(g.density(np.zeros((1, 3)))[0]) == 0.0
        assert mc_total_mass(g, 6.0) == pytest.approx(1.0, rel=0.06)

    def test_combine(self):
        g = CombineGeometryDecorator(
            [GaussianGeometry(1.0), OffsetGeometryDecorator(GaussianGeometry(1.0), [10, 0, 0])],
            [1.0, 3.0])
        pos = np.asarray(g.generate_position(rng.root_key(5), 100000))
        frac_right = (pos[:, 0] > 5).mean()
        assert frac_right == pytest.approx(0.75, abs=0.01)

    def test_clumpy_mass_split(self):
        base = GaussianGeometry(1.0)
        g = ClumpyGeometryDecorator(base, 0.3, 64, 0.2, seed=11)
        assert mc_total_mass(g, 5.0, n=400000) == pytest.approx(1.0, rel=0.1)

    def test_spiral_density_modulation(self):
        base = ExpDiskGeometry(2.0, 0.2)
        g = SpiralStructureDecorator(base, arms=2, pitch=np.deg2rad(20),
                                     radius=1.0, perturb_weight=1.0, index=1)
        # azimuthal average of perturbation should be ~1 (mass preserved)
        R = np.full((1000,), 3.0)
        phi = np.linspace(0, 2 * np.pi, 1000)
        pert = np.asarray(g.perturbation(R, phi))
        assert pert.mean() == pytest.approx(1.0, rel=0.01)
        # sampled phi distribution follows perturbation
        pos = np.asarray(g.generate_position(rng.root_key(6), 200000))
        # compare density-weighted and sampled azimuthal histograms at fixed R ring
        sel = (np.hypot(pos[:, 0], pos[:, 1]) > 2.5) & (np.hypot(pos[:, 0], pos[:, 1]) < 3.5)
        phis = np.arctan2(pos[sel, 1], pos[sel, 0])
        assert sel.sum() > 5000
        # the histogram should be strongly non-uniform (w=1 full modulation)
        h, _ = np.histogram(phis, bins=36)
        assert h.max() > 2.5 * max(h.min(), 1)


class TestFoamAndFits:
    def test_foam_samples_arbitrary_density(self):
        # a density with two unequal blobs, no analytic sampler
        def rho(pos):
            pos = np.atleast_2d(pos)
            d1 = np.sum((pos - [0.5, 0, 0]) ** 2, axis=-1)
            d2 = np.sum((pos + [0.5, 0, 0]) ** 2, axis=-1)
            return 3 * np.exp(-d1 / 0.02) + np.exp(-d2 / 0.02)

        from skirt_tpu.geometry import FoamGeometry
        g = FoamGeometry(rho, (-1, -1, -1, 1, 1, 1), max_level=6,
                         cells_target=3000)
        s = np.asarray(g.generate_position(rng.root_key(8), 50000))
        right = (s[:, 0] > 0).mean()
        assert right == pytest.approx(0.75, abs=0.02)
        # density normalization
        assert mc_total_mass(g, 1.0, n=400000) == pytest.approx(1.0, rel=0.05)

    def test_read_fits_geometry(self, tmp_path):
        from skirt_tpu.io.fits import write_fits
        from skirt_tpu.geometry import ReadFitsGeometry
        img = np.zeros((16, 16))
        img[4, 12] = 3.0   # bright spot at i=12 (x>0), j=4 (y<0)
        img[8, 8] = 1.0
        path = str(tmp_path / "gal.fits")
        write_fits(path, img)
        g = ReadFitsGeometry(path, pixel_scale=0.1, axial_scale=0.05)
        s = np.asarray(g.generate_position(rng.root_key(9), 20000))
        bright = (s[:, 0] > 0.2) & (s[:, 1] < -0.2)
        assert bright.mean() == pytest.approx(0.75, abs=0.02)
        # z profile is exponential with scale 0.05
        assert np.abs(s[:, 2]).mean() == pytest.approx(0.05, rel=0.05)
        # density consistent with sampling (integrates to 1)
        assert mc_total_mass(g, 0.9, n=500000, seed=12) == pytest.approx(
            1.0, rel=0.1)


class TestAnisotropic:
    def test_netzer_direction_distribution(self):
        from skirt_tpu.geometry import NetzerAccretionDiskGeometry
        g = NetzerAccretionDiskGeometry()
        pos = jnp.zeros((100000, 3))
        d = np.asarray(g.generate_direction(rng.root_key(10), None, pos))
        ct = d[:, 2]
        # the Netzer profile is symmetric and peaks along the poles
        assert abs(ct.mean()) < 0.01
        frac_polar = (np.abs(ct) > 0.8).mean()
        frac_equator = (np.abs(ct) < 0.2).mean()
        assert frac_polar > 2.0 * frac_equator
        # probability normalizes: <p> over isotropic directions = 1
        iso = np.asarray(rng.isotropic_direction(rng.root_key(11), (200000,)))
        p = np.asarray(g.direction_probability(None, jnp.asarray(iso) * 0,
                                               jnp.asarray(iso)))
        assert p.mean() == pytest.approx(1.0, rel=0.02)

    def test_sphe_background_inward(self):
        from skirt_tpu.geometry import SpheBackgroundGeometry
        g = SpheBackgroundGeometry(5.0)
        pos = g.generate_position(rng.root_key(12), 20000)
        r = np.linalg.norm(np.asarray(pos), axis=1)
        np.testing.assert_allclose(r, 5.0, rtol=1e-5)
        d = np.asarray(g.generate_direction(rng.root_key(13), None, pos))
        inward = np.sum(np.asarray(pos) * d, axis=1)
        assert np.all(inward < 0)  # all directions point inward
        # probability normalizes over isotropic directions
        iso = rng.isotropic_direction(rng.root_key(14), (200000,))
        p = np.asarray(g.direction_probability(
            None, jnp.broadcast_to(jnp.asarray([5.0, 0, 0]), (200000, 3)), iso))
        assert p.mean() == pytest.approx(1.0, rel=0.02)


class TestTrustBenchmarks:
    def test_all_normalized_and_sampling_matches(self):
        from skirt_tpu.geometry import (Trust1Geometry, Trust2Geometry,
                                        Trust6Geometry, Trust7aGeometry,
                                        Trust7bGeometry)
        from skirt_tpu.constants import AU, PC
        cases = [
            (Trust1Geometry(), 5.1 * PC),
            (Trust2Geometry(), 31 * AU),
            (Trust7aGeometry(), 5.1 * PC),
            (Trust7bGeometry(), 5.1 * PC),
        ]
        for g, half in cases:
            name = type(g).__name__
            total = mc_total_mass(g, half, n=400000, seed=21)
            assert total == pytest.approx(1.0, rel=0.08), (name, total)
            # samples land where the density is positive
            s = np.asarray(g.generate_position(rng.root_key(23), 5000))
            rho = np.asarray(g.density(s.astype(np.float64)))
            assert (rho > 0).mean() > 0.99, name

    def test_trust6_quadrature_normalized(self):
        # the 1.5-AU-thin Gaussian slab defeats uniform box MC; check by
        # direct (R, z) quadrature with z refinement around the slabs
        from skirt_tpu.geometry import Trust6Geometry
        from skirt_tpu.constants import AU
        g = Trust6Geometry()
        R = np.linspace(0, 400 * AU, 801)
        z = np.unique(np.concatenate([
            np.linspace(-240 * AU, 240 * AU, 2001),
            np.linspace(-80 * AU, -70 * AU, 4001),
        ]))
        RR, ZZ = np.meshgrid(R, z, indexing="ij")
        pts = np.stack([RR.ravel(), np.zeros(RR.size), ZZ.ravel()], axis=-1)
        rho = np.asarray(g.density(pts)).reshape(RR.shape)
        total = 2 * np.pi * np.trapezoid(np.trapezoid(rho * RR, z, axis=1), R)
        assert total == pytest.approx(1.0, rel=0.01)
        s = np.asarray(g.generate_position(rng.root_key(24), 5000))
        rho_s = np.asarray(g.density(s.astype(np.float64)))
        assert (rho_s > 0).mean() > 0.99


class TestSurfaceAndMGE:
    def test_mge_density_and_sampling(self):
        from skirt_tpu.geometry import MGEGeometry
        comps = [(3.0, 2.0, 0.9), (1.0, 5.0, 0.7)]
        g = MGEGeometry(comps, pixelscale=1.0, inclination=np.pi / 2)
        # edge-on: intrinsic q equals apparent q
        assert np.allclose(g.qv, [0.9, 0.7])
        assert mc_total_mass(g, 20.0, n=400000) == pytest.approx(1.0, rel=0.08)
        pos = np.asarray(g.generate_position(rng.root_key(3), 200000))
        # var(x) = sum_j M_j sigma_j^2 ; var(z) = sum_j M_j (q_j sigma_j)^2
        Mv, sv, qv = g.Mv, g.sigmav, g.qv
        assert pos[:, 0].var() == pytest.approx(np.sum(Mv * sv**2), rel=0.03)
        assert pos[:, 2].var() == pytest.approx(np.sum(Mv * (qv * sv)**2), rel=0.03)
        # closed-form surface densities vs quadrature along the axes
        zv = np.linspace(-60, 60, 20001)
        line = np.stack([np.zeros_like(zv), np.zeros_like(zv), zv], axis=-1)
        assert g.sigma_z() == pytest.approx(
            np.trapezoid(g.density(line), zv), rel=1e-3)

    def test_mge_deprojection_error(self):
        from skirt_tpu.geometry import MGEGeometry
        with pytest.raises(ValueError):
            MGEGeometry([(1.0, 1.0, 0.5)], 1.0, np.deg2rad(10.0))

    def test_stellar_surface(self):
        from skirt_tpu.geometry import StellarSurfaceGeometry
        g = StellarSurfaceGeometry(2.0)
        pos = np.asarray(g.generate_position(rng.root_key(1), 50000))
        assert np.allclose(np.linalg.norm(pos, axis=1), 2.0, atol=1e-3)
        k = np.asarray(g.generate_direction(rng.root_key(2), 0,
                                            jnp.asarray(pos)))
        ct = np.sum(pos / 2.0 * k, axis=1)
        # cosine-law: pdf(c)=2c on [0,1] => mean 2/3, all outward
        assert ct.min() > 0
        assert ct.mean() == pytest.approx(2.0 / 3.0, rel=0.01)
        p = np.asarray(g.direction_probability(0, jnp.asarray(pos),
                                               jnp.asarray(k)))
        assert np.allclose(p, 4.0 * ct, atol=1e-4)
        assert g.sigma_x() == pytest.approx(1.0 / (2 * np.pi * 4.0))

    def test_solar_patch(self):
        from skirt_tpu.geometry import SolarPatchGeometry
        g = SolarPatchGeometry(3.0)
        pos = np.asarray(g.generate_position(rng.root_key(1), 50000))
        R = np.hypot(pos[:, 0], pos[:, 1])
        assert np.all(pos[:, 2] == 0)
        assert R.max() <= 3.0
        # uniform over the disc: E[R] = 2/3 Rmax
        assert R.mean() == pytest.approx(2.0, rel=0.01)
        k = np.asarray(g.generate_direction(rng.root_key(2), 0,
                                            jnp.asarray(pos)))
        assert k[:, 2].min() > 0
        assert k[:, 2].mean() == pytest.approx(2.0 / 3.0, rel=0.01)
        assert g.sigma_z() == pytest.approx(1.0 / (np.pi * 9.0))
