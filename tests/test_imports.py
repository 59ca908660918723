"""SPH and AMR import tests."""

import numpy as np
import pytest

from skirt_tpu import rng
from skirt_tpu.imports import (AdaptiveMeshGeometry, SPHParticleGeometry,
                               load_amr_ascii)


class TestSPH:
    def test_density_normalized_and_sampling_consistent(self):
        rs = np.random.default_rng(3)
        npart = 200
        pos = rs.normal(scale=1.0, size=(npart, 3))
        h = np.full(npart, 0.4)
        m = rs.uniform(0.5, 2.0, size=npart)
        g = SPHParticleGeometry(pos, h, m)

        # MC integral of the density ~ 1
        pts = rs.uniform(-4, 4, size=(150000, 3))
        rho = g.density(pts)
        total = rho.mean() * 8.0 ** 3
        assert total == pytest.approx(1.0, rel=0.05)

        # sampled positions reproduce the mass-weighted particle centroid
        sample = np.asarray(g.generate_position(rng.root_key(1), 20000))
        centroid = (pos * m[:, None]).sum(axis=0) / m.sum()
        np.testing.assert_allclose(sample.mean(axis=0), centroid, atol=0.05)

    def test_density_peaks_at_particles(self):
        g = SPHParticleGeometry(np.array([[0.0, 0.0, 0.0]]), np.array([1.0]),
                                np.array([2.0]))
        rho0 = g.density(np.array([[0.0, 0.0, 0.0]]))[0]
        rho1 = g.density(np.array([[0.9, 0.0, 0.0]]))[0]
        rho2 = g.density(np.array([[1.5, 0.0, 0.0]]))[0]
        assert rho0 > rho1 > 0
        assert rho2 == 0.0


AMR_FILE = """# test AMR mesh
! 2 2 1
1.0
2.0
3.0
! 2 1 1
8.0
8.0
"""


class TestAMR:
    def test_parse_and_geometry(self, tmp_path):
        p = tmp_path / "mesh.amr"
        p.write_text(AMR_FILE)
        extent = (0.0, 0.0, 0.0, 2.0, 2.0, 1.0)
        lo, hi, vals = load_amr_ascii(str(p), extent)
        # 3 leaves at level 1 plus 2 leaves inside the subdivided cell
        assert lo.shape[0] == 5
        np.testing.assert_allclose(sorted(vals), [1.0, 2.0, 3.0, 8.0, 8.0])

        g = AdaptiveMeshGeometry(lo, hi, vals)
        # density integrates to 1
        total = float((g.rho * g.volumes).sum())
        assert total == pytest.approx(1.0)
        # density lookup inside the refined cell (top-right quadrant x in
        # [1,2], y in [1,2]) returns the refined value
        rho_fine = g.density(np.array([[1.25, 1.5, 0.5]]))[0]
        rho_coarse = g.density(np.array([[0.5, 0.5, 0.5]]))[0]
        assert rho_fine > rho_coarse
        assert g.density(np.array([[5.0, 0.0, 0.0]]))[0] == 0.0

        # sampling concentrates in high-density leaves
        s = np.asarray(g.generate_position(rng.root_key(2), 20000))
        frac_fine = ((s[:, 0] > 1) & (s[:, 1] > 1)).mean()
        # leaf masses: 1,2,3 (volume 1) and 8*0.5 twice -> 8 of 14 total
        mass_fine = 8.0 / 14.0
        assert frac_fine == pytest.approx(mass_fine, abs=0.02)
