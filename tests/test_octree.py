"""Octree grid construction and traversal tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from skirt_tpu.engine import traversal
from skirt_tpu.grids import CartesianGrid
from skirt_tpu.grids.octree import OctreeGrid


EXTENT = (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0)


def random_rays(n, seed=0):
    rs = np.random.default_rng(seed)
    pos = rs.uniform(-0.9, 0.9, size=(n, 3)).astype(np.float32)
    d = rs.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(pos), jnp.asarray(d.astype(np.float32))


class TestConstruction:
    def test_uniform_min_level(self):
        g = OctreeGrid(EXTENT, None, min_level=2, max_level=2)
        assert g.ncells == 64  # 4x4x4 leaves
        np.testing.assert_allclose(g.cell_volumes(), (0.5) ** 3)
        assert g.max_depth == 2

    def test_refinement_follows_density(self):
        # a compact Gaussian blob at (0.5, 0.5, 0.5) should drive deep
        # refinement only near the blob
        def rho(pos):
            r2 = np.sum((pos - np.array([0.5, 0.5, 0.5])) ** 2, axis=-1)
            return np.exp(-r2 / (2 * 0.05 ** 2))

        g = OctreeGrid(EXTENT, rho, min_level=2, max_level=6,
                       max_mass_fraction=1e-3, samples_per_node=64)
        assert g.max_depth == 6
        vols = g.cell_volumes()
        centers = g.cell_centers()
        near = np.linalg.norm(centers - [0.5, 0.5, 0.5], axis=1) < 0.2
        assert vols[near].min() < vols[~near].min()
        # the deepest cells concentrate at the blob
        deepest = vols <= vols.min() * 1.01
        assert near[deepest].mean() > 0.8


class TestTraversal:
    def test_chord_sums(self):
        g = OctreeGrid(EXTENT, None, min_level=3, max_level=3)
        pos, d = random_rays(300)

        def seg(carry, cell, ds, t):
            return carry + ds, jnp.ones_like(carry, dtype=bool)

        total, _ = traversal.sweep(g, pos, d, seg, jnp.zeros(pos.shape[0]))
        p, dd = np.asarray(pos, np.float64), np.asarray(d, np.float64)
        with np.errstate(divide="ignore"):
            t2 = np.where(np.abs(dd) > 1e-12, (np.sign(dd) - p) / dd, np.inf)
        expected = np.min(t2, axis=1)
        np.testing.assert_allclose(np.asarray(total), expected, rtol=3e-3,
                                   atol=2e-3)

    def test_optical_depth_matches_cartesian(self):
        # same density field on an octree (uniform depth 3 = 8^3) and a
        # Cartesian 8^3 grid must give identical optical depths
        n = 8
        b = np.linspace(-1, 1, n + 1)
        cart = CartesianGrid(b, b, b)
        octg = OctreeGrid(EXTENT, None, min_level=3, max_level=3)
        assert octg.ncells == cart.ncells

        # density varying by cell: rho = f(center)
        def rho_at(centers):
            return (1.0 + np.abs(centers[:, 0]) + 2 * np.abs(centers[:, 1])
                    + 0.5 * centers[:, 2] ** 2)

        rho_cart = jnp.asarray(rho_at(cart.cell_centers()).astype(np.float32))
        rho_oct = jnp.asarray(rho_at(octg.cell_centers()).astype(np.float32))

        pos, d = random_rays(300, seed=2)
        kr_c = lambda cell: jnp.where(cell >= 0, rho_cart[jnp.clip(cell, 0)], 0.0)
        kr_o = lambda cell: jnp.where(cell >= 0, rho_oct[jnp.clip(cell, 0)], 0.0)
        tau_c = np.asarray(traversal.optical_depth(cart, kr_c, pos, d))
        tau_o = np.asarray(traversal.optical_depth(octg, kr_o, pos, d))
        np.testing.assert_allclose(tau_o, tau_c, rtol=5e-3, atol=2e-3)

    def test_enter_from_outside(self):
        g = OctreeGrid(EXTENT, None, min_level=2, max_level=2)
        pos = jnp.asarray([[-5.0, 0.1, 0.1]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        s0, state = g.enter(pos, d)
        assert float(s0[0]) == pytest.approx(4.0, rel=1e-5)
        assert int(g.cell_of(state)[0]) >= 0

    def test_propagate_to_tau(self):
        g = OctreeGrid(EXTENT, None, min_level=2, max_level=2)
        kapparho = lambda cell: jnp.where(cell >= 0, 2.0, 0.0)
        pos = jnp.asarray([[-0.9, 0.01, 0.01]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        s, cell = traversal.propagate_to_tau(g, kapparho, pos, d,
                                             jnp.asarray([1.0], jnp.float32))
        assert float(s[0]) == pytest.approx(0.5, rel=1e-3)


class TestBinTree:
    def test_uniform_min_level_matches_octree(self):
        from skirt_tpu.grids.octree import BinTreeGrid
        # 6 binary levels == 2 octree levels: 4x4x4 leaves of equal volume
        g = BinTreeGrid(EXTENT, None, min_level=6, max_level=6)
        assert g.ncells == 64
        np.testing.assert_allclose(g.cell_volumes(), (0.5) ** 3)

    def test_chord_sums(self):
        from skirt_tpu.grids.octree import BinTreeGrid
        g = BinTreeGrid(EXTENT, None, min_level=9, max_level=9)
        pos, d = random_rays(300, seed=3)

        def seg(carry, cell, ds, t):
            return carry + ds, jnp.ones_like(carry, dtype=bool)

        total, _ = traversal.sweep(g, pos, d, seg, jnp.zeros(pos.shape[0]))
        p, dd = np.asarray(pos, np.float64), np.asarray(d, np.float64)
        with np.errstate(divide="ignore"):
            t2 = np.where(np.abs(dd) > 1e-12, (np.sign(dd) - p) / dd, np.inf)
        expected = np.min(t2, axis=1)
        np.testing.assert_allclose(np.asarray(total), expected, rtol=3e-3,
                                   atol=2e-3)

    def test_refinement_follows_density(self):
        from skirt_tpu.grids.octree import BinTreeGrid

        def rho(pos):
            r2 = np.sum((pos - np.array([0.5, 0.5, 0.5])) ** 2, axis=-1)
            return np.exp(-r2 / (2 * 0.05 ** 2))

        g = BinTreeGrid(EXTENT, rho, min_level=6, max_level=15,
                        max_mass_fraction=1e-3, samples_per_node=64)
        vols = g.cell_volumes()
        centers = g.cell_centers()
        near = np.linalg.norm(centers - [0.5, 0.5, 0.5], axis=1) < 0.2
        # refinement concentrates at the blob: cells there are much smaller
        assert vols[near].mean() < 0.1 * vols[~near].mean()
        assert g.max_depth > 6


class TestParticleTree:
    def test_leaf_occupancy_and_chords(self):
        from skirt_tpu.grids.octree import ParticleTreeGrid
        rs = np.random.default_rng(4)
        pts = rs.normal(0, 0.3, (150, 3)).clip(-0.95, 0.95)
        g = ParticleTreeGrid(EXTENT, pts)
        # each particle sits in its own leaf
        cells = np.asarray(g.locate(jnp.asarray(pts, jnp.float32)))
        assert cells.min() >= 0
        counts = np.bincount(cells, minlength=g.ncells)
        assert counts.max() <= 1 or g.max_depth >= 16
        # volumes tile the domain
        assert g.cell_volumes().sum() == pytest.approx(8.0, rel=1e-9)
        # chord sums across the adaptive grid
        pos, d = random_rays(200, seed=5)

        def seg(carry, cell, ds, t):
            return carry + ds, jnp.ones_like(carry, dtype=bool)

        total, _ = traversal.sweep(g, pos, d, seg, jnp.zeros(pos.shape[0]))
        p, dd = np.asarray(pos, np.float64), np.asarray(d, np.float64)
        with np.errstate(divide="ignore"):
            t2 = np.where(np.abs(dd) > 1e-12, (np.sign(dd) - p) / dd, np.inf)
        expected = np.min(t2, axis=1)
        np.testing.assert_allclose(np.asarray(total), expected, rtol=5e-3,
                                   atol=3e-3)

    def test_extra_levels(self):
        from skirt_tpu.grids.octree import ParticleTreeGrid
        pts = np.array([[0.5, 0.5, 0.5], [-0.5, -0.5, -0.5]])
        g0 = ParticleTreeGrid(EXTENT, pts, extra_levels=0)
        g1 = ParticleTreeGrid(EXTENT, pts, extra_levels=1)
        assert g1.ncells == 8 * g0.ncells


class TestBarycentricSubdivision:
    def test_build_and_field_coverage(self):
        """ref: BaryOctTreeNode.cpp / BaryBinTreeNode — children split at
        the node's density barycenter.  The barycentric tree must cover
        the domain (every point locates to a leaf) and represent the
        same total mass within MC sampling noise."""
        import numpy as np
        import jax.numpy as jnp
        from skirt_tpu.constants import KPC
        from skirt_tpu.geometry import TorusGeometry
        from skirt_tpu.grids.octree import BinTreeGrid, OctreeGrid

        torus = TorusGeometry(1.0, 2.0, 0.7, 0.05 * KPC, 2 * KPC)
        half = 2.2 * KPC
        ext = (-half,) * 3 + (half,) * 3

        def fn(p):
            return np.asarray(torus.density(p))

        for cls, kw in ((OctreeGrid, dict(min_level=2, max_level=4)),
                        (BinTreeGrid, dict(min_level=6, max_level=12))):
            g = cls(ext, fn, subdivision="barycentric", **kw)
            assert g.ncells > 8
            if cls is OctreeGrid:
                # true barycenter split planes: walls off-lattice
                assert g.voxelize_exact is False
                assert g.voxelize() is None
            else:
                # ref: BaryBinTreeNode splits at the MIDPOINT along the
                # barycenter-chosen axis — walls stay dyadic
                assert g.voxelize_exact is True
            rs = np.random.default_rng(1)
            pts = rs.uniform(-0.99 * half, 0.99 * half, (2000, 3))
            cells = np.asarray(g.locate(jnp.asarray(pts, jnp.float32)))
            assert (cells >= 0).all()
            # volumes tile the domain
            assert np.isclose(g.cell_volumes().sum(), (2 * half) ** 3,
                              rtol=1e-10)

    def test_bintree_barycenter_axis_choice(self):
        """ref: BaryBinTreeNode.cpp:38-57 — the split axis for an inner
        node is the one whose wall is fractionally nearest the density
        barycenter, and the plane is the geometric midpoint."""
        import numpy as np
        from skirt_tpu.grids.octree import BinTreeGrid

        # density concentrated near +x wall: every early split should be x
        def fn(p):
            p = np.asarray(p)
            return np.exp(8.0 * p[..., 0])

        g = BinTreeGrid((-1, -1, -1, 1, 1, 1), fn, min_level=3,
                        max_level=6, max_mass_fraction=1e-3)
        ax = np.asarray(g._split_axis_np)
        inner = np.asarray(g.child) >= 0
        # the root (largest node) must split along x, not the
        # alternating default
        assert ax[0] == 0
        # midpoint plane: each child pair shares a wall at the parent mid
        lo = np.asarray(g.lo64)
        hi = np.asarray(g.hi64)
        child = np.asarray(g.child)
        c0 = child[0]
        a = ax[0]
        assert np.isclose(hi[c0, a], 0.5 * (lo[0, a] + hi[0, a]))
        assert inner.sum() > 0

    def test_ski_property(self):
        from skirt_tpu.discover import SUPPORTED  # noqa: F401 (import ok)
        from skirt_tpu.grids.octree import OctreeGrid
        g = OctreeGrid((-1, -1, -1, 1, 1, 1), None, min_level=1,
                       max_level=2, subdivision="barycentric")
        assert g.subdivision == "barycentric"


class TestNeighborWalk:
    """traversal='neighbor' (ref Neighbor search method,
    TreeDustGrid.cpp:460-560): per-(leaf, face) baked neighbor rows must
    reproduce the re-descend walk segment-for-segment."""

    def _rho(self, pos):
        r2 = np.sum((pos - np.array([0.3, -0.2, 0.1])) ** 2, axis=-1)
        return np.exp(-r2 / (2 * 0.15 ** 2)) + 0.01

    def _sweep_cells(self, g, pos, d):
        # accumulate sum of ds and a cell-weighted checksum so any
        # cell-identity difference shows, not just chord length
        def seg(carry, cell, ds, t):
            tot, chk = carry
            return (tot + ds, chk + ds * (cell.astype(jnp.float32) + 1.0)), \
                jnp.ones_like(tot, dtype=bool)

        z = jnp.zeros(pos.shape[0])
        (tot, chk), _ = traversal.sweep(g, pos, d, seg, (z, z))
        return np.asarray(tot), np.asarray(chk)

    def test_matches_redescend_octree(self):
        ga = OctreeGrid(EXTENT, self._rho, min_level=2, max_level=5,
                        max_mass_fraction=3e-3, samples_per_node=32)
        gb = OctreeGrid(EXTENT, self._rho, min_level=2, max_level=5,
                        max_mass_fraction=3e-3, samples_per_node=32,
                        traversal="neighbor")
        assert gb.ncells == ga.ncells
        pos, d = random_rays(400, seed=3)
        ta, ca = self._sweep_cells(ga, pos, d)
        tb, cb = self._sweep_cells(gb, pos, d)
        np.testing.assert_allclose(tb, ta, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(cb, ca, rtol=1e-5, atol=1e-5)

    def test_matches_redescend_bintree_barycentric(self):
        # non-dyadic walls are the hard case for the baked f32 boxes.
        # NOTE: the re-descend walk itself can STALL on barycentric
        # knife edges (observed: a ray pinned at ds=0 on one leaf), so
        # the chord-length oracle is the analytic box exit; checksum
        # parity is asserted only on rays where re-descend completed.
        from skirt_tpu.grids.octree import BinTreeGrid
        ga = BinTreeGrid(EXTENT, self._rho, min_level=6, max_level=12,
                         max_mass_fraction=3e-3, samples_per_node=32,
                         subdivision="barycentric")
        gb = BinTreeGrid(EXTENT, self._rho, min_level=6, max_level=12,
                         max_mass_fraction=3e-3, samples_per_node=32,
                         subdivision="barycentric", traversal="neighbor")
        pos, d = random_rays(300, seed=4)
        p, dd = np.asarray(pos, np.float64), np.asarray(d, np.float64)
        with np.errstate(divide="ignore"):
            t2 = np.where(np.abs(dd) > 1e-12, (np.sign(dd) - p) / dd,
                          np.inf)
        chord = np.min(t2, axis=1)
        ta, ca = self._sweep_cells(ga, pos, d)
        tb, cb = self._sweep_cells(gb, pos, d)
        np.testing.assert_allclose(tb, chord, rtol=3e-3, atol=2e-3)
        done = np.abs(ta - chord) < 3e-3 * chord + 2e-3
        assert done.mean() > 0.99
        np.testing.assert_allclose(cb[done], ca[done], rtol=1e-5,
                                   atol=1e-5)

    def test_axis_aligned_rays(self):
        # axis-aligned rays cross faces exactly on edges — the worst case
        # for the containment selection
        g = OctreeGrid(EXTENT, self._rho, min_level=2, max_level=4,
                       max_mass_fraction=3e-3, samples_per_node=32,
                       traversal="neighbor")
        pos = jnp.asarray(np.array([[-0.95, 0.1, 0.1], [0.1, -0.95, 0.3],
                                    [0.2, 0.3, -0.95]], np.float32))
        d = jnp.asarray(np.eye(3, dtype=np.float32))

        def seg(carry, cell, ds, t):
            return carry + ds, jnp.ones_like(carry, dtype=bool)

        tot, _ = traversal.sweep(g, pos, d, seg, jnp.zeros(3))
        np.testing.assert_allclose(np.asarray(tot), 1.95, rtol=1e-4)

    def test_ski_search_method(self):
        # ref: TreeDustGrid.hpp:44-52 searchMethod enum; Neighbor is the
        # reference's ski default for tree grids
        from test_ski import OLIGO_SKI
        from skirt_tpu.ski import load_ski
        xml = OLIGO_SKI.replace(
            '<CartesianDustGrid minX="-15000 pc" maxX="15000 pc" '
            'minY="-15000 pc" maxY="15000 pc" minZ="-2000 pc" '
            'maxZ="2000 pc">',
            '<OctTreeDustGrid minX="-15000 pc" maxX="15000 pc" '
            'minY="-15000 pc" maxY="15000 pc" minZ="-2000 pc" '
            'maxZ="2000 pc" minLevel="2" maxLevel="3" '
            'searchMethod="Neighbor">')
        xml = xml.replace("</CartesianDustGrid>", "</OctTreeDustGrid>")
        import tempfile
        import os
        fd, path = tempfile.mkstemp(suffix=".ski")
        os.write(fd, xml.encode())
        os.close(fd)
        try:
            sim = load_ski(path)
            # the sim may auto-voxelize for running; the parsed tree grid
            # itself carries the walk choice
            assert sim.dust_system_out.grid._traversal == "neighbor"
        finally:
            os.unlink(path)
