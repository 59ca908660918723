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


class TestMappingsSEDFamily:
    """ref: SKIRTcore/MappingsSEDFamily.cpp (Groves et al. 2008 grid)."""

    def test_grid_interpolation_and_scaling(self):
        from skirt_tpu.sources.sed_family import MappingsSEDFamily
        from skirt_tpu.wavelengths import LogWavelengthGrid
        wg = LogWavelengthGrid(0.05e-6, 1000e-6, 60)
        fam = MappingsSEDFamily()
        base = np.array([[1.0, 0.0122, 5.0, 1.38e-17, 0.5]])
        L1 = fam.luminosities(wg, base)[0]
        assert L1.shape == (60,) and np.all(L1 >= 0) and L1.sum() > 0
        # templates scale linearly with SFR
        L2 = fam.luminosities(wg, base * [[2, 1, 1, 1, 1]])[0]
        np.testing.assert_allclose(L2, 2 * L1, rtol=1e-12)
        # f_PDR blends linearly between the two library columns (on the
        # native grid, before the log-log resample, as in the reference —
        # so totals agree but per-bin values only approximately)
        p0 = base.copy(); p0[0, 4] = 0.0
        p1 = base.copy(); p1[0, 4] = 1.0
        Lmid = fam.luminosities(wg, base)[0]
        Lavg = 0.5 * (fam.luminosities(wg, p0)[0]
                      + fam.luminosities(wg, p1)[0])
        assert Lmid.sum() == pytest.approx(Lavg.sum(), rel=0.05)
        assert Lmid.sum() > 0.99 * min(
            fam.luminosities(wg, p0)[0].sum(),
            fam.luminosities(wg, p1)[0].sum())
        # mass convention: SFR x 10 Myr
        assert fam.mass(base)[0] == pytest.approx(1e7)

    def test_sph_spectral_binning_conserves_luminosity(self):
        from skirt_tpu.sources.sed_family import MappingsSEDFamily
        from skirt_tpu.sources.stellar import (StellarSystem,
                                               sph_stellar_components)
        from skirt_tpu.wavelengths import LogWavelengthGrid
        wg = LogWavelengthGrid(0.05e-6, 1000e-6, 40)
        fam = MappingsSEDFamily()
        rs = np.random.default_rng(3)
        n = 25
        params = np.column_stack([
            rs.uniform(0.1, 5, n), rs.uniform(0.004, 0.03, n),
            rs.uniform(4.2, 6.2, n), np.full(n, 1.38e-17),
            rs.uniform(0, 1, n)])
        L = fam.luminosities(wg, params)
        pos = rs.normal(size=(n, 3)) * 1e17
        comps = sph_stellar_components(pos, np.full(n, 1e16), L, wg, nbins=5)
        assert 1 <= len(comps) <= 5
        total = sum(c.luminosities.sum() for c in comps)
        assert total == pytest.approx(L.sum(), rel=1e-12)
        ss = StellarSystem(comps)
        assert float(ss.Ltot) == pytest.approx(L.sum(), rel=1e-6)


class TestMarastonStarburstSEDs:
    def test_maraston_old_population_is_red(self):
        from skirt_tpu.sources.sed import MarastonSED
        from skirt_tpu.wavelengths import LogWavelengthGrid
        wg = LogWavelengthGrid(0.01e-6, 100e-6, 80)
        old = MarastonSED(wg, age=10.0, metallicity=0.02)
        young = MarastonSED(wg, age=1.0, metallicity=0.02)
        assert old.fractions.sum() == pytest.approx(1.0)
        lam = wg.lambdav
        uv = lam < 0.3e-6
        # the younger population emits a larger UV fraction
        assert young.fractions[uv].sum() > old.fractions[uv].sum()

    def test_maraston_validation(self):
        from skirt_tpu.sources.sed import MarastonSED
        from skirt_tpu.wavelengths import LogWavelengthGrid
        wg = LogWavelengthGrid(0.01e-6, 100e-6, 20)
        with pytest.raises(ValueError):
            MarastonSED(wg, age=20.0)
        with pytest.raises(ValueError):
            MarastonSED(wg, age=0.5, metallicity=0.0005)

    def test_starburst_uv_dominated(self):
        from skirt_tpu.sources.sed import StarburstSED
        from skirt_tpu.wavelengths import LogWavelengthGrid
        wg = LogWavelengthGrid(0.01e-6, 100e-6, 80)
        s = StarburstSED(wg, metallicity=0.02)
        assert s.fractions.sum() == pytest.approx(1.0)
        lam = wg.lambdav
        assert s.fractions[lam < 0.5e-6].sum() > 0.5
        with pytest.raises(ValueError):
            StarburstSED(wg, metallicity=0.5)


class TestAdaptiveMeshGrid:
    """ref: AdaptiveMeshDustGrid.cpp — AMR leaves as dust cells."""

    def _grid(self, tmp_path):
        from skirt_tpu.grids.adaptivemesh import AdaptiveMeshGrid
        p = tmp_path / "mesh.amr"
        p.write_text(AMR_FILE)
        return AdaptiveMeshGrid(str(p), (0.0, 0.0, 0.0, 2.0, 2.0, 1.0))

    def test_structure(self, tmp_path):
        g = self._grid(tmp_path)
        assert g.ncells == 5
        assert g.cell_volumes().sum() == pytest.approx(4.0)  # 2x2x1 domain
        # leaf densities preserved in cell order
        dens = sorted(g.leaf_density())
        np.testing.assert_allclose(dens, [1.0, 2.0, 3.0, 8.0, 8.0])

    def test_locate(self, tmp_path):
        import jax.numpy as jnp
        g = self._grid(tmp_path)
        pts = jnp.asarray([[0.5, 0.5, 0.5],    # first quadrant leaf
                           [1.25, 1.5, 0.5],   # refined cell, left half
                           [1.75, 1.5, 0.5],   # refined cell, right half
                           [2.5, 0.5, 0.5]],   # outside
                          jnp.float32)
        cells = np.asarray(g.locate(pts))
        assert cells[3] == -1
        assert len({cells[0], cells[1], cells[2]}) == 3
        # the two refined leaves carry density 8
        dens = g.leaf_density()
        assert dens[cells[1]] == 8.0 and dens[cells[2]] == 8.0

    def test_chord_traversal(self, tmp_path):
        import jax.numpy as jnp
        from skirt_tpu.engine import traversal
        g = self._grid(tmp_path)
        # ray across the domain at y = 1.5: crosses leaf(2.0) then the two
        # refined leaves -> 3 segments totalling the 2.0 chord
        pos = jnp.asarray([[0.01, 1.5, 0.5]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)

        def seg(carry, cell, ds, t_exit):
            total, count = carry
            return (total + ds, count + (ds > 0)), jnp.ones_like(ds, bool)

        (total, count), _ = traversal.sweep(
            g, pos, d, seg, (jnp.zeros(1), jnp.zeros(1, jnp.int32)))
        assert float(total[0]) == pytest.approx(1.99, rel=1e-3)
        assert int(count[0]) == 3

    def test_optical_depth_piecewise(self, tmp_path):
        import jax.numpy as jnp
        from skirt_tpu.engine import traversal
        g = self._grid(tmp_path)
        dens = jnp.asarray(np.concatenate([g.leaf_density(), [0.0]]),
                           jnp.float32)

        def kr(cell):
            return dens[jnp.clip(cell, 0)] * (cell >= 0)

        pos = jnp.asarray([[0.01, 1.5, 0.5]], jnp.float32)
        d = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
        tau = traversal.optical_depth(g, kr, pos, d)
        # 0.99 through the (i=0, j=1) leaf (rho = 3, x-fastest child
        # ordering), then 0.5 + 0.5 through the refined rho = 8 leaves
        assert float(tau[0]) == pytest.approx(0.99 * 3 + 1.0 * 8, rel=1e-3)


SPH_SKI = """<?xml version="1.0" encoding="UTF-8"?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="6.1">
  <OligoMonteCarloSimulation packages="500">
    <units type="Units"><SIUnits/></units>
    <wavelengthGrid type="OligoWavelengthGrid">
      <OligoWavelengthGrid wavelengths="1 micron"/>
    </wavelengthGrid>
    <stellarSystem type="StellarSystem">
      <StellarSystem>
        <components type="StellarComp">
          <OligoStellarComp luminosities="1e7">
            <geometry type="Geometry"><PointGeometry/></geometry>
          </OligoStellarComp>
        </components>
      </StellarSystem>
    </stellarSystem>
    <dustSystem type="OligoDustSystem">
      <OligoDustSystem sampleCount="4">
        <dustDistribution type="DustDistribution">
          <SPHDustDistribution filename="__SPHFILE__" dustFraction="0.3">
            <dustMix type="DustMix">
              <SimpleOligoDustMix opacities="100 m2/kg" albedos="0.4" asymmetryParameters="0"/>
            </dustMix>
          </SPHDustDistribution>
        </dustDistribution>
        <dustGrid type="DustGrid">
          <ParticleTreeDustGrid minX="-20 pc" maxX="20 pc" minY="-20 pc" maxY="20 pc" minZ="-20 pc" maxZ="20 pc" extraLevels="0"/>
        </dustGrid>
      </OligoDustSystem>
    </dustSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="sed" distance="1 Mpc" inclination="0 deg" azimuth="0 deg"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
  </OligoMonteCarloSimulation>
</skirt-simulation-hierarchy>
"""

VORO_SKI = """<?xml version="1.0" encoding="UTF-8"?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="6.1">
  <OligoMonteCarloSimulation packages="500">
    <units type="Units"><SIUnits/></units>
    <wavelengthGrid type="OligoWavelengthGrid">
      <OligoWavelengthGrid wavelengths="1 micron"/>
    </wavelengthGrid>
    <stellarSystem type="StellarSystem">
      <StellarSystem>
        <components type="StellarComp">
          <OligoStellarComp luminosities="1e7">
            <geometry type="Geometry"><PointGeometry/></geometry>
          </OligoStellarComp>
        </components>
      </StellarSystem>
    </stellarSystem>
    <dustSystem type="OligoDustSystem">
      <OligoDustSystem sampleCount="4">
        <dustDistribution type="DustDistribution">
          <VoronoiDustDistribution minX="-10 pc" maxX="10 pc" minY="-10 pc" maxY="10 pc" minZ="-10 pc" maxZ="10 pc" densityUnits="1">
            <voronoiMeshFile type="VoronoiMeshFile">
              <VoronoiMeshAsciiFile filename="__VOROFILE__" coordinateUnits="1 pc"/>
            </voronoiMeshFile>
            <components type="MeshDustComponent">
              <MeshDustComponent densityIndex="0" densityFraction="1">
                <mix type="DustMix">
                  <SimpleOligoDustMix opacities="100 m2/kg" albedos="0" asymmetryParameters="0"/>
                </mix>
              </MeshDustComponent>
            </components>
          </VoronoiDustDistribution>
        </dustDistribution>
        <dustGrid type="DustGrid">
          <VoronoiDustGrid/>
        </dustGrid>
      </OligoDustSystem>
    </dustSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="sed" distance="1 Mpc" inclination="0 deg" azimuth="0 deg"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
  </OligoMonteCarloSimulation>
</skirt-simulation-hierarchy>
"""


class TestImportSki:
    """ref: SPHDustDistribution / VoronoiDustDistribution /
    ParticleTreeDustGrid / SPHStellarComp ski elements."""

    def test_sph_distribution_with_particle_tree(self, tmp_path):
        from skirt_tpu.ski import load_ski
        from skirt_tpu.grids.octree import ParticleTreeGrid
        from skirt_tpu.log import SilentLog
        rs = np.random.default_rng(5)
        n = 40
        rows = np.column_stack([
            rs.normal(0, 3, (n, 3)),                  # x,y,z [pc]
            np.full(n, 1.2),                          # h [pc]
            rs.uniform(0.5, 2.0, n),                  # M [Msun]
        ])
        f = tmp_path / "gas.dat"
        np.savetxt(f, rows)
        ski = tmp_path / "sph.ski"
        ski.write_text(SPH_SKI.replace("__SPHFILE__", str(f)))
        sim = load_ski(str(ski), out_dir=str(tmp_path), log=SilentLog(),
                       batch_size=1 << 10)
        # the engine may auto-voxelize the tree (sim.grid becomes the
        # exact Cartesian voxel view); the source grid stays the tree
        assert isinstance(sim.dust_system_out.grid, ParticleTreeGrid)
        from skirt_tpu.constants import M_SUN
        want = 0.3 * rows[:, 4].sum() * M_SUN
        assert sim.dust_system.components[0].mass() == pytest.approx(
            want, rel=1e-6)
        acc = sim.run()
        F = acc["instruments"][0]["Ftot"]
        assert np.all(np.isfinite(F)) and F.sum() > 0

    def test_voronoi_distribution_reuses_mesh(self, tmp_path):
        from skirt_tpu.ski import load_ski
        from skirt_tpu.grids.voronoi import VoronoiGrid
        from skirt_tpu.log import SilentLog
        rs = np.random.default_rng(11)
        nsites = 24
        sites = rs.uniform(-9, 9, (nsites, 3))       # pc
        dens = rs.uniform(0.5, 1.5, nsites) * 1e-21  # SI (densityUnits=1)
        f = tmp_path / "mesh.vor"
        np.savetxt(f, np.column_stack([sites, dens]))
        ski = tmp_path / "voro.ski"
        ski.write_text(VORO_SKI.replace("__VOROFILE__", str(f)))
        sim = load_ski(str(ski), out_dir=str(tmp_path), log=SilentLog(),
                       batch_size=1 << 10)
        assert isinstance(sim.grid, VoronoiGrid)
        assert sim.grid.ncells == nsites
        # absolute mass = sum rho_i V_i (densityUnits = 1 -> SI)
        want = float((dens * sim.grid.cell_volumes()).sum())
        assert sim.dust_system.components[0].mass() == pytest.approx(
            want, rel=1e-6)
        acc = sim.run()
        F = acc["instruments"][0]["Ftot"]
        assert np.all(np.isfinite(F)) and F.sum() > 0

    def test_sph_stellar_comp_mappings(self, tmp_path):
        from skirt_tpu.ski import build_stellar_component, Node
        from skirt_tpu.sources.sed_family import MappingsSEDFamily
        from skirt_tpu.wavelengths import LogWavelengthGrid
        wg = LogWavelengthGrid(0.1e-6, 100e-6, 40)
        rs = np.random.default_rng(2)
        n = 12
        rows = np.column_stack([
            rs.normal(0, 50, (n, 3)),                 # x,y,z [pc]
            np.full(n, 10.0),                         # h [pc]
            rs.uniform(0.5, 2.0, n),                  # SFR [Msun/yr]
            np.full(n, 0.0122),                       # Z
            np.full(n, 5.0),                          # logC
            np.full(n, 1e-12 * 1.38e-23 * 1e6),       # pressure [Pa]
            rs.uniform(0.0, 1.0, n),                  # f_PDR
        ])
        f = tmp_path / "hii.dat"
        np.savetxt(f, rows)
        fam_node = Node("MappingsSEDFamily", {})
        node = Node("SPHStellarComp", {"filename": str(f)},
                    {"sedFamily": [fam_node]})
        comps = build_stellar_component(node, wg)
        assert isinstance(comps, list) and len(comps) >= 1
        want = MappingsSEDFamily().luminosities(wg, rows[:, 4:9]).sum()
        got = sum(float(np.asarray(c.luminosities).sum()) for c in comps)
        assert got == pytest.approx(want, rel=1e-6)


class TestAmrvacImport:
    """MPI-AMRVAC binary AMR import (ref: AdaptiveMeshAmrvacFile.cpp)."""

    @staticmethod
    def _write_amrvac(path, levelone=(4, 2, 2), nx=(2, 2, 2)):
        """Synthetic AMRVAC .dat: top level ng=(2,1,1); first block a
        leaf, second refined into 8 leaf blocks.  Cell value = global
        leaf counter (checkable).  Returns the expected leaf count."""
        import struct

        ndims, nvars, pars = 3, 2, 2
        ncells = nx[0] * nx[1] * nx[2]
        forest = [1, 0] + [1] * 8           # leaf, refine, 8 leaves
        nleafs = sum(forest)
        with open(path, "wb") as f:
            # data blocks: variable-major doubles, value = 100*b + cell
            for b in range(nleafs):
                for g in range(nvars):
                    for c in range(ncells):
                        f.write(struct.pack("<d",
                                            (g + 1) * (100.0 * b + c + 1)))
            for v in forest:
                f.write(struct.pack("<i", v))
            for v in nx[:ndims]:
                f.write(struct.pack("<i", v))
            for _ in range(pars):
                f.write(struct.pack("<d", 0.0))
            for v in (nleafs, 2, ndims, 3, nvars, pars, 0):
                f.write(struct.pack("<i", v))
            f.write(struct.pack("<d", 1.5))   # time
        return nleafs, ncells

    def test_parse_structure_and_values(self, tmp_path):
        from skirt_tpu.imports.amr import load_amr_amrvac

        p = tmp_path / "snap.dat"
        nleafs, ncells = self._write_amrvac(str(p))
        extent = (0.0, 0.0, 0.0, 4.0, 2.0, 2.0)
        lo, hi, vals = load_amr_amrvac(str(p), extent, levelone=(4, 2, 2))
        assert lo.shape[0] == nleafs * ncells == 72
        # volumes: first top-level block (8 cells of 1x1x1 /2 = coarse),
        # the refined half has 64 cells at half size
        v = np.prod(hi - lo, axis=1)
        assert v[:8] == pytest.approx(1.0)       # coarse block cells
        assert v[8:] == pytest.approx(1.0 / 8.0)  # refined cells
        # coverage: total volume = domain volume
        assert v.sum() == pytest.approx(16.0)
        # first block's first cell value (g=0): 100*0 + 1
        assert vals[0] == pytest.approx(1.0)
        # second variable column
        _, _, v2 = load_amr_amrvac(str(p), extent, levelone=(4, 2, 2),
                                   density_column=1)
        np.testing.assert_allclose(v2, 2 * vals)
        # cells tile the domain disjointly: every probe point is in
        # exactly one leaf
        rs = np.random.default_rng(0)
        pts = rs.uniform([0, 0, 0], [4, 2, 2], (500, 3))
        inside = ((pts[:, None, :] >= lo[None]) &
                  (pts[:, None, :] <= hi[None])).all(axis=2)
        assert np.all(inside.sum(axis=1) == 1)

    def test_matches_ascii_equivalent(self, tmp_path):
        """The same mesh in both formats yields identical leaves."""
        from skirt_tpu.imports.amr import load_amr_amrvac, load_amr_ascii

        p = tmp_path / "snap.dat"
        self._write_amrvac(str(p))
        extent = (0.0, 0.0, 0.0, 4.0, 2.0, 2.0)
        lo_b, hi_b, v_b = load_amr_amrvac(str(p), extent,
                                          levelone=(4, 2, 2))

        # equivalent ASCII: ! 2 1 1 -> [! 2 2 2 leaf-cells] x ...
        def block_lines(b):
            # a leaf block of 2x2x2 cells is a "! 2 2 2" node with values
            return ["! 2 2 2"] + [f"{100.0 * b + c + 1}" for c in range(8)]

        lines = ["! 2 1 1"]
        lines += block_lines(0)
        lines += ["! 2 2 2"]
        for b in range(1, 9):
            lines += block_lines(b)
        pa = tmp_path / "snap.txt"
        pa.write_text("\n".join(lines) + "\n")
        lo_a, hi_a, v_a = load_amr_ascii(str(pa), extent)
        # identical leaf sets (ordering may differ within refined region)
        key_b = np.lexsort((lo_b[:, 2], lo_b[:, 1], lo_b[:, 0], v_b))
        key_a = np.lexsort((lo_a[:, 2], lo_a[:, 1], lo_a[:, 0], v_a))
        np.testing.assert_allclose(lo_b[key_b], lo_a[key_a])
        np.testing.assert_allclose(hi_b[key_b], hi_a[key_a])
        np.testing.assert_allclose(v_b[key_b], v_a[key_a])

    def test_geometry_from_amrvac(self, tmp_path):
        from skirt_tpu.imports.amr import AdaptiveMeshGeometry

        p = tmp_path / "snap.dat"
        self._write_amrvac(str(p))
        geom = AdaptiveMeshGeometry.from_amrvac(
            str(p), (0.0, 0.0, 0.0, 4.0, 2.0, 2.0), levelone=(4, 2, 2))
        rho = geom.density(np.array([[0.5, 0.5, 0.5], [3.9, 1.9, 1.9]]))
        assert np.all(rho > 0)
        # unit total mass
        total = (geom.rho * geom.volumes).sum()
        assert total == pytest.approx(1.0, rel=1e-12)


class TestGridPlots:
    def test_cartesian_and_octree_outlines(self, tmp_path):
        from skirt_tpu.grids import CartesianGrid
        from skirt_tpu.grids.octree import OctreeGrid
        from skirt_tpu.media.outputs import write_grid_plots
        from skirt_tpu.units import Units

        b = np.linspace(-1, 1, 6)      # 5 cells: z=0 inside the middle
        grid = CartesianGrid(b, b, b)
        files = write_grid_plots(grid, Units(style="SI"), str(tmp_path),
                                 "t")
        assert len(files) == 4
        xy = (tmp_path / "t_ds_gridxy.dat").read_text()
        # 25 cells cross the z=0 plane; each rectangle = 5 vertex rows
        blocks = [blk for blk in xy.split("\n\n") if blk.strip()
                  and not blk.startswith("#")]
        assert len(blocks) == 25
        # octree leaves
        oct_grid = OctreeGrid((-1, -1, -1, 1, 1, 1), None, min_level=1,
                              max_level=1)
        files = write_grid_plots(oct_grid, Units(style="SI"),
                                 str(tmp_path), "o")
        assert (tmp_path / "o_ds_gridxyz.dat").exists()

    def test_sphere_and_cylinder(self, tmp_path):
        from skirt_tpu.grids.sphere1d import Sphere1DGrid
        from skirt_tpu.grids.cylinder2d import Cylinder2DGrid
        from skirt_tpu.media.outputs import write_grid_plots
        from skirt_tpu.units import Units

        g1 = Sphere1DGrid(np.linspace(0, 1, 4))
        files = write_grid_plots(g1, Units(style="SI"), str(tmp_path), "s")
        assert len(files) == 3
        assert "0.33333333" in (tmp_path / "s_ds_gridxy.dat").read_text()[:2000]
        g2 = Cylinder2DGrid(np.linspace(0, 1, 4), np.linspace(-1, 1, 5))
        write_grid_plots(g2, Units(style="SI"), str(tmp_path), "c")
        assert (tmp_path / "c_ds_gridxz.dat").exists()

    def test_driver_write_grid(self, tmp_path):
        import jax.numpy as jnp
        from skirt_tpu.engine.simulation import OligoSimulation
        from skirt_tpu.geometry import PointGeometry, UniformSphereGeometry
        from skirt_tpu.grids import CartesianGrid
        from skirt_tpu.instruments import SEDInstrument
        from skirt_tpu.log import SilentLog
        from skirt_tpu.media import (DustComponent, DustMassNormalization,
                                     DustSystem, SimpleOligoDustMix)
        from skirt_tpu.sources.stellar import (LuminosityStellarComponent,
                                               StellarSystem)
        from skirt_tpu.wavelengths import OligoWavelengthGrid

        wg = OligoWavelengthGrid([0.55e-6])
        ss = StellarSystem([LuminosityStellarComponent(PointGeometry(), wg,
                                                       [1.0])])
        b = np.linspace(-1, 1, 5)
        grid = CartesianGrid(b, b, b)
        mix = SimpleOligoDustMix(wg, [1.0], [0.4], [0.0])
        dsys = DustSystem(grid, [DustComponent(
            UniformSphereGeometry(0.9), mix, DustMassNormalization(1.0))],
            samples_per_cell=1)
        sim = OligoSimulation(stellar_system=ss,
                              instruments=[SEDInstrument("sed", 10.0, 1)],
                              dust_system=dsys, packets=256,
                              log=SilentLog(), out_dir=str(tmp_path),
                              write_grid=True)
        sim.run()
        for body in ("gridxy", "gridxz", "gridyz", "gridxyz"):
            assert (tmp_path / f"skirt_tpu_ds_{body}.dat").exists()


class TestSphericalAdaptiveMesh:
    """ref: SphericalAdaptiveMesh.cpp — AMR file in (r, theta, phi)."""

    def test_volumes_density_sampling(self, tmp_path):
        import jax
        from skirt_tpu.imports.amr import SphericalAdaptiveMeshGeometry

        # two radial shells (r-split), uniform in angle: ! 2 1 1
        p = tmp_path / "sph.amr"
        p.write_text("! 2 1 1\n5.0\n1.0\n")
        rin, rout = 1.0, 3.0
        g = SphericalAdaptiveMeshGeometry.from_file(str(p), rin, rout)
        rmid = 0.5 * (rin + rout)
        v_in = 4 * np.pi / 3 * (rmid ** 3 - rin ** 3)
        v_out = 4 * np.pi / 3 * (rout ** 3 - rmid ** 3)
        np.testing.assert_allclose(g.volumes, [v_in, v_out], rtol=1e-12)
        # normalized density ratio matches the file values
        pts = np.array([[1.5, 0, 0], [0, 0, 2.5], [0.5, 0, 0]])
        rho = g.density(pts)
        assert rho[0] / rho[1] == pytest.approx(5.0, rel=1e-9)
        assert rho[2] == 0.0                    # inside the inner cavity
        total = (g.rho * g.volumes).sum()
        assert total == pytest.approx(1.0, rel=1e-12)
        # sampling: radii within the shell, mass split matches 5:1 values
        pos = np.asarray(g.generate_position(jax.random.key(0), 20000))
        r = np.linalg.norm(pos, axis=1)
        assert r.min() >= rin - 1e-6 and r.max() <= rout + 1e-6
        frac_in = (r < rmid).mean()
        expect = 5 * v_in / (5 * v_in + v_out)
        assert frac_in == pytest.approx(expect, abs=0.02)

    def test_angular_sectors(self, tmp_path):
        from skirt_tpu.imports.amr import SphericalAdaptiveMeshGeometry

        # theta-split: dense northern hemisphere
        p = tmp_path / "sph2.amr"
        p.write_text("! 1 2 1\n3.0\n1.0\n")
        g = SphericalAdaptiveMeshGeometry.from_file(str(p), 0.5, 2.0)
        north = g.density(np.array([[0.0, 0.0, 1.0]]))[0]
        south = g.density(np.array([[0.0, 0.0, -1.0]]))[0]
        assert north / south == pytest.approx(3.0, rel=1e-9)


class TestImportedStellarComps:
    """VoronoiStellarComp / AdaptiveMeshStellarComp: stellar components
    imported from mesh files with (density, Z, age) columns and BC03 SEDs
    (ref: VoronoiStellarComp.cpp:40-90, AdaptiveMeshStellarComp.cpp)."""

    @staticmethod
    def _bc_family(tmp_path, monkeypatch):
        import os
        from tests.test_data_loaders import write_ised_ascii
        from skirt_tpu.sources.sed_family import BruzualCharlotSEDFamily
        base = str(tmp_path / "dat")
        for code in BruzualCharlotSEDFamily.ZCODES:
            write_ised_ascii(os.path.join(
                base, "SED/BruzualCharlot/chabrier",
                f"bc2003_lr_{code}_chab_ssp.ised_ASCII"))
        BruzualCharlotSEDFamily._cache.clear()
        return BruzualCharlotSEDFamily(data_dir=base), base

    def _wg(self):
        from skirt_tpu.wavelengths import OligoWavelengthGrid
        return OligoWavelengthGrid([0.3e-6, 1.1e-6])

    def test_voronoi_stellar_components(self, tmp_path, monkeypatch):
        from skirt_tpu.constants import PC
        from skirt_tpu.grids.voronoi import VoronoiGrid
        from skirt_tpu.imports.voronoi import (load_voronoi_mesh,
                                               voronoi_stellar_components)
        from skirt_tpu.sources.stellar import StellarSystem

        family, _ = self._bc_family(tmp_path, monkeypatch)
        wg = self._wg()
        rs = np.random.default_rng(3)
        nsites = 32
        sites_pc = rs.uniform(-40, 40, size=(nsites, 3))
        rho = rs.uniform(0.0, 2.0, nsites)       # Msun/pc^3
        Z = rs.uniform(0.001, 0.03, nsites)
        age = rs.uniform(1e6, 9e8, nsites)
        mesh = tmp_path / "stars.vmesh"
        np.savetxt(mesh, np.column_stack([sites_pc, rho, Z, age]))

        sites, fields = load_voronoi_mesh(str(mesh))
        half = 45 * PC
        grid = VoronoiGrid(sites, (-half, -half, -half, half, half, half))
        comps = voronoi_stellar_components(grid, fields, wg, family)
        assert 1 <= len(comps) <= 8

        # total luminosity equals the family's per-cell sum
        V = grid.cell_volumes()
        M = rho * V / PC ** 3
        L_ref = family.luminosities(wg, np.column_stack([M, Z, age]))
        L_tot = sum(np.asarray(c.luminosities) for c in comps)
        np.testing.assert_allclose(L_tot, L_ref.sum(axis=0), rtol=1e-8)

        # the system launches packets from inside the domain
        ss = StellarSystem(comps)
        import jax.numpy as jnp
        from skirt_tpu import rng as _rng
        n = 512
        pos, d, L, _ = ss.launch(_rng.root_key(1),
                                 jnp.zeros(n, jnp.int32),
                                 jnp.full((n,), 1.0 / n, jnp.float32))
        p = np.asarray(pos)
        assert np.isfinite(p).all()
        assert (np.abs(p) <= half * 1.0001).all()

    def test_amr_stellar_components(self, tmp_path, monkeypatch):
        from skirt_tpu.constants import PC
        from skirt_tpu.imports.amr import (amr_stellar_components,
                                           load_amr_ascii)

        family, _ = self._bc_family(tmp_path, monkeypatch)
        wg = self._wg()
        # 2x1x1 root: one refined node (2x2x2) + one leaf; 3 value columns
        lines = ["! 2 1 1", "! 2 2 2"]
        rs = np.random.default_rng(5)
        for _ in range(8):
            lines.append(f"{rs.uniform(0.5, 2):.4f} 0.02 1e8")
        lines.append("1.5 0.008 5e8")
        p = tmp_path / "stars.amr"
        p.write_text("\n".join(lines) + "\n")
        half = 10 * PC
        extent = (-half, -half, -half, half, half, half)
        lo, hi, fields = load_amr_ascii(str(p), extent, None)
        assert fields.shape == (9, 3)
        comps = amr_stellar_components(lo, hi, fields, wg, family)
        assert 1 <= len(comps) <= 8
        V = np.prod(hi - lo, axis=1)
        M = fields[:, 0] * V / PC ** 3
        L_ref = family.luminosities(
            wg, np.column_stack([M, fields[:, 1], fields[:, 2]]))
        L_tot = sum(np.asarray(c.luminosities) for c in comps)
        np.testing.assert_allclose(L_tot, L_ref.sum(axis=0), rtol=1e-8)

    def test_voronoi_stellar_ski_end_to_end(self, tmp_path, monkeypatch):
        from skirt_tpu.constants import PC
        from skirt_tpu.log import SilentLog
        from skirt_tpu.ski import load_ski

        family, base = self._bc_family(tmp_path, monkeypatch)
        import skirt_tpu.sources.sed_family as sf
        monkeypatch.setattr(sf, "DATA_DIR", base)
        rs = np.random.default_rng(7)
        nsites = 16
        sites_pc = rs.uniform(-40, 40, size=(nsites, 3))
        rho = rs.uniform(0.1, 2.0, nsites)
        Z = np.full(nsites, 0.02)
        age = np.full(nsites, 1e8)
        mesh = tmp_path / "stars.vmesh"
        np.savetxt(mesh, np.column_stack([sites_pc, rho, Z, age]))
        ski = tmp_path / "vstars.ski"
        ski.write_text(f"""<?xml version="1.0" encoding="UTF-8"?>
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="6.1">
  <OligoMonteCarloSimulation packages="2000">
    <units type="Units"><SIUnits/></units>
    <wavelengthGrid type="OligoWavelengthGrid">
      <OligoWavelengthGrid wavelengths="0.3 micron, 1.1 micron"/>
    </wavelengthGrid>
    <stellarSystem type="StellarSystem">
      <StellarSystem>
        <components type="StellarComp">
          <VoronoiStellarComp minX="-45 pc" maxX="45 pc" minY="-45 pc"
              maxY="45 pc" minZ="-45 pc" maxZ="45 pc" densityIndex="0"
              metallicityIndex="1" ageIndex="2">
            <voronoiMeshFile type="VoronoiMeshFile">
              <VoronoiMeshAsciiFile filename="{mesh}"/>
            </voronoiMeshFile>
          </VoronoiStellarComp>
        </components>
      </StellarSystem>
    </stellarSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="sed" distance="10 Mpc"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
  </OligoMonteCarloSimulation>
</skirt-simulation-hierarchy>
""")
        sim = load_ski(str(ski), out_dir=str(tmp_path), log=SilentLog())
        acc = sim.run()
        F = np.asarray(acc["instruments"][0]["Ftot"])
        assert np.isfinite(F).all() and (F > 0).all()


class TestGenericImportGeometries:
    """SPHGeometry / VoronoiGeometry as generic ski geometries (ref:
    SPHGeometry.hpp:22-35, VoronoiGeometry.hpp:27-46) + the clumpy
    decorator's selectable smoothing kernel."""

    def test_sph_geometry_with_temperature_filter(self, tmp_path):
        from skirt_tpu.ski import build_geometry, Node
        # x y z h M T: second particle is hot gas -> excluded
        f = tmp_path / "gas.dat"
        f.write_text("0 0 0 1 2.0 100\n5 0 0 1 3.0 90000\n")
        g = build_geometry(Node("SPHGeometry", {"filename": str(f)}))
        assert g.pos.shape[0] == 1 and g.m[0] > 0
        g2 = build_geometry(Node("SPHGeometry",
                                 {"filename": str(f),
                                  "maximumTemperature": "1e6 K"}))
        assert g2.pos.shape[0] == 2

    def test_voronoi_geometry_with_multiplier(self, tmp_path):
        from skirt_tpu.constants import PC
        from skirt_tpu.ski import build_geometry, Node
        rs = np.random.default_rng(11)
        sites = rs.uniform(-40, 40, size=(16, 3))
        rho = rs.uniform(0.5, 2.0, 16)
        mult = np.full(16, 0.5)
        f = tmp_path / "mesh.dat"
        np.savetxt(f, np.column_stack([sites, rho, mult]))
        attrs = {"filename": str(f), "minX": "-45 pc", "maxX": "45 pc",
                 "minY": "-45 pc", "maxY": "45 pc", "minZ": "-45 pc",
                 "maxZ": "45 pc", "densityIndex": "0"}
        g = build_geometry(Node("VoronoiGeometry", dict(attrs)))
        g2 = build_geometry(Node("VoronoiGeometry",
                                 dict(attrs, multiplierIndex="1")))
        # multiplier scales the file mass but not the normalized density
        assert g2.file_mass == pytest.approx(0.5 * g.file_mass, rel=1e-12)
        pts = rs.uniform(-30, 30, size=(200, 3)) * PC
        np.testing.assert_allclose(np.asarray(g2.density(pts)),
                                   np.asarray(g.density(pts)), rtol=1e-9)

    def test_clumpy_kernel_selection(self):
        from skirt_tpu.geometry.kernels import (CubicSplineSmoothingKernel,
                                                UniformSmoothingKernel)
        from skirt_tpu.ski import build_geometry, Node
        base = Node("PlummerGeometry", {"scale": "100 pc"})
        n = Node("ClumpyGeometryDecorator",
                 {"clumpFraction": "0.3", "clumpCount": "10",
                  "clumpRadius": "10 pc"})
        n.children["geometry"] = [base]
        n.children["kernel"] = [Node("UniformSmoothingKernel", {})]
        g = build_geometry(n)
        assert isinstance(g.kernel, UniformSmoothingKernel)
        n.children["kernel"] = [Node("CubicSplineSmoothingKernel", {})]
        assert isinstance(build_geometry(n).kernel,
                          CubicSplineSmoothingKernel)
