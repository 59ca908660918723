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
        assert isinstance(sim.grid, ParticleTreeGrid)
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
