"""ski-file loading and CLI tests (the reference's config format)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from skirt_tpu.ski import load_ski, parse_ski, parse_scalar, SkiParseError


OLIGO_SKI = """<?xml version="1.0" encoding="UTF-8"?>
<!--SKIRT radiative transfer simulations-->
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="6.1">
  <OligoMonteCarloSimulation packages="2000" minWeightReduction="1e4" scattBias="0.5">
    <units type="Units">
      <ExtragalacticUnits fluxOutputStyle="Frequency"/>
    </units>
    <wavelengthGrid type="OligoWavelengthGrid">
      <OligoWavelengthGrid wavelengths="0.55 micron, 1 micron"/>
    </wavelengthGrid>
    <stellarSystem type="StellarSystem">
      <StellarSystem emissionBias="0.5">
        <components type="StellarComp">
          <OligoStellarComp luminosities="1e7, 5e6">
            <geometry type="Geometry">
              <ExpDiskGeometry radialScale="4400 pc" axialScale="500 pc"/>
            </geometry>
          </OligoStellarComp>
        </components>
      </StellarSystem>
    </stellarSystem>
    <dustSystem type="OligoDustSystem">
      <OligoDustSystem sampleCount="10">
        <dustDistribution type="DustDistribution">
          <CompDustDistribution>
            <components type="DustComp">
              <DustComp>
                <geometry type="Geometry">
                  <ExpDiskGeometry radialScale="6600 pc" axialScale="250 pc"/>
                </geometry>
                <mix type="DustMix">
                  <SimpleOligoDustMix opacities="2600 m2/kg, 1000 m2/kg" albedos="0.6, 0.5" asymmetryParameters="0.5, 0.4"/>
                </mix>
                <normalization type="DustCompNormalization">
                  <ZDustCompNormalization wavelength="0.55 micron" opticalDepth="1.0"/>
                </normalization>
              </DustComp>
            </components>
          </CompDustDistribution>
        </dustDistribution>
        <dustGrid type="DustGrid">
          <CartesianDustGrid minX="-15000 pc" maxX="15000 pc" minY="-15000 pc" maxY="15000 pc" minZ="-2000 pc" maxZ="2000 pc">
            <meshX type="Mesh"><LinMesh numBins="16"/></meshX>
            <meshY type="Mesh"><LinMesh numBins="16"/></meshY>
            <meshZ type="Mesh"><SymPowMesh numBins="8" ratio="4"/></meshZ>
          </CartesianDustGrid>
        </dustGrid>
      </OligoDustSystem>
    </dustSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SimpleInstrument instrumentName="i88" distance="10 Mpc" inclination="88 deg" azimuth="0 deg" positionAngle="0 deg" fieldOfViewX="30000 pc" pixelsX="16" fieldOfViewY="30000 pc" pixelsY="16"/>
          <SEDInstrument instrumentName="sed0" distance="10 Mpc" inclination="0 deg"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
  </OligoMonteCarloSimulation>
</skirt-simulation-hierarchy>
"""


class TestParsing:
    def test_parse_scalar_units(self):
        from skirt_tpu.constants import PC, MPC
        assert parse_scalar("4400 pc") == pytest.approx(4400 * PC)
        assert parse_scalar("10 Mpc") == pytest.approx(10 * MPC)
        assert parse_scalar("88 deg") == pytest.approx(np.deg2rad(88))
        assert parse_scalar("1e6") == 1e6

    def test_parse_tree(self, tmp_path):
        p = tmp_path / "model.ski"
        p.write_text(OLIGO_SKI)
        node = parse_ski(str(p))
        assert node.name == "OligoMonteCarloSimulation"
        assert node.scalar("packages") == 2000
        wg = node.child("wavelengthGrid")
        assert wg.name == "OligoWavelengthGrid"

    def test_bintree_grid_parses(self, tmp_path):
        """Regression: BinTreeDustGrid parsing crashed with a TypeError
        (subdivision= was nested inside the minLevel scalar() call), and
        directionMethod never reached the grid.
        ref: BinTreeDustGrid.hpp:21-46 (directionMethod enum)."""
        ski = OLIGO_SKI.replace(
            '<CartesianDustGrid minX="-15000 pc" maxX="15000 pc" '
            'minY="-15000 pc" maxY="15000 pc" minZ="-2000 pc" '
            'maxZ="2000 pc">',
            '<BinTreeDustGrid minX="-15000 pc" maxX="15000 pc" '
            'minY="-15000 pc" maxY="15000 pc" minZ="-2000 pc" '
            'maxZ="2000 pc" minLevel="6" maxLevel="8" sampleCount="10" '
            'directionMethod="Barycenter">').replace(
            "</CartesianDustGrid>", "</BinTreeDustGrid>")
        p = tmp_path / "bintree.ski"
        p.write_text(ski)
        sim = load_ski(str(p))
        from skirt_tpu.grids.octree import BinTreeGrid
        g = sim.dust_system_out.grid
        assert isinstance(g, BinTreeGrid)
        assert g.subdivision == "barycentric"
        # barycentric BinTree still voxelizes (midpoint split planes)
        assert g.voxelize_exact is True

    def test_unknown_class_raises(self, tmp_path):
        bad = OLIGO_SKI.replace("ExpDiskGeometry", "WeirdGeometry")
        p = tmp_path / "bad.ski"
        p.write_text(bad)
        with pytest.raises(SkiParseError, match="WeirdGeometry"):
            load_ski(str(p))


class TestEndToEnd:
    def test_load_and_run(self, tmp_path):
        from skirt_tpu.log import SilentLog
        p = tmp_path / "disc.ski"
        p.write_text(OLIGO_SKI)
        sim = load_ski(str(p), out_dir=str(tmp_path), log=SilentLog(),
                       batch_size=1 << 13)
        assert sim.nlambda == 2
        assert sim.dust_system is not None
        assert len(sim.instruments) == 2
        # units style from the ski file
        assert sim.units.flux_style == "frequency"
        acc = sim.run()
        # outputs written with ski-derived names
        assert os.path.exists(tmp_path / "skirt_tpu_i88_total.fits")
        assert os.path.exists(tmp_path / "skirt_tpu_sed0_sed.dat")
        F = acc["instruments"][1]["Ftot"]
        assert np.all(np.isfinite(F)) and F.sum() > 0


class TestCli:
    def test_cli_emulate(self, tmp_path):
        p = tmp_path / "cli.ski"
        p.write_text(OLIGO_SKI)
        env = dict(os.environ)
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
        code = subprocess.run(
            [sys.executable, "-m", "skirt_tpu.cli", "--cpu", "-e", "-b",
             "-o", str(tmp_path), str(p)],
            env=env, capture_output=True, text=True, timeout=300)
        assert code.returncode == 0, code.stderr
        assert os.path.exists(tmp_path / "cli_i88_total.fits")

    def test_cli_missing_file(self):
        from skirt_tpu.cli import main
        assert main(["/nonexistent/file.ski", "--cpu"]) == 2


AMR_SKI = """<?xml version="1.0" encoding="UTF-8"?>
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
          <AdaptiveMeshDustDistribution minX="-1 m" maxX="1 m" minY="-1 m" maxY="1 m" minZ="-1 m" maxZ="1 m" densityUnits="1">
            <adaptiveMeshFile type="AdaptiveMeshFile">
              <AdaptiveMeshAsciiFile filename="__AMRFILE__"/>
            </adaptiveMeshFile>
            <components type="MeshDustComponent">
              <MeshDustComponent densityIndex="0" densityFraction="1">
                <mix type="DustMix">
                  <SimpleOligoDustMix opacities="100 m2/kg" albedos="0" asymmetryParameters="0"/>
                </mix>
              </MeshDustComponent>
            </components>
          </AdaptiveMeshDustDistribution>
        </dustDistribution>
        <dustGrid type="DustGrid">
          <AdaptiveMeshDustGrid/>
        </dustGrid>
      </OligoDustSystem>
    </dustSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="sed" distance="10 m" inclination="0 deg" azimuth="0 deg"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
  </OligoMonteCarloSimulation>
</skirt-simulation-hierarchy>
"""


class TestAdaptiveMeshSki:
    """ref: AdaptiveMeshDustDistribution + AdaptiveMeshDustGrid ski elements."""

    def test_amr_distribution_and_grid(self, tmp_path):
        from skirt_tpu.grids.adaptivemesh import AdaptiveMeshGrid
        amr = tmp_path / "mesh.amr"
        amr.write_text("! 2 1 1\n3.0\n1.0\n")
        ski = tmp_path / "amr.ski"
        ski.write_text(AMR_SKI.replace("__AMRFILE__", str(amr)))
        sim = load_ski(str(ski), out_dir=str(tmp_path))
        assert isinstance(sim.grid, AdaptiveMeshGrid)
        assert sim.grid.ncells == 2
        ds = sim.dust_system
        # total mass = sum rho V = 3*4 + 1*4 (two 1x2x2 halves)
        assert ds.gridded_mass() == pytest.approx(16.0, rel=1e-6)
        # density in each half matches the file values
        import jax.numpy as jnp
        c = np.asarray(sim.grid.locate(jnp.asarray(
            [[-0.5, 0, 0], [0.5, 0, 0]], jnp.float32)))
        rho = ds.rho64.sum(axis=0)
        assert rho[c[0]] == pytest.approx(3.0, rel=1e-6)
        assert rho[c[1]] == pytest.approx(1.0, rel=1e-6)


class TestExtendedSkiElements:
    """Trust/Netzer/background geometries + perspective/multi-frame
    instruments load from ski elements."""

    def test_geometries(self):
        from skirt_tpu.ski import build_geometry, Node
        import skirt_tpu.geometry as geo
        for name in ("Trust1Geometry", "Trust2Geometry", "Trust6Geometry",
                     "Trust7aGeometry", "Trust7bGeometry",
                     "NetzerAccretionDiskGeometry"):
            g = build_geometry(Node(name, {}))
            assert isinstance(g, getattr(geo, name))
        g = build_geometry(Node("SpheBackgroundGeometry",
                                {"radius": "2 pc"}))
        assert isinstance(g, geo.SpheBackgroundGeometry)

    def test_surface_and_mge_geometries(self, tmp_path):
        from skirt_tpu.ski import build_geometry, Node
        import skirt_tpu.geometry as geo
        g = build_geometry(Node("StellarSurfaceGeometry", {"radius": "1 AU"}))
        assert isinstance(g, geo.StellarSurfaceGeometry)
        g = build_geometry(Node("SolarPatchGeometry", {"radius": "2 AU"}))
        assert isinstance(g, geo.SolarPatchGeometry)
        mge = tmp_path / "mge.dat"
        mge.write_text("10 1.5 0.8\n5 4.0 0.9\n")
        g = build_geometry(Node("MGEGeometry", {
            "filename": str(mge), "pixelscale": "1 pc",
            "inclination": "90 deg"}))
        assert isinstance(g, geo.MGEGeometry)
        assert len(g.Mv) == 2

    def test_instruments(self):
        from skirt_tpu.ski import build_instrument, Node
        ins = build_instrument(Node("PerspectiveInstrument", {
            "instrumentName": "p", "pixelsX": "16", "pixelsY": "16",
            "width": "10 pc", "viewX": "50 pc", "viewY": "0 pc",
            "viewZ": "10 pc", "crossX": "0 pc", "crossY": "0 pc",
            "crossZ": "0 pc", "upX": "0", "upY": "0", "upZ": "1",
            "focal": "5 pc"}), 1)
        assert ins.nx == 16
        frames = [Node("InstrumentFrame",
                       {"pixelsX": "8", "pixelsY": "8",
                        "fieldOfViewX": "4 pc", "fieldOfViewY": "4 pc"})
                  for _ in range(3)]
        mf = build_instrument(
            Node("MultiFrameInstrument",
                 {"instrumentName": "m", "distance": "10 Mpc",
                  "inclination": "30 deg"}, {"frames": frames}), 3)
        assert mf.nlambda == 3
        from skirt_tpu.ski import SkiParseError
        with pytest.raises(SkiParseError):
            build_instrument(
                Node("MultiFrameInstrument",
                     {"instrumentName": "m", "distance": "10 Mpc"},
                     {"frames": frames[:2]}), 3)


class TestAmrvacSki:
    """ref: AdaptiveMeshAmrvacFile ski element (the binary AMR format)."""

    def test_amrvac_distribution(self, tmp_path):
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from test_imports import TestAmrvacImport
        from skirt_tpu.grids.adaptivemesh import AdaptiveMeshGrid

        snap = tmp_path / "snap.dat"
        TestAmrvacImport._write_amrvac(str(snap))
        ski_text = AMR_SKI.replace(
            '<AdaptiveMeshAsciiFile filename="__AMRFILE__"/>',
            '<AdaptiveMeshAmrvacFile filename="__AMRFILE__" '
            'levelOneX="4" levelOneY="2" levelOneZ="2"/>').replace(
            "__AMRFILE__", str(snap)).replace(
            'minX="-1 m" maxX="1 m" minY="-1 m" maxY="1 m" minZ="-1 m" '
            'maxZ="1 m"',
            'minX="0 m" maxX="4 m" minY="0 m" maxY="2 m" minZ="0 m" '
            'maxZ="2 m"')
        ski = tmp_path / "amrvac.ski"
        ski.write_text(ski_text)
        sim = load_ski(str(ski), out_dir=str(tmp_path))
        src_grid = sim.dust_system_out.grid
        assert isinstance(src_grid, AdaptiveMeshGrid) \
            or src_grid.ncells == 72
        assert sim.dust_system_out.gridded_mass() > 0


CLUMPY_OCTREE_SKI = """<?xml version="1.0" encoding="UTF-8"?>
<!--SKIRT radiative transfer simulations-->
<skirt-simulation-hierarchy type="MonteCarloSimulation" format="6.1">
  <OligoMonteCarloSimulation packages="3000" minWeightReduction="1e4" scattBias="0.5">
    <units type="Units"><SIUnits/></units>
    <wavelengthGrid type="OligoWavelengthGrid">
      <OligoWavelengthGrid wavelengths="0.55 micron, 1 micron"/>
    </wavelengthGrid>
    <stellarSystem type="StellarSystem">
      <StellarSystem emissionBias="0.5">
        <components type="StellarComp">
          <OligoStellarComp luminosities="1e7, 5e6">
            <geometry type="Geometry"><PointGeometry/></geometry>
          </OligoStellarComp>
        </components>
      </StellarSystem>
    </stellarSystem>
    <dustSystem type="OligoDustSystem">
      <OligoDustSystem sampleCount="6">
        <dustDistribution type="DustDistribution">
          <CompDustDistribution>
            <components type="DustComp">
              <DustComp>
                <geometry type="Geometry">
                  <ClumpyGeometryDecorator clumpFraction="0.5" clumpCount="40" clumpRadius="150 pc" cutoff="false">
                    <geometry type="Geometry">
                      <TorusGeometry expon="2" index="1" openAngle="40 deg" minRadius="50 pc" maxRadius="1800 pc"/>
                    </geometry>
                  </ClumpyGeometryDecorator>
                </geometry>
                <mix type="DustMix">
                  <SimpleOligoDustMix opacities="2600 m2/kg, 1000 m2/kg" albedos="0.6, 0.5" asymmetryParameters="0.5, 0.4"/>
                </mix>
                <normalization type="DustCompNormalization">
                  <EdgeOnDustCompNormalization wavelength="0.55 micron" opticalDepth="1.0"/>
                </normalization>
              </DustComp>
            </components>
          </CompDustDistribution>
        </dustDistribution>
        <dustGrid type="DustGrid">
          <OctTreeDustGrid minX="-2000 pc" maxX="2000 pc" minY="-2000 pc" maxY="2000 pc" minZ="-2000 pc" maxZ="2000 pc" minLevel="2" maxLevel="4" sampleCount="8"/>
        </dustGrid>
      </OligoDustSystem>
    </dustSystem>
    <instrumentSystem type="InstrumentSystem">
      <InstrumentSystem>
        <instruments type="Instrument">
          <SEDInstrument instrumentName="sed" distance="10 Mpc" inclination="70 deg"/>
        </instruments>
      </InstrumentSystem>
    </instrumentSystem>
  </OligoMonteCarloSimulation>
</skirt-simulation-hierarchy>
"""


class TestFastTableFromSki:
    """--fast on a model without closed-form densities (clumpy decorator on
    an octree: the capability-3 class) engages the table density mode."""

    def test_fast_engages_table_and_agrees(self, tmp_path):
        p = tmp_path / "clumpy.ski"
        p.write_text(CLUMPY_OCTREE_SKI)
        from skirt_tpu.log import SilentLog
        sim_fast = load_ski(str(p), out_dir=str(tmp_path / "f"),
                            log=SilentLog(), fast_path=True)
        assert sim_fast.dust_system.table
        assert sim_fast.options.deposition == "sampled"
        sim_ref = load_ski(str(p), out_dir=str(tmp_path / "r"),
                           log=SilentLog())
        assert not getattr(sim_ref.dust_system, "table", False)
        os.makedirs(tmp_path / "f", exist_ok=True)
        os.makedirs(tmp_path / "r", exist_ok=True)
        acc_f = sim_fast.run()
        acc_r = sim_ref.run()
        Ff = np.asarray(acc_f["instruments"][0]["Ftot"], np.float64)
        Fr = np.asarray(acc_r["instruments"][0]["Ftot"], np.float64)
        assert np.isfinite(Ff).all() and (Ff > 0).all()
        # MC noise at 3000 packets + voxel-scale quadrature
        np.testing.assert_allclose(Ff, Fr, rtol=0.15)

    def test_fast_pan_rides_table_with_leaf_emission(self, tmp_path):
        # round 4: --fast pan models trace the voxel TABLE (the fused
        # kernel engages) while the emission solve/launch/checkpoint
        # arrays stay at LEAF resolution (labs fold voxel -> leaf)
        text = CLUMPY_OCTREE_SKI.replace("OligoMonteCarloSimulation",
                                         "PanMonteCarloSimulation") \
            .replace("OligoDustSystem", "PanDustSystem") \
            .replace("OligoWavelengthGrid wavelengths=\"0.55 micron, 1 micron\"",
                     "LogWavelengthGrid minWavelength=\"0.2 micron\" "
                     "maxWavelength=\"100 micron\" points=\"6\"") \
            .replace('type="OligoWavelengthGrid"', 'type="WavelengthGrid"') \
            .replace('<SimpleOligoDustMix opacities="2600 m2/kg, 1000 m2/kg" albedos="0.6, 0.5" asymmetryParameters="0.5, 0.4"/>',
                     "<MeanZubkoDustMix/>") \
            .replace("""<OligoStellarComp luminosities="1e7, 5e6">
            <geometry type="Geometry"><PointGeometry/></geometry>
          </OligoStellarComp>""",
                     """<PanStellarComp>
            <geometry type="Geometry"><PointGeometry/></geometry>
            <sed type="StellarSED"><BlackBodySED temperature="6000 K"/></sed>
            <normalization type="StellarCompNormalization">
              <BolLuminosityStellarCompNormalization luminosity="1e10 Lsun"/>
            </normalization>
          </PanStellarComp>""")
        p = tmp_path / "clumpy_pan.ski"
        p.write_text(text)
        from skirt_tpu.log import SilentLog
        sim = load_ski(str(p), out_dir=str(tmp_path), log=SilentLog(),
                       fast_path=True)
        assert getattr(sim.dust_system, "table", False)
        assert sim.options.fused
        # emission machinery stays at leaf (tree) resolution
        leaf = sim.dust_system_out.grid
        assert sim.grid is not leaf
        assert sim._labs_fold is not None
        assert sim._inv4pivrho.shape[0] == leaf.ncells
