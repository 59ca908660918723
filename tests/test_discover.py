"""Discover-layer tests: ski round trip, LaTeX report, schema export."""

import os
import xml.etree.ElementTree as ET

import pytest

from skirt_tpu import discover
from skirt_tpu.discover import latex_report, write_schema, write_ski
from skirt_tpu.ski import parse_ski
from tests.test_ski import OLIGO_SKI


class TestRoundTrip:
    def test_parse_write_parse(self, tmp_path):
        p1 = tmp_path / "in.ski"
        p1.write_text(OLIGO_SKI)
        node = parse_ski(str(p1))
        p2 = tmp_path / "out.ski"
        write_ski(node, str(p2))
        node2 = parse_ski(str(p2))

        def flatten(n):
            items = [(n.name, tuple(sorted(n.attrs.items())))]
            for prop in sorted(n.children):
                for c in n.children[prop]:
                    items.extend(flatten(c))
            return items

        assert flatten(node) == flatten(node2)

    def test_written_file_loads_and_builds(self, tmp_path):
        from skirt_tpu.log import SilentLog
        from skirt_tpu.ski import load_ski
        p1 = tmp_path / "in.ski"
        p1.write_text(OLIGO_SKI)
        p2 = tmp_path / "out.ski"
        write_ski(parse_ski(str(p1)), str(p2))
        sim = load_ski(str(p2), log=SilentLog(), packets=10)
        assert sim.nlambda == 2


class TestLatex:
    def test_report_contains_components(self, tmp_path):
        p1 = tmp_path / "in.ski"
        p1.write_text(OLIGO_SKI)
        out = tmp_path / "params.tex"
        latex_report(parse_ski(str(p1)), str(out))
        text = out.read_text()
        assert "\\documentclass" in text
        assert "ExpDiskGeometry" in text
        assert "radialScale=4400 pc" in text


class TestSchema:
    def test_schema_exports_supported_types(self, tmp_path):
        out = tmp_path / "schema.xml"
        write_schema(str(out))
        root = ET.parse(str(out)).getroot()
        names = {t.get("name") for t in root.findall("Type")}
        for required in ("OligoMonteCarloSimulation", "ExpDiskGeometry",
                        "SimpleInstrument", "CartesianDustGrid",
                        "MeanZubkoDustMix", "BlackBodySED"):
            assert required in names


class TestDerivedRegistry:
    """discover.SUPPORTED is generated from the ski builders (VERDICT r1
    item 8): every class the loader dispatches appears in the registry."""

    def test_covers_every_ski_dispatch(self):
        import inspect
        import re

        import skirt_tpu.ski as ski
        from skirt_tpu.discover import SUPPORTED

        src = inspect.getsource(ski)
        names = set(re.findall(r'n == "(\w+)"', src))
        names |= {m for grp in re.findall(r'n in \(([^)]*)\)', src)
                  for m in re.findall(r'"(\w+)"', grp)}
        # top-level elements are dispatched differently; exclude the few
        # structural names handled outside builder functions
        missing = sorted(n for n in names if n not in SUPPORTED)
        assert not missing, f"ski classes missing from SUPPORTED: {missing}"
        assert len(SUPPORTED) >= 120

    def test_properties_derived(self):
        from skirt_tpu.discover import SUPPORTED

        assert "numCells" in SUPPORTED["FoamGeometryDecorator"]["properties"]
        assert "geometry" in SUPPORTED["FoamGeometryDecorator"]["children"]
        assert SUPPORTED["OctTreeDustGrid"]["kind"] == "dustGrid"
        assert "maxLevel" in SUPPORTED["OctTreeDustGrid"]["properties"]
        assert SUPPORTED["AdaptiveMeshAmrvacFile"]["kind"] in (
            "dustDistribution", "adaptiveMeshFile", "geometry", "dustGrid")


class TestFoamDecorators:
    def test_foam_decorator_samples_clumpy(self):
        import jax
        import numpy as np

        from skirt_tpu.geometry import (ClumpyGeometryDecorator,
                                        FoamGeometryDecorator,
                                        PlummerGeometry)

        base = ClumpyGeometryDecorator(PlummerGeometry(1.0), 0.5, 30, 0.2)
        foam = FoamGeometryDecorator(base, (-4, -4, -4, 4, 4, 4),
                                     num_cells=3000)
        pos = np.asarray(foam.generate_position(jax.random.key(0), 4000))
        assert np.isfinite(pos).all()
        r = np.linalg.norm(pos, axis=1)
        # samples concentrate toward the Plummer core
        assert np.median(r) < 2.0
        # density delegates to the wrapped geometry
        pts = np.array([[0.1, 0.0, 0.0], [3.0, 3.0, 3.0]])
        np.testing.assert_allclose(foam.density(pts), base.density(pts))

    def test_foam_ax_geometry(self):
        import jax
        import numpy as np

        from skirt_tpu.geometry import FoamAxGeometry

        class Donut(FoamAxGeometry):
            def radial_density(self, R, z):
                return np.exp(-((np.asarray(R) - 1.0) ** 2
                                + np.asarray(z) ** 2) / 0.02)

        g = Donut(rmax=2.0, zmax=1.0, num_cells=4000)
        pos = np.asarray(g.generate_position(jax.random.key(1), 5000))
        R = np.hypot(pos[:, 0], pos[:, 1])
        assert abs(np.median(R) - 1.0) < 0.1
        assert abs(np.median(pos[:, 2])) < 0.05
        # normalized density integrates to ~1 (2D trapezoid over R,z)
        Rg = np.linspace(0, 2, 400)
        zg = np.linspace(-1, 1, 400)
        RR, ZZ = np.meshgrid(Rg, zg, indexing="ij")
        pts = np.stack([RR.ravel(), np.zeros(RR.size), ZZ.ravel()], axis=1)
        rho = g.density(pts).reshape(400, 400)
        total = np.trapezoid(np.trapezoid(rho * 2 * np.pi * RR, zg, axis=1),
                             Rg)
        assert total == pytest.approx(1.0, rel=0.02)


# every CONCRETE class of the reference registry (add<X>() without the
# abstract marker, Discover/RegisterSimulationItems.cpp:201-449)
REFERENCE_CONCRETE_REGISTRY = [
    "AdaptiveMeshAmrvacFile", "AdaptiveMeshAsciiFile", "AdaptiveMeshDustDistribution", "AdaptiveMeshDustGrid",
    "AdaptiveMeshGeometry", "AdaptiveMeshStellarComp", "AllCellsDustLib", "AmHydrocarbonGrainComposition",
    "Benchmark1DDustMix", "Benchmark2DDustMix", "BinTreeDustGrid", "BlackBodySED",
    "BolLuminosityStellarCompNormalization", "BrokenExpDiskGeometry", "BruzualCharlotSED", "BruzualCharlotSEDFamily",
    "CartesianDustGrid", "ClumpyGeometryDecorator", "CombineGeometryDecorator", "CompDustDistribution",
    "ConfigurableDustMix", "ConicalShellGeometry", "CropGeometryDecorator", "CubBackgroundGeometry",
    "CubicSplineSmoothingKernel", "Cylinder2DDustGrid", "CylindricalCavityGeometryDecorator", "Dim1DustLib",
    "Dim2DustLib", "DraineGraphiteGrainComposition", "DraineIonizedPAHGrainComposition", "DraineLiDustMix",
    "DraineNeutralPAHGrainComposition", "DraineSilicateGrainComposition", "DustComp", "DustEmGrainComposition",
    "DustMassDustCompNormalization", "DustMixPopulation", "EdgeOnDustCompNormalization", "EinastoGeometry",
    "ElectronDustMix", "EnstatiteGrainComposition", "ExpDiskGeometry", "ExtragalacticUnits",
    "FaceOnDustCompNormalization", "FileGrainComposition", "FileSED", "FileWavelengthGrid",
    "FoamGeometryDecorator", "ForsteriteGrainComposition", "FrameInstrument", "FullInstrument",
    "GammaGeometry", "GaussianGeometry", "GreyBodyDustEmissivity", "IdenticalAssigner",
    "InstrumentFrame", "InstrumentSystem", "InterstellarDustMix", "KuruczSED",
    "LaserGeometry", "LinMesh", "LogMesh", "LogNormalGrainSizeDistribution",
    "LogWavelengthGrid", "LuminosityStellarCompNormalization", "MGEGeometry", "MRNDustMix",
    "MappingsSED", "MappingsSEDFamily", "MarastonSED", "MeanZubkoDustMix",
    "MeshDustComponent", "MieSilicateGrainComposition", "MinSilicateGrainComposition", "ModifiedLogNormalGrainSizeDistribution",
    "ModifiedPowerLawGrainSizeDistribution", "MultiFrameInstrument", "NestedLogWavelengthGrid", "NetzerAccretionDiskGeometry",
    "OctTreeDustGrid", "OffsetGeometryDecorator", "OligoDustSystem", "OligoMonteCarloSimulation",
    "OligoStellarComp", "OligoWavelengthGrid", "PanDustSystem", "PanMonteCarloSimulation",
    "PanStellarComp", "ParticleTreeDustGrid", "PegaseSED", "PerspectiveInstrument",
    "PlummerGeometry", "PointGeometry", "PolarizedGraphiteGrainComposition", "PolarizedSilicateGrainComposition",
    "PowMesh", "PowerLawGrainSizeDistribution", "PseudoSersicGeometry", "QuasarSED",
    "RadialDustCompNormalization", "Random", "RandomAssigner", "ReadFitsGeometry",
    "RingGeometry", "RotateGeometryDecorator", "SEDInstrument", "SIUnits",
    "SPHDustDistribution", "SPHGeometry", "SPHStellarComp", "SequentialAssigner",
    "SersicGeometry", "ShellGeometry", "SimpleInstrument", "SimpleOligoDustMix",
    "SingleGrainSizeDistribution", "SolarPatchGeometry", "SpectralLuminosityStellarCompNormalization", "SpheBackgroundGeometry",
    "Sphere1DDustGrid", "Sphere2DDustGrid", "SphericalAdaptiveMeshDustDistribution", "SphericalCavityGeometryDecorator",
    "SpheroidalGeometryDecorator", "SpiralStructureGeometryDecorator", "StaggeredAssigner", "StarburstSED",
    "StellarSurfaceGeometry", "StellarSystem", "StellarUnits", "SunSED",
    "SymPowMesh", "TTauriDiskGeometry", "ThemisDustMix", "TorusGeometry",
    "TransientDustEmissivity", "TriaxialGeometryDecorator", "Trust1Geometry", "Trust2Geometry",
    "Trust6Geometry", "Trust7aGeometry", "Trust7bGeometry", "TrustDustMix",
    "TrustGraphiteGrainComposition", "TrustMeanDustMix", "TrustNeutralPAHGrainComposition", "TrustPolarizedMeanDustMix",
    "TrustSilicateGrainComposition", "TwoPhaseDustGrid", "UniformCuboidGeometry", "UniformSmoothingKernel",
    "VoronoiDustDistribution", "VoronoiDustGrid", "VoronoiGeometry", "VoronoiMeshAsciiFile",
    "VoronoiStellarComp", "WeingartnerDraineDustMix", "XDustCompNormalization", "YDustCompNormalization",
    "ZDustCompNormalization", "ZubkoDustMix", "ZubkoGraphiteGrainSizeDistribution", "ZubkoPAHGrainSizeDistribution",
    "ZubkoSilicateGrainSizeDistribution",
]


class TestReferenceRegistryCoverage:
    def test_every_concrete_reference_class_is_covered(self):
        """Schema export / wizard vocabulary covers the full concrete
        reference registry; deliberate re-design gaps carry a reason in
        discover.NOT_APPLICABLE."""
        missing = [n for n in REFERENCE_CONCRETE_REGISTRY
                   if n not in discover.SUPPORTED
                   and n not in discover.NOT_APPLICABLE]
        assert missing == []

    def test_not_applicable_has_reasons(self):
        for name, reason in discover.NOT_APPLICABLE.items():
            assert isinstance(reason, str) and len(reason) > 10
            assert name not in discover.SUPPORTED
