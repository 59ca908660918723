"""Config-hierarchy tooling: ski writing, LaTeX reports, schema export.

ref: Discover/XmlHierarchyWriter (object tree -> ski XML),
LatexHierarchyWriter (parameters.tex report), SmileSchemaWriter
(`skirt -x` schema export), ConsoleHierarchyCreator (interactive Q&A
construction).  These operate on the parsed `ski.Node` tree, which is the
framework's declarative configuration representation.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET

from .ski import Node

# The supported component vocabulary (class -> scalar property names),
# mirrored from the builders in ski.py; used for schema export and the
# console creator.  ref: Discover/RegisterSimulationItems.cpp registry.
SUPPORTED: dict[str, dict] = {
    "OligoMonteCarloSimulation": {
        "kind": "simulation",
        "properties": ["packages", "minWeightReduction", "minScattEvents",
                       "scattBias"],
        "children": ["units", "wavelengthGrid", "stellarSystem",
                     "dustSystem", "instrumentSystem"],
    },
    "PanMonteCarloSimulation": {
        "kind": "simulation",
        "properties": ["packages", "minWeightReduction", "minScattEvents",
                       "scattBias"],
        "children": ["units", "wavelengthGrid", "stellarSystem",
                     "dustSystem", "instrumentSystem"],
    },
    "OligoWavelengthGrid": {"kind": "wavelengthGrid",
                            "properties": ["wavelengths"]},
    "LogWavelengthGrid": {"kind": "wavelengthGrid",
                          "properties": ["minWavelength", "maxWavelength",
                                         "points"]},
    "NestedLogWavelengthGrid": {"kind": "wavelengthGrid",
                                "properties": ["minWavelength",
                                               "maxWavelength", "points",
                                               "minWavelengthSubGrid",
                                               "maxWavelengthSubGrid",
                                               "pointsSubGrid"]},
    "FileWavelengthGrid": {"kind": "wavelengthGrid",
                           "properties": ["filename"]},
    "StellarSystem": {"kind": "stellarSystem",
                      "properties": ["emissionBias"],
                      "children": ["components"]},
    "OligoStellarComp": {"kind": "stellarComp",
                         "properties": ["luminosities"],
                         "children": ["geometry"]},
    "PanStellarComp": {"kind": "stellarComp", "properties": [],
                       "children": ["geometry", "sed", "normalization"]},
    "SPHStellarComp": {"kind": "stellarComp", "properties": ["filename"],
                       "children": ["sedFamily"]},
    "SPHDustDistribution": {"kind": "dustDistribution",
                            "properties": ["filename", "dustFraction"],
                            "children": ["dustMix"]},
    "VoronoiDustDistribution": {"kind": "dustDistribution",
                                "properties": ["minX", "maxX", "minY", "maxY",
                                               "minZ", "maxZ",
                                               "densityUnits"],
                                "children": ["voronoiMeshFile",
                                             "components"]},
    "SimpleInstrument": {"kind": "instrument",
                         "properties": ["instrumentName", "distance",
                                        "inclination", "azimuth",
                                        "positionAngle", "fieldOfViewX",
                                        "pixelsX", "fieldOfViewY",
                                        "pixelsY"]},
    "SEDInstrument": {"kind": "instrument",
                      "properties": ["instrumentName", "distance",
                                     "inclination", "azimuth",
                                     "positionAngle"]},
    "FrameInstrument": {"kind": "instrument",
                        "properties": ["instrumentName", "distance",
                                       "inclination", "azimuth",
                                       "positionAngle", "fieldOfViewX",
                                       "pixelsX", "fieldOfViewY",
                                       "pixelsY"]},
    "FullInstrument": {"kind": "instrument",
                       "properties": ["instrumentName", "distance",
                                      "inclination", "azimuth",
                                      "positionAngle", "fieldOfViewX",
                                      "pixelsX", "fieldOfViewY", "pixelsY",
                                      "scatteringLevels"]},
    # geometries (the catalog; decorators carry nested geometry children)
    "PointGeometry": {"kind": "geometry", "properties": []},
    "PlummerGeometry": {"kind": "geometry", "properties": ["scale"]},
    "GammaGeometry": {"kind": "geometry", "properties": ["scale", "gamma"]},
    "EinastoGeometry": {"kind": "geometry", "properties": ["radius", "index"]},
    "GaussianGeometry": {"kind": "geometry",
                         "properties": ["dispersion", "flattening"]},
    "ShellGeometry": {"kind": "geometry",
                      "properties": ["minRadius", "maxRadius", "expon"]},
    "SersicGeometry": {"kind": "geometry", "properties": ["radius", "index"]},
    "PseudoSersicGeometry": {"kind": "geometry",
                             "properties": ["radius", "index"]},
    "ExpDiskGeometry": {"kind": "geometry",
                        "properties": ["radialScale", "axialScale",
                                       "radialTrunc", "axialTrunc",
                                       "innerRadius"]},
    "BrokenExpDiskGeometry": {"kind": "geometry",
                              "properties": ["radialScaleInner",
                                             "radialScaleOuter", "axialScale",
                                             "breakRadius", "sharpness"]},
    "RingGeometry": {"kind": "geometry",
                     "properties": ["radius", "width", "height"]},
    "TorusGeometry": {"kind": "geometry",
                      "properties": ["expon", "index", "openAngle",
                                     "minRadius", "maxRadius"]},
    "ConicalShellGeometry": {"kind": "geometry",
                             "properties": ["expon", "index", "inAngle",
                                            "outAngle", "minRadius",
                                            "maxRadius"]},
    "TTauriDiskGeometry": {"kind": "geometry",
                           "properties": ["minRadius", "maxRadius",
                                          "radialScale", "axialScale"]},
    "UniformCuboidGeometry": {"kind": "geometry",
                              "properties": ["minX", "maxX", "minY", "maxY",
                                             "minZ", "maxZ"]},
    "LaserGeometry": {"kind": "geometry", "properties": []},
    "NetzerAccretionDiskGeometry": {"kind": "geometry", "properties": []},
    "SpheBackgroundGeometry": {"kind": "geometry", "properties": ["radius"]},
    "CubBackgroundGeometry": {"kind": "geometry", "properties": ["extent"]},
    "StellarSurfaceGeometry": {"kind": "geometry", "properties": ["radius"]},
    "SolarPatchGeometry": {"kind": "geometry", "properties": ["radius"]},
    "MGEGeometry": {"kind": "geometry",
                    "properties": ["filename", "pixelscale", "inclination"]},
    "ReadFitsGeometry": {"kind": "geometry",
                         "properties": ["filename", "pixelScale",
                                        "axialScale", "xcenter", "ycenter"]},
    "Trust1Geometry": {"kind": "geometry", "properties": []},
    "Trust2Geometry": {"kind": "geometry", "properties": []},
    "Trust6Geometry": {"kind": "geometry", "properties": []},
    "Trust7aGeometry": {"kind": "geometry", "properties": []},
    "Trust7bGeometry": {"kind": "geometry", "properties": []},
    "OffsetGeometryDecorator": {"kind": "geometry",
                                "properties": ["offsetX", "offsetY",
                                               "offsetZ"],
                                "children": ["geometry"]},
    "RotateGeometryDecorator": {"kind": "geometry",
                                "properties": ["euleralpha", "eulerbeta",
                                               "eulergamma"],
                                "children": ["geometry"]},
    "SpheroidalGeometryDecorator": {"kind": "geometry",
                                    "properties": ["flattening"],
                                    "children": ["geometry"]},
    "TriaxialGeometryDecorator": {"kind": "geometry",
                                  "properties": ["yFlattening",
                                                 "zFlattening"],
                                  "children": ["geometry"]},
    "SphericalCavityGeometryDecorator": {"kind": "geometry",
                                         "properties": ["radius"],
                                         "children": ["geometry"]},
    "CylindricalCavityGeometryDecorator": {"kind": "geometry",
                                           "properties": ["radius"],
                                           "children": ["geometry"]},
    "CropGeometryDecorator": {"kind": "geometry",
                              "properties": ["minX", "maxX", "minY", "maxY",
                                             "minZ", "maxZ"],
                              "children": ["geometry"]},
    "CombineGeometryDecorator": {"kind": "geometry",
                                 "properties": ["firstWeight",
                                                "secondWeight"],
                                 "children": ["firstGeometry",
                                              "secondGeometry"]},
    "ClumpyGeometryDecorator": {"kind": "geometry",
                                "properties": ["clumpFraction", "clumpCount",
                                               "clumpRadius", "cutoff"],
                                "children": ["geometry"]},
    "SpiralStructureGeometryDecorator": {"kind": "geometry",
                                         "properties": ["arms", "pitch",
                                                        "radius", "phase",
                                                        "perturbWeight",
                                                        "index"],
                                         "children": ["geometry"]},
    # SEDs
    "BlackBodySED": {"kind": "sed", "properties": ["temperature"]},
    "SunSED": {"kind": "sed", "properties": []},
    "FileSED": {"kind": "sed", "properties": ["filename"]},
    "QuasarSED": {"kind": "sed", "properties": []},
    "KuruczSED": {"kind": "sed",
                  "properties": ["metallicity", "temperature", "gravity"]},
    "PegaseSED": {"kind": "sed", "properties": ["type"]},
    "MarastonSED": {"kind": "sed", "properties": ["age", "metallicity"]},
    "StarburstSED": {"kind": "sed", "properties": ["metallicity"]},
    # normalizations
    "BolLuminosityStellarCompNormalization": {"kind": "stellarNormalization",
                                              "properties": ["luminosity"]},
    "SpectralLuminosityStellarCompNormalization": {
        "kind": "stellarNormalization",
        "properties": ["wavelength", "luminosity"]},
    "DustMassDustCompNormalization": {"kind": "dustNormalization",
                                      "properties": ["dustMass"]},
    "ZDustCompNormalization": {"kind": "dustNormalization",
                               "properties": ["wavelength", "opticalDepth"]},
    "FaceOnDustCompNormalization": {"kind": "dustNormalization",
                                    "properties": ["wavelength",
                                                   "opticalDepth"]},
    "EdgeOnDustCompNormalization": {"kind": "dustNormalization",
                                    "properties": ["wavelength",
                                                   "opticalDepth"]},
    "RadialDustCompNormalization": {"kind": "dustNormalization",
                                    "properties": ["wavelength",
                                                   "opticalDepth"]},
    # mixes
    "SimpleOligoDustMix": {"kind": "dustMix",
                           "properties": ["opacities", "albedos",
                                          "asymmetryParameters"]},
    "MeanZubkoDustMix": {"kind": "dustMix", "properties": []},
    "TrustMeanDustMix": {"kind": "dustMix", "properties": []},
    "DraineLiDustMix": {"kind": "dustMix", "properties": []},
    "InterstellarDustMix": {"kind": "dustMix", "properties": []},
    "ElectronDustMix": {"kind": "dustMix", "properties": []},
    "Benchmark1DDustMix": {"kind": "dustMix", "properties": []},
    "Benchmark2DDustMix": {"kind": "dustMix", "properties": []},
    "TrustPolarizedMeanDustMix": {"kind": "dustMix", "properties": []},
    "MRNDustMix": {"kind": "dustMix",
                   "properties": ["graphitePops", "silicatePops"]},
    "WeingartnerDraineDustMix": {"kind": "dustMix",
                                 "properties": ["environment", "graphitePops",
                                                "silicatePops", "PAHPops"]},
    "ZubkoDustMix": {"kind": "dustMix",
                     "properties": ["graphitePops", "silicatePops",
                                    "PAHPops"]},
    "ThemisDustMix": {"kind": "dustMix",
                      "properties": ["hydrocarbonPops", "enstatitePops",
                                     "forsteritePops"]},
    "ConfigurableDustMix": {"kind": "dustMix", "properties": [],
                            "children": ["populations"]},
    "DustMixPopulation": {"kind": "dustMixPopulation",
                          "properties": ["subPops"],
                          "children": ["composition", "sizeDistribution"]},
    "DraineGraphiteGrainComposition": {"kind": "grainComposition",
                                       "properties": []},
    "DraineSilicateGrainComposition": {"kind": "grainComposition",
                                       "properties": []},
    "DraineNeutralPAHGrainComposition": {"kind": "grainComposition",
                                         "properties": []},
    "DraineIonizedPAHGrainComposition": {"kind": "grainComposition",
                                         "properties": []},
    "AmHydrocarbonGrainComposition": {"kind": "grainComposition",
                                      "properties": []},
    "EnstatiteGrainComposition": {"kind": "grainComposition",
                                  "properties": ["type"]},
    "ForsteriteGrainComposition": {"kind": "grainComposition",
                                   "properties": ["type"]},
    "TrustNeutralPAHGrainComposition": {"kind": "grainComposition",
                                        "properties": []},
    "DustEmGrainComposition": {"kind": "grainComposition",
                               "properties": ["grainType",
                                              "bulkMassDensity"]},
    "FileGrainComposition": {"kind": "grainComposition",
                             "properties": ["opticalFilename",
                                            "calorimetricFilename",
                                            "bulkMassDensity"]},
    "PowerLawGrainSizeDistribution": {"kind": "grainSizeDistribution",
                                      "properties": ["minSize", "maxSize",
                                                     "exponent", "factor"]},
    "LogNormalGrainSizeDistribution": {"kind": "grainSizeDistribution",
                                       "properties": ["minSize", "maxSize",
                                                      "centroid", "width",
                                                      "factor"]},
    "ModifiedLogNormalGrainSizeDistribution": {
        "kind": "grainSizeDistribution",
        "properties": ["minSize", "maxSize", "centroid", "width", "y0", "y1",
                       "factor"]},
    "ModifiedPowerLawGrainSizeDistribution": {
        "kind": "grainSizeDistribution",
        "properties": ["minSize", "maxSize", "alpha", "at", "gamma", "au",
                       "zeta", "eta", "factor"]},
    "SingleGrainSizeDistribution": {"kind": "grainSizeDistribution",
                                    "properties": ["size", "factor"]},
    "ZubkoGraphiteGrainSizeDistribution": {"kind": "grainSizeDistribution",
                                           "properties": ["factor"]},
    "ZubkoSilicateGrainSizeDistribution": {"kind": "grainSizeDistribution",
                                           "properties": ["factor"]},
    "ZubkoPAHGrainSizeDistribution": {"kind": "grainSizeDistribution",
                                      "properties": ["factor"]},
    # grids
    "CartesianDustGrid": {"kind": "dustGrid",
                          "properties": ["minX", "maxX", "minY", "maxY",
                                         "minZ", "maxZ"],
                          "children": ["meshX", "meshY", "meshZ"]},
    "Cylinder2DDustGrid": {"kind": "dustGrid",
                           "properties": ["maxR", "minZ", "maxZ"],
                           "children": ["meshR", "meshZ"]},
    "Sphere1DDustGrid": {"kind": "dustGrid", "properties": ["maxR"],
                         "children": ["meshR"]},
    "OctTreeDustGrid": {"kind": "dustGrid",
                        "properties": ["minX", "maxX", "minY", "maxY",
                                       "minZ", "maxZ", "minLevel", "maxLevel",
                                       "maxMassFraction", "sampleCount"]},
    "BinTreeDustGrid": {"kind": "dustGrid",
                        "properties": ["minX", "maxX", "minY", "maxY",
                                       "minZ", "maxZ", "minLevel", "maxLevel",
                                       "maxMassFraction", "sampleCount"]},
    "ParticleTreeDustGrid": {"kind": "dustGrid",
                             "properties": ["minX", "maxX", "minY", "maxY",
                                            "minZ", "maxZ", "extraLevels"]},
    "VoronoiDustGrid": {"kind": "dustGrid",
                        "properties": ["minX", "maxX", "minY", "maxY",
                                       "minZ", "maxZ", "numParticles",
                                       "distribution"]},
    "TwoPhaseDustGrid": {"kind": "dustGrid",
                         "properties": ["minX", "maxX", "minY", "maxY",
                                        "minZ", "maxZ", "fillingFactor",
                                        "contrast"],
                         "children": ["meshX", "meshY", "meshZ"]},
    "AdaptiveMeshDustGrid": {"kind": "dustGrid", "properties": []},
    "Sphere2DDustGrid": {"kind": "dustGrid", "properties": ["maxR"],
                         "children": ["meshR", "meshTheta"]},
    "LinMesh": {"kind": "mesh", "properties": ["numBins"]},
    "LogMesh": {"kind": "mesh", "properties": ["numBins",
                                               "centralBinFraction"]},
    "PowMesh": {"kind": "mesh", "properties": ["numBins", "ratio"]},
    "SymPowMesh": {"kind": "mesh", "properties": ["numBins", "ratio"]},
    "SIUnits": {"kind": "units", "properties": ["fluxOutputStyle"]},
    "StellarUnits": {"kind": "units", "properties": ["fluxOutputStyle"]},
    "ExtragalacticUnits": {"kind": "units", "properties": ["fluxOutputStyle"]},
    # AMR mesh-file elements and distributions (dispatched on node names
    # inside build_simulation, not via a builder function)
    "AdaptiveMeshAsciiFile": {"kind": "adaptiveMeshFile",
                              "properties": ["filename"]},
    "AdaptiveMeshAmrvacFile": {"kind": "adaptiveMeshFile",
                               "properties": ["filename", "levelOneX",
                                              "levelOneY", "levelOneZ"]},
    "AdaptiveMeshDustDistribution": {
        "kind": "dustDistribution",
        "properties": ["minX", "maxX", "minY", "maxY", "minZ", "maxZ",
                       "densityUnits"],
        "children": ["adaptiveMeshFile", "components"]},
    "SphericalAdaptiveMeshDustDistribution": {
        "kind": "dustDistribution",
        "properties": ["innerRadius", "outerRadius", "densityUnits"],
        "children": ["adaptiveMeshFile", "components"]},
    "CompDustDistribution": {"kind": "dustDistribution",
                             "children": ["components"]},
    "MeshDustComponent": {"kind": "meshDustComponent",
                          "properties": ["densityIndex", "densityFraction"],
                          "children": ["mix"]},
}


# ---------------------------------------------------------------------------
# registry derivation from the ski builders (single source of truth)
# ---------------------------------------------------------------------------
# ref: Discover/RegisterSimulationItems.cpp:201-449 registers 199 classes
# against the Qt meta-object system; here the ski.py builder functions ARE
# the registry, and static analysis of their dispatch branches derives the
# schema entries, so schema export / LaTeX / console cover everything the
# loader can build without a second hand-maintained list.

_BUILDER_KINDS = {
    "build_geometry": "geometry",
    "build_sed": "sed",
    "build_mix": "dustMix",
    "build_grain_composition": "grainComposition",
    "build_size_distribution": "grainSizeDistribution",
    "build_dust_normalization": "dustNormalization",
    "build_grid": "dustGrid",
    "build_instrument": "instrument",
    "build_wavelength_grid": "wavelengthGrid",
    "build_stellar_component": "stellarComp",
    "build_units": "units",
}

_ACCESSORS = ("scalar", "s", "vector", "boolean", "string", "enum")


def _derive_registry() -> dict[str, dict]:
    """Scan ski.py's builder dispatch for class names + property reads."""
    import ast
    import inspect

    from . import ski as _ski

    tree = ast.parse(inspect.getsource(_ski))
    out: dict[str, dict] = {}

    def class_names(test) -> list[str]:
        # `n == "X"` or `n in ("X", "Y")`
        if not (isinstance(test, ast.Compare) and len(test.ops) == 1):
            return []
        if not (isinstance(test.left, ast.Name) and test.left.id == "n"):
            return []
        cmp = test.comparators[0]
        if isinstance(test.ops[0], ast.Eq) and isinstance(cmp, ast.Constant) \
                and isinstance(cmp.value, str):
            return [cmp.value]
        if isinstance(test.ops[0], ast.In) and isinstance(cmp, ast.Tuple):
            return [e.value for e in cmp.elts
                    if isinstance(e, ast.Constant)
                    and isinstance(e.value, str)]
        return []

    def scan(body):
        props: list[str] = []
        children: list[str] = []
        for stmt in body:
            for nd in ast.walk(stmt):
                if isinstance(nd, ast.Call):
                    f = nd.func
                    name = (f.attr if isinstance(f, ast.Attribute)
                            else f.id if isinstance(f, ast.Name) else None)
                    if nd.args and isinstance(nd.args[0], ast.Constant) \
                            and isinstance(nd.args[0].value, str):
                        if name in _ACCESSORS:
                            props.append(nd.args[0].value)
                        elif name == "child":
                            children.append(nd.args[0].value)
                elif isinstance(nd, ast.Subscript) \
                        and isinstance(nd.value, ast.Attribute) \
                        and nd.value.attr == "attrs" \
                        and isinstance(nd.slice, ast.Constant) \
                        and isinstance(nd.slice.value, str):
                    props.append(nd.slice.value)

        def uniq(seq):
            seen = set()
            return [x for x in seq if not (x in seen or seen.add(x))]

        return uniq(props), uniq(children)

    for fn in tree.body:
        if not isinstance(fn, ast.FunctionDef) \
                or fn.name not in _BUILDER_KINDS:
            continue
        kind = _BUILDER_KINDS[fn.name]
        for nd in ast.walk(fn):
            if isinstance(nd, ast.If):
                for nm in class_names(nd.test):
                    props, children = scan(nd.body)
                    entry = {"kind": kind, "properties": props}
                    if children:
                        entry["children"] = children
                    out.setdefault(nm, entry)
    return out


def _merge_derived():
    """Fold the builder-derived entries into SUPPORTED (hand-curated
    entries keep their children lists; properties are unioned)."""
    derived = _derive_registry()
    for name, entry in derived.items():
        if name not in SUPPORTED:
            SUPPORTED[name] = entry
        else:
            cur = SUPPORTED[name]
            for p in entry["properties"]:
                if p not in cur.get("properties", []):
                    cur.setdefault("properties", []).append(p)
            if "children" not in cur and "children" in entry:
                cur["children"] = entry["children"]


_merge_derived()


# Hand-curated entries the AST derivation misses (dict-dispatch builders,
# container elements parsed positionally, and classes added after the
# derivation was written).  ref: Discover/RegisterSimulationItems.cpp
# :201-449 — every CONCRETE reference-registry class must be here or in
# NOT_APPLICABLE (tests/test_discover.py enforces this).
_SUPPLEMENT: dict[str, dict] = {
    "Random": {"kind": "random", "properties": ["seed"]},
    "InstrumentSystem": {"kind": "instrumentSystem", "properties": [],
                         "children": ["instruments"]},
    "InstrumentFrame": {"kind": "instrumentFrame",
                        "properties": ["pixelsX", "pixelsY", "fieldOfViewX",
                                       "fieldOfViewY"]},
    "DustComp": {"kind": "dustComp", "properties": [],
                 "children": ["geometry", "mix", "normalization"]},
    "OligoDustSystem": {"kind": "dustSystem",
                        "properties": ["writeConvergence", "writeDensity",
                                       "writeDepthMap", "writeQuality",
                                       "writeCellProperties",
                                       "writeCellsCrossed"],
                        "children": ["dustDistribution", "dustGrid"]},
    "PanDustSystem": {"kind": "dustSystem",
                      "properties": ["writeConvergence", "writeDensity",
                                     "writeDepthMap", "writeQuality",
                                     "writeCellProperties",
                                     "writeCellsCrossed", "writeEmissivity",
                                     "writeTemperature", "writeISRF",
                                     "selfAbsorption", "emissionBoost"],
                      "children": ["dustDistribution", "dustGrid",
                                   "dustEmissivity", "dustLib"]},
    "AllCellsDustLib": {"kind": "dustLib", "properties": []},
    "Dim1DustLib": {"kind": "dustLib", "properties": ["entries"]},
    "Dim2DustLib": {"kind": "dustLib",
                    "properties": ["pointsTemperature", "pointsWavelength"]},
    "GreyBodyDustEmissivity": {"kind": "dustEmissivity", "properties": []},
    "TransientDustEmissivity": {"kind": "dustEmissivity", "properties": []},
    "CubicSplineSmoothingKernel": {"kind": "smoothingKernel",
                                   "properties": []},
    "UniformSmoothingKernel": {"kind": "smoothingKernel", "properties": []},
    "BruzualCharlotSED": {"kind": "sed",
                          "properties": ["metallicity", "age"]},
    "MappingsSED": {"kind": "sed",
                    "properties": ["metallicity", "compactness", "pressure",
                                   "coveringFactor"]},
    "BruzualCharlotSEDFamily": {"kind": "sedFamily", "properties": []},
    "MappingsSEDFamily": {"kind": "sedFamily", "properties": []},
    "MieSilicateGrainComposition": {"kind": "grainComposition",
                                    "properties": []},
    "MinSilicateGrainComposition": {"kind": "grainComposition",
                                    "properties": []},
    "TrustGraphiteGrainComposition": {"kind": "grainComposition",
                                      "properties": []},
    "TrustSilicateGrainComposition": {"kind": "grainComposition",
                                      "properties": []},
    "PolarizedGraphiteGrainComposition": {"kind": "grainComposition",
                                          "properties": []},
    "PolarizedSilicateGrainComposition": {"kind": "grainComposition",
                                          "properties": []},
    "XDustCompNormalization": {"kind": "dustNormalization",
                               "properties": ["wavelength", "opticalDepth"]},
    "YDustCompNormalization": {"kind": "dustNormalization",
                               "properties": ["wavelength", "opticalDepth"]},
    "LuminosityStellarCompNormalization": {
        "kind": "stellarNormalization",
        "properties": ["band", "luminosity"]},
    "VoronoiMeshAsciiFile": {"kind": "voronoiMeshFile",
                             "properties": ["filename", "coordinateUnits"]},
    "AdaptiveMeshGeometry": {"kind": "geometry",
                             "properties": ["densityUnits"],
                             "children": ["adaptiveMeshFile"]},
}
for _n, _e in _SUPPLEMENT.items():
    if _n not in SUPPORTED:
        SUPPORTED[_n] = _e

# Reference-registry classes with no counterpart BY DESIGN: the
# reference's thread/process work-assigner plumbing is replaced by SPMD
# lockstep batches over the device mesh (parallel/mesh.py) — there is
# nothing to assign.  ref: ProcessAssigner.hpp and subclasses.
NOT_APPLICABLE: dict[str, str] = {
    "IdenticalAssigner": "SPMD re-design: no per-thread work assignment",
    "RandomAssigner": "SPMD re-design: no per-thread work assignment",
    "SequentialAssigner": "SPMD re-design: no per-thread work assignment",
    "StaggeredAssigner": "SPMD re-design: no per-thread work assignment",
}


# ---------------------------------------------------------------------------
# ski writing (ref: Discover/XmlHierarchyWriter)
# ---------------------------------------------------------------------------

def node_to_element(node: Node) -> ET.Element:
    elem = ET.Element(node.name, dict(node.attrs))
    for prop, children in node.children.items():
        if prop == "_items":
            for child in children:
                elem.append(node_to_element(child))
            continue
        wrapper = ET.SubElement(elem, prop)
        kinds = {SUPPORTED.get(c.name, {}).get("kind", "Item")
                 for c in children}
        wrapper.set("type", kinds.pop() if len(kinds) == 1 else "Item")
        for child in children:
            wrapper.append(node_to_element(child))
    return elem


def write_ski(node: Node, path: str) -> None:
    """Serialize a Node tree back to a ski file (round-trips parse_ski)."""
    root = ET.Element("skirt-simulation-hierarchy",
                      {"type": "MonteCarloSimulation", "format": "6.1"})
    root.append(node_to_element(node))
    tree = ET.ElementTree(root)
    ET.indent(tree)
    with open(path, "wb") as f:
        f.write(b'<?xml version="1.0" encoding="UTF-8"?>\n')
        f.write(b"<!--SKIRT radiative transfer simulations-->\n")
        tree.write(f, encoding="utf-8", xml_declaration=False)


# ---------------------------------------------------------------------------
# LaTeX report (ref: Discover/LatexHierarchyWriter)
# ---------------------------------------------------------------------------

def latex_report(node: Node, path: str, title: str = "Simulation parameters"):
    out = io.StringIO()
    out.write("\\documentclass{article}\n\\usepackage[margin=2cm]{geometry}\n"
              "\\begin{document}\n")
    out.write(f"\\section*{{{title}}}\n\\begin{{itemize}}\n")

    def emit(n: Node, depth: int):
        indent = "  " * depth
        props = ", ".join(f"{k}={v}" for k, v in n.attrs.items())
        name = n.name.replace("_", "\\_")
        out.write(f"{indent}\\item \\textbf{{{name}}}"
                  + (f": {props}" if props else "") + "\n")
        kids = [c for lst in n.children.values() for c in lst]
        if kids:
            out.write(f"{indent}\\begin{{itemize}}\n")
            for c in kids:
                emit(c, depth + 1)
            out.write(f"{indent}\\end{{itemize}}\n")

    emit(node, 1)
    out.write("\\end{itemize}\n\\end{document}\n")
    with open(path, "w") as f:
        f.write(out.getvalue())


# ---------------------------------------------------------------------------
# schema export (ref: Discover/SmileSchemaWriter, `skirt -x`)
# ---------------------------------------------------------------------------

def write_schema(path: str) -> None:
    """Export the supported component schema as XML."""
    root = ET.Element("skirt-tpu-schema", {"format": "1"})
    for name, meta in sorted(SUPPORTED.items()):
        e = ET.SubElement(root, "Type",
                          {"name": name, "kind": meta.get("kind", "")})
        for p in meta.get("properties", []):
            ET.SubElement(e, "Property", {"name": p})
        for c in meta.get("children", []):
            ET.SubElement(e, "CompoundProperty", {"name": c})
    tree = ET.ElementTree(root)
    ET.indent(tree)
    tree.write(path, encoding="utf-8", xml_declaration=True)
