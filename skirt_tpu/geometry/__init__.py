"""Analytic source/dust geometries.

ref: the reference's Geometry family (SKIRTcore/Geometry.hpp:26-88 and the
61-file catalog registered at Discover/RegisterSimulationItems.cpp:247-298).
Geometries are normalized to unit total mass; `density` is a jit-friendly
function of position (SI meters), and positions are sampled with exact
inverse-CDF tables instead of the reference's rejection loops (SPMD-friendly,
statistically identical).
"""

from .base import Geometry, SpheGeometry, AxGeometry, build_inverse_cdf
from .spherical import (
    PlummerGeometry,
    GammaGeometry,
    EinastoGeometry,
    GaussianGeometry,
    ShellGeometry,
    SersicGeometry,
    PseudoSersicGeometry,
)
from .axial import (
    ExpDiskGeometry,
    BrokenExpDiskGeometry,
    RingGeometry,
    TorusGeometry,
    ConicalShellGeometry,
    TTauriDiskGeometry,
    MGEGeometry,
)
from .general import PointGeometry, BoxGeometry, LaserGeometry, UniformSphereGeometry
from .foam import (FoamAxGeometry, FoamGeometry,
                   FoamGeometryDecorator, ReadFitsGeometry)
from .special import (NetzerAccretionDiskGeometry, SpheBackgroundGeometry,
                      CubBackgroundGeometry, StellarSurfaceGeometry,
                      SolarPatchGeometry)
from .benchmarks import (Trust1Geometry, Trust2Geometry, Trust6Geometry,
                         Trust7aGeometry, Trust7bGeometry)
from .decorators import (
    OffsetGeometryDecorator,
    RotateGeometryDecorator,
    SpheroidalGeometryDecorator,
    TriaxialGeometryDecorator,
    SphericalCavityDecorator,
    CylindricalCavityDecorator,
    CropGeometryDecorator,
    CombineGeometryDecorator,
    ClumpyGeometryDecorator,
    SpiralStructureDecorator,
)

__all__ = [
    "Geometry", "SpheGeometry", "AxGeometry", "build_inverse_cdf",
    "PlummerGeometry", "GammaGeometry", "EinastoGeometry", "GaussianGeometry",
    "ShellGeometry", "SersicGeometry", "PseudoSersicGeometry",
    "ExpDiskGeometry", "BrokenExpDiskGeometry", "RingGeometry", "TorusGeometry",
    "ConicalShellGeometry", "TTauriDiskGeometry", "MGEGeometry",
    "PointGeometry", "BoxGeometry", "LaserGeometry", "UniformSphereGeometry",
    "FoamGeometry", "FoamGeometryDecorator", "FoamAxGeometry",
    "ReadFitsGeometry", "NetzerAccretionDiskGeometry",
    "SpheBackgroundGeometry", "CubBackgroundGeometry",
    "StellarSurfaceGeometry", "SolarPatchGeometry",
    "Trust1Geometry", "Trust2Geometry", "Trust6Geometry", "Trust7aGeometry",
    "Trust7bGeometry",
    "OffsetGeometryDecorator", "RotateGeometryDecorator",
    "SpheroidalGeometryDecorator", "TriaxialGeometryDecorator",
    "SphericalCavityDecorator", "CylindricalCavityDecorator",
    "CropGeometryDecorator", "CombineGeometryDecorator",
    "ClumpyGeometryDecorator", "SpiralStructureDecorator",
]
