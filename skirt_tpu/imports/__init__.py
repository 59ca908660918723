"""Imported (snapshot-based) distributions: SPH particles, AMR meshes,
Voronoi site files."""

from .sph import SPHParticleGeometry, load_sph_particles
from .amr import (AdaptiveMeshGeometry, SphericalAdaptiveMeshGeometry,
                  load_amr_amrvac, load_amr_ascii)
from .voronoi import VoronoiMeshGeometry, load_voronoi_mesh

__all__ = ["SPHParticleGeometry", "load_sph_particles",
           "AdaptiveMeshGeometry", "SphericalAdaptiveMeshGeometry",
           "load_amr_amrvac", "load_amr_ascii",
           "VoronoiMeshGeometry", "load_voronoi_mesh"]
