"""Imported (snapshot-based) distributions: SPH particles, AMR meshes,
Voronoi site files."""

from .sph import SPHParticleGeometry, load_sph_particles
from .amr import AdaptiveMeshGeometry, load_amr_ascii
from .voronoi import VoronoiMeshGeometry, load_voronoi_mesh

__all__ = ["SPHParticleGeometry", "load_sph_particles",
           "AdaptiveMeshGeometry", "load_amr_ascii",
           "VoronoiMeshGeometry", "load_voronoi_mesh"]
