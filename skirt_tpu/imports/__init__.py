"""Imported (snapshot-based) distributions: SPH particles, AMR meshes,
Voronoi site files."""

from .sph import SPHParticleGeometry, load_sph_particles
from .amr import AdaptiveMeshGeometry, load_amr_ascii

__all__ = ["SPHParticleGeometry", "load_sph_particles",
           "AdaptiveMeshGeometry", "load_amr_ascii"]
