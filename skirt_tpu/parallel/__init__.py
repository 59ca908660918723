"""Multi-device / multi-host parallelism."""

from .mesh import (packet_mesh, make_sharded_lifecycle,
                   make_sharded_lifecycle_scattered)
from .slab import make_slab_lifecycle
from .multihost import initialize_distributed, pod_mesh

__all__ = ["packet_mesh", "make_sharded_lifecycle",
           "make_sharded_lifecycle_scattered", "make_slab_lifecycle",
           "initialize_distributed", "pod_mesh"]
