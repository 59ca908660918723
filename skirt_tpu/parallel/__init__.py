"""Multi-device / multi-host parallelism."""

from .mesh import (packet_mesh, make_sharded_lifecycle,
                   make_sharded_lifecycle_scattered)

__all__ = ["packet_mesh", "make_sharded_lifecycle",
           "make_sharded_lifecycle_scattered"]
