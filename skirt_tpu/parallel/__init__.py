"""Multi-device / multi-host parallelism."""

from .mesh import packet_mesh, make_sharded_lifecycle

__all__ = ["packet_mesh", "make_sharded_lifecycle"]
