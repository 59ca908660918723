"""TPU kernels for the framework's hot scatter/gather-shaped ops."""

from .binned import binned_add, drop_add  # noqa: F401
