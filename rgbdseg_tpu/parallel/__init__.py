"""Device-mesh parallelism helpers."""

from .mesh import make_mesh, data_sharding, replicated  # noqa: F401
