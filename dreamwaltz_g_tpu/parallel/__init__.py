"""Device mesh + data-parallel training over ICI."""
from .mesh import make_mesh, replicate, shard_batch  # noqa: F401
