"""Device mesh + data/tensor-parallel training over ICI."""
from .mesh import make_mesh, make_mesh_2d, replicate, shard_batch  # noqa: F401
from .tp import guidance_shardings, shard_guidance_params  # noqa: F401
