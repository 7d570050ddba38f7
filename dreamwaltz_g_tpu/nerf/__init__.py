"""Instant-NGP NeRF: networks, renderer, encoders, isosurfaces, export."""
from .network import NeRFModel, NeRFParams, build_nerf  # noqa: F401
from .renderer import OccupancyGrid, init_occupancy, render_rays  # noqa: F401
