"""Compute kernels: rasterization (jnp + Pallas), mesh/ray ops, SH.

Note: the ``rasterize`` *submodule* keeps its name — import the one-call
rasterize function from ``ops.rasterize`` directly (re-exporting it here
would shadow the submodule for ``from ..ops import rasterize`` users).
"""
from .rasterize import (  # noqa: F401
    Gaussians2D,
    RasterOutput,
    bin_gaussians,
    covariance3d,
    project_gaussians,
    rasterize_projected,
)
