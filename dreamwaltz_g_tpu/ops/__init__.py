"""Compute kernels: rasterization (jnp + Pallas), mesh/ray ops, SH."""
from .rasterize import (  # noqa: F401
    Gaussians2D,
    RasterOutput,
    bin_gaussians,
    covariance3d,
    project_gaussians,
    rasterize,
    rasterize_projected,
)
