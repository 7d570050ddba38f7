"""3D Gaussian parameter state + static-shape densification."""
from .densify import DensifyConfig, densify_step, reset_opt_slots  # noqa: F401
from .model import GaussianParams, GaussianState, init_state  # noqa: F401
