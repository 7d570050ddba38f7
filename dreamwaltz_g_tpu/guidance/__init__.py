"""Frozen 2D diffusion guidance: SD1.5/SDXL + ControlNet + SDS."""
from .sds import GuidanceParams, ScoreDistillation  # noqa: F401
from .time_prior import DiffusionSchedule, TimePrioritizedScheduler, make_schedule  # noqa: F401
