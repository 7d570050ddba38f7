"""Trainers, optimizers, losses, checkpointing."""
from .trainer import Trainer, resolve_ckpt_path  # noqa: F401
