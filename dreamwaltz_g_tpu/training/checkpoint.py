"""Checkpoint save/load with rotating retention.

(reference: core/trainer.py:172-278 _Checkpointer — ``step_{:06d}.pth``
files, ``max_keep_ckpts`` rotation, latest-checkpoint glob discovery,
model-only vs full (optimizer+step) loads, and the shape-adaptive
``reset_by_state_dict`` — unnecessary here because TPU buffers are
fixed-capacity with alive masks, so shapes never change.)

Uses orbax-checkpoint's PyTreeCheckpointer: any pytree of jnp/np arrays is
written as a directory ``step_{:08d}``.
"""
from __future__ import annotations

import re
import shutil
from pathlib import Path
from typing import Any, List, Optional

import jax
import numpy as np
from orbax import checkpoint as ocp

_STEP_RE = re.compile(r"step_(\d+)$")


class Checkpointer:
    def __init__(self, ckpt_dir, max_keep: int = 1):
        self.dir = Path(ckpt_dir).absolute()
        self.dir.mkdir(parents=True, exist_ok=True)
        self.max_keep = max_keep
        self._ckpt = ocp.PyTreeCheckpointer()

    # -- discovery -------------------------------------------------------

    def all_steps(self) -> List[int]:
        steps = []
        for p in self.dir.iterdir():
            m = _STEP_RE.search(p.name)
            if m and p.is_dir():
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def _path(self, step: int) -> Path:
        return self.dir / f"step_{step:08d}"

    # -- io ----------------------------------------------------------------

    def save(self, step: int, state: Any) -> Path:
        """Write the state pytree; rotate old checkpoints
        (reference: save_checkpoint + rotation, trainer.py:238-257)."""
        path = self._path(step)
        if path.exists():
            shutil.rmtree(path)
        state = jax.tree_util.tree_map(np.asarray, state)
        self._ckpt.save(path, state)
        if self.max_keep > 0:
            for s in self.all_steps()[: -self.max_keep]:
                shutil.rmtree(self._path(s), ignore_errors=True)
        return path

    def restore(self, step: Optional[int] = None,
                target: Optional[Any] = None) -> Any:
        """Load a checkpoint (latest when ``step`` is None). ``target`` gives
        the pytree structure/dtypes to restore into."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        restored = self._ckpt.restore(self._path(step), item=target)
        return restored, step


def save_pytree(path, tree) -> None:
    """One-shot pytree save (stage handoffs: NeRF -> 3DGS init)."""
    path = Path(path).absolute()
    if path.exists():
        shutil.rmtree(path)
    ocp.PyTreeCheckpointer().save(path, jax.tree_util.tree_map(np.asarray, tree))


def load_pytree(path, target=None):
    return ocp.PyTreeCheckpointer().restore(Path(path).absolute(), item=target)
