"""Tensor-parallel sharding for the frozen guidance stack (UNet/ControlNet).

The reference runs its diffusers UNet replicated on one GPU
(core/guidance/basic.py:116-210). On a TPU pod slice the guidance forward
is ~40% of the SDS step and its weights are the HBM heavyweight (SDXL bf16
~5 GB + ControlNet), so the TPU build adds a second mesh axis: Megatron-
style tensor parallelism over the transformer blocks, expressed purely as
GSPMD sharding annotations — no layer rewrites, no hand-written
collectives. XLA partitions the attention/FF matmuls over the ``model``
axis and inserts the all-reduces on the row-sharded projections.

Partition rules (classic Megatron, applied by param-path suffix):

- ``to_q/to_k/to_v.kernel`` (in, heads*head_dim)  -> P(None, 'model')
  (column-parallel: each chip computes its head slice)
- ``to_out_0.kernel``        (heads*head_dim, out) -> P('model', None)
  (row-parallel: partial sums all-reduced by XLA; bias replicated)
- ``ff.net_0_proj.kernel``   (dim, 2*inner)        -> P(None, 'model')
  (+ bias sharded alike)
- ``ff.net_2.kernel``        (inner, dim)          -> P('model', None)
- everything else (convs, norms, time embeds, VAE) replicated.

Constraints / caveats:

- 'model' axis size should divide the head count of every attention block
  so the (B, N, inner) -> (B, N, H, D) reshape keeps the sharding
  (SD1.5: 8 heads everywhere -> tp in {2,4,8}; SDXL: 10/20 heads on the
  attention blocks -> tp=2). Off-divisor sizes still run (GSPMD
  reshards) — they're just slower.
- The GEGLU split in ``FeedForwardGEGLU`` halves the sharded 2*inner
  column axis; GSPMD inserts one reshard there. Correctness is
  unaffected (equivalence is test-asserted, tests/test_tp.py).
- The VAE stays replicated: it is conv-dominated, its single attention
  block is tiny, and its encode runs once per step.

Use ``make_mesh_2d(dp, tp)`` (parallel/mesh.py) for the mesh and pass
``guidance_shardings(gparams, mesh)`` as the guidance in_sharding of a
DP step builder (parallel/dp.py ``gparams_shardings=``).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# param-path suffixes (parent module name, leaf name) -> spec builder
_COL_PARALLEL = {"to_q", "to_k", "to_v"}


def _tp_spec(path, leaf, axis: str) -> P:
    """Partition spec for one guidance param leaf by its tree path."""
    names = [getattr(k, "key", None) for k in path]
    if len(names) < 2 or getattr(leaf, "ndim", 0) == 0:
        return P()
    parent, name = names[-2], names[-1]
    if parent in _COL_PARALLEL and name == "kernel":
        return P(None, axis)
    if parent == "to_out_0" and name == "kernel":
        return P(axis, None)
    if parent == "net_0_proj":
        return P(None, axis) if name == "kernel" else P(axis)
    if parent == "net_2" and name == "kernel":
        return P(axis, None)
    return P()


def guidance_pspecs(gparams, axis: str = MODEL_AXIS):
    """PartitionSpec pytree matching ``GuidanceParams``.

    UNet and ControlNet subtrees get the Megatron rules; the VAE subtree is
    replicated (see module docstring).
    """

    def specs(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: _tp_spec(p, x, axis), tree)

    rep = jax.tree_util.tree_map(lambda x: P(), gparams.vae)
    return gparams._replace(
        unet=specs(gparams.unet),
        vae=rep,
        controlnet=None if gparams.controlnet is None
        else specs(gparams.controlnet),
    )


def guidance_shardings(gparams, mesh: Mesh, axis: str = MODEL_AXIS):
    """NamedSharding pytree for jit ``in_shardings`` / ``device_put``."""
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        guidance_pspecs(gparams, axis),
        is_leaf=lambda x: isinstance(x, P))


def shard_guidance_params(gparams, mesh: Mesh, axis: str = MODEL_AXIS):
    """Place guidance weights onto the mesh with the TP layout."""
    return jax.tree_util.tree_map(
        jax.device_put, gparams, guidance_shardings(gparams, mesh, axis))
