"""dreamwaltz_g_tpu — a TPU-native (JAX/XLA/Pallas) text-to-3D-avatar framework.

Re-implements the capabilities of DreamWaltz-G (TPAMI 2025): two-stage
text-to-avatar training (Instant-NGP NeRF SDS -> animatable hybrid 3D Gaussian
Splatting avatar rigged to SMPL-X), plus animation / reenactment inference.

Design stance (see SURVEY.md §7): functional pipeline with explicit pytree
state, jit/pjit-ed step functions, fixed-capacity padded Gaussian buffers with
alive-masks, and Pallas/MXU kernels for the hot ops (tile rasterization,
hash-grid encoding, raymarching).
"""

__version__ = "0.1.0"
