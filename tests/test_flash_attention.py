"""Flash-attention parity tests.

The SD UNet's long self-attention layers (4096 tokens at 64² latents) run
on the fused Pallas TPU flash-attention kernel instead of materializing the
(B, H, N, N) attention matrix in HBM (reference consumes attention through
diffusers/torch: core/guidance/basic.py:116-154 — the memory layout problem
it solves with xformers is solved here with the TPU kernel). These tests
run the kernel under the Mosaic TPU interpreter on CPU and assert numeric
parity (fwd + grads) with the einsum path, plus the gating policy.
"""
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from dreamwaltz_g_tpu.guidance import layers


def _einsum_attention(q, k, v):
    d = q.shape[-1]
    a = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d)
    a = jax.nn.softmax(a.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", a, v)


def test_flash_matches_einsum_fwd_and_grad():
    key = jax.random.PRNGKey(0)
    B, N, H, D = 1, 256, 2, 40  # D=40 exercises the lane-padding path
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, N, H, D),
                                 jnp.float32) for i in range(3))

    def loss_flash(q, k, v):
        return (layers.flash_self_attention(q, k, v) ** 2).sum()

    def loss_ref(q, k, v):
        return (_einsum_attention(q, k, v) ** 2).sum()

    with pltpu.force_tpu_interpret_mode():
        out = layers.flash_self_attention(q, k, v)
        grads = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ref = _einsum_attention(q, k, v)
    assert jnp.abs(out - ref).max() < 1e-5
    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, rg in zip(grads, ref_grads):
        scale = jnp.abs(rg).max()
        assert jnp.abs(g - rg).max() < 1e-4 * scale


def test_attention_module_flash_parity():
    """The full Attention module: flash vs einsum paths agree."""
    key = jax.random.PRNGKey(1)
    B, N, H, D = 1, 1024, 1, 40  # N=1024 crosses the FLASH_MIN_SEQ gate
    x = jax.random.normal(key, (B, N, H * D), jnp.float32)
    mod = layers.Attention(heads=H, head_dim=D)
    params = mod.init(jax.random.PRNGKey(2), x)

    old = layers.FLASH_ATTENTION
    try:
        layers.FLASH_ATTENTION = "off"
        ref = mod.apply(params, x)
        layers.FLASH_ATTENTION = "on"
        with pltpu.force_tpu_interpret_mode():
            out = mod.apply(params, x)
    finally:
        layers.FLASH_ATTENTION = old
    assert jnp.abs(out - ref).max() < 1e-4 * float(jnp.abs(ref).max())


@pytest.mark.slow  # 16 s; DP path also exercised by the dryrun
def test_flash_shard_map_dp_matches_einsum():
    """FLASH_SHARD (the DP mesh published by the trainer) wraps the kernel
    in shard_map with batch rows split over 'data'; values and gradients
    must match the einsum reference exactly as in the unsharded case."""
    from dreamwaltz_g_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8)
    key = jax.random.PRNGKey(3)
    # minimal shapes: the interpreted backward kernels run once per shard
    # (serially on CPU), so keep per-shard work tiny
    B, N, H, D = 8, 128, 1, 8
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, N, H, D),
                                 jnp.float32) for i in range(3))

    def loss_flash(q, k, v):
        return (layers.flash_self_attention(q, k, v) ** 2).sum()

    old = layers.FLASH_SHARD
    try:
        layers.FLASH_SHARD = (mesh, "data", None)
        with pltpu.force_tpu_interpret_mode():
            out = layers.flash_self_attention(q, k, v)
            grads = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    finally:
        layers.FLASH_SHARD = old
    ref = _einsum_attention(q, k, v)
    assert jnp.abs(out - ref).max() < 1e-5
    ref_grads = jax.grad(
        lambda q, k, v: (_einsum_attention(q, k, v) ** 2).sum(),
        argnums=(0, 1, 2))(q, k, v)
    for g, rg in zip(grads, ref_grads):
        assert jnp.abs(g - rg).max() < 1e-4 * float(jnp.abs(rg).max())


def test_flash_shard_map_tp_head_split():
    """On a (data, model) mesh the heads split over 'model' (Megatron
    sharding of the attention) and batch over 'data'."""
    from dreamwaltz_g_tpu.parallel.mesh import make_mesh_2d

    mesh = make_mesh_2d(dp=2, tp=4)
    key = jax.random.PRNGKey(4)
    B, N, H, D = 2, 128, 4, 8
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, N, H, D),
                                 jnp.float32) for i in range(3))
    old = layers.FLASH_SHARD
    try:
        layers.FLASH_SHARD = (mesh, "data", "model")
        with pltpu.force_tpu_interpret_mode():
            out = layers.flash_self_attention(q, k, v)
    finally:
        layers.FLASH_SHARD = old
    ref = _einsum_attention(q, k, v)
    assert jnp.abs(out - ref).max() < 1e-5


def test_flash_shard_map_inside_gspmd_jit():
    """The shard_map wrapper composes with a jit whose inputs carry GSPMD
    shardings — the exact context of the DP train steps, where the bare
    Pallas call has no partitioning rule."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dreamwaltz_g_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8)
    key = jax.random.PRNGKey(5)
    B, N, H, D = 8, 128, 1, 8
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, N, H, D),
                                 jnp.float32) for i in range(3))
    sh = NamedSharding(mesh, P("data"))
    old = layers.FLASH_SHARD
    try:
        layers.FLASH_SHARD = (mesh, "data", None)
        f = jax.jit(layers.flash_self_attention,
                    in_shardings=(sh, sh, sh))
        with pltpu.force_tpu_interpret_mode():
            out = f(q, k, v)
    finally:
        layers.FLASH_SHARD = old
    ref = _einsum_attention(q, k, v)
    assert jnp.abs(out - ref).max() < 1e-5


def test_flash_shard_map_nondividing_falls_back_replicated():
    """Batch/head extents that don't divide their mesh axes degrade to the
    replicated spec for that dimension (correctness preserved)."""
    from dreamwaltz_g_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8)
    key = jax.random.PRNGKey(6)
    B, N, H, D = 3, 128, 1, 8  # 3 % 8 != 0
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (B, N, H, D),
                                 jnp.float32) for i in range(3))
    old = layers.FLASH_SHARD
    try:
        layers.FLASH_SHARD = (mesh, "data", None)
        with pltpu.force_tpu_interpret_mode():
            out = layers.flash_self_attention(q, k, v)
    finally:
        layers.FLASH_SHARD = old
    ref = _einsum_attention(q, k, v)
    assert jnp.abs(out - ref).max() < 1e-5


@pytest.mark.parametrize("nq,nk,d,expect", [
    (4096, 4096, 40, True),    # 64² self-attention
    (1024, 1024, 80, True),    # 32² self-attention
    (4096, 77, 40, False),     # cross-attention to text tokens
    (256, 256, 160, False),    # short layer stays einsum
    (4096, 4096, 160, False),  # head_dim >128 non-multiple: kernel limit
    (4096, 4096, 512, True),   # VAE mid-block single-head
])
def test_flash_gating(nq, nk, d, expect):
    old = layers.FLASH_ATTENTION
    try:
        layers.FLASH_ATTENTION = "on"
        assert layers._flash_enabled(nq, nk, d) is expect
        layers.FLASH_ATTENTION = "off"
        assert layers._flash_enabled(nq, nk, d) is False
    finally:
        layers.FLASH_ATTENTION = old
