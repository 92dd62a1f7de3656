"""int8-everything opt-in mode (int8 global-k flash + int8 convs): e2e
drift bound at toy scale. The production quality gate is
`replay --all --score --int8` once real checkpoints exist (PERF_NOTES
'Round-3 levers' item 5) — this test only guards that the mode runs
end-to-end and stays in a sane neighborhood of the exact path."""

import numpy as np
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.slow  # extra denoise-graph compiles

import jax

from blobctrl_tpu.apps import flagship
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.nn import attention
from blobctrl_tpu.ops import conv3x3 as conv_mod
from blobctrl_tpu.pipeline import BlobNetPipeline


def test_matmul_i8_matches_int_reference():
    """layers.matmul_i8 == explicit numpy int8 math (static act scale,
    per-out-channel weight scales, int32 accumulation)."""
    from blobctrl_tpu.nn import layers
    from blobctrl_tpu.ops import conv3x3 as conv_mod
    import jax.numpy as jnp
    rng = np.random.RandomState(3)
    x = rng.randn(2, 5, 16).astype(np.float32) * 2.0
    w = rng.randn(16, 24).astype(np.float32) * 0.2
    b = rng.randn(24).astype(np.float32)
    wq, ws = conv_mod._quantize_kernel_i8(jnp.asarray(w))
    amax = layers._LINEAR_INT8_AMAX
    xs = amax / 127.0
    xq = np.clip(np.round(x / xs), -127, 127)
    ref = (xq @ np.asarray(wq, np.int64)) * (xs * np.asarray(ws)) + b
    got = layers.matmul_i8(jnp.asarray(x), wq, ws, jnp.asarray(b),
                           jnp.float32)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_linear_and_conv1x1_int8_dispatch():
    """linear() and conv2d() route to the int8 path exactly when the flag is
    on AND pre-quantized leaves exist; outputs stay near the bf16 path."""
    from blobctrl_tpu.nn import layers
    from blobctrl_tpu.ops import conv3x3 as conv_mod
    import jax.numpy as jnp
    rng = np.random.RandomState(4)
    lin = {"kernel": jnp.asarray(rng.randn(32, 16), jnp.float32) * 0.2,
           "bias": jnp.asarray(rng.randn(16), jnp.float32)}
    c11 = {"kernel": jnp.asarray(rng.randn(1, 1, 32, 16), jnp.float32) * 0.2,
           "bias": jnp.asarray(rng.randn(16), jnp.float32)}
    tree = {"blk": {"to_q": lin, "proj_out": c11,
                    "other": {"kernel": lin["kernel"]}}}
    q = conv_mod.quantize_conv_tree(tree)["blk"]
    assert "kernel_q" in q["to_q"] and q["to_q"]["kernel_q"].shape == (32, 16)
    assert "kernel_q" in q["proj_out"]
    assert q["proj_out"]["w_scale"].shape == (16,)
    assert "kernel_q" not in q["other"]  # name filter

    x = jnp.asarray(rng.randn(2, 7, 32), jnp.float32)
    xi = jnp.asarray(rng.randn(1, 4, 6, 32), jnp.float32)
    exact_l = np.asarray(layers.linear(lin, x))
    exact_c = np.asarray(layers.conv2d(c11, xi))
    layers.set_linear_int8(True)
    try:
        got_l = np.asarray(layers.linear(q["to_q"], x))
        got_c = np.asarray(layers.conv2d(q["proj_out"], xi))
        # without kernel_q the exact path still runs under the flag
        np.testing.assert_array_equal(np.asarray(layers.linear(lin, x)),
                                      exact_l)
    finally:
        layers.set_linear_int8(False)
    for got, exact in ((got_l, exact_l), (got_c, exact_c)):
        rel = np.abs(got - exact).max() / np.abs(exact).max()
        assert rel < 0.03, rel
    # flag off -> exact path even with kernel_q present
    np.testing.assert_array_equal(np.asarray(layers.linear(q["to_q"], x)),
                                  exact_l)


def test_transformer_block_int8_linears_bounded_drift():
    """A full transformer block (fused QKV concat + folded out-proj einsum +
    GEGLU FF + 77-token cross-attention) under int8 linears stays close to
    the exact path."""
    import jax.numpy as jnp
    from blobctrl_tpu.nn import attention as attn_mod
    from blobctrl_tpu.nn import layers
    from blobctrl_tpu.ops import conv3x3 as conv_mod
    key = jax.random.PRNGKey(5)
    p = attn_mod.init_transformer_block(key, 64, heads=4, cross_dim=48)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 33, 64), jnp.float32)
    ctx = jnp.asarray(rng.randn(2, 7, 48), jnp.float32)
    exact = np.asarray(attn_mod.transformer_block(p, x, 4, context=ctx))
    pq = conv_mod.quantize_conv_tree(p)
    layers.set_linear_int8(True)
    try:
        got = np.asarray(attn_mod.transformer_block(pq, x, 4, context=ctx))
    finally:
        layers.set_linear_int8(False)
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert np.isfinite(got).all() and rel < 0.08, rel


def test_int8_everything_bounded_drift():
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))

    rng = np.random.RandomState(0)
    kw = dict(
        fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        gs_score=np.stack([np.ones((1, 8, 8)),
                           rng.rand(1, 8, 8)], -1).astype(np.float32),
        height=64, width=64, num_inference_steps=4, guidance_scale=7.5,
        prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        seed=1, fg_dino_feats=rng.randn(1, 16).astype(np.float32))

    exact = pipe(**kw).images
    # on CPU the flash kernel does not engage, so only the conv int8 path is
    # exercised e2e here (via the interpret conv backend); the flash int8
    # kernel has its own parity tests
    from blobctrl_tpu.nn import layers
    from blobctrl_tpu.nn import resnet as resnet_mod
    resnet_mod.set_conv_backend("interpret")
    conv_mod.set_conv_int8(True)
    layers.set_linear_int8(True)
    pipe._denoise_cache.clear()
    try:
        got = pipe(**kw).images
    finally:
        conv_mod.set_conv_int8(False)
        layers.set_linear_int8(False)
        resnet_mod.set_conv_backend("auto")
        pipe._denoise_cache.clear()

    assert got.shape == exact.shape and np.isfinite(got).all()
    # a 4-step random-weight diffusion amplifies perturbations chaotically;
    # require same-ballpark images, not parity (the real gate is PSNR on
    # checkpoints)
    assert np.abs(got - exact).mean() < 0.25, np.abs(got - exact).mean()


def test_int8_stacks_with_encoder_cache():
    """The two opt-in fast modes compose: int8 convs + Faster-Diffusion
    encoder caching in one edit (the fastest validated-config path,
    PERF_NOTES). Runs finite at tiny scale through the full pipeline."""
    key = jax.random.PRNGKey(1)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))
    rng = np.random.RandomState(1)
    kw = dict(
        fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        gs_score=np.stack([np.ones((1, 8, 8)),
                           rng.rand(1, 8, 8)], -1).astype(np.float32),
        height=64, width=64, num_inference_steps=4, guidance_scale=7.5,
        prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        seed=1, fg_dino_feats=rng.randn(1, 16).astype(np.float32))
    from blobctrl_tpu.nn import resnet as resnet_mod
    resnet_mod.set_conv_backend("interpret")
    conv_mod.set_conv_int8(True)
    try:
        got = pipe(encoder_cache_interval=2, **kw).images
    finally:
        conv_mod.set_conv_int8(False)
        resnet_mod.set_conv_backend("auto")
    assert got.shape == (1, 64, 64, 3) and np.isfinite(got).all()


def test_int8_stacks_with_cfg_interval():
    """int8 convs + guidance-interval CFG compose (the two modes are
    orthogonal: kernel routing vs loop structure). encoder-cache + cfg
    interval is the one disallowed pair (tests/test_cfg_interval.py)."""
    key = jax.random.PRNGKey(2)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))
    rng = np.random.RandomState(2)
    kw = dict(
        fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        gs_score=np.stack([np.ones((1, 8, 8)),
                           rng.rand(1, 8, 8)], -1).astype(np.float32),
        height=64, width=64, num_inference_steps=4, guidance_scale=7.5,
        prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        seed=1, fg_dino_feats=rng.randn(1, 16).astype(np.float32))
    from blobctrl_tpu.nn import resnet as resnet_mod
    resnet_mod.set_conv_backend("interpret")
    conv_mod.set_conv_int8(True)
    try:
        got = pipe(cfg_guidance_start=0.25, cfg_guidance_end=0.75,
                   **kw).images
    finally:
        conv_mod.set_conv_int8(False)
        resnet_mod.set_conv_backend("auto")
    assert got.shape == (1, 64, 64, 3) and np.isfinite(got).all()
