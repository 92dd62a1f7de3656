"""Robustness: non-default resolutions, remat equivalence, batch semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.apps import flagship
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.pipeline import BlobNetPipeline


@pytest.fixture(scope="module")
def tiny():
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    return dict(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))


def _run(tiny, height, width, n_prompts=1, nipp=1, steps=2):
    rng = np.random.RandomState(0)
    pipe = BlobNetPipeline(**tiny)
    fg = rng.randint(0, 255, (height, width, 3)).astype(np.uint8)
    bg = rng.randint(0, 255, (height, width, 3)).astype(np.uint8)
    lh, lw = height // 8, width // 8
    gs = np.stack([np.ones((1, lh, lw)), rng.rand(1, lh, lw)], -1).astype(np.float32)
    pe = rng.randn(n_prompts, 7, 16).astype(np.float32)
    npe = rng.randn(n_prompts, 7, 16).astype(np.float32)
    dino = rng.randn(1, 16).astype(np.float32)
    return pipe(fg_image=fg, bg_image=bg, gs_score=gs, height=height,
                width=width, num_inference_steps=steps, guidance_scale=7.5,
                prompt_embeds=pe, negative_prompt_embeds=npe, seed=1,
                num_images_per_prompt=nipp, fg_dino_feats=dino).images


@pytest.mark.slow
def test_non_square_free_resolution(tiny):
    out = _run(tiny, height=96, width=96)
    assert out.shape == (1, 96, 96, 3)
    out = _run(tiny, height=64, width=128)  # non-square
    assert out.shape == (1, 64, 128, 3)


@pytest.mark.slow
def test_multi_prompt_multi_sample(tiny):
    out = _run(tiny, 64, 64, n_prompts=2, nipp=3)
    assert out.shape == (6, 64, 64, 3)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_no_cfg_guidance_one(tiny):
    rng = np.random.RandomState(0)
    pipe = BlobNetPipeline(**tiny)
    fg = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    gs = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32)
    out = pipe(fg_image=fg, bg_image=fg, gs_score=gs, height=64, width=64,
               num_inference_steps=2, guidance_scale=1.0,
               prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
               fg_dino_feats=rng.randn(1, 16).astype(np.float32)).images
    assert out.shape == (1, 64, 64, 3)


@pytest.mark.slow
def test_remat_matches_no_remat(tiny):
    key = jax.random.PRNGKey(3)
    ucfg = tiny["unet_cfg"]
    params = tiny["unet_params"]
    x = jax.random.normal(key, (1, 8, 16, 5))
    ctx = jax.random.normal(key, (1, 7, 16))
    y0 = unet_lib.unet_apply(params, ucfg, x, jnp.asarray(5), ctx, remat=False)
    y1 = unet_lib.unet_apply(params, ucfg, x, jnp.asarray(5), ctx, remat=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)


def test_dead_path_guards(tiny):
    pipe = BlobNetPipeline(**tiny)
    with pytest.raises(NotImplementedError, match="IP-Adapter"):
        pipe(prompt_embeds=np.zeros((1, 7, 16), np.float32),
             ip_adapter_image=np.zeros((8, 8, 3)))
    with pytest.raises(NotImplementedError, match="return_sample"):
        pipe(prompt_embeds=np.zeros((1, 7, 16), np.float32),
             return_sample=True)


@pytest.mark.slow
def test_multi_blob_edit(tiny):
    """M=2 blobs with distinct appearance embeddings (beyond the reference's
    single-blob pipeline; same math, generalized)."""
    from blobctrl_tpu.blob import math as blob_math
    rng = np.random.RandomState(7)
    pipe = BlobNetPipeline(**tiny)
    H = W = 64
    fg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    bg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)

    xs = np.array([[0.3, 0.7]], np.float32)
    ys = np.array([[0.4, 0.6]], np.float32)
    covs = np.zeros((1, 2, 2, 2), np.float32)
    for j in range(2):
        _, c = blob_math.ellipse_to_gaussian(0, 0, 0.08, 0.15, 0.4 + j)
        covs[0, j] = c
    gs = np.asarray(blob_math.splat_scores(
        jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(covs),
        jnp.ones((1, 2), np.float32), (8, 8)))  # (1,8,8,3)
    assert gs.shape[-1] == 3

    pe = rng.randn(1, 7, 16).astype(np.float32)
    feats2 = rng.randn(2, 16).astype(np.float32)  # one embedding per blob
    out = pipe(fg_image=fg, bg_image=bg, gs_score=gs, height=H, width=W,
               num_inference_steps=2, guidance_scale=7.5,
               prompt_embeds=pe, negative_prompt_embeds=pe,
               fg_dino_feats=feats2).images
    assert out.shape == (1, H, W, 3)
    assert np.isfinite(out).all()

    # single-blob path still matches the old semantics: M=1 with one feat
    gs1 = np.asarray(blob_math.blob_score_from_ellipse(
        ((32., 30.), (20., 30.), 10.), W, H, (8, 8)))
    out1 = pipe(fg_image=fg, bg_image=bg, gs_score=gs1, height=H, width=W,
                num_inference_steps=2, guidance_scale=7.5, prompt_embeds=pe,
                negative_prompt_embeds=pe,
                fg_dino_feats=feats2[:1]).images
    assert np.isfinite(out1).all()


@pytest.mark.slow
def test_guidance_sweep_does_not_recompile(tiny):
    """guidance_scale is a traced operand: sweeping it must reuse ONE
    compiled denoise graph (regression for the static-bake bug)."""
    rng = np.random.RandomState(0)
    pipe = BlobNetPipeline(**tiny)
    kw = dict(fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
              bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
              gs_score=np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32),
              height=64, width=64, num_inference_steps=2,
              prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
              negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
              fg_dino_feats=rng.randn(1, 16).astype(np.float32))
    out1 = pipe(guidance_scale=7.5, **kw).images
    out2 = pipe(guidance_scale=9.0, **kw).images
    assert len(pipe._denoise_cache) == 1
    assert np.abs(out1 - out2).max() > 1e-4  # the scale actually matters


@pytest.mark.slow
def test_caller_latents_survive(tiny):
    """The denoise loop must not donate caller-supplied jax-array latents."""
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    pipe = BlobNetPipeline(**tiny)
    lat = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    kw = dict(fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
              bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
              gs_score=np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32),
              height=64, width=64, num_inference_steps=2,
              prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
              negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
              fg_dino_feats=rng.randn(1, 16).astype(np.float32))
    a = pipe(latents=lat, **kw).images
    b = pipe(latents=lat, **kw).images  # same latents buffer reused
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_preprocess_image_pil_ndarray_same_filter():
    """ndarray and PIL inputs must use the same LANCZOS resample — identical
    pixels give identical latents regardless of input type (up to the PIL
    path's uint8 output quantization)."""
    from PIL import Image
    from blobctrl_tpu.pipeline.blobnet_pipeline import preprocess_image
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 255, (96, 128, 3)).astype(np.uint8)
    out_pil = preprocess_image(Image.fromarray(arr), 64, 64)
    out_arr = preprocess_image(arr, 64, 64)
    assert out_arr.shape == out_pil.shape == (1, 64, 64, 3)
    # integer ndarray takes the exact PIL path -> bit identical
    np.testing.assert_array_equal(out_pil, out_arr)
    # float ndarray uses the same LANCZOS kernel without uint8 intermediate
    # quantization/clipping; bilinear would differ by ~3e-1 on random noise
    out_f = preprocess_image(arr.astype(np.float32) / 255.0, 64, 64)
    assert np.abs(out_pil - out_f).max() < 0.1


@pytest.mark.slow
def test_uint8_transport_bit_exact(tiny):
    """uint8 conditioning images ride the wire as uint8 (1/4 the bytes) and
    normalize on device; the result must be BIT-identical to the float32
    [-1, 1] transport of the same pixels."""
    from blobctrl_tpu.pipeline import blobnet_pipeline as bp
    rng = np.random.RandomState(7)
    pipe = BlobNetPipeline(**tiny)
    fg = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    bg = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    # the transport layer really picks uint8 for integer inputs
    t = bp.preprocess_image_transport(fg, 64, 64)
    assert t.dtype == np.uint8
    gs = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32)
    kw = dict(gs_score=gs, height=64, width=64, num_inference_steps=2,
              guidance_scale=7.5, seed=3,
              prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
              negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
              fg_dino_feats=rng.randn(1, 16).astype(np.float32))
    out_u8 = pipe(fg_image=fg, bg_image=bg, **kw).images
    # float path: same pixels as [0, 1] float arrays (float transport form)
    out_f = pipe(fg_image=fg.astype(np.float32) / 255.0,
                 bg_image=bg.astype(np.float32) / 255.0, **kw).images
    np.testing.assert_array_equal(out_u8, out_f)


def test_dino_u8_transport_matches_host_preprocess():
    """preprocess_u8 + device normalize == the host preprocess to 1 ulp
    (XLA rewrites the /std constant division to a reciprocal multiply —
    ~5e-7 on ImageNet-normalized values, far below the bf16 rounding the
    encoder applies to its input anyway)."""
    from blobctrl_tpu.models import dinov2 as dino_lib
    rng = np.random.RandomState(11)
    imgs = rng.randint(0, 255, (2, 300, 260, 3)).astype(np.uint8)
    host = dino_lib.preprocess(imgs, size=224)
    u8 = dino_lib.preprocess_u8(imgs, size=224)
    assert u8.dtype == np.uint8 and u8.shape == (2, 224, 224, 3)
    dev = np.asarray(jax.jit(dino_lib.normalize_pixels)(jnp.asarray(u8)))
    np.testing.assert_allclose(host.astype(np.float32), dev, atol=1e-6,
                               rtol=0)


def _fake_tokenizer(prompts):
    out = []
    for p in prompts:
        rng = np.random.RandomState(abs(hash(p)) % (2 ** 31))
        out.append(rng.randint(1, 99, 7))
    return np.asarray(out, np.int32)


def _clip_pipe(tiny):
    from blobctrl_tpu.models import clip_text as clip_lib
    ccfg = clip_lib.CLIPTextConfig(vocab_size=99, hidden_size=16,
                                   intermediate_size=32, num_layers=2,
                                   num_heads=2)
    return BlobNetPipeline(**tiny, clip_cfg=ccfg,
                           clip_params=clip_lib.init(jax.random.PRNGKey(5),
                                                     ccfg),
                           tokenizer=_fake_tokenizer)


def test_encode_prompt_single_dispatch_memoized(tiny):
    """String prompts: CLIP pos+neg+repeat+concat fuse into ONE jitted
    dispatch, memoized by token ids — a repeated prompt across edit rounds
    costs zero dispatches. The fused result must match the eager fallback
    path exactly."""
    from blobctrl_tpu.models import clip_text as clip_lib
    pipe = _clip_pipe(tiny)
    pe1 = pipe.encode_prompt("a cat", "blurry", 2, True)
    assert pe1.shape == (4, 7, 16)
    # memo hit: same object back, no new work
    pe2 = pipe.encode_prompt("a cat", "blurry", 2, True)
    assert pe2 is pe1
    # different prompt -> different entry
    pe3 = pipe.encode_prompt("a dog", "blurry", 2, True)
    assert pe3 is not pe1
    # equals the eager reference combine
    ids = jnp.asarray(_fake_tokenizer(["a cat"]))
    nids = jnp.asarray(_fake_tokenizer(["blurry"]))
    pos = clip_lib.encode_with_clip_skip(pipe.clip_params, pipe.clip_cfg,
                                         ids, None)
    neg = clip_lib.apply(pipe.clip_params, pipe.clip_cfg, nids)
    want = jnp.concatenate([jnp.repeat(neg, 2, 0), jnp.repeat(pos, 2, 0)], 0)
    np.testing.assert_allclose(np.asarray(pe1), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_encode_prompt_host_embeds_single_upload(tiny):
    """Host-array embeds combine in numpy (zero eager device ops) with the
    same values as the device combine."""
    pipe = BlobNetPipeline(**tiny)
    rng = np.random.RandomState(0)
    pe = rng.randn(2, 7, 16).astype(np.float32)
    npe = rng.randn(2, 7, 16).astype(np.float32)
    got = pipe.encode_prompt(None, None, 3, True, prompt_embeds=pe,
                             negative_prompt_embeds=npe)
    want = np.concatenate([np.repeat(npe, 3, 0), np.repeat(pe, 3, 0)], 0)
    np.testing.assert_array_equal(np.asarray(got), want)


def test_dino_embedding_cache(tiny):
    """Repeated object images across rounds hit the DINOv2 memo cache —
    zero encoder dispatches after the first."""
    from blobctrl_tpu.models import dinov2 as dino_lib
    dcfg = dino_lib.DINOv2Config(hidden_size=16, num_layers=2, num_heads=2,
                                 intermediate_size=32, patch_size=14,
                                 image_size=28)
    pipe = BlobNetPipeline(**tiny, dino_cfg=dcfg,
                           dino_params=dino_lib.init(jax.random.PRNGKey(6),
                                                     dcfg),
                           dino_image_size=28)
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    calls = []
    real = pipe._encode_dino
    pipe._encode_dino = lambda px: calls.append(1) or real(px)
    p1 = pipe._dino_pooled_cached([img])
    p2 = pipe._dino_pooled_cached([img])
    assert len(calls) == 1 and p2 is p1
    p3 = pipe._dino_pooled_cached([img[::-1].copy()])
    assert len(calls) == 2 and p3 is not p1
    # edit_batch's per-request cache consult reuses the same entries
    assert pipe._dino_cache.get(pipe._dino_key([img])) is p1


def test_cond_latent_memo_exact(tiny):
    """Interactive rounds keep fg/bg fixed: the conditioning-latent memo
    must make repeat rounds bit-identical to cold rounds (the in-graph VAE
    encode and the lax.cond passthrough compute the same latents), never
    serve stale latents for new images, and key on image content."""
    rng = np.random.RandomState(3)
    pipe = BlobNetPipeline(**tiny)
    H = W = 64
    fg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    bg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    gs = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32)
    pe = rng.randn(1, 7, 16).astype(np.float32)
    npe = rng.randn(1, 7, 16).astype(np.float32)
    dino = rng.randn(1, 16).astype(np.float32)
    kw = dict(fg_image=fg, bg_image=bg, gs_score=gs, height=H, width=W,
              num_inference_steps=2, guidance_scale=7.5, prompt_embeds=pe,
              negative_prompt_embeds=npe, seed=1, fg_dino_feats=dino)

    cold = pipe(**kw).images                      # miss: encodes, stashes
    assert len(pipe._cond_lat_cache) == 1
    hit = pipe(**kw).images                       # hit: dummy upload path
    np.testing.assert_array_equal(cold, hit)
    assert any(s == (2, H, W, 3) for s, _ in pipe._dummy_cache), \
        "repeat round should have fed dummy image operands"

    # moved blob, same images: still a hit, still exact vs a fresh pipe
    gs2 = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32)
    moved = pipe(**dict(kw, gs_score=gs2)).images
    assert len(pipe._cond_lat_cache) == 1
    fresh = BlobNetPipeline(**tiny)(**dict(kw, gs_score=gs2)).images
    np.testing.assert_array_equal(moved, fresh)

    # new background: miss (new entry), result matches a fresh pipe
    bg2 = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    new_bg = pipe(**dict(kw, bg_image=bg2)).images
    assert len(pipe._cond_lat_cache) == 2
    fresh2 = BlobNetPipeline(**tiny)(**dict(kw, bg_image=bg2)).images
    np.testing.assert_array_equal(new_bg, fresh2)
    assert not np.array_equal(new_bg, cold)


def test_memo_keys_survive_param_replacement(tiny):
    """Replacing a param tree on the pipeline (fine-tune reload, LoRA merge,
    sharding round-trip) must invalidate every memoized device result keyed
    on it — including when CPython hands the NEW tree the OLD tree's id()
    (the _params_version map holds a strong ref precisely to make that
    reuse harmless)."""
    from blobctrl_tpu.models import vae as vae_lib
    rng = np.random.RandomState(9)
    pipe = BlobNetPipeline(**tiny)
    H = W = 64
    fg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    bg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    gs = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32)
    pe = rng.randn(1, 7, 16).astype(np.float32)
    npe = rng.randn(1, 7, 16).astype(np.float32)
    dino = rng.randn(1, 16).astype(np.float32)
    kw = dict(fg_image=fg, bg_image=bg, gs_score=gs, height=H, width=W,
              num_inference_steps=2, guidance_scale=7.5, prompt_embeds=pe,
              negative_prompt_embeds=npe, seed=1, fg_dino_feats=dino)

    old = pipe(**kw).images
    v0 = pipe._params_version("vae_params")
    assert pipe._params_version("vae_params") == v0  # stable while unchanged

    # swap in different VAE weights: the memoized conditioning latents are
    # stale and MUST miss; the result must match a fresh pipe with the same
    # weights (a stale hit would silently reproduce `old`)
    new_vae = vae_lib.init_vae(jax.random.PRNGKey(123), pipe.vae_cfg)
    pipe.vae_params = new_vae
    assert pipe._params_version("vae_params") != v0
    swapped = pipe(**kw).images
    fresh = BlobNetPipeline(**dict(tiny, vae_params=new_vae))(**kw).images
    np.testing.assert_array_equal(swapped, fresh)
    assert not np.array_equal(swapped, old)
    assert len(pipe._cond_lat_cache) == 2  # old + new entries coexist


@pytest.mark.slow
def test_seed_none_draws_fresh_noise(tiny):
    rng = np.random.RandomState(0)
    pipe = BlobNetPipeline(**tiny)
    fg = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    bg = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    gs = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32)
    pe = rng.randn(1, 7, 16).astype(np.float32)
    npe = rng.randn(1, 7, 16).astype(np.float32)
    dino = rng.randn(1, 16).astype(np.float32)
    kw = dict(fg_image=fg, bg_image=bg, gs_score=gs, height=64, width=64,
              num_inference_steps=2, guidance_scale=7.5, prompt_embeds=pe,
              negative_prompt_embeds=npe, num_images_per_prompt=1,
              fg_dino_feats=dino)
    a = pipe(seed=None, **kw).images
    b = pipe(seed=None, **kw).images
    assert np.abs(a - b).max() > 1e-4   # fresh noise each no-seed call
    c = pipe(seed=7, **kw).images
    d = pipe(seed=7, **kw).images
    np.testing.assert_array_equal(c, d)  # explicit seed reproducible


@pytest.mark.slow
def test_dpm_scheduler_variants_run_e2e(tiny):
    """The pipeline accepts every DPM variant name; SDE is seeded and
    reproducible; karras differs from the plain spacing."""
    rng = np.random.RandomState(0)
    pipe = BlobNetPipeline(**tiny)
    kw = dict(fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
              bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
              gs_score=np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32),
              height=64, width=64, num_inference_steps=3, guidance_scale=7.5,
              prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
              negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
              fg_dino_feats=rng.randn(1, 16).astype(np.float32), seed=5)
    outs = {}
    for name in ("dpm", "dpm_karras", "dpm_sde", "dpm_sde_karras", "dpm_heun"):
        outs[name] = pipe(scheduler=name, **kw).images
        assert np.isfinite(outs[name]).all(), name
    # same seed -> SDE reproducible
    np.testing.assert_array_equal(outs["dpm_sde"],
                                  pipe(scheduler="dpm_sde", **kw).images)
    # variants genuinely change the trajectory
    assert np.abs(outs["dpm"] - outs["dpm_karras"]).max() > 1e-4
    assert np.abs(outs["dpm"] - outs["dpm_sde"]).max() > 1e-4
    with pytest.raises(ValueError, match="dpm variant"):
        pipe(scheduler="dpm_bogus", **kw)


@pytest.mark.slow
def test_int8_conv_mode_prequantized_pipeline(tiny):
    """The opt-in int8 conv mode through the full pipeline: the edit runs
    under pre-quantized weights (quantize_conv_tree applied ONCE per tree
    and cached by identity — never inside the denoise loop), output stays
    finite and close to the exact-path edit at tiny scale."""
    from blobctrl_tpu.nn import resnet
    from blobctrl_tpu.ops import conv3x3 as conv_mod

    exact = _run(tiny, 64, 64)
    resnet.set_conv_backend("interpret")
    conv_mod.set_conv_int8(True)
    try:
        rng = np.random.RandomState(0)
        pipe = BlobNetPipeline(**tiny)
        fg = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        bg = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        gs = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32)
        kw = dict(fg_image=fg, bg_image=bg, gs_score=gs, height=64, width=64,
                  num_inference_steps=2, guidance_scale=7.5,
                  prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
                  negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
                  seed=1, fg_dino_feats=rng.randn(1, 16).astype(np.float32))
        out = pipe(**kw).images
        assert np.isfinite(out).all()
        # the augmented trees were built and cached by identity
        cache = pipe._int8_param_cache
        assert set(cache) == {"unet_params", "blobnet_params", "vae_params"}
        ids = {k: id(v[1]) for k, v in cache.items()}
        pipe(**kw)
        assert {k: id(v[1]) for k, v in pipe._int8_param_cache.items()} == ids
        # tiny-scale drift vs the exact path stays bounded (uint8 images)
        assert np.abs(out.astype(np.float32)
                      - exact.astype(np.float32)).mean() < 0.08
    finally:
        conv_mod.set_conv_int8(False)
        resnet.set_conv_backend("auto")


@pytest.mark.slow
def test_edit_batch_matches_single_runs(tiny):
    """B distinct edits batched into one device program (the production
    serving path) reproduce each request's solo result: per-request seeds,
    prompts, conditioning images, scores, and appearance embeddings all
    stay independent across the batch dim (no analog in the reference —
    pipeline_blobnet.py batches only samples of ONE edit)."""
    rng = np.random.RandomState(11)
    pipe = BlobNetPipeline(**tiny)
    H = W = 64
    lh = lw = 8
    reqs = []
    for i in range(3):
        fg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        bg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        gs = np.stack([np.ones((1, lh, lw)), rng.rand(1, lh, lw)],
                      -1).astype(np.float32)
        reqs.append(dict(
            fg_image=fg, bg_image=bg, gs_score=gs, seed=100 + i,
            prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
            negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
            fg_dino_feats=rng.randn(1, 16).astype(np.float32)))
    batched = pipe.edit_batch(reqs, height=H, width=W,
                              num_inference_steps=3,
                              guidance_scale=7.5).images
    assert batched.shape == (3, H, W, 3)
    for i, r in enumerate(reqs):
        solo = pipe(fg_image=r["fg_image"], bg_image=r["bg_image"],
                    gs_score=r["gs_score"], height=H, width=W,
                    num_inference_steps=3, guidance_scale=7.5,
                    prompt_embeds=r["prompt_embeds"],
                    negative_prompt_embeds=r["negative_prompt_embeds"],
                    fg_dino_feats=r["fg_dino_feats"], seed=100 + i).images
        # fp32 batch-invariant math; images are uint8-quantized so allow one
        # quantization-boundary flip
        np.testing.assert_allclose(batched[i], solo[0], atol=0.005)
    # distinct requests actually produced distinct images
    assert np.abs(batched[0] - batched[1]).mean() > 0.01


@pytest.mark.slow
def test_edit_batch_matches_single_runs_sde(tiny):
    """Batched == solo holds for the STOCHASTIC scheduler too: per-step
    sde-dpmsolver++ variance noise is drawn per-request from that request's
    own key chain (not once at the batched shape), so each row of the batch
    reproduces its solo trajectory bit-for-bit up to uint8 quantization."""
    rng = np.random.RandomState(17)
    pipe = BlobNetPipeline(**tiny)
    H = W = 64
    lh = lw = 8
    reqs = []
    for i in range(2):
        fg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        bg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        gs = np.stack([np.ones((1, lh, lw)), rng.rand(1, lh, lw)],
                      -1).astype(np.float32)
        reqs.append(dict(
            fg_image=fg, bg_image=bg, gs_score=gs, seed=200 + i,
            prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
            negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
            fg_dino_feats=rng.randn(1, 16).astype(np.float32)))
    batched = pipe.edit_batch(reqs, height=H, width=W,
                              num_inference_steps=4, guidance_scale=7.5,
                              scheduler="dpm_sde").images
    for i, r in enumerate(reqs):
        solo = pipe(fg_image=r["fg_image"], bg_image=r["bg_image"],
                    gs_score=r["gs_score"], height=H, width=W,
                    num_inference_steps=4, guidance_scale=7.5,
                    scheduler="dpm_sde",
                    prompt_embeds=r["prompt_embeds"],
                    negative_prompt_embeds=r["negative_prompt_embeds"],
                    fg_dino_feats=r["fg_dino_feats"], seed=200 + i).images
        np.testing.assert_allclose(batched[i], solo[0], atol=0.005)
    assert np.abs(batched[0] - batched[1]).mean() > 0.01


@pytest.mark.slow
def test_edit_batch_remove_mode(tiny):
    """Batched remove-mode requests (strength 0 -> statically UNet-only
    graph, bg-only score) run and return finite images."""
    rng = np.random.RandomState(13)
    pipe = BlobNetPipeline(**tiny)
    H = W = 64
    gs_remove = np.concatenate([np.ones((1, 8, 8, 1), np.float32),
                                np.zeros((1, 8, 8, 1), np.float32)], -1)
    reqs = []
    for i in range(2):
        img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
        reqs.append(dict(fg_image=img, bg_image=img, gs_score=gs_remove,
                         seed=i,
                         prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
                         negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
                         fg_dino_feats=rng.randn(1, 16).astype(np.float32)))
    out = pipe.edit_batch(reqs, height=H, width=W, num_inference_steps=2,
                          blobnet_conditioning_scale=0.0).images
    assert out.shape == (2, H, W, 3)
    assert np.isfinite(out).all()


def test_edit_batch_validation(tiny):
    """Mixed blob counts and mixed embeds/tokenizer batches raise clearly."""
    rng = np.random.RandomState(17)
    pipe = BlobNetPipeline(**tiny)
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    base = dict(fg_image=img, bg_image=img, seed=0,
                prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
                negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
                fg_dino_feats=rng.randn(1, 16).astype(np.float32))
    gs1 = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)],
                   -1).astype(np.float32)
    gs2 = np.concatenate([gs1, rng.rand(1, 8, 8, 1).astype(np.float32)], -1)
    with pytest.raises(ValueError, match="blob count"):
        pipe.edit_batch([dict(base, gs_score=gs1), dict(base, gs_score=gs2)],
                        height=64, width=64, num_inference_steps=1)
    with pytest.raises(ValueError, match="prompt_embeds"):
        no_pe = {k: v for k, v in base.items()
                 if k not in ("prompt_embeds", "negative_prompt_embeds")}
        pipe.edit_batch([dict(base, gs_score=gs1),
                         dict(no_pe, gs_score=gs1, prompt="x")],
                        height=64, width=64, num_inference_steps=1)
    with pytest.raises(ValueError, match="at least one"):
        pipe.edit_batch([], height=64, width=64)
