"""Pallas kernels under SPMD sharding (parallel.kernel_sharding).

GSPMD cannot partition Mosaic kernels — on a real multi-chip slice every
sharded recipe would crash with ``NotImplementedError: Mosaic kernels cannot
be automatically partitioned`` the moment a Pallas conv/attention saw sharded
operands (the CPU virtual-mesh dryruns never catch this because Pallas only
engages on the TPU backend). These tests run the ACTUAL Pallas kernels in
interpret mode on the virtual 8-CPU mesh, wrapped in the same shard_maps the
TPU path uses, and require the sharded outputs to match unsharded execution.

Reference counterpart: none — the reference is single-GPU (SURVEY.md §2.5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from blobctrl_tpu.nn import attention, resnet
from blobctrl_tpu.parallel import kernel_sharding as ks
from blobctrl_tpu.parallel import mesh as mesh_lib


@pytest.fixture
def interpret_convs():
    resnet.set_conv_backend("interpret")
    yield
    resnet.set_conv_backend("auto")


@pytest.fixture
def interpret_attention():
    attention.set_attention_backend("interpret")
    yield
    attention.set_attention_backend("auto")


def _resnet_ref(p, x, temb):
    return jax.jit(lambda p, x, t: resnet.resnet_block(p, x, t))(p, x, temb)


@pytest.mark.parametrize("data,model,axes,batch", [
    (1, 4, ("model",), ()),            # pure TP
    (2, 4, ("model",), ("data",)),     # DP x TP (batch rides data)
    (2, 4, ("data", "model"), ()),     # hybrid BlobNet: weights over BOTH
    (1, 8, ("model",), ()),            # full-width TP
])
def test_sharded_resnet_block_matches_unsharded(interpret_convs, data, model,
                                                axes, batch):
    """resnet_block routes conv1 column-parallel and conv2 row-parallel
    (with the fused GroupNorm+SiLU prologue) through shard_map'd Pallas
    convs; every recipe must reproduce the unsharded block."""
    p = resnet.init_resnet_block(jax.random.PRNGKey(0), 64, 128, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 64), jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(2), (2, 32), jnp.float32)
    ref = _resnet_ref(p, x, temb)

    mesh = mesh_lib.make_mesh(data=data, model=model)
    ps = mesh_lib.shard_params(mesh, p, model_parallel=True, axes=axes)
    profiles = {"m": ks.KernelProfile(mesh, batch=batch, model=axes)}

    def run(p_, x_, t_):
        with ks.activate(profiles), ks.scope("m"):
            return resnet.resnet_block(p_, x_, t_)

    xs = jax.device_put(x, NamedSharding(mesh, P("data") if batch else P()))
    out = jax.jit(run)(ps, xs, temb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_sharded_resnet_indivisible_channels_fall_back(interpret_convs):
    """Channel counts that do not divide the model axes must still work:
    the wrapper drops the model axes (replicated specs — the same rule
    param_shardings applies to the weights) instead of mis-sharding."""
    p = resnet.init_resnet_block(jax.random.PRNGKey(0), 12, 12, None)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 12), jnp.float32)
    ref = jax.jit(lambda p, x: resnet.resnet_block(
        p, x, None, norm_groups=4))(p, x)

    mesh = mesh_lib.make_mesh(data=1, model=8)  # 12 % 8 != 0
    ps = mesh_lib.shard_params(mesh, p, model_parallel=True)
    profiles = {"m": ks.KernelProfile(mesh, model=("model",))}

    def run(p_, x_):
        with ks.activate(profiles), ks.scope("m"):
            return resnet.resnet_block(p_, x_, None, norm_groups=4)

    out = jax.jit(run)(ps, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-4)


@pytest.mark.parametrize("data,model,batch_axes", [
    (1, 4, ()),           # TP: heads sharded
    (2, 4, ("data",)),    # hybrid UNet: CFG batch over data, heads over model
    (2, 4, ()),           # batch indivisible by nothing — heads only
])
def test_sharded_flash_attention_matches_xla(interpret_attention, data,
                                             model, batch_axes):
    """multi_head_attention's flash path under shard_map (heads over the
    model axes, batch over data) vs the plain XLA attention, both from the
    same inputs."""
    b, s, c, heads = 2, 256, 64, 8
    kq = jax.random.PRNGKey(3)
    q = jax.random.normal(kq, (b, s, c), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(4), (b, s, c), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(5), (b, s, c), jnp.float32)

    attention.set_attention_backend("xla")
    ref = jax.jit(lambda q, k, v: attention.multi_head_attention(
        q, k, v, heads))(q, k, v)
    attention.set_attention_backend("interpret")

    mesh = mesh_lib.make_mesh(data=data, model=model)
    profiles = {"m": ks.KernelProfile(mesh, batch=batch_axes,
                                      model=("model",))}

    def run(q, k, v):
        with ks.activate(profiles), ks.scope("m"):
            return attention.multi_head_attention(q, k, v, heads)

    spec = P("data") if batch_axes else P()
    qs = jax.device_put(q, NamedSharding(mesh, spec))
    out = jax.jit(run)(qs, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-3)


def test_no_profile_means_no_wrapping(interpret_convs):
    """Without an active profile (single chip, un-sharded pipeline) the call
    sites must hit the kernel directly — no shard_map in the jaxpr."""
    p = resnet.init_resnet_block(jax.random.PRNGKey(0), 32, 32, None)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 32), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda p, x: resnet.resnet_block(p, x, None))(p, x)
    assert "shard_map" not in str(jaxpr)

    mesh = mesh_lib.make_mesh(data=1, model=4)
    profiles = {"m": ks.KernelProfile(mesh, model=("model",))}

    def run(p_, x_):
        with ks.activate(profiles), ks.scope("m"):
            return resnet.resnet_block(p_, x_, None)

    jaxpr = jax.make_jaxpr(run)(p, x)
    assert "shard_map" in str(jaxpr)


def test_scope_selects_profile():
    mesh = mesh_lib.make_mesh(data=2, model=4)
    profiles = {"unet": ks.KernelProfile(mesh, batch=("data",),
                                         model=("model",))}
    with ks.activate(profiles):
        assert ks.current() is None            # no scope entered
        with ks.scope("unet"):
            assert ks.current() is profiles["unet"]
            with ks.scope("blobnet"):          # model the recipe left out
                assert ks.current() is None
        with ks.scope("vae"):
            assert ks.current() is None
    with ks.scope("unet"):
        assert ks.current() is None            # no active profile map


@pytest.fixture
def no_compile_cache():
    """Partitioner warnings only print during a FRESH compile — a
    persistent-cache hit silently skips them, so the pathology assertions
    below must compile from scratch."""
    jax.config.update("jax_enable_compilation_cache", False)
    yield
    jax.config.update("jax_enable_compilation_cache", True)


@pytest.mark.slow
@pytest.mark.parametrize("recipe", ["tp", "hybrid"])
def test_pipeline_sharded_pallas_matches_unsharded(interpret_convs,
                                                   interpret_attention,
                                                   no_compile_cache,
                                                   recipe, capfd):
    """The FULL tiny pipeline with the Pallas kernels forced on (interpret
    mode) under the sharded recipes: equality with the unsharded pipeline
    AND no involuntary rematerialization. This is the CPU stand-in for what
    a real multi-chip slice runs — the XLA-kernel variants of this test
    (test_checkpoint_and_mesh.py) cannot see shard_map boundary pathologies
    because Pallas never engages on the CPU backend's 'auto' routing."""
    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.models import vae as vae_lib
    from blobctrl_tpu.pipeline import BlobNetPipeline

    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    kwargs = dict(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))

    rng = np.random.RandomState(11)
    H = W = 64
    call_kwargs = dict(
        fg_image=rng.randint(0, 255, (H, W, 3)).astype(np.uint8),
        bg_image=rng.randint(0, 255, (H, W, 3)).astype(np.uint8),
        gs_score=np.stack([np.ones((1, 8, 8)),
                           rng.rand(1, 8, 8)], -1).astype(np.float32),
        height=H, width=W, num_inference_steps=2, guidance_scale=7.5,
        latents=rng.randn(1, 8, 8, 4).astype(np.float32),
        prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        fg_dino_feats=rng.randn(1, 16).astype(np.float32))

    ref = BlobNetPipeline(**kwargs)(**call_kwargs).images

    if recipe == "tp":
        mesh = mesh_lib.make_mesh(data=1, model=4)
        pipe = BlobNetPipeline(mesh=mesh, **kwargs).shard_to_mesh(
            model_parallel=True)
    else:
        mesh = mesh_lib.make_mesh(data=2, model=2)
        pipe = BlobNetPipeline(mesh=mesh, **kwargs).shard_to_mesh(
            hybrid_cfg_data=True)
    capfd.readouterr()
    with mesh:
        got = pipe(**call_kwargs).images
    err = capfd.readouterr().err
    assert "Involuntary full rematerialization" not in err, err[-3000:]
    np.testing.assert_allclose(got, ref, atol=1.01 / 255.0)
