"""Checkpoint save/restore + export roundtrips; sharded pipeline equivalence."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.apps import flagship
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import lora as lora_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.parallel import mesh as mesh_lib
from blobctrl_tpu.pipeline import BlobNetPipeline
from blobctrl_tpu.train import checkpoint as ckpt_lib
from blobctrl_tpu.train import train_step as ts


@pytest.mark.slow
def test_orbax_save_restore_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    unet_cfg, blobnet_cfg = flagship.tiny_configs()
    key = jax.random.PRNGKey(0)
    unet_params = unet_lib.init_unet(key, unet_cfg)
    blobnet_params = blobnet_lib.init_blobnet(key, blobnet_cfg)
    lora_params = lora_lib.init_lora(key, unet_params, rank=4)
    cfg = ts.TrainConfig(compute_dtype=jnp.float32, remat=False)
    state = ts.init_train_state(cfg, blobnet_params, lora_params)

    ckpt_lib.save(str(tmp_path / "ckpt"), state, step=7)
    assert ckpt_lib.latest_step(str(tmp_path / "ckpt")) == 7
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    restored = ckpt_lib.restore(str(tmp_path / "ckpt"), abstract)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_blobnet_export_reimport_roundtrip(tmp_path):
    from blobctrl_tpu.params import convert
    _, blobnet_cfg = flagship.tiny_configs()
    key = jax.random.PRNGKey(1)
    params = blobnet_lib.init_blobnet(key, blobnet_cfg)
    path = str(tmp_path / "blobnet" / "diffusion_pytorch_model.safetensors")
    ckpt_lib.export_blobnet_safetensors(params, path)

    from safetensors.numpy import load_file
    sd = load_file(path)
    reimported = convert.convert_unet(sd)
    flat1, tree1 = jax.tree_util.tree_flatten(params)
    flat2, tree2 = jax.tree_util.tree_flatten(reimported)
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


def test_lora_export_reimport_roundtrip(tmp_path):
    unet_cfg, _ = flagship.tiny_configs()
    key = jax.random.PRNGKey(2)
    unet_params = unet_lib.init_unet(key, unet_cfg)
    lora = lora_lib.init_lora(key, unet_params, rank=4)
    lora = jax.tree_util.tree_map(lambda a: a + 0.1, lora)  # non-zero B
    path = str(tmp_path / "unet_lora" / "adapter_model.safetensors")
    ckpt_lib.export_lora_safetensors(lora, path)
    from safetensors.numpy import load_file
    reimported = lora_lib.convert_lora_state_dict(load_file(path))
    assert set(reimported.keys()) == set(lora.keys())
    for k in lora:
        np.testing.assert_allclose(np.asarray(lora[k]["A"]),
                                   np.asarray(reimported[k]["A"]), atol=1e-7)
        np.testing.assert_allclose(np.asarray(lora[k]["B"]),
                                   np.asarray(reimported[k]["B"]), atol=1e-7)


@pytest.mark.slow
def test_pipeline_sharded_matches_unsharded():
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    kwargs = dict(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))

    rng = np.random.RandomState(3)
    H = W = 64
    fg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    bg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    gs = np.stack([np.ones((1, 8, 8)), np.zeros((1, 8, 8))], -1).astype(np.float32)
    gs[..., 1] = rng.rand(1, 8, 8)
    pe = rng.randn(1, 7, 16).astype(np.float32)
    npe = rng.randn(1, 7, 16).astype(np.float32)
    lat = rng.randn(2, 8, 8, 4).astype(np.float32)
    dino = rng.randn(1, 16).astype(np.float32)

    call_kwargs = dict(fg_image=fg, bg_image=bg, gs_score=gs, height=H, width=W,
                       num_inference_steps=2, guidance_scale=7.5, latents=lat,
                       prompt_embeds=pe, negative_prompt_embeds=npe,
                       num_images_per_prompt=2, fg_dino_feats=dino)

    ref = BlobNetPipeline(**kwargs)(**call_kwargs).images

    mesh = mesh_lib.make_mesh(data=4, model=2)
    sharded_pipe = BlobNetPipeline(mesh=mesh, **kwargs).shard_to_mesh(
        model_parallel=True)
    with mesh:
        got = sharded_pipe(**call_kwargs).images
    # uint8 image transport: GSPMD float reordering of ~1e-7 can flip a
    # pixel across a round() boundary, so allow one quantization step
    np.testing.assert_allclose(got, ref, atol=1.01 / 255.0)


@pytest.mark.slow
def test_pipeline_hybrid_cfg_data_matches_unsharded():
    """Hybrid CFG-data x model recipe (PERF_NOTES "TP latency projection"
    path 2): UNet CFG pair split over the data axis, BlobNet tensor-sharded
    over data x model — must equal the unsharded pipeline."""
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    kwargs = dict(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))

    rng = np.random.RandomState(7)
    H = W = 64
    fg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    bg = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    gs = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)], -1).astype(np.float32)
    pe = rng.randn(1, 7, 16).astype(np.float32)
    npe = rng.randn(1, 7, 16).astype(np.float32)
    lat = rng.randn(1, 8, 8, 4).astype(np.float32)
    dino = rng.randn(1, 16).astype(np.float32)

    call_kwargs = dict(fg_image=fg, bg_image=bg, gs_score=gs, height=H,
                       width=W, num_inference_steps=2, guidance_scale=7.5,
                       latents=lat, prompt_embeds=pe,
                       negative_prompt_embeds=npe, fg_dino_feats=dino)

    ref = BlobNetPipeline(**kwargs)(**call_kwargs).images

    mesh = mesh_lib.make_mesh(data=2, model=2)
    pipe = BlobNetPipeline(mesh=mesh, **kwargs).shard_to_mesh(
        hybrid_cfg_data=True)
    with mesh:
        got = pipe(**call_kwargs).images
    np.testing.assert_allclose(got, ref, atol=1.01 / 255.0)

    # BlobNet kernels really spread over BOTH axes (8-way at divisible dims)
    from jax.sharding import PartitionSpec as P
    leaf = pipe.blobnet_params["down_blocks"][0]["resnets"][0]["conv1"]["kernel"]
    assert leaf.sharding.spec == P(None, None, None, ("data", "model"))


def test_latest_step_ignores_orbax_tmp_dirs(tmp_path):
    """An interrupted orbax save leaves step_N.orbax-checkpoint-tmp-<ts>;
    resume must skip it instead of crashing on int()."""
    from blobctrl_tpu.train import checkpoint as ckpt
    (tmp_path / "step_00000005").mkdir()
    (tmp_path / "step_00000007.orbax-checkpoint-tmp-1234567").mkdir()
    (tmp_path / "not_a_step").mkdir()
    assert ckpt.latest_step(str(tmp_path)) == 5
    assert ckpt.latest_step(str(tmp_path / "missing")) is None


@pytest.mark.slow
def test_edit_batch_dp_sharded_matches_unsharded():
    """The serving path on a data mesh: a batch of 4 DISTINCT edits shards
    1-per-chip over data=4 (pipeline.edit_batch puts batch-major tensors on
    the data axis), so a v5e-4 serves 4 users at one-edit latency. Must
    equal the unsharded batch."""
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    kwargs = dict(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))

    rng = np.random.RandomState(5)
    H = W = 64
    reqs = []
    for i in range(4):
        gs = np.stack([np.ones((1, 8, 8)), rng.rand(1, 8, 8)],
                      -1).astype(np.float32)
        reqs.append(dict(
            fg_image=rng.randint(0, 255, (H, W, 3)).astype(np.uint8),
            bg_image=rng.randint(0, 255, (H, W, 3)).astype(np.uint8),
            gs_score=gs, seed=20 + i,
            prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
            negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
            fg_dino_feats=rng.randn(1, 16).astype(np.float32)))
    shared = dict(height=H, width=W, num_inference_steps=2,
                  guidance_scale=7.5)

    ref = BlobNetPipeline(**kwargs).edit_batch(reqs, **shared).images

    mesh = mesh_lib.make_mesh(data=4)
    pipe = BlobNetPipeline(mesh=mesh, **kwargs).shard_to_mesh()
    with mesh:
        got = pipe.edit_batch(reqs, **shared).images
    np.testing.assert_allclose(got, ref, atol=1.01 / 255.0)
