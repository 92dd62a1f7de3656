"""Training step, LoRA, and multi-device sharding tests (8 virtual CPU
devices via conftest)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.apps import flagship
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import lora as lora_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.parallel import mesh as mesh_lib
from blobctrl_tpu.train import train_step as ts


def make_batch(rng, B, LH=8, LW=8, DC=16, CT=16):
    return {
        "x0_latents": rng.randn(B, LH, LW, 4).astype(np.float32),
        "fg_latents": rng.randn(B, LH, LW, 4).astype(np.float32),
        "bg_latents": rng.randn(B, LH, LW, 4).astype(np.float32),
        "fg_score": rng.rand(B, LH, LW, 1).astype(np.float32),
        "bg_score": rng.rand(B, LH, LW, 1).astype(np.float32),
        "fg_feats": rng.randn(B, LH, LW, DC).astype(np.float32),
        "text_embeds": rng.randn(B, 77, CT).astype(np.float32),
    }


@pytest.mark.slow
def test_lora_merge_and_zero_init_identity():
    unet_cfg, _ = flagship.tiny_configs()
    key = jax.random.PRNGKey(0)
    params = unet_lib.init_unet(key, unet_cfg)
    lora = lora_lib.init_lora(key, params, rank=4)
    assert len(lora) > 0
    # B is zero-init -> merge must be an exact no-op
    merged = lora_lib.merge_lora(params, lora, scale=1.0)
    x = jax.random.normal(key, (1, 8, 8, 5))
    ctx = jax.random.normal(key, (1, 7, 16))
    y0 = unet_lib.unet_apply(params, unet_cfg, x, jnp.asarray(3), ctx)
    y1 = unet_lib.unet_apply(merged, unet_cfg, x, jnp.asarray(3), ctx)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
    # non-zero B changes the output
    lora2 = jax.tree_util.tree_map(lambda a: a + 0.05, lora)
    merged2 = lora_lib.merge_lora(params, lora2, scale=1.0)
    y2 = unet_lib.unet_apply(merged2, unet_cfg, x, jnp.asarray(3), ctx)
    assert np.abs(np.asarray(y2) - np.asarray(y0)).max() > 1e-4


def test_lora_state_dict_conversion_peft_format():
    import torch
    rank = 4
    sd = {
        "base_model.model.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_A.default.weight":
            torch.randn(rank, 8),
        "base_model.model.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.lora_B.default.weight":
            torch.randn(8, rank),
        "base_model.model.up_blocks.1.attentions.2.transformer_blocks.0.attn2.to_out.0.lora_A.weight":
            torch.randn(rank, 16),
        "base_model.model.up_blocks.1.attentions.2.transformer_blocks.0.attn2.to_out.0.lora_B.weight":
            torch.randn(16, rank),
    }
    tree = lora_lib.convert_lora_state_dict(sd)
    assert "down_blocks/0/attentions/0/blocks/0/attn1/to_q" in tree
    assert "up_blocks/1/attentions/2/blocks/0/attn2/to_out" in tree
    for v in tree.values():
        assert v["A"].shape[1] == rank and v["B"].shape[0] == rank


@pytest.mark.slow
def test_train_step_runs_and_learns():
    unet_cfg, blobnet_cfg = flagship.tiny_configs()
    key = jax.random.PRNGKey(0)
    unet_params = unet_lib.init_unet(key, unet_cfg)
    blobnet_params = blobnet_lib.init_blobnet(key, blobnet_cfg)
    lora_params = lora_lib.init_lora(key, unet_params, rank=4)

    cfg = ts.TrainConfig(learning_rate=1e-3, compute_dtype=jnp.float32,
                         remat=False)
    state = ts.init_train_state(cfg, blobnet_params, lora_params)
    step_fn = ts.make_train_step(cfg, unet_cfg, blobnet_cfg)

    rng = np.random.RandomState(0)
    batch = make_batch(rng, B=2)
    losses = []
    for i in range(3):
        state, metrics = step_fn(state, unet_params, batch, jax.random.PRNGKey(7))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # same batch + same rng -> optimization must reduce the loss
    assert losses[-1] < losses[0]
    # LoRA B must have moved off zero
    bsum = sum(float(jnp.abs(v["B"]).sum())
               for k, v in state["params"]["lora"].items())
    assert bsum > 0


@pytest.mark.slow
def test_train_step_dp_sharded_matches_single_device():
    unet_cfg, blobnet_cfg = flagship.tiny_configs()
    key = jax.random.PRNGKey(0)
    unet_params = unet_lib.init_unet(key, unet_cfg)
    blobnet_params = blobnet_lib.init_blobnet(key, blobnet_cfg)
    lora_params = lora_lib.init_lora(key, unet_params, rank=4)
    cfg = ts.TrainConfig(compute_dtype=jnp.float32, remat=False)
    step_fn = ts.make_train_step(cfg, unet_cfg, blobnet_cfg)

    rng = np.random.RandomState(1)
    batch = make_batch(rng, B=8)

    # train_step donates its state; device_put-to-replicated can alias the
    # device-0 buffer with the original array, so donated states are built
    # from explicit copies
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)

    mesh = mesh_lib.make_mesh(data=8, model=1)
    up = mesh_lib.shard_params(mesh, unet_params)
    bp = mesh_lib.shard_params(mesh, blobnet_params)
    lp = mesh_lib.shard_params(mesh, lora_params)
    state8 = ts.init_train_state(cfg, copy(bp), copy(lp))
    sbatch = mesh_lib.shard_batch(mesh, batch)
    with mesh:
        _, m8 = step_fn(state8, up, sbatch, jax.random.PRNGKey(3))

    # single device
    state1 = ts.init_train_state(cfg, copy(blobnet_params), copy(lora_params))
    _, m1 = step_fn(state1, unet_params, batch, jax.random.PRNGKey(3))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-4)


@pytest.mark.slow
def test_model_parallel_forward_matches_replicated():
    unet_cfg, _ = flagship.tiny_configs()
    key = jax.random.PRNGKey(0)
    params = unet_lib.init_unet(key, unet_cfg)
    x = jax.random.normal(key, (2, 8, 8, 5))
    ctx = jax.random.normal(key, (2, 7, 16))
    y_ref = unet_lib.unet_apply(params, unet_cfg, x, jnp.asarray(5), ctx)

    mesh = mesh_lib.make_mesh(data=2, model=4)
    sparams = mesh_lib.shard_params(mesh, params, model_parallel=True)
    sx = mesh_lib.shard_batch(mesh, x)
    sctx = mesh_lib.shard_batch(mesh, ctx)
    with mesh:
        y = jax.jit(lambda p, x, c: unet_lib.unet_apply(p, unet_cfg, x,
                                                        jnp.asarray(5), c))(
            sparams, sx, sctx)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=2e-5)


@pytest.mark.slow
def test_ema_shadow_follows_update_rule():
    unet_cfg, blobnet_cfg = flagship.tiny_configs()
    key = jax.random.PRNGKey(0)
    unet_params = unet_lib.init_unet(key, unet_cfg)
    blobnet_params = blobnet_lib.init_blobnet(key, blobnet_cfg)
    lora_params = lora_lib.init_lora(key, unet_params, rank=4)

    cfg = ts.TrainConfig(learning_rate=1e-3, compute_dtype=jnp.float32,
                         remat=False, ema_decay=0.9)
    state = ts.init_train_state(cfg, blobnet_params, lora_params)
    # shadow starts as an exact copy of the trainables
    jax.tree_util.tree_map(
        lambda e, p: np.testing.assert_array_equal(np.asarray(e),
                                                   np.asarray(p)),
        state["ema"], state["params"])
    init_params = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), state["params"])

    step_fn = ts.make_train_step(cfg, unet_cfg, blobnet_cfg)
    batch = make_batch(np.random.RandomState(0), B=2)
    state, _ = step_fn(state, unet_params, batch, jax.random.PRNGKey(7))

    # one step: ema == d * init + (1-d) * new_params, leaf-exact
    def check(e, p0, p1):
        np.testing.assert_allclose(np.asarray(e),
                                   0.9 * p0 + 0.1 * np.asarray(p1),
                                   rtol=1e-6, atol=1e-7)
    jax.tree_util.tree_map(check, state["ema"], init_params, state["params"])

    # more steps keep the shadow finite and BETWEEN init and a pure copy
    for i in range(2):
        state, _ = step_fn(state, unet_params, batch, jax.random.PRNGKey(i))
    flat = jax.tree_util.tree_leaves(state["ema"])
    assert all(np.isfinite(np.asarray(x)).all() for x in flat)


def test_lr_schedules():
    """make_lr: warmup ramps linearly from 0 to peak and holds; cosine
    decays from the peak to end_factor * peak over lr_total_steps; bad
    configs raise; constant/cosine optimizer states share one layout
    (checkpoints interchangeable across schedule changes)."""
    peak = 1e-3
    cfg_w = ts.TrainConfig(learning_rate=peak, lr_warmup_steps=10)
    lr = ts.make_lr(cfg_w)
    assert float(lr(0)) == 0.0
    np.testing.assert_allclose(float(lr(5)), peak / 2, rtol=1e-6)
    np.testing.assert_allclose(float(lr(10)), peak, rtol=1e-6)
    np.testing.assert_allclose(float(lr(500)), peak, rtol=1e-6)  # holds

    cfg_c = ts.TrainConfig(learning_rate=peak, lr_warmup_steps=10,
                           lr_schedule="cosine", lr_total_steps=100,
                           lr_end_factor=0.1)
    lr_c = ts.make_lr(cfg_c)
    assert float(lr_c(0)) == 0.0
    np.testing.assert_allclose(float(lr_c(10)), peak, rtol=1e-6)
    assert float(lr_c(55)) < peak
    np.testing.assert_allclose(float(lr_c(100)), 0.1 * peak, rtol=1e-5)

    # flat-scalar fast path
    assert ts.make_lr(ts.TrainConfig(learning_rate=peak)) == peak

    with pytest.raises(ValueError, match="lr_total_steps"):
        ts.make_lr(ts.TrainConfig(lr_schedule="cosine"))
    with pytest.raises(ValueError, match="unknown lr_schedule"):
        ts.make_lr(ts.TrainConfig(lr_schedule="linear"))


@pytest.mark.slow
def test_train_step_reports_scheduled_lr():
    unet_cfg, blobnet_cfg = flagship.tiny_configs()
    key = jax.random.PRNGKey(0)
    unet_params = unet_lib.init_unet(key, unet_cfg)
    blobnet_params = blobnet_lib.init_blobnet(key, blobnet_cfg)
    lora_params = lora_lib.init_lora(key, unet_params, rank=4)

    cfg = ts.TrainConfig(learning_rate=1e-3, compute_dtype=jnp.float32,
                         remat=False, lr_warmup_steps=4)
    state = ts.init_train_state(cfg, blobnet_params, lora_params)
    step_fn = ts.make_train_step(cfg, unet_cfg, blobnet_cfg)
    batch = make_batch(np.random.RandomState(0), B=2)
    state, m0 = step_fn(state, unet_params, batch, jax.random.PRNGKey(7))
    assert float(m0["lr"]) == 0.0            # warmup step 0
    state, m1 = step_fn(state, unet_params, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(m1["lr"]), 1e-3 / 4, rtol=1e-6)
