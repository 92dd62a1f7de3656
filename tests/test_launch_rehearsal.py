"""Launch-day rehearsal — the ENTIRE checkpoint-day path as one flow:

  train step -> export (blobnet safetensors + diffusers config, LoRA PEFT)
  -> fabricated reference-layout models_root (SD-1.5 keys, conv LoRA,
  DINOv2 + processor config, SAM pickle)
  -> the ONE scoring command: `replay --models_root ... --all --score
  --score_ui` over the real recorded demo states
  (/root/reference/assets/results/demo).

tests/test_load_pipeline.py drills the loader in isolation; this drills the
command a user will actually run on checkpoint day, end to end, including
the trainer's own exports being loadable through the reference layout.
PSNR values are meaningless on tiny random-ish weights — what this gates is
that every stage runs, every artifact parses, and all 9 recorded states
replay + score without intervention.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

DEMO_ROOT = "/root/reference/assets/results/demo"

pytestmark = pytest.mark.skipif(not os.path.isdir(DEMO_ROOT),
                                reason="no reference demo assets")


@pytest.mark.slow
def test_launch_day_rehearsal(tmp_path_factory, monkeypatch, capsys):
    import jax
    import jax.numpy as jnp

    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import lora as lora_lib
    from blobctrl_tpu.params import config_io
    from blobctrl_tpu.params import io as params_io
    from blobctrl_tpu.train import checkpoint as ckpt_lib
    from blobctrl_tpu.train import train_step as ts
    from tests.fake_checkpoint import build_fake_models_root, CTX, DINO_C

    root = build_fake_models_root(tmp_path_factory.mktemp("models"))

    # ---- 1. one REAL train step on this repo's stack, from the fabricated
    # SD-1.5 checkpoint (exactly how a production run starts)
    with open(os.path.join(root, "stable-diffusion-v1-5", "unet",
                           "config.json")) as f:
        import dataclasses
        unet_cfg = dataclasses.replace(
            config_io.unet_config_from_diffusers(json.load(f)), in_channels=5)
    with open(os.path.join(root, "BlobCtrl", "blobnet", "config.json")) as f:
        blobnet_cfg = config_io.blobnet_config_from_diffusers(json.load(f))

    unet_params = params_io.load_sd15_unet(
        os.path.join(root, "stable-diffusion-v1-5", "unet"))
    key = jax.random.PRNGKey(0)
    blobnet_params = blobnet_lib.init_blobnet(key, blobnet_cfg)
    lora_params = lora_lib.init_lora(key, unet_params, rank=2)

    cfg = ts.TrainConfig(compute_dtype=jnp.float32, remat=False)
    state = ts.init_train_state(cfg, blobnet_params, lora_params)
    step_fn = ts.make_train_step(cfg, unet_cfg, blobnet_cfg)
    B, LH, LW = 2, 8, 8
    rng = np.random.RandomState(0)
    batch = {
        "x0_latents": rng.randn(B, LH, LW, 4).astype(np.float32),
        "fg_latents": rng.randn(B, LH, LW, 4).astype(np.float32),
        "bg_latents": rng.randn(B, LH, LW, 4).astype(np.float32),
        "fg_score": rng.rand(B, LH, LW, 1).astype(np.float32),
        "bg_score": rng.rand(B, LH, LW, 1).astype(np.float32),
        "fg_feats": rng.randn(B, LH, LW, DINO_C).astype(np.float32),
        "text_embeds": rng.randn(B, 77, CTX).astype(np.float32),
    }
    state, metrics = step_fn(state, unet_params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # ---- 2. export the trained weights OVER the fabricated checkpoint, in
    # the reference's own formats (what a finished training run publishes)
    trained = jax.device_get(state["params"])
    bn_dir = os.path.join(root, "BlobCtrl", "blobnet")
    ckpt_lib.export_blobnet_safetensors(
        trained["blobnet"],
        os.path.join(bn_dir, "diffusion_pytorch_model.safetensors"))
    with open(os.path.join(bn_dir, "config.json"), "w") as f:
        json.dump(config_io.blobnet_config_to_diffusers(blobnet_cfg), f)
    lora_dir = os.path.join(root, "BlobCtrl", "unet_lora")
    ckpt_lib.export_lora_safetensors(
        trained["lora"], os.path.join(lora_dir, "adapter_model.safetensors"))
    with open(os.path.join(lora_dir, "adapter_config.json"), "w") as f:
        json.dump({"r": 2, "lora_alpha": 2.0}, f)

    # ---- 3. the ONE checkpoint-day command: load the models_root and
    # replay + score every recorded demo state (pixels AND UI goldens)
    from blobctrl_tpu.apps import replay as replay_mod
    json_out = os.path.join(str(tmp_path_factory.mktemp("out")), "rows.json")
    monkeypatch.setattr("sys.argv", [
        "replay", "--models_root", root, "--demo_root", DEMO_ROOT,
        "--all", "--score", "--score_ui",
        "--steps", "2", "--num_samples", "1", "--json_out", json_out])
    replay_mod.main()

    out = capsys.readouterr().out
    assert '"artifacts_bit_exact": 52' in out  # UI goldens scored too

    with open(json_out) as f:
        rows = json.load(f)
    assert len(rows) == 9, [r["name"] for r in rows]
    for r in rows:
        assert r["num_scored"] >= 1, r
        assert r["psnr_db"] is not None and np.isfinite(r["psnr_db"]), r
