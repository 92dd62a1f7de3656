"""Training data pipeline: (image, mask, prompt) -> batch -> train step."""

import numpy as np
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.slow  # full data->train-step path
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.apps import flagship
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import dinov2 as dino_lib
from blobctrl_tpu.models import lora as lora_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.pipeline import BlobNetPipeline
from blobctrl_tpu.train import data as data_lib
from blobctrl_tpu.train import train_step as ts


def test_blobdata_loader_and_train_step():
    cv2 = pytest.importorskip("cv2")
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    dino_cfg = dino_lib.DINOv2Config(hidden_size=16, num_layers=1, num_heads=2,
                                     intermediate_size=32, patch_size=14,
                                     image_size=28)
    unet_params = unet_lib.init_unet(key, unet_cfg)
    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_params,
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg),
        dino_cfg=dino_cfg, dino_params=dino_lib.init(key, dino_cfg),
        dino_image_size=28)

    size = 64
    rng = np.random.RandomState(0)
    images, masks, pes = [], [], []
    for i in range(4):
        img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        mask = np.zeros((size, size), np.uint8)
        cv2.ellipse(mask, ((32 + i, 30), (18, 26), 10.0 * i), 255, -1)
        images.append(img)
        masks.append(mask)
        pes.append(rng.randn(7, 16).astype(np.float32))

    loader = data_lib.BlobDataLoader(pipe, images, masks, pes,
                                     batch_size=2, size=size)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["x0_latents"].shape == (2, 8, 8, 4)
    assert b["fg_feats"].shape == (2, 8, 8, 16)
    assert b["text_embeds"].shape == (2, 7, 16)

    cfg = ts.TrainConfig(compute_dtype=jnp.float32, remat=False,
                         learning_rate=1e-3)
    lora_params = lora_lib.init_lora(key, unet_params, rank=2)
    state = ts.init_train_state(cfg, pipe.blobnet_params, lora_params)
    step_fn = ts.make_train_step(cfg, unet_cfg, blobnet_cfg)
    state, metrics = step_fn(state, unet_params, b, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
