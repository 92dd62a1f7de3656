"""Config round-trip + diffusers config translation."""

import json

import numpy as np
import pytest

from blobctrl_tpu.models.blobnet import BlobNetConfig
from blobctrl_tpu.models.unet import UNetConfig
from blobctrl_tpu.params import config_io


def test_dataclass_json_roundtrip(tmp_path):
    cfg = UNetConfig(in_channels=5, block_out_channels=(8, 16),
                     down_block_has_attn=(True, False),
                     up_block_has_attn=(False, True), num_heads=2,
                     cross_attention_dim=16, norm_num_groups=4)
    path = str(tmp_path / "config.json")
    config_io.save_config(cfg, path)
    loaded = config_io.load_config(UNetConfig, path)
    assert loaded == cfg


def test_unet_config_from_diffusers_sd15():
    sd15 = {
        "in_channels": 4, "out_channels": 4,
        "block_out_channels": [320, 640, 1280, 1280],
        "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        "up_block_types": ["UpBlock2D"] + ["CrossAttnUpBlock2D"] * 3,
        "layers_per_block": 2, "cross_attention_dim": 768,
        "attention_head_dim": 8, "norm_num_groups": 32, "norm_eps": 1e-5,
    }
    cfg = config_io.unet_config_from_diffusers(sd15)
    assert cfg.block_out_channels == (320, 640, 1280, 1280)
    assert cfg.down_block_has_attn == (True, True, True, False)
    assert cfg.up_block_has_attn == (False, True, True, True)
    assert cfg.num_heads == 8 and cfg.cross_attention_dim == 768


def test_blobnet_config_from_diffusers():
    bn = {
        "in_channels": 4, "conditioning_channels": 1025,
        "block_out_channels": [320, 640, 1280, 1280],
        "down_block_types": ["CrossAttnDownBlock2D"] * 3 + ["DownBlock2D"],
        "up_block_types": ["UpBlock2D"] + ["CrossAttnUpBlock2D"] * 3,
        "layers_per_block": 2, "cross_attention_dim": None,
        "attention_head_dim": 8,
    }
    cfg = config_io.blobnet_config_from_diffusers(bn)
    assert cfg.conditioning_channels == 1025
    assert cfg.cross_attention_dim is None


@pytest.mark.slow
def test_guess_mode_scaling():
    import jax
    import jax.numpy as jnp
    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.models import blobnet as blobnet_lib
    _, bcfg = flagship.tiny_configs()
    params = blobnet_lib.init_blobnet(jax.random.PRNGKey(0), bcfg)
    # randomize taps
    params["zero_mid"]["kernel"] = jnp.ones_like(params["zero_mid"]["kernel"]) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 16, 4 + 17))
    d1, m1, u1 = blobnet_lib.blobnet_apply(params, bcfg, x, jnp.asarray(5.0),
                                           conditioning_scale=1.0)
    d2, m2, u2 = blobnet_lib.blobnet_apply(params, bcfg, x, jnp.asarray(5.0),
                                           conditioning_scale=1.0, guess_mode=True)
    # guess mode scales the first down residual by 0.1, mid by 1.0
    np.testing.assert_allclose(np.asarray(d2[0]), np.asarray(d1[0]) * 0.1, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(m1), rtol=1e-5)
