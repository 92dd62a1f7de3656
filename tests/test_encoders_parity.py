"""Parity tests: VAE / CLIP text / DINOv2 vs torch oracles (tiny random
configs, fp32 CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.models import clip_text as clip_lib
from blobctrl_tpu.models import dinov2 as dino_lib
from blobctrl_tpu.params import convert
from tests.oracles import assert_close, import_diffusers, nchw_to_nhwc, nhwc_to_nchw

torch = pytest.importorskip("torch")

RNG = np.random.RandomState(3)


@pytest.mark.slow
def test_tiny_vae_parity():
    import_diffusers()
    from diffusers import AutoencoderKL
    torch.manual_seed(0)
    tvae = AutoencoderKL(
        in_channels=3, out_channels=3, latent_channels=4,
        block_out_channels=(8, 16), layers_per_block=2, norm_num_groups=4,
        down_block_types=("DownEncoderBlock2D",) * 2,
        up_block_types=("UpDecoderBlock2D",) * 2,
        sample_size=32).eval()
    params = convert.convert_vae(tvae.state_dict())
    cfg = vae_lib.VAEConfig(block_out_channels=(8, 16), norm_num_groups=4)

    img = RNG.randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        moments_ref = tvae.encode(torch.from_numpy(img)).latent_dist.parameters.numpy()
    moments = vae_lib.encode(params, cfg, jnp.asarray(nchw_to_nhwc(img)))
    assert_close(nhwc_to_nchw(np.asarray(moments)), moments_ref, atol=2e-4,
                 rtol=2e-3, name="vae_encode")

    lat = RNG.randn(1, 4, 16, 16).astype(np.float32)
    with torch.no_grad():
        dec_ref = tvae.decode(torch.from_numpy(lat)).sample.numpy()
    dec = vae_lib.decode(params, cfg, jnp.asarray(nchw_to_nhwc(lat)))
    assert_close(nhwc_to_nchw(np.asarray(dec)), dec_ref, atol=2e-4, rtol=2e-3,
                 name="vae_decode")


@pytest.mark.slow
def test_tiny_clip_text_parity():
    from transformers import CLIPTextModel, CLIPTextConfig
    torch.manual_seed(0)
    tcfg = CLIPTextConfig(vocab_size=99, hidden_size=16, intermediate_size=32,
                          num_hidden_layers=2, num_attention_heads=2,
                          max_position_embeddings=77)
    tmodel = CLIPTextModel(tcfg).eval()
    params = convert.convert_clip_text(tmodel.state_dict())
    cfg = clip_lib.CLIPTextConfig(vocab_size=99, hidden_size=16,
                                  intermediate_size=32, num_layers=2,
                                  num_heads=2)

    ids = RNG.randint(0, 99, (2, 77)).astype(np.int32)
    with torch.no_grad():
        out = tmodel(torch.from_numpy(ids).long(), output_hidden_states=True)
    got = clip_lib.apply(params, cfg, jnp.asarray(ids))
    assert_close(np.asarray(got), out.last_hidden_state.numpy(), atol=2e-4,
                 rtol=2e-3, name="clip_last_hidden")

    # clip_skip path: hidden_states[-(k+2)] + final LN (k=1)
    got_skip = clip_lib.encode_with_clip_skip(params, cfg, jnp.asarray(ids), clip_skip=1)
    ref_skip = tmodel.text_model.final_layer_norm(out.hidden_states[-3]).detach().numpy()
    assert_close(np.asarray(got_skip), ref_skip, atol=2e-4, rtol=2e-3,
                 name="clip_skip")


def test_tiny_dinov2_parity():
    from transformers import Dinov2Model, Dinov2Config
    torch.manual_seed(0)
    tcfg = Dinov2Config(hidden_size=16, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=32,
                        image_size=28, patch_size=14)
    tmodel = Dinov2Model(tcfg).eval()
    params = convert.convert_dinov2(tmodel.state_dict())
    cfg = dino_lib.DINOv2Config(hidden_size=16, num_layers=2, num_heads=2,
                                intermediate_size=32, patch_size=14,
                                image_size=28)

    px = RNG.randn(2, 3, 28, 28).astype(np.float32)
    with torch.no_grad():
        out = tmodel(torch.from_numpy(px))
    hs, pooled = dino_lib.apply(params, cfg, jnp.asarray(nchw_to_nhwc(px)))
    assert_close(np.asarray(hs), out.last_hidden_state.numpy(), atol=2e-4,
                 rtol=2e-3, name="dino_hidden")
    assert_close(np.asarray(pooled), out.pooler_output.numpy(), atol=2e-4,
                 rtol=2e-3, name="dino_pooled")


def test_tiny_dinov2_interpolated_pos_parity():
    """Input at a different resolution than the checkpoint grid exercises the
    bicubic position-embedding interpolation."""
    from transformers import Dinov2Model, Dinov2Config
    torch.manual_seed(0)
    tcfg = Dinov2Config(hidden_size=16, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=32,
                        image_size=56, patch_size=14)
    tmodel = Dinov2Model(tcfg).eval()
    params = convert.convert_dinov2(tmodel.state_dict())
    cfg = dino_lib.DINOv2Config(hidden_size=16, num_layers=2, num_heads=2,
                                intermediate_size=32, patch_size=14,
                                image_size=56)

    px = RNG.randn(1, 3, 28, 28).astype(np.float32)  # 2x2 grid vs native 4x4
    with torch.no_grad():
        out = tmodel(torch.from_numpy(px))
    hs, pooled = dino_lib.apply(params, cfg, jnp.asarray(nchw_to_nhwc(px)))
    # torch-matching bicubic (no antialias) => tight tolerance
    assert_close(np.asarray(pooled), out.pooler_output.numpy(), atol=5e-4,
                 rtol=5e-3, name="dino_pooled_interp")
    assert_close(np.asarray(hs), out.last_hidden_state.numpy(), atol=5e-4,
                 rtol=5e-3, name="dino_hidden_interp")
