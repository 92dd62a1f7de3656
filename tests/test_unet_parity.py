"""End-to-end numerics parity: tiny random-weight UNet / BlobNet vs the torch
oracle (vendored diffusers + reference BlobNetModel), fp32 CPU.

This validates architecture + weight conversion without needing the real
checkpoints (SURVEY.md §4 test strategy).
"""

import importlib.util
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.params import convert
from tests.oracles import (assert_close, import_diffusers, nchw_to_nhwc,
                           nhwc_to_nchw, REFERENCE_ROOT)

torch = pytest.importorskip("torch")

RNG = np.random.RandomState(42)


def tiny_torch_unet(in_channels=4):
    import_diffusers()
    from diffusers import UNet2DConditionModel
    torch.manual_seed(0)
    return UNet2DConditionModel(
        sample_size=8,
        in_channels=in_channels,
        out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        cross_attention_dim=16,
        attention_head_dim=2,
        norm_num_groups=4,
        layers_per_block=2,
    ).eval()


TINY_CFG = unet_lib.UNetConfig(
    in_channels=4,
    out_channels=4,
    block_out_channels=(8, 16),
    down_block_has_attn=(True, False),
    up_block_has_attn=(False, True),
    layers_per_block=2,
    cross_attention_dim=16,
    num_heads=2,
    norm_num_groups=4,
)


@pytest.mark.slow
def test_tiny_unet_parity():
    tunet = tiny_torch_unet()
    params = convert.convert_unet(tunet.state_dict())

    x = RNG.randn(2, 4, 8, 8).astype(np.float32)
    ctx = RNG.randn(2, 7, 16).astype(np.float32)
    with torch.no_grad():
        ref = tunet(torch.from_numpy(x), 17,
                    encoder_hidden_states=torch.from_numpy(ctx)).sample.numpy()

    got = unet_lib.unet_apply(params, TINY_CFG, jnp.asarray(nchw_to_nhwc(x)),
                              jnp.asarray(17), jnp.asarray(ctx))
    assert_close(nhwc_to_nchw(np.asarray(got)), ref, atol=2e-4, rtol=2e-3,
                 name="tiny_unet")


def test_tiny_unet_injection_parity():
    """Double-width input + the full 6/1/7 injection protocol vs the patched
    torch UNet (unet_2d_condition.py:1200-1338)."""
    tunet = tiny_torch_unet()
    params = convert.convert_unet(tunet.state_dict())

    h, w = 8, 16  # double width
    x = RNG.randn(1, 4, h, w).astype(np.float32)
    ctx = RNG.randn(1, 7, 16).astype(np.float32)

    # residual shapes follow the hidden-state trajectory (right-half width)
    down_shapes = [(1, 8, 8, 8), (1, 8, 8, 8), (1, 8, 8, 8), (1, 8, 4, 4),
                   (1, 16, 4, 4), (1, 16, 4, 4)]
    mid_shape = (1, 16, 4, 4)
    up_shapes = [(1, 16, 4, 4), (1, 16, 4, 4), (1, 16, 4, 4), (1, 16, 8, 8),
                 (1, 8, 8, 8), (1, 8, 8, 8), (1, 8, 8, 8)]
    down_res = [RNG.randn(*s).astype(np.float32) * 0.1 for s in down_shapes]
    mid_res = RNG.randn(*mid_shape).astype(np.float32) * 0.1
    up_res = [RNG.randn(*s).astype(np.float32) * 0.1 for s in up_shapes]

    with torch.no_grad():
        ref = tunet(torch.from_numpy(x), 3,
                    encoder_hidden_states=torch.from_numpy(ctx),
                    down_block_add_samples=[torch.from_numpy(r) for r in down_res],
                    mid_block_add_sample=torch.from_numpy(mid_res),
                    up_block_add_samples=[torch.from_numpy(r) for r in up_res],
                    ).sample.numpy()

    got = unet_lib.unet_apply(
        params, TINY_CFG, jnp.asarray(nchw_to_nhwc(x)), jnp.asarray(3),
        jnp.asarray(ctx),
        down_block_add_samples=[jnp.asarray(nchw_to_nhwc(r)) for r in down_res],
        mid_block_add_sample=jnp.asarray(nchw_to_nhwc(mid_res)),
        up_block_add_samples=[jnp.asarray(nchw_to_nhwc(r)) for r in up_res])
    assert_close(nhwc_to_nchw(np.asarray(got)), ref, atol=2e-4, rtol=2e-3,
                 name="tiny_unet_inject")


def _load_reference_blobnet_module():
    import_diffusers()
    spec = importlib.util.spec_from_file_location(
        "ref_blobnet", f"{REFERENCE_ROOT}/blobctrl/models/blobnet.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tiny_blobnet_parity():
    ref_mod = _load_reference_blobnet_module()
    torch.manual_seed(1)
    tblob = ref_mod.BlobNetModel(
        in_channels=4,
        conditioning_channels=2,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        cross_attention_dim=None,
        attention_head_dim=2,
        norm_num_groups=4,
        layers_per_block=2,
    ).eval()
    # the reference zero-inits taps; randomize them so the test is non-trivial
    with torch.no_grad():
        for m in list(tblob.blobnet_down_blocks) + [tblob.blobnet_mid_block] + list(tblob.blobnet_up_blocks):
            m.weight.copy_(torch.randn_like(m.weight) * 0.1)
            m.bias.copy_(torch.randn_like(m.bias) * 0.1)

    params = convert.convert_unet(tblob.state_dict())
    cfg = blobnet_lib.BlobNetConfig(
        in_channels=4, conditioning_channels=2,
        block_out_channels=(8, 16),
        down_block_has_attn=(True, False),
        up_block_has_attn=(False, True),
        layers_per_block=2, cross_attention_dim=None,
        num_heads=2, norm_num_groups=4)

    x = RNG.randn(1, 6, 8, 16).astype(np.float32)  # double-width 6ch
    with torch.no_grad():
        rd, rm, ru = tblob(torch.from_numpy(x), 5, conditioning_scale=1.3,
                           return_dict=False)

    gd, gm, gu = blobnet_lib.blobnet_apply(
        params, cfg, jnp.asarray(nchw_to_nhwc(x)), jnp.asarray(5),
        conditioning_scale=1.3)

    assert len(gd) == len(rd) and len(gu) == len(ru)
    for i, (g, r) in enumerate(zip(gd, rd)):
        assert_close(nhwc_to_nchw(np.asarray(g)), r.numpy(), atol=2e-4,
                     rtol=2e-3, name=f"blobnet_down[{i}]")
    assert_close(nhwc_to_nchw(np.asarray(gm)), rm.numpy(), atol=2e-4,
                 rtol=2e-3, name="blobnet_mid")
    for i, (g, r) in enumerate(zip(gu, ru)):
        assert_close(nhwc_to_nchw(np.asarray(g)), r.numpy(), atol=2e-4,
                     rtol=2e-3, name=f"blobnet_up[{i}]")


def test_blobnet_from_unet_matches_reference():
    """from_unet clones UNet weights exactly like the reference
    BlobNetModel.from_unet (blobnet.py:493-572): conv_in kernel zero-padded
    over the extra conditioning channels (bias copied whole), time embedding
    and every down/mid/up block weight copied, zero taps left at zero —
    verified leaf-for-leaf against the torch oracle's resulting state."""
    ref_mod = _load_reference_blobnet_module()
    tunet = tiny_torch_unet()
    with torch.no_grad():
        tblob = ref_mod.BlobNetModel.from_unet(tunet, conditioning_channels=2)
    ref_params = convert.convert_unet(tblob.state_dict())

    cfg = blobnet_lib.BlobNetConfig(
        in_channels=4, conditioning_channels=2,
        block_out_channels=(8, 16),
        down_block_has_attn=(True, False),
        up_block_has_attn=(False, True),
        layers_per_block=2, cross_attention_dim=None,
        num_heads=2, norm_num_groups=4)
    got = blobnet_lib.from_unet(convert.convert_unet(tunet.state_dict()), cfg)

    ref_leaves, ref_treedef = jax.tree_util.tree_flatten_with_path(ref_params)
    got_leaves, got_treedef = jax.tree_util.tree_flatten_with_path(got)
    assert ref_treedef == got_treedef
    for (rp, r), (_, g) in zip(ref_leaves, got_leaves):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=1e-6,
            err_msg=jax.tree_util.keystr(rp))
    # the taps really are zero (non-trivially: time emb is not)
    assert np.asarray(got["zero_mid"]["kernel"]).any() == False
    assert np.abs(np.asarray(
        got["time_embedding"]["linear_1"]["kernel"])).max() > 0

    # a BlobNet weight without a UNet source must raise (the reference's
    # len(missing)==0 assert), e.g. a deeper BlobNet than the UNet
    deeper = blobnet_lib.BlobNetConfig(
        in_channels=4, conditioning_channels=2,
        block_out_channels=(8, 16),
        down_block_has_attn=(True, False),
        up_block_has_attn=(False, True),
        layers_per_block=3, cross_attention_dim=None,
        num_heads=2, norm_num_groups=4)
    with pytest.raises(ValueError):
        blobnet_lib.from_unet(convert.convert_unet(tunet.state_dict()), deeper)


@pytest.mark.slow
def test_four_level_sd_structure_parity():
    """Full SD-1.5 block topology (4 levels, 3 CrossAttn + 1 plain down,
    1 plain + 3 CrossAttn up) at small channels — catches per-level wiring
    that the 2-level tests cannot (skip channels, upsample sizes, head
    counts)."""
    import_diffusers()
    from diffusers import UNet2DConditionModel
    torch.manual_seed(3)
    boc = (8, 16, 32, 32)
    tunet = UNet2DConditionModel(
        sample_size=16, in_channels=4, out_channels=4,
        block_out_channels=boc,
        down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
        up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
        cross_attention_dim=16, attention_head_dim=2, norm_num_groups=4,
        layers_per_block=2).eval()
    params = convert.convert_unet(tunet.state_dict())
    cfg = unet_lib.UNetConfig(
        in_channels=4, out_channels=4, block_out_channels=boc,
        down_block_has_attn=(True, True, True, False),
        up_block_has_attn=(False, True, True, True),
        layers_per_block=2, cross_attention_dim=16, num_heads=2,
        norm_num_groups=4)

    x = RNG.randn(1, 4, 16, 32).astype(np.float32)  # double-width too
    ctx = RNG.randn(1, 7, 16).astype(np.float32)
    with torch.no_grad():
        ref = tunet(torch.from_numpy(x), 123,
                    encoder_hidden_states=torch.from_numpy(ctx)).sample.numpy()
    got = unet_lib.unet_apply(params, cfg, jnp.asarray(nchw_to_nhwc(x)),
                              jnp.asarray(123), jnp.asarray(ctx))
    assert_close(nhwc_to_nchw(np.asarray(got)), ref, atol=5e-4, rtol=5e-3,
                 name="sd_structure_unet")
