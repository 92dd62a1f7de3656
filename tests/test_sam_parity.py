"""SAM parity vs transformers SamModel (tiny random config)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.models import sam as sam_lib
from blobctrl_tpu.params import convert_sam
from tests.oracles import assert_close, nchw_to_nhwc

torch = pytest.importorskip("torch")

RNG = np.random.RandomState(9)


@pytest.fixture(scope="module")
def tiny():
    from transformers import SamModel, SamConfig
    torch.manual_seed(0)
    cfg = SamConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=3,
                           num_attention_heads=2, image_size=64, patch_size=16,
                           global_attn_indexes=[1], window_size=2,
                           output_channels=16, mlp_dim=64, num_pos_feats=8),
        prompt_encoder_config=dict(hidden_size=16, image_embedding_size=4,
                                   image_size=64, mask_input_channels=4,
                                   num_pos_feats=8),
        mask_decoder_config=dict(hidden_size=16, num_attention_heads=2,
                                 iou_head_hidden_dim=16, mlp_dim=32),
    )
    tmodel = SamModel(cfg).eval()
    params = convert_sam.convert_sam(tmodel.state_dict())
    jcfg = sam_lib.SAMConfig(
        hidden_size=32, num_layers=3, num_heads=2, mlp_dim=64, patch_size=16,
        image_size=64, window_size=2, global_attn_indexes=(1,),
        output_channels=16, prompt_dim=16, decoder_heads=2,
        decoder_mlp_dim=32)
    return tmodel, params, jcfg


@pytest.mark.slow
def test_sam_vision_encoder_parity(tiny):
    tmodel, params, jcfg = tiny
    px = RNG.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tmodel.vision_encoder(torch.from_numpy(px)).last_hidden_state
    got = sam_lib.vision_encoder(params["vision"], jcfg, jnp.asarray(nchw_to_nhwc(px)))
    # transformers returns (B, C, g, g)
    assert_close(np.moveaxis(np.asarray(got), -1, 1), ref.numpy(), atol=5e-4,
                 rtol=5e-3, name="sam_vision")


@pytest.mark.slow
def test_sam_end_to_end_mask_parity(tiny):
    tmodel, params, jcfg = tiny
    px = RNG.randn(1, 3, 64, 64).astype(np.float32)
    pts = np.array([[[[40.0, 30.0]]]], np.float32)   # (B, point_batch, N, 2)
    lbs = np.array([[[1]]], np.int64)
    with torch.no_grad():
        out = tmodel(pixel_values=torch.from_numpy(px),
                     input_points=torch.from_numpy(pts),
                     input_labels=torch.from_numpy(lbs),
                     multimask_output=True)
    ref_masks = out.pred_masks[0, 0].numpy()      # (3, 16, 16)
    ref_iou = out.iou_scores[0, 0].numpy()

    emb = sam_lib.vision_encoder(params["vision"], jcfg, jnp.asarray(nchw_to_nhwc(px)))
    sparse = sam_lib.encode_points(params["prompt"], jcfg,
                                   jnp.asarray(pts[0]), jnp.asarray(lbs[0].astype(np.int32)))
    dense = sam_lib.dense_no_mask_embedding(params["prompt"], jcfg, 1)
    pe = sam_lib.image_grid_pe(params["prompt"], jcfg)
    masks, iou = sam_lib.mask_decoder(params["decoder"], jcfg, emb, pe, sparse, dense)
    masks, iou = sam_lib.select_mask(masks, iou, multimask=True)
    # normalize by the reference's own scale: random-init mask logits are
    # ~1e-5, so a raw atol would accept anything (incl. all-zeros)
    mscale = max(float(np.abs(ref_masks).max()), 1e-12)
    assert_close(np.asarray(masks[0]) / mscale, ref_masks / mscale,
                 atol=2e-3, rtol=2e-2, name="sam_masks")
    iscale = max(float(np.abs(ref_iou).max()), 1e-12)
    assert_close(np.asarray(iou[0]) / iscale, ref_iou / iscale,
                 atol=2e-3, rtol=2e-2, name="sam_iou")


def test_sam_original_key_format(tiny):
    """Spot-check that the original segment_anything key format maps to the
    same leaves as the transformers format."""
    tmodel, params, jcfg = tiny
    sd = {k: v for k, v in tmodel.state_dict().items()
          if k != "shared_image_embedding.positional_embedding"}
    orig = {}
    for k, v in sd.items():
        nk = (k.replace("vision_encoder.layers.", "image_encoder.blocks.")
               .replace("vision_encoder.patch_embed.projection.",
                        "image_encoder.patch_embed.proj.")
               .replace("vision_encoder.pos_embed", "image_encoder.pos_embed")
               .replace("vision_encoder.neck.conv1.", "image_encoder.neck.0.")
               .replace("vision_encoder.neck.layer_norm1.", "image_encoder.neck.1.")
               .replace("vision_encoder.neck.conv2.", "image_encoder.neck.2.")
               .replace("vision_encoder.neck.layer_norm2.", "image_encoder.neck.3."))
        if nk.startswith("image_encoder.blocks."):
            nk = nk.replace(".layer_norm1.", ".norm1.").replace(".layer_norm2.", ".norm2.")
        if nk.startswith("mask_decoder.transformer.layers."):
            # the real sam_vit_h checkpoint uses norm1..norm4 in decoder layers
            nk = (nk.replace(".layer_norm1.", ".norm1.")
                    .replace(".layer_norm2.", ".norm2.")
                    .replace(".layer_norm3.", ".norm3.")
                    .replace(".layer_norm4.", ".norm4."))
        nk = (nk.replace("transformer.layer_norm_final_attn.", "transformer.norm_final_attn.")
                .replace("prompt_encoder.shared_embedding.positional_embedding",
                         "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix")
                .replace("prompt_encoder.point_embed.", "prompt_encoder.point_embeddings.")
                .replace("mask_decoder.upscale_conv1.", "mask_decoder.output_upscaling.0.")
                .replace("mask_decoder.upscale_layer_norm.", "mask_decoder.output_upscaling.1.")
                .replace("mask_decoder.upscale_conv2.", "mask_decoder.output_upscaling.3."))
        if "hypernetworks" in nk or "iou_prediction_head" in nk:
            # transformers proj_in/layers.i/proj_out -> original layers.0/1+i/last
            if ".proj_in." in nk:
                nk = nk.replace(".proj_in.", ".layers.0.")
            elif ".proj_out." in nk:
                nk = nk.replace(".proj_out.", ".layers.2.")
            elif ".layers." in nk:
                head, tail = nk.split(".layers.", 1)
                idx, leaf = tail.split(".", 1)
                nk = f"{head}.layers.{int(idx) + 1}.{leaf}"
        orig[nk] = v
    params2 = convert_sam.convert_sam(orig)
    flat1, tree1 = jax.tree_util.tree_flatten(params)
    flat2, tree2 = jax.tree_util.tree_flatten(params2)
    assert tree1 == tree2
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
