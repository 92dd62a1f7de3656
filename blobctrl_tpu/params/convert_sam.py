"""SAM state_dict converters: transformers SamModel format AND the original
segment_anything sam_vit_h_4b8939.pth format (what the reference downloads,
scripts/download_models.py:15-30).

Target tree (see blobctrl_tpu.models.sam):
  vision: patch_embed, pos_embed, layers[i]{layer_norm1, attn{qkv, proj,
          rel_pos_h, rel_pos_w}, layer_norm2, mlp{lin1, lin2}},
          neck{conv1, layer_norm1, conv2, layer_norm2}
  prompt: shared_embedding (2, C/2), point_embed (4, C), not_a_point_embed,
          no_mask_embed
  decoder: iou_token (1, C), mask_tokens (4, C), transformer{layers[i]{...},
           final_attn_token_to_image, layer_norm_final_attn},
           upscale_conv1/2 (transposed, (kh, kw, c_in, c_out)),
           upscale_layer_norm, output_hypernetworks_mlps[i] (list of linear),
           iou_prediction_head (list of linear)
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np
import jax.numpy as jnp


def _np(t):
    return t.detach().cpu().float().numpy() if hasattr(t, "detach") else np.asarray(t)


def _lin(t):
    return jnp.asarray(_np(t).T)


def _vec(t):
    return jnp.asarray(_np(t))


def _conv(t):
    return jnp.asarray(_np(t).transpose(2, 3, 1, 0))


def _convt(t):
    # torch ConvTranspose2d weight (c_in, c_out, kh, kw) -> (kh, kw, c_out,
    # c_in), consumed with jax.lax.conv_transpose(transpose_kernel=True)
    # (the exact torch-equivalent; verified numerically)
    return jnp.asarray(_np(t).transpose(2, 3, 1, 0))


def convert_sam(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Accepts either key format; dispatches on the vision-tower prefix."""
    if any(k.startswith("image_encoder.") for k in state_dict):
        return _convert_original(state_dict)
    return _convert_transformers(state_dict)


def _mk_layers(n):
    return [dict() for _ in range(n)]


def _convert_transformers(sd: Dict[str, Any]) -> Dict[str, Any]:
    get = lambda k: sd[k]
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd
                       if k.startswith("vision_encoder.layers."))
    vision = {
        "patch_embed": {"kernel": _conv(get("vision_encoder.patch_embed.projection.weight")),
                        "bias": _vec(get("vision_encoder.patch_embed.projection.bias"))},
        "pos_embed": _vec(get("vision_encoder.pos_embed"))[0],
        "layers": _mk_layers(n_layers),
        "neck": {
            "conv1": {"kernel": _conv(get("vision_encoder.neck.conv1.weight"))},
            "layer_norm1": {"scale": _vec(get("vision_encoder.neck.layer_norm1.weight")),
                            "bias": _vec(get("vision_encoder.neck.layer_norm1.bias"))},
            "conv2": {"kernel": _conv(get("vision_encoder.neck.conv2.weight"))},
            "layer_norm2": {"scale": _vec(get("vision_encoder.neck.layer_norm2.weight")),
                            "bias": _vec(get("vision_encoder.neck.layer_norm2.bias"))},
        },
    }
    for i in range(n_layers):
        p = f"vision_encoder.layers.{i}."
        vision["layers"][i] = {
            "layer_norm1": {"scale": _vec(get(p + "layer_norm1.weight")),
                            "bias": _vec(get(p + "layer_norm1.bias"))},
            "attn": {"qkv": {"kernel": _lin(get(p + "attn.qkv.weight")),
                             "bias": _vec(get(p + "attn.qkv.bias"))},
                     "proj": {"kernel": _lin(get(p + "attn.proj.weight")),
                              "bias": _vec(get(p + "attn.proj.bias"))},
                     "rel_pos_h": _vec(get(p + "attn.rel_pos_h")),
                     "rel_pos_w": _vec(get(p + "attn.rel_pos_w"))},
            "layer_norm2": {"scale": _vec(get(p + "layer_norm2.weight")),
                            "bias": _vec(get(p + "layer_norm2.bias"))},
            "mlp": {"lin1": {"kernel": _lin(get(p + "mlp.lin1.weight")),
                             "bias": _vec(get(p + "mlp.lin1.bias"))},
                    "lin2": {"kernel": _lin(get(p + "mlp.lin2.weight")),
                             "bias": _vec(get(p + "mlp.lin2.bias"))}},
        }

    prompt = {
        "shared_embedding": _vec(get("prompt_encoder.shared_embedding.positional_embedding")),
        "point_embed": jnp.stack([_vec(get(f"prompt_encoder.point_embed.{i}.weight"))[0]
                                  for i in range(4)]),
        "not_a_point_embed": _vec(get("prompt_encoder.not_a_point_embed.weight"))[0],
        "no_mask_embed": _vec(get("prompt_encoder.no_mask_embed.weight"))[0],
    }

    def dec_attn(prefix):
        return {n: {"kernel": _lin(get(f"{prefix}.{n}.weight")),
                    "bias": _vec(get(f"{prefix}.{n}.bias"))}
                for n in ("q_proj", "k_proj", "v_proj", "out_proj")}

    def dec_ln(key):
        return {"scale": _vec(get(key + ".weight")), "bias": _vec(get(key + ".bias"))}

    n_dec = 1 + max(int(k.split(".")[3]) for k in sd
                    if k.startswith("mask_decoder.transformer.layers."))
    tlayers = []
    for i in range(n_dec):
        p = f"mask_decoder.transformer.layers.{i}"
        tlayers.append({
            "self_attn": dec_attn(p + ".self_attn"),
            "layer_norm1": dec_ln(p + ".layer_norm1"),
            "cross_attn_token_to_image": dec_attn(p + ".cross_attn_token_to_image"),
            "layer_norm2": dec_ln(p + ".layer_norm2"),
            "mlp": {"lin1": {"kernel": _lin(get(p + ".mlp.lin1.weight")),
                             "bias": _vec(get(p + ".mlp.lin1.bias"))},
                    "lin2": {"kernel": _lin(get(p + ".mlp.lin2.weight")),
                             "bias": _vec(get(p + ".mlp.lin2.bias"))}},
            "layer_norm3": dec_ln(p + ".layer_norm3"),
            "cross_attn_image_to_token": dec_attn(p + ".cross_attn_image_to_token"),
            "layer_norm4": dec_ln(p + ".layer_norm4"),
        })

    def ff(prefix):
        out = [{"kernel": _lin(get(f"{prefix}.proj_in.weight")),
                "bias": _vec(get(f"{prefix}.proj_in.bias"))}]
        i = 0
        while f"{prefix}.layers.{i}.weight" in sd:
            out.append({"kernel": _lin(get(f"{prefix}.layers.{i}.weight")),
                        "bias": _vec(get(f"{prefix}.layers.{i}.bias"))})
            i += 1
        out.append({"kernel": _lin(get(f"{prefix}.proj_out.weight")),
                    "bias": _vec(get(f"{prefix}.proj_out.bias"))})
        return out

    n_hyper = 1 + max(int(k.split(".")[2]) for k in sd
                      if k.startswith("mask_decoder.output_hypernetworks_mlps."))
    decoder = {
        "iou_token": _vec(get("mask_decoder.iou_token.weight")),
        "mask_tokens": _vec(get("mask_decoder.mask_tokens.weight")),
        "transformer": {
            "layers": tlayers,
            "final_attn_token_to_image": dec_attn(
                "mask_decoder.transformer.final_attn_token_to_image"),
            "layer_norm_final_attn": dec_ln(
                "mask_decoder.transformer.layer_norm_final_attn"),
        },
        "upscale_conv1": {"kernel": _convt(get("mask_decoder.upscale_conv1.weight")),
                          "bias": _vec(get("mask_decoder.upscale_conv1.bias"))},
        "upscale_layer_norm": dec_ln("mask_decoder.upscale_layer_norm"),
        "upscale_conv2": {"kernel": _convt(get("mask_decoder.upscale_conv2.weight")),
                          "bias": _vec(get("mask_decoder.upscale_conv2.bias"))},
        "output_hypernetworks_mlps": [
            ff(f"mask_decoder.output_hypernetworks_mlps.{i}") for i in range(n_hyper)],
        "iou_prediction_head": ff("mask_decoder.iou_prediction_head"),
    }
    return {"vision": vision, "prompt": prompt, "decoder": decoder}


def _convert_original(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Original segment_anything checkpoint -> transformers-style keys, then
    reuse the transformers converter."""
    remap: Dict[str, Any] = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("image_encoder.blocks.", "vision_encoder.layers.")
        nk = nk.replace("image_encoder.patch_embed.proj.",
                        "vision_encoder.patch_embed.projection.")
        nk = nk.replace("image_encoder.pos_embed", "vision_encoder.pos_embed")
        nk = nk.replace(".norm1.", ".layer_norm1.")
        nk = nk.replace(".norm2.", ".layer_norm2.")
        nk = nk.replace(".norm3.", ".layer_norm3.")
        nk = nk.replace(".norm4.", ".layer_norm4.")
        # neck: Sequential(conv1, LN, conv2, LN)
        nk = nk.replace("image_encoder.neck.0.", "vision_encoder.neck.conv1.")
        nk = nk.replace("image_encoder.neck.1.", "vision_encoder.neck.layer_norm1.")
        nk = nk.replace("image_encoder.neck.2.", "vision_encoder.neck.conv2.")
        nk = nk.replace("image_encoder.neck.3.", "vision_encoder.neck.layer_norm2.")
        # prompt encoder
        nk = nk.replace("prompt_encoder.pe_layer.positional_encoding_gaussian_matrix",
                        "prompt_encoder.shared_embedding.positional_embedding")
        nk = nk.replace("prompt_encoder.point_embeddings.", "prompt_encoder.point_embed.")
        # mask decoder
        nk = nk.replace(".norm_final_attn.", ".layer_norm_final_attn.")
        nk = nk.replace("mask_decoder.output_upscaling.0.", "mask_decoder.upscale_conv1.")
        nk = nk.replace("mask_decoder.output_upscaling.1.", "mask_decoder.upscale_layer_norm.")
        nk = nk.replace("mask_decoder.output_upscaling.3.", "mask_decoder.upscale_conv2.")
        remap[nk] = v

    # original FF MLPs are layers.{0,1,2}; transformers are proj_in/layers/proj_out
    out: Dict[str, Any] = {}
    for k, v in remap.items():
        if ".layers." in k and ("hypernetworks" in k or "iou_prediction_head" in k):
            head, tail = k.split(".layers.", 1)
            idx, leaf = tail.split(".", 1)
            idxs = sorted({int(kk.split(".layers.")[1].split(".")[0])
                           for kk in remap if kk.startswith(head + ".layers.")})
            last = max(idxs)
            i = int(idx)
            if i == 0:
                out[f"{head}.proj_in.{leaf}"] = v
            elif i == last:
                out[f"{head}.proj_out.{leaf}"] = v
            else:
                out[f"{head}.layers.{i - 1}.{leaf}"] = v
        else:
            out[k] = v
    return _convert_transformers(out)
