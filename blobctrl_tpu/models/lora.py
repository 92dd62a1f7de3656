"""LoRA adapters for the UNet (the reference loads a PEFT-injected UNet-LoRA,
scripts/blobctrl_inference.py:269-274).

Functional design: the LoRA is a separate param tree mirroring the UNet's
attention-projection paths, each leaf {"A": (in, r), "B": (r, out)}.

  * inference: fuse once at load (W += scale * A @ B) — zero runtime cost;
  * training: merge per step (differentiable w.r.t. A/B; the merge matmuls
    are O(r·in·out), negligible next to a forward pass, and XLA fuses them).
"""

from __future__ import annotations

import math
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out")


def _iter_attention_paths(params, prefix=()):
    """Yield (path, leaf_dict) for every attention projection in a UNet tree."""
    if isinstance(params, dict):
        for k, v in params.items():
            if k in DEFAULT_TARGETS and isinstance(v, dict) and "kernel" in v:
                yield prefix + (k,), v
            else:
                yield from _iter_attention_paths(v, prefix + (k,))
    elif isinstance(params, list):
        for i, v in enumerate(params):
            yield from _iter_attention_paths(v, prefix + (i,))


def _get(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def init_lora(key, unet_params, rank: int = 16,
              targets: Tuple[str, ...] = DEFAULT_TARGETS) -> Dict[str, Any]:
    """LoRA tree keyed by 'path/as/string' -> {A, B}; B zero-init (standard).
    The tree contains ONLY array leaves (safe under jax.grad); rank is
    implicit in A's trailing dim, alpha is passed to merge_lora."""
    lora: Dict[str, Any] = {}
    for path, leaf in _iter_attention_paths(unet_params):
        if path[-1] not in targets:
            continue
        d_in, d_out = leaf["kernel"].shape
        key, sub = jax.random.split(key)
        lora["/".join(map(str, path))] = {
            "A": jax.random.normal(sub, (d_in, rank), jnp.float32) / math.sqrt(d_in),
            "B": jnp.zeros((rank, d_out), jnp.float32),
        }
    return lora


def merge_lora(unet_params, lora: Dict[str, Any], scale: float = 1.0,
               alpha: Optional[float] = None):
    """Returns a NEW param tree with W += (scale * alpha / r) * A @ B
    (alpha defaults to r, i.e. effective factor = scale — PEFT convention
    when lora_alpha == r). Differentiable w.r.t. the LoRA leaves."""

    def copy_structure(node):
        if isinstance(node, dict):
            return {k: copy_structure(v) for k, v in node.items()}
        if isinstance(node, list):
            return [copy_structure(v) for v in node]
        return node

    new_params = copy_structure(unet_params)
    for key, ab in lora.items():
        rank = ab["A"].shape[-1]
        eff = scale * (alpha if alpha is not None else rank) / rank
        path = [int(p) if p.isdigit() else p for p in key.split("/")]
        leaf = _get(new_params, path)
        if ab["A"].ndim == 4:
            # k x k conv adapter: A is (kh, kw, in, r), B (r, out). PEFT
            # composes conv(A) then 1x1 conv(B), whose merged kernel is
            # delta[h,w,i,o] = sum_r A[h,w,i,r] * B[r,o] — exactly this
            # einsum on our HWIO layout (peft/tuners/lora/layer.py
            # Conv2d.get_delta_weight does the same via F.conv2d).
            assert leaf["kernel"].shape[:2] == ab["A"].shape[:2], (
                f"LoRA delta for {key} has spatial dims "
                f"{ab['A'].shape[:2]} but the target kernel is "
                f"{leaf['kernel'].shape}")
            delta = jnp.einsum("hwir,ro->hwio", ab["A"], ab["B"]) * eff
        else:
            delta = (ab["A"] @ ab["B"]) * eff
            if leaf["kernel"].ndim == 4:
                # 1x1 conv target stored HWIO (1, 1, in, out): lift the
                # linear delta onto the kernel's singleton spatial dims
                assert leaf["kernel"].shape[:2] == (1, 1), (
                    f"LoRA delta for {key} is a linear map but the target "
                    f"kernel is {leaf['kernel'].shape}")
                delta = delta[None, None]
        leaf["kernel"] = leaf["kernel"] + delta.astype(leaf["kernel"].dtype)
    return new_params


# ---------------------------------------------------------------------------
# checkpoint conversion (PEFT + diffusers key formats)
# ---------------------------------------------------------------------------

_PEFT_RE = re.compile(
    r"^(?:base_model\.model\.|unet\.)?(?P<body>.+?)\.(?P<ab>lora_[AB])"
    r"(?:\.(?:default|weight))*(?:\.weight)?$")


def convert_lora_state_dict(state_dict: Dict[str, Any],
                            alpha: Optional[float] = None) -> Dict[str, Any]:
    """PEFT/diffusers LoRA state_dict -> our tree. Handles keys like
      base_model.model.down_blocks.0.attentions.0.transformer_blocks.0.attn1.
        to_q.lora_A.weight                              (PEFT)
      unet.….attn1.to_q.lora_A.weight / lora.up/down    (diffusers)
    torch lora_A: (r, in) -> A (in, r); lora_B: (out, r) -> B (r, out)."""
    out: Dict[str, Any] = {}
    rank = None
    unrecognized: List[str] = []
    for key, tensor in state_dict.items():
        k = key.replace(".lora.down.", ".lora_A.").replace(".lora.up.", ".lora_B.")
        m = _PEFT_RE.match(k)
        if not m:
            unrecognized.append(key)
            continue
        body, ab = m.group("body"), m.group("ab")
        parts = body.split(".")
        # normalize to our tree path names
        norm: List[str] = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if p == "transformer_blocks":
                norm.append("blocks")
            elif p == "to_out":
                norm.append("to_out")
                if i + 1 < len(parts) and parts[i + 1] == "0":
                    i += 1
            elif p == "ff" and parts[i + 1:i + 3] == ["net", "0"]:
                # ff.net.0.proj -> ff/proj_in (GEGLU input projection)
                norm += ["ff", "proj_in"]
                i += 4 if parts[i + 3:i + 4] == ["proj"] else 3
                continue
            elif p == "ff" and parts[i + 1:i + 3] == ["net", "2"]:
                norm += ["ff", "proj_out"]
                i += 3
                continue
            elif p == "processor":
                i += 1
                continue
            elif (p in ("downsamplers", "upsamplers")
                    and parts[i + 1:i + 2] == ["0"]):
                # diffusers down_blocks.N.downsamplers.0.conv -> our
                # down_blocks/N/downsample/conv (single sampler per block)
                norm.append("downsample" if p == "downsamplers" else "upsample")
                i += 2
                continue
            else:
                norm.append(p)
            i += 1
        path_key = "/".join(norm)
        arr = np.asarray(tensor.detach().cpu().float().numpy()
                         if hasattr(tensor, "detach") else tensor)
        conv_a = None
        if arr.ndim == 4:
            # PEFT stores Conv2d adapters 4-D: lora_A (r, in, kh, kw),
            # lora_B (out, r, 1, 1). 1x1 kernels are linear maps — squeeze
            # to 2-D; merge_lora broadcasts the (in, out) delta onto our
            # HWIO (1, 1, in, out) conv leaves. Diffusers SD-1.5 adapters
            # routinely carry these (proj_in/proj_out when
            # use_linear_projection=False), so this must not hard-fail.
            # A k x k lora_A (conv1/conv2/conv_in/... targets) stays 4-D,
            # transposed to HWIO-style (kh, kw, in, r) for merge_lora's
            # conv-composition einsum.
            if arr.shape[2:] == (1, 1):
                arr = arr[:, :, 0, 0]
            elif ab == "lora_A":
                conv_a = np.transpose(arr, (2, 3, 1, 0))
            else:
                raise NotImplementedError(
                    f"LoRA lora_B on a {arr.shape[2]}x{arr.shape[3]} conv "
                    f"not supported: {key} (shape {arr.shape}) — PEFT "
                    "Conv2d adapters always use a 1x1 lora_B")
        elif arr.ndim != 2:
            raise NotImplementedError(
                f"LoRA on non-linear module not supported: {key} "
                f"(shape {arr.shape})")
        entry = out.setdefault(path_key, {})
        if ab == "lora_A":
            entry["A"] = jnp.asarray(conv_a if conv_a is not None else arr.T)
            rank = arr.shape[0]
        else:
            entry["B"] = jnp.asarray(arr.T)
            rank = arr.shape[1]
    if unrecognized:
        raise ValueError(
            f"{len(unrecognized)} LoRA keys not recognized (e.g. "
            f"{unrecognized[:3]}); extend convert_lora_state_dict's mapping")
    assert rank is not None, "no LoRA keys recognized"
    return out
