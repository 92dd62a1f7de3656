"""Training checkpoint save/restore (orbax) + export to reference formats.

The reference is load-only (safetensors via from_pretrained, SURVEY.md §5);
training here adds real checkpoint/resume:
  * save/restore the full train state (params + optimizer + step) with orbax
  * export trained BlobNet / LoRA back to safetensors in the reference's key
    format so reference-side tooling can consume them.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def save(ckpt_dir: str, state, step: Optional[int] = None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(ckpt_dir)
    with ocp.StandardCheckpointer() as ckptr:
        s = int(state["step"]) if step is None else step
        ckptr.save(os.path.join(path, f"step_{s:08d}"), state, force=True)


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    # Only exact step_NNNN dirs count: an interrupted orbax save leaves a
    # 'step_NNNN.orbax-checkpoint-tmp-<ts>' dir which must not crash (or be
    # picked up by) resume — that is the crash-recovery scenario itself.
    steps = [int(m.group(1)) for d in os.listdir(ckpt_dir)
             if (m := re.fullmatch(r"step_(\d+)", d))]
    return max(steps) if steps else None


def restore(ckpt_dir: str, abstract_state, step: Optional[int] = None):
    import orbax.checkpoint as ocp
    s = step if step is not None else latest_step(ckpt_dir)
    assert s is not None, f"no checkpoints in {ckpt_dir}"
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{s:08d}")
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract_state)


# ---------------------------------------------------------------------------
# export to reference checkpoint formats
# ---------------------------------------------------------------------------

def _flatten(tree, prefix=""):
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}."))
    elif isinstance(tree, list):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _to_torch_key(path: str, arr: np.ndarray):
    """Invert params/convert.py naming back to diffusers keys + layouts.
    (ff.proj_in/proj_out must already be renamed to ff.net.* by the caller.)"""
    k = (path.replace(".kernel", ".weight").replace(".scale", ".weight")
         .replace("zero_down.", "blobnet_down_blocks.")
         .replace("zero_mid.", "blobnet_mid_block.")
         .replace("zero_up.", "blobnet_up_blocks.")
         .replace(".blocks.", ".transformer_blocks.")
         .replace(".downsample.conv.", ".downsamplers.0.conv.")
         .replace(".upsample.conv.", ".upsamplers.0.conv.")
         .replace(".to_out.weight", ".to_out.0.weight")
         .replace(".to_out.bias", ".to_out.0.bias"))
    if k.endswith(".weight"):
        if arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)
        elif arr.ndim == 2:
            arr = arr.T
    return k, arr


def export_blobnet_safetensors(blobnet_params, out_path: str):
    """Our BlobNet tree -> diffusers-format safetensors (reference
    BlobNetModel key names)."""
    from safetensors.numpy import save_file
    flat = _flatten(blobnet_params)
    sd = {}
    for path, arr in flat.items():
        # restore ff naming before generic inversion
        p = path
        if ".ff.proj_in." in p:
            p = p.replace(".ff.proj_in.", ".ff.net.0.proj.")
        if ".ff.proj_out." in p:
            p = p.replace(".ff.proj_out.", ".ff.net.2.")
        k, a = _to_torch_key(p, np.asarray(arr, np.float32))
        sd[k] = np.ascontiguousarray(a)  # safetensors writes raw buffers
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    save_file(sd, out_path)
    return sd


def export_lora_safetensors(lora_params, out_path: str):
    """Our LoRA tree -> PEFT-format safetensors."""
    from safetensors.numpy import save_file
    sd = {}
    for key, ab in lora_params.items():
        body = key.replace("/", ".").replace(".blocks.", ".transformer_blocks.")
        if body.endswith(".to_out"):
            body += ".0"
        sd[f"base_model.model.{body}.lora_A.weight"] = np.ascontiguousarray(
            np.asarray(ab["A"], np.float32).T)
        sd[f"base_model.model.{body}.lora_B.weight"] = np.ascontiguousarray(
            np.asarray(ab["B"], np.float32).T)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    save_file(sd, out_path)
    return sd
