"""Inference CLI, mirroring the reference entry point
(/root/reference/scripts/blobctrl_inference.py:286-378): loads the checkpoint
layout, builds the blob score from an ellipse list, runs the pipeline, saves a
results gallery (optionally with the ellipse overlay).

Usage:
  python -m blobctrl_tpu.apps.cli \
      --models_root ./models \
      --original_image scene.png --scene_prompt "a photo of ..." \
      --object_image object_centered.png --edited_background bg.png \
      --ellipse "300,260,120,220,35" [--remove] ...
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from blobctrl_tpu.pipeline.blobnet_pipeline import SCHEDULER_NAMES


def parse_ellipse(spec: str):
    """'xc,yc,d1,d2,angle' -> cv2-style ellipse (a real parser; the reference
    demo used eval() on user text, blobctrl_app.py:1388 — do not replicate)."""
    parts = [float(x) for x in spec.replace("(", " ").replace(")", " ")
             .replace(";", ",").split(",") if x.strip()]
    if len(parts) != 5:
        raise argparse.ArgumentTypeError(
            f"ellipse must be 'xc,yc,d1,d2,angle_deg', got {spec!r}")
    return ((parts[0], parts[1]), (parts[2], parts[3]), parts[4])


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="BlobCtrl-TPU element-level image editing")
    p.add_argument("--models_root", default="models",
                   help="checkpoint root (download_models.py layout)")
    p.add_argument("--original_image", required=False,
                   help="original scene image (for --remove background build)")
    p.add_argument("--object_image", required=True,
                   help="object on white 512x512 canvas (fg_image)")
    p.add_argument("--edited_background", required=False,
                   help="background with edit region masked (bg_image)")
    p.add_argument("--ellipse_mask", required=False,
                   help="mask image of the start ellipse (for --remove)")
    p.add_argument("--scene_prompt", required=True)
    p.add_argument("--negative_prompt", default=None)
    p.add_argument("--ellipse", type=parse_ellipse, action="append", required=True,
                   help="'xc,yc,d1,d2,angle'; repeat for multi-round edits "
                        "(the last one is used, like the reference)")
    p.add_argument("--remove", action="store_true", help="remove-blob mode")
    p.add_argument("--blobnet_control_strength", type=float, default=1.2)
    p.add_argument("--blobnet_control_guidance_start", type=float, default=0.0)
    p.add_argument("--blobnet_control_guidance_end", type=float, default=0.9)
    p.add_argument("--num_samples", type=int, default=1)
    p.add_argument("--seed", type=int, default=1248464818)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--scheduler", choices=SCHEDULER_NAMES,
                   default="unipc")
    p.add_argument("--dtype", choices=("bf16", "f32"), default="bf16")
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--plot_ellipse", action="store_true",
                   help="additionally save outputs with the ellipse drawn")
    p.add_argument("--mesh", default=None, metavar="data=N,model=M",
                   help="shard the edit over a device mesh, e.g. "
                        "'data=1,model=4' for tensor-parallel singles on a "
                        "v5e-4 (outputs are identical to unsharded; only "
                        "latency changes)")
    p.add_argument("--hybrid_cfg_data", action="store_true",
                   help="single-edit latency recipe: shard the CFG pair "
                        "over the data axis and weights over model "
                        "(defaults to data=2 x model=<rest> when --mesh is "
                        "not given)")
    return p


def run(args) -> list:
    import jax.numpy as jnp
    from PIL import Image

    from blobctrl_tpu.blob import math as blob_math
    from blobctrl_tpu.params import io as params_io
    from blobctrl_tpu.pipeline.blobnet_pipeline import preprocess_image

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    pipe = params_io.load_pipeline(args.models_root, dtype=dtype)
    if getattr(args, "mesh", None) or getattr(args, "hybrid_cfg_data", False):
        from blobctrl_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.shard_pipeline_from_flags(
            pipe, mesh_spec=args.mesh,
            hybrid_cfg_data=args.hybrid_cfg_data)
        print(json.dumps({"mesh": dict(mesh.shape),
                          "hybrid_cfg_data": bool(args.hybrid_cfg_data)}))

    fg_image = Image.open(args.object_image)
    width, height = fg_image.size
    lh, lw = height // 8, width // 8

    if not args.remove:
        assert args.edited_background, "--edited_background required unless --remove"
        bg_image = Image.open(args.edited_background)
        final_ellipse = args.ellipse[-1]
        gs_score = blob_math.blob_score_from_ellipse(final_ellipse, width, height, (lh, lw))
        strength = args.blobnet_control_strength
    else:
        assert args.original_image and args.ellipse_mask, \
            "--remove needs --original_image and --ellipse_mask"
        orig = np.asarray(Image.open(args.original_image).convert("RGB"))
        mask = np.asarray(Image.open(args.ellipse_mask).convert("L")) > 0
        bg_np = np.where(mask[..., None], 255, orig).astype(np.uint8)
        bg_image = Image.fromarray(bg_np)
        final_ellipse = args.ellipse[0]
        gs_score = blob_math.removal_score((lh, lw))
        strength = 0.0  # reference forces control strength to 0 in remove mode

    t0 = time.perf_counter()
    out = pipe(prompt=[args.scene_prompt] * args.num_samples,
               negative_prompt=args.negative_prompt,
               fg_image=fg_image, bg_image=bg_image, gs_score=np.asarray(gs_score),
               height=height, width=width,
               num_inference_steps=args.num_inference_steps,
               guidance_scale=args.guidance_scale,
               seed=args.seed,
               blobnet_conditioning_scale=strength,
               blobnet_control_guidance_start=args.blobnet_control_guidance_start,
               blobnet_control_guidance_end=args.blobnet_control_guidance_end,
               scheduler=args.scheduler)
    dt = time.perf_counter() - t0

    os.makedirs(args.output_dir, exist_ok=True)
    paths = []
    for i, img in enumerate(out.images):
        arr = (img * 255).astype(np.uint8)
        path = os.path.join(args.output_dir, f"edit_{i}.png")
        Image.fromarray(arr).save(path)
        paths.append(path)
        if args.plot_ellipse:
            import cv2
            arr2 = arr.copy()
            cv2.ellipse(arr2, (tuple(map(int, final_ellipse[0])),
                               tuple(map(int, final_ellipse[1])),
                               final_ellipse[2]), [0, 255, 0], 3)
            path2 = os.path.join(args.output_dir, f"edit_{i}_ellipse.png")
            Image.fromarray(arr2).save(path2)
            paths.append(path2)
    print(json.dumps({"outputs": paths, "seconds": round(dt, 3)}))
    return paths


def main():
    from blobctrl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
