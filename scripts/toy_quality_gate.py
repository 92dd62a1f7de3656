"""Fast-mode drift on the TRAINED toy model (TPU).

Replays the same held-out move edits through the exact path and each opt-in
fast mode, printing PSNR(exact, mode) and the blob-control color error per
mode. Unlike the random-weight drift tests, these numbers are on trained
weights with smooth outputs — a meaningful (toy-scale) stand-in for the
checkpoint-day `replay --all --score` gates.

    python scripts/toy_quality_gate.py [--ckpt assets/toy_ckpt] [--n 4]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from blobctrl_tpu.train import toy  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="assets/toy_ckpt")
    ap.add_argument("--n", type=int, default=4, help="held-out edits")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--save_dir", default="/tmp/toy_gate")
    args = ap.parse_args()

    pipe, meta = toy.load_toy(args.ckpt)
    size = meta["size"]

    edits = []
    rng = np.random.RandomState(10_000)
    for _ in range(args.n):
        scene = toy.make_scene(rng, size)
        target = toy._random_ellipse(rng, size)
        edits.append((scene, target,
                      toy.edit_kwargs(scene, target, size=size,
                                      steps=args.steps)))

    from blobctrl_tpu.nn import attention
    from blobctrl_tpu.nn import resnet as resnet_mod
    from blobctrl_tpu.ops import conv3x3 as conv_mod

    def run_all(**extra):
        return [np.asarray(pipe(**kw, **extra).images[0])
                for _, _, kw in edits]

    modes = {}
    exact = run_all()
    modes["exact"] = exact

    modes["encoder-cache i3"] = run_all(encoder_cache_interval=3,
                                        encoder_cache_warmup=5)
    modes["cfg-interval .15-.75"] = run_all(cfg_guidance_start=0.15,
                                            cfg_guidance_end=0.75)
    attention.set_attention_backend("auto", qk_int8=True, int8_global_k=True)
    conv_mod.set_conv_int8(True)
    try:
        modes["int8-everything"] = run_all()
        modes["int8+cache"] = run_all(encoder_cache_interval=3,
                                      encoder_cache_warmup=5)
    finally:
        attention.set_attention_backend("auto", qk_int8=False,
                                        int8_global_k=False)
        conv_mod.set_conv_int8(False)
        resnet_mod.set_conv_backend("auto")

    os.makedirs(args.save_dir, exist_ok=True)
    from PIL import Image
    print(f"\n{'mode':24s} {'PSNR vs exact':>14s} {'color err':>10s}")
    for name, outs in modes.items():
        psnrs = [toy.psnr(e, o) for e, o in zip(exact, outs)]
        cerrs = [toy.color_error_inside(o, t, s["cls"], size)
                 for o, (s, t, _) in zip(outs, edits)]
        p = float("inf") if name == "exact" else float(np.median(psnrs))
        print(f"{name:24s} {p:>14.2f} {np.median(cerrs):>10.3f}")
        for i, o in enumerate(outs):
            Image.fromarray((o * 255).astype(np.uint8)).save(
                f"{args.save_dir}/{name.replace(' ', '_')}_{i}.png")
    for i, (s, t, kw) in enumerate(edits):
        Image.fromarray(s["image"]).save(f"{args.save_dir}/scene_{i}.png")
        Image.fromarray(kw["bg_image"]).save(f"{args.save_dir}/bg_{i}.png")
    print(f"images in {args.save_dir}")


if __name__ == "__main__":
    main()
