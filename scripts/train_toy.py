"""Train the toy BlobCtrl from scratch and save the quality-gate checkpoint.

Produces assets/toy_ckpt/{toy.safetensors,toy.json} (~3.5 MB) consumed by
tests/test_toy_quality_gate.py, plus eval PNGs for visual inspection.

    python scripts/train_toy.py --out assets/toy_ckpt \
        --vae_steps 1500 --diff_steps 8000
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from blobctrl_tpu.train import toy  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="assets/toy_ckpt")
    ap.add_argument("--n_train", type=int, default=4096)
    ap.add_argument("--size", type=int, default=128,
                    help=">=256 trains the 3-level geometry "
                         "(toy.toy_configs)")
    ap.add_argument("--vae_steps", type=int, default=1500)
    ap.add_argument("--diff_steps", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--vae_batch", type=int, default=None,
                    help="VAE-phase batch (default --batch); the VAE "
                         "backward is the memory peak at 256^2")
    ap.add_argument("--p_two_objects", type=float, default=0.0,
                    help="fraction of 2-object (multi-blob) scenes")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval_dir", default="/tmp/toy_eval")
    args = ap.parse_args()

    t0 = time.time()
    unet_cfg, blobnet_cfg, vae_cfg = toy.toy_configs(size=args.size)
    cache = (f"/tmp/toy_data_{args.n_train}_{args.size}_{args.seed}"
             f"_{args.p_two_objects}.npz")
    if os.path.exists(cache):
        print(f"loading dataset cache {cache}...", flush=True)
        data = dict(np.load(cache))
    else:
        print("building dataset...", flush=True)
        data = toy.build_dataset(args.n_train, size=args.size, seed=args.seed,
                                 p_two_objects=args.p_two_objects)
        np.savez(cache, **data)

    print("training VAE...", flush=True)
    vae_params, vae_cfg, vae_mse = toy.train_toy_vae(
        data["image"], vae_cfg, steps=args.vae_steps,
        batch=args.vae_batch or args.batch, seed=args.seed)
    print(f"vae done: mse {vae_mse:.5f} "
          f"scaling {vae_cfg.scaling_factor:.3f}", flush=True)

    print("encoding dataset...", flush=True)
    batch_data = toy.encode_dataset(vae_params, vae_cfg, data)

    print("training diffusion (BlobNet + full UNet)...", flush=True)
    unet_params, blobnet_params, diff_loss = toy.train_toy_diffusion(
        batch_data, unet_cfg, blobnet_cfg, steps=args.diff_steps,
        batch=args.batch, seed=args.seed)

    meta = {"ctx": 16, "dino_c": 16, "size": args.size,
            "vae_scaling_factor": vae_cfg.scaling_factor,
            "vae_recon_mse": vae_mse, "final_loss": diff_loss,
            "n_train": args.n_train, "vae_steps": args.vae_steps,
            "diff_steps": args.diff_steps, "batch": args.batch,
            "p_two_objects": args.p_two_objects, "seed": args.seed}
    toy.save_toy(args.out, unet_params, blobnet_params, vae_params, meta)
    print(f"saved {args.out} in {time.time() - t0:.0f}s", flush=True)

    # quick eval: one held-out move edit, exact path
    pipe, _ = toy.load_toy(args.out)
    rng = np.random.RandomState(10_000)
    scene = toy.make_scene(rng, args.size)
    target = toy._random_ellipse(rng, args.size)
    kw = toy.edit_kwargs(scene, target, size=args.size)
    out = pipe(**kw).images[0]
    err = toy.color_error_inside(out, target, scene["cls"], args.size)
    print(f"eval move edit: inside-target color error {err:.3f}", flush=True)

    os.makedirs(args.eval_dir, exist_ok=True)
    from PIL import Image
    Image.fromarray(scene["image"]).save(f"{args.eval_dir}/scene.png")
    Image.fromarray(kw["bg_image"]).save(f"{args.eval_dir}/bg.png")
    Image.fromarray((out * 255).astype(np.uint8)).save(
        f"{args.eval_dir}/edit.png")
    print(f"eval images in {args.eval_dir}", flush=True)


if __name__ == "__main__":
    main()
