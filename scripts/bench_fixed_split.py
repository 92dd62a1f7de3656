"""In-process fixed-vs-per-step split: time the edit at several step counts."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp

    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.blob import math as blob_math
    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.models import vae as vae_lib
    from blobctrl_tpu.pipeline import BlobNetPipeline

    size = 512
    dtype = jnp.bfloat16
    unet_cfg = flagship.sd15_unet_config()
    blobnet_cfg = flagship.blobctrl_blobnet_config()
    vae_cfg = flagship.sd15_vae_config()
    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg,
        unet_params=flagship.structural_params(unet_lib.init_unet, unet_cfg, dtype),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=flagship.structural_params(blobnet_lib.init_blobnet,
                                                  blobnet_cfg, dtype),
        vae_cfg=vae_cfg,
        vae_params=flagship.structural_params(vae_lib.init_vae, vae_cfg, dtype),
        dtype=dtype)

    rng = np.random.RandomState(0)
    fg = rng.randint(0, 255, (size, size, 3)).astype(np.uint8)
    bg = rng.randint(0, 255, (size, size, 3)).astype(np.uint8)
    gs = np.asarray(blob_math.blob_score_from_ellipse(
        ((size * 0.55, size * 0.5), (size * 0.25, size * 0.4), 30.0),
        size, size, (size // 8, size // 8)))
    pe = rng.randn(1, 77, 768).astype(np.float32) * 0.02
    npe = rng.randn(1, 77, 768).astype(np.float32) * 0.02
    dino = rng.randn(1, 1024).astype(np.float32) * 0.1
    lat0 = rng.randn(1, size // 8, size // 8, 4).astype(np.float32)

    def run(steps):
        return pipe(fg_image=fg, bg_image=bg, gs_score=gs, height=size,
                    width=size, num_inference_steps=steps, guidance_scale=7.5,
                    latents=lat0, prompt_embeds=pe, negative_prompt_embeds=npe,
                    blobnet_conditioning_scale=1.6,
                    blobnet_control_guidance_end=0.9, scheduler="unipc",
                    fg_dino_feats=dino).images

    res = {}
    for steps in (10, 50):
        run(steps)
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            run(steps)
            ts.append(time.perf_counter() - t0)
        res[steps] = float(np.median(ts))
        print(f"steps={steps:3d} median={res[steps]:.4f}s "
              f"times={[round(t, 4) for t in ts]}", flush=True)
    s = (res[50] - res[10]) / 40
    print(f"per-step={1e3 * s:.1f} ms  fixed={1e3 * (res[50] - 50 * s):.0f} ms")


if __name__ == "__main__":
    main()
