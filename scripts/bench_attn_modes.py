"""In-process A/B: exact flash vs int8-QK^T flash, e2e 50-step edit."""
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
    from blobctrl_tpu.nn import attention
    from blobctrl_tpu.pipeline import BlobNetPipeline

    size, steps = 512, 50
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

    def run():
        return pipe(fg_image=fg, bg_image=bg, gs_score=gs, height=size,
                    width=size, num_inference_steps=steps, guidance_scale=7.5,
                    latents=lat0, prompt_embeds=pe, negative_prompt_embeds=npe,
                    blobnet_conditioning_scale=1.6,
                    blobnet_control_guidance_end=0.9, scheduler="unipc",
                    fg_dino_feats=dino).images

    for label, int8 in (("exact", False), ("int8-qk", True)):
        attention.set_attention_backend("auto", qk_int8=int8)
        pipe._denoise_cache.clear()
        ref = run()
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            out = run()
            ts.append(time.perf_counter() - t0)
        if label == "exact":
            base = ref
        else:
            drift = np.abs(ref.astype(np.float64) - base.astype(np.float64))
            print(f"  int8 pixel drift: max={drift.max():.4f} "
                  f"mean={drift.mean():.5f}")
        print(f"attn={label:8s} median={np.median(ts):.4f}s "
              f"times={[round(t, 4) for t in ts]}", flush=True)
    attention.set_attention_backend("auto", qk_int8=False)


if __name__ == "__main__":
    main()
