"""Break down the fixed (non-loop) cost of one edit: preprocess, VAE encode
x2, score prep, denoise dispatch, VAE decode, host RTT."""
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
    from blobctrl_tpu.pipeline.blobnet_pipeline import preprocess_image

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

    def timeit(label, f, n=5):
        f()  # warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = f()
            jax.block_until_ready(r) if hasattr(r, "block_until_ready") or isinstance(r, jax.Array) else None
            ts.append(time.perf_counter() - t0)
        print(f"{label:28s} {1e3 * float(np.median(ts)):8.1f} ms", flush=True)
        return f()

    fgp = timeit("preprocess_image (host)", lambda: preprocess_image(fg, size, size))
    fgj = jnp.asarray(fgp)
    timeit("host->device transfer", lambda: jnp.asarray(np.asarray(fgp)) + 0)
    lat = timeit("vae encode (1 img)", lambda: pipe._encode_image(fgj))
    timeit("gs score (host)", lambda: np.asarray(blob_math.blob_score_from_ellipse(
        ((size * 0.55, size * 0.5), (size * 0.25, size * 0.4), 30.0),
        size, size, (size // 8, size // 8))))
    lat4 = jnp.tile(jnp.asarray(lat, jnp.float32), (1, 1, 1, 1))
    timeit("vae decode", lambda: pipe._decode_latents(lat4))
    # null jit dispatch RTT
    f0 = jax.jit(lambda x: x + 1)
    timeit("null jit dispatch RTT", lambda: f0(lat4))

    # full pipeline at steps=1 (pure fixed cost + 1 step)
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

    timeit("pipeline steps=1", lambda: run(1), n=3)
    timeit("pipeline steps=2", lambda: run(2), n=3)
    timeit("pipeline steps=10", lambda: run(10), n=3)


if __name__ == "__main__":
    main()
