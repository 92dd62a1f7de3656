"""Break down the fixed (non-loop) cost of one edit: host preprocess,
transfers, splat, dispatch RTT, and short-step pipeline calls.

Caveat (measured): `block_until_ready` LIES through the device tunnel here —
only timings that fetch real bytes (np.asarray of an output) are valid."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np


def main():
    from blobctrl_tpu.utils import benchkit
    benchkit.enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from blobctrl_tpu.blob import math as blob_math
    from blobctrl_tpu.pipeline.blobnet_pipeline import preprocess_image

    size = 512
    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs(size=size)
    fg = kw["fg_image"]

    def timeit(label, f, n=5):
        f()
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        print(f"{label:28s} {1e3 * float(np.median(ts)):8.1f} ms", flush=True)

    timeit("preprocess_image (host)", lambda: preprocess_image(fg, size, size))
    timeit("gs score (jitted splat)", lambda: np.asarray(
        blob_math.blob_score_from_ellipse(
            ((size * 0.55, size * 0.5), (size * 0.25, size * 0.4), 30.0),
            size, size, (size // 8, size // 8))))
    lat4 = jnp.asarray(kw["latents"])
    f0 = jax.jit(lambda x: x + 1)
    timeit("null jit dispatch + fetch", lambda: np.asarray(f0(lat4)))
    for steps in (1, 2, 10):
        kws = benchkit.standard_edit_kwargs(size=size, steps=steps)
        timeit(f"pipeline steps={steps}", lambda: pipe(**kws), n=3)


if __name__ == "__main__":
    main()
