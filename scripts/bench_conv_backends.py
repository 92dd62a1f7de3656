"""In-process A/B/C: e2e 50-step edit with conv backend xla / auto / pallas.
One pipeline instance; the denoise cache is cleared between backends so each
traces fresh. Removes process-to-process variance from the comparison."""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from blobctrl_tpu.utils import benchkit
    benchkit.enable_compile_cache()
    from blobctrl_tpu.nn import resnet

    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs()

    for backend in (sys.argv[1:] or ["xla", "auto", "pallas"]):
        resnet.set_conv_backend(backend)
        pipe._denoise_cache.clear()
        pipe(**kw)  # compile + warmup
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            pipe(**kw)
            ts.append(time.perf_counter() - t0)
        print(f"backend={backend:8s} median={np.median(ts):.4f}s "
              f"times={[round(t, 4) for t in ts]}", flush=True)
    resnet.set_conv_backend("auto")


if __name__ == "__main__":
    main()
