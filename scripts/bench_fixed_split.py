"""In-process fixed-vs-per-step split: time the edit at several step counts,
with latent output (64 KB fetch) isolating the loop from decode+fetch."""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from blobctrl_tpu.utils import benchkit
    benchkit.enable_compile_cache()

    pipe = benchkit.make_flagship_pipe()
    res = {}
    for steps, ot in ((10, "latent"), (50, "latent"), (50, "np")):
        kw = benchkit.standard_edit_kwargs(steps=steps)
        pipe(output_type=ot, **kw)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            pipe(output_type=ot, **kw)
            ts.append(time.perf_counter() - t0)
        res[(steps, ot)] = float(np.min(ts))
        print(f"steps={steps:3d} out={ot:7s} min={np.min(ts):.4f} "
              f"times={[round(t, 3) for t in ts]}", flush=True)
    s = (res[(50, "latent")] - res[(10, "latent")]) / 40
    print(f"per-step={1e3 * s:.1f} ms  "
          f"fixed_latent={1e3 * (res[(50, 'latent')] - 50 * s):.0f} ms  "
          f"decode+fetch={1e3 * (res[(50, 'np')] - res[(50, 'latent')]):.0f} ms")


if __name__ == "__main__":
    main()
