"""Split one edit's wall time into host-prep / dispatch / device+fetch by
wrapping the cached jitted edit fn. Prep = preprocess + upload enqueue;
device+fetch = loop + fixed device work + output transfer."""
import sys
import time

sys.path.insert(0, ".")
import numpy as np


def main():
    from blobctrl_tpu.utils import benchkit
    benchkit.enable_compile_cache()

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs(size=512, steps=steps)
    pipe(**kw)  # warm

    key = next(iter(pipe._denoise_cache))
    edit, sched = pipe._denoise_cache[key]
    marks = {}

    def wrapped(*a, **k):
        marks["enter"] = time.perf_counter()
        out = edit(*a, **k)
        marks["dispatched"] = time.perf_counter()
        return out
    pipe._denoise_cache[key] = (wrapped, sched)

    rows = []
    for _ in range(6):
        t0 = time.perf_counter()
        pipe(**kw)
        t3 = time.perf_counter()
        rows.append((marks["enter"] - t0, marks["dispatched"] - marks["enter"],
                     t3 - marks["dispatched"], t3 - t0))
    rows = np.array(rows[1:])  # drop first (any lingering warm effects)
    med = np.median(rows, axis=0) * 1e3
    print(f"steps={steps}: prep+upload-enqueue {med[0]:.1f} ms, "
          f"dispatch {med[1]:.1f} ms, device+fetch {med[2]:.1f} ms, "
          f"total {med[3]:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
