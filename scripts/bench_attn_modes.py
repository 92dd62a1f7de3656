"""In-process A/B: exact flash vs int8-QK^T flash, e2e 50-step edit.

Note: with structural (zero) weights the drift readout is vacuous — Q/K are
degenerate; rerun with real checkpoints for a meaningful quality number."""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from blobctrl_tpu.utils import benchkit
    benchkit.enable_compile_cache()
    from blobctrl_tpu.nn import attention

    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs()

    base = None
    for label, int8 in (("exact", False), ("int8-qk", True)):
        attention.set_attention_backend("auto", qk_int8=int8)
        pipe._denoise_cache.clear()
        ref = pipe(**kw).images
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            pipe(**kw)
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
