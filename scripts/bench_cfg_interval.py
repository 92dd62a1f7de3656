"""Guidance-interval CFG e2e A/B on real TPU (one process at a time!).

Interleaves exact vs cfg-window edits rep-by-rep (host drift makes
sequential A/Bs mislead — PERF_NOTES "Measurement methodology") and reports
per-pair deltas. Window 0.15,0.75 = the benched default (60% of steps
guided, 40% cond-only at UNet batch 1).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from blobctrl_tpu.utils import benchkit

benchkit.enable_compile_cache()

import numpy as np  # noqa: E402


def main():
    pairs = int(os.environ.get("PAIRS", "4"))
    w0, w1 = (float(x) for x in
              os.environ.get("CFG_WINDOW", "0.15,0.75").split(","))
    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs()

    if os.environ.get("INT8", "0") == "1":
        # interleave int8-alone vs int8+window (the stackability A/B)
        from blobctrl_tpu.nn import attention
        from blobctrl_tpu.ops import conv3x3 as conv_mod
        attention.set_attention_backend("auto", qk_int8=True,
                                        int8_global_k=True)
        conv_mod.set_conv_int8(True)
        print("int8-everything ON for both variants", flush=True)

    def run_exact():
        return pipe(**kw).images

    def run_window():
        return pipe(cfg_guidance_start=w0, cfg_guidance_end=w1, **kw).images

    print("warming exact", flush=True)
    run_exact()
    print("warming window", flush=True)
    run_window()

    deltas = []
    ex_ts, wi_ts = [], []
    for i in range(pairs):
        t0 = time.perf_counter(); run_exact(); a = time.perf_counter() - t0
        t0 = time.perf_counter(); run_window(); b = time.perf_counter() - t0
        ex_ts.append(a); wi_ts.append(b); deltas.append(a - b)
        print(f"pair {i}: exact {a:.3f}s window {b:.3f}s delta {a-b:+.3f}s",
              flush=True)
    print(f"median exact {np.median(ex_ts):.3f}s, "
          f"median window {np.median(wi_ts):.3f}s, "
          f"speedup {np.median(ex_ts)/np.median(wi_ts):.3f}x, "
          f"deltas {['%+.3f' % d for d in deltas]}")


if __name__ == "__main__":
    main()
