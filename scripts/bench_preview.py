"""Measure the cost of in-flight latent previews on the real chip.

Interleaved A/B (PERF_NOTES methodology): exact edit vs the same edit with
callback_on_step_end + callback_interval=N (the serving --preview_every
path). The preview graph differs from the exact graph only by a lax.cond'd
jax.debug.callback after the scheduler update, so the delta is the price of
the per-preview-step d2h latent transfer (64 KB f32 at 512^2) plus callback
dispatch through the tunnel.

Usage: python scripts/bench_preview.py [steps=50] [interval=5] [pairs=4]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    interval = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from blobctrl_tpu.utils import benchkit
    benchkit.enable_compile_cache()
    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs(size=512, steps=steps)

    fired = []

    def cb(_p, i, _t, tensors):
        fired.append(int(i))

    def run_exact():
        pipe._cond_lat_cache.clear()
        return pipe(**kw).images

    def run_preview():
        pipe._cond_lat_cache.clear()
        fired.clear()
        return pipe(callback_on_step_end=cb, callback_interval=interval,
                    **kw).images

    print("warming both graphs...", flush=True)
    run_exact()
    run_preview()
    n_previews = len(fired)

    deltas, ex_ts, pv_ts = [], [], []
    for p in range(pairs):
        t0 = time.perf_counter()
        run_exact()
        te = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_preview()
        tp = time.perf_counter() - t0
        ex_ts.append(te)
        pv_ts.append(tp)
        deltas.append(tp - te)
        print(f"pair {p}: exact {te:.3f}s preview {tp:.3f}s "
              f"delta {tp - te:+.3f}s", flush=True)

    print(f"\nsteps={steps} interval={interval} -> {n_previews} previews"
          f" (steps {sorted(set(fired))[:5]}...)")
    print(f"exact   median {np.median(ex_ts):.3f}s")
    print(f"preview median {np.median(pv_ts):.3f}s")
    print(f"delta   median {np.median(deltas):+.3f}s "
          f"({np.median(deltas) / n_previews * 1e3:+.1f} ms/preview)")


if __name__ == "__main__":
    main()
