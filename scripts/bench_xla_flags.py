"""XLA compiler-flag sweep for the exact-path 50-step edit.

XLA_FLAGS are read once at backend init, so each variant runs in a fresh
subprocess; variants are INTERLEAVED rep-by-rep (PERF_NOTES "Measurement
methodology": the host drifts over tens of minutes, so sequential A/B
misleads). Each worker builds the flagship pipe, warms the graph, then
prints a median-of-3 timing. Per-variant compile caches keep reruns cheap
without cross-flag cache poisoning.

Usage:  python scripts/bench_xla_flags.py            # sweep
        XLA-FLAGS-set python scripts/bench_xla_flags.py --worker  # one cell
"""

import json
import os
import subprocess
import sys
import time

VARIANTS = [
    ("base", ""),
    # scoped VMEM is the XLA-fusion working-set budget; the default leaves
    # most of the 128 MB v5e VMEM to Pallas. Raising it lets XLA form larger
    # fusions in the ~18 ms/step small-fusion bucket (PERF_NOTES "Where one
    # step goes") at the risk of starving the Pallas kernels.
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
    # the latency-hiding scheduler mostly reorders collectives, but it also
    # changes copy/compute overlap decisions single-chip.
    ("lhs", "--xla_tpu_enable_latency_hiding_scheduler=true"),
]


def worker():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["SWEEP_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import numpy as np
    from blobctrl_tpu.utils import benchkit
    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs()
    pipe(**kw).images  # warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        pipe(**kw).images
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"median": float(np.median(ts)),
                      "times": [round(t, 4) for t in ts]}))


def sweep(reps: int = 3):
    results = {name: [] for name, _ in VARIANTS}
    for rep in range(reps):
        for name, flags in VARIANTS:
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            env = dict(os.environ)
            env["XLA_FLAGS"] = flags
            env["SWEEP_CACHE_DIR"] = f"/root/jax_cache_sweep_{name}"
            env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                env=env, capture_output=True, text=True, timeout=1200,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
            try:
                med = json.loads(line)["median"]
                results[name].append(med)
                print(f"rep {rep} {name:<8} {med:.3f}s", flush=True)
            except (json.JSONDecodeError, KeyError):
                results[name].append(None)
                print(f"rep {rep} {name:<8} FAILED rc={p.returncode} "
                      f"stderr tail: {p.stderr.strip()[-300:]}", flush=True)
    print("\n== per-variant medians (paired reps above for drift) ==")
    import numpy as np
    base = [t for t in results["base"] if t]
    for name, _ in VARIANTS:
        ok = [t for t in results[name] if t]
        if not ok:
            print(f"{name:<8} all reps failed")
            continue
        med = float(np.median(ok))
        rel = float(np.median(base)) / med if base else float("nan")
        print(f"{name:<8} {med:.3f}s  ({rel:.3f}x vs base)")


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        sweep()
