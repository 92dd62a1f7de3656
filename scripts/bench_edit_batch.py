"""Distinct-edit micro-batch throughput on the real chip.

Times pipeline.edit_batch with B distinct requests (the serving path) against
B sequential solo edits. Per-image step cost is flat in batch (PERF_NOTES
"Batch scaling"), so the single-chip win is amortized fixed cost
(encode/decode/dispatch/fetch); the larger point is multi-chip: a data=N mesh
runs a batch of N distinct requests at one-edit latency.

Usage: python scripts/bench_edit_batch.py [B] [steps]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from blobctrl_tpu.utils import benchkit


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    benchkit.enable_compile_cache()
    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs(size=512, steps=steps)

    rng = np.random.RandomState(0)
    reqs = []
    for i in range(B):
        r = dict(fg_image=rng.randint(0, 255, (512, 512, 3)).astype(np.uint8),
                 bg_image=rng.randint(0, 255, (512, 512, 3)).astype(np.uint8),
                 gs_score=kw["gs_score"], seed=i)
        for k in ("prompt_embeds", "negative_prompt_embeds", "fg_dino_feats"):
            if k in kw:
                r[k] = kw[k]
        reqs.append(r)
    shared = dict(height=512, width=512, num_inference_steps=steps,
                  guidance_scale=kw.get("guidance_scale", 7.5),
                  blobnet_conditioning_scale=kw.get(
                      "blobnet_conditioning_scale", 1.2))

    print("warming solo graph", file=sys.stderr, flush=True)
    pipe(**kw)
    solo_times = []
    for _ in range(B):
        t0 = time.perf_counter()
        pipe(**kw)
        solo_times.append(time.perf_counter() - t0)
    solo_total = sum(solo_times)

    print("warming batch graph", file=sys.stderr, flush=True)
    pipe.edit_batch(reqs, **shared)
    bt = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = pipe.edit_batch(reqs, **shared)
        bt.append(time.perf_counter() - t0)
    batch_sec = float(np.median(bt))
    assert out.images.shape[0] == B
    print(f"B={B} steps={steps}: sequential {solo_total:.3f}s "
          f"({solo_total/B:.3f}s/req) vs batched {batch_sec:.3f}s "
          f"({batch_sec/B:.3f}s/req) -> {solo_total/batch_sec:.3f}x "
          f"throughput; batch times {['%.3f' % t for t in bt]}")


if __name__ == "__main__":
    main()
