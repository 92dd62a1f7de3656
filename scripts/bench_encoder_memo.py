"""Measure the interactive-path encoder memoization (round 4).

The interactive norm (reference app `/root/reference/scripts/blobctrl_app.py`:
the user drags/rotates/resizes a blob, then re-runs the edit) repeats the SAME
prompt and object image across edit rounds. Round-4 memoization makes those
repeats cost zero encoder dispatches: CLIP pos+neg+repeat+concat is ONE jitted
dispatch memoized by token ids, and DINOv2 pooled features are memoized by
pixel content.

This script times, at production geometry on the real chip (CLIP-L text
encoder + DINOv2-large, structural weights):
  - cold edit round: string prompt + uint8 fg_image, encoders RUN
  - repeat rounds: same prompt/object, encoders memo-hit (zero dispatches)
  - embeds baseline: caller-supplied prompt_embeds/fg_dino_feats (the
    bench.py path, for reference)

Few steps (BENCH_STEPS, default 4) so the fixed/encoder cost dominates the
reading; the denoise-loop time is identical across modes by construction.
"""
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from blobctrl_tpu.utils import benchkit
    benchkit.enable_compile_cache()

    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.models import clip_text as clip_lib
    from blobctrl_tpu.models import dinov2 as dino_lib

    steps = int(os.environ.get("BENCH_STEPS", "4"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    reps = int(os.environ.get("BENCH_REPEATS", "5"))

    print("building flagship pipe...", flush=True)
    pipe = benchkit.make_flagship_pipe()
    ccfg = flagship.clip_vit_l_config()
    dcfg = flagship.dinov2_large_config()
    print("init CLIP-L...", flush=True)
    pipe.clip_cfg = ccfg
    pipe.clip_params = flagship.structural_params(clip_lib.init, ccfg)
    print("init DINOv2-large...", flush=True)
    pipe.dino_cfg = dcfg
    pipe.dino_params = flagship.structural_params(dino_lib.init, dcfg)

    # BPE vocab files are checkpoint-day assets; token ids are all the CLIP
    # encoder timing needs, so hash words into the SD-1.5 id range here.
    def tok(prompts):
        out = []
        for p in prompts:
            rng = np.random.RandomState(abs(hash(p)) % (2 ** 31))
            ids = np.full((77,), 49407, np.int32)
            ids[0] = 49406
            n = min(len(p.split()), 75)
            ids[1:1 + n] = rng.randint(320, 49000, n)
            out.append(ids)
        return np.asarray(out, np.int32)

    pipe.tokenizer = tok

    kw = benchkit.standard_edit_kwargs(size=size, steps=steps)
    kw_str = {k: v for k, v in kw.items()
              if k not in ("prompt_embeds", "negative_prompt_embeds",
                           "fg_dino_feats")}
    kw_str.update(prompt="a high quality photo of a corgi on a beach",
                  negative_prompt="low quality, blurry")

    def run_str():
        return pipe(**kw_str).images

    def run_embeds():
        return pipe(**kw).images

    print("warming (main graph + encoders + embeds graph)...", flush=True)
    run_str()   # compiles edit graph + CLIP + DINO
    run_embeds()

    def clear_memos():
        pipe._prompt_cache.clear()
        pipe._dino_cache.clear()
        pipe._cond_lat_cache.clear()

    def t(fn):
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    # Interleaved triples (PERF_NOTES methodology: host load drifts several
    # percent over a run, so ordering A...A B...B biases the comparison;
    # per-round triples cancel the drift).
    cold_ts, rep_ts, emb_ts = [], [], []
    for _ in range(reps):
        clear_memos()
        cold_ts.append(t(run_str))     # encoders run this round
        rep_ts.append(t(run_str))      # memo hits
        emb_ts.append(t(run_embeds))   # caller-supplied baseline
    cold_med = float(np.median(cold_ts))
    rep_med = float(np.median(rep_ts))
    emb_med = float(np.median(emb_ts))

    def fmt(ts):
        return "[" + ", ".join(f"{t:.3f}" for t in ts) + "]"

    print(f"steps={steps} size={size} reps={reps} (interleaved triples)")
    print(f"cold   (string prompt + fg, encoders run): "
          f"{cold_med:.3f} s  {fmt(cold_ts)}")
    print(f"repeat (same prompt/object, memo hits):    "
          f"{rep_med:.3f} s  {fmt(rep_ts)}")
    print(f"embeds (caller-supplied, bench.py path):   "
          f"{emb_med:.3f} s  {fmt(emb_ts)}")
    deltas = [1e3 * (c - r) for c, r in zip(cold_ts, rep_ts)]
    print(f"memo saving per round (cold-repeat pairs): "
          f"[{', '.join(f'{d:+.0f}' for d in deltas)}] ms, "
          f"median {np.median(deltas):+.0f} ms; "
          f"repeat vs embeds delta {1e3 * (rep_med - emb_med):+.0f} ms")


if __name__ == "__main__":
    main()
