"""BlobCtrl-TPU benchmark: one 50-step 512x512 SD-1.5+BlobNet edit.

Prints exactly one JSON line:
  {"metric": ..., "value": imgs_per_sec_per_chip, "unit": "img/s/chip",
   "vs_baseline": ...}

Baseline normalization: the driver target is a 50-step 512^2 edit in < 1.5 s
on a v5e-4 (BASELINE.md). That equals 1 img / 1.5 s / 4 chips = 0.1667
img/s/chip of per-chip throughput. vs_baseline = measured / 0.1667, so
vs_baseline >= 1.0 means a single chip already sustains the 4-chip target
rate (and a 4-chip DP batch hits the latency target with batch >= 4).

Weights are structural (zero kernels / unit norms) — the published
checkpoints are not on disk; TPU timing is data-independent so this measures
exactly what checkpoint weights would. The timed region is the full pipeline
call: VAE encode x2, DINOv2 feature splat, 50 x (BlobNet 1029-ch double-width
fwd + UNet 5-ch double-width fwd + CFG + UniPC), VAE decode.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    from blobctrl_tpu.utils import benchkit
    benchkit.enable_compile_cache()
    import jax

    steps = int(os.environ.get("BENCH_STEPS", "50"))
    size = int(os.environ.get("BENCH_SIZE", "512"))
    # the TPU host here shows +-10% run-to-run load variance; median-of-5
    repeats = int(os.environ.get("BENCH_REPEATS", "5"))

    # Time budget for the OPTIONAL modes (batch/cache/cfg-interval/int8/
    # remove/edit-batch): each is a separate XLA program, and on a host
    # where the tunnel's compile helper is CPU-starved a cold compile of
    # one 50-step graph can take ~20 min. The headline metric must always
    # make it out before any driver timeout, so once the elapsed time
    # passes the budget the remaining optional modes are skipped (their
    # JSON fields report null). Warm-cache runs (/root/jax_cache) are
    # unaffected — everything fits easily.
    t_start = time.perf_counter()
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2400"))

    def have_budget(label):
        left = budget_s - (time.perf_counter() - t_start)
        if left <= 0:
            print(f"bench: skipping {label} (past BENCH_BUDGET_S="
                  f"{budget_s:.0f}s — cold compiles on a starved host; "
                  f"rerun warm for the full mode set)",
                  file=sys.stderr, flush=True)
            return False
        return True

    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs(size=size, steps=steps)

    def run():
        # the bench reuses one kw dict, which would hit the interactive
        # conditioning-latent memo from the second call on; the headline
        # metric is the COLD edit (what the torch reference re-does every
        # call), so clear it — the repeat path is measured separately
        # (scripts/bench_encoder_memo.py, PERF_NOTES)
        pipe._cond_lat_cache.clear()
        return pipe(**kw).images

    print("bench: pipe built, warming up main graph", file=sys.stderr, flush=True)
    run()  # warmup + compile
    print("bench: main warm, timing", file=sys.stderr, flush=True)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        img = run()
        times.append(time.perf_counter() - t0)
    assert img.shape == (1, size, size, 3)

    sec = float(np.median(times))
    img_s_chip = 1.0 / sec  # one chip in this harness

    # ---- MFU: XLA's cost model on the pure-XLA lowering of the flagship
    # step (__graft_entry__.entry(): UNet CFG-2 + BlobNet batch-1, 512^2
    # double-width). The Pallas kernels compute the same math as the XLA
    # routing, so this counts their FLOPs too (Pallas custom calls would be
    # invisible to the cost model, hence the temporary backend switch).
    step_tflops = achieved_tflops = mfu = None
    V5E_BF16_PEAK_TFLOPS = 197.0   # v5e MXU nominal bf16 peak
    MEASURED_MATMUL_PEAK = 164.0   # this chip's measured big-GEMM ceiling
    if os.environ.get("BENCH_MFU", "1") == "1" and size == 512:
        from blobctrl_tpu.nn import attention, resnet
        attention.set_attention_backend("xla")
        resnet.set_conv_backend("xla")
        try:
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            import __graft_entry__ as ge
            fn, args = ge.entry()
            lowered = jax.jit(fn).lower(*args)
            # some backends only expose the cost model post-compile
            ca = lowered.cost_analysis() or lowered.compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            step_flops = float(ca["flops"])
        except Exception as e:  # MFU is reporting, never fail the bench
            print(f"bench: MFU count failed: {e!r}", file=sys.stderr,
                  flush=True)
            step_flops = None
        finally:
            attention.set_attention_backend("auto")
            resnet.set_conv_backend("auto")
        if step_flops:
            step_tflops = step_flops / 1e12
            # loop FLOPs over the FULL edit wall time (fixed VAE/fetch cost
            # included in the denominator, its FLOPs excluded from the
            # numerator: conservative)
            achieved_tflops = step_flops * steps / sec / 1e12
            mfu = achieved_tflops / V5E_BF16_PEAK_TFLOPS

    # interactive repeat round (EXACT): same fg/bg as the previous edit —
    # the conditioning-latent memo skips the image upload and the in-graph
    # VAE encode (the interactive norm: the blob moves, the images don't)
    def run_repeat():
        return pipe(**kw).images
    run_repeat()  # populate the memo
    repeat_ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_repeat()
        repeat_ts.append(time.perf_counter() - t0)
    repeat_sec = float(np.median(repeat_ts))

    # secondary: batched multi-edit throughput (BASELINE config 4: bs=8)
    batch = int(os.environ.get("BENCH_BATCH", "8"))
    batch_img_s = None
    if batch > 1 and have_budget("batch graph"):
        kwb = {k: v for k, v in kw.items() if k != "latents"}

        def run_batch():
            pipe._cond_lat_cache.clear()  # cold path (see run())
            return pipe(seed=0, num_images_per_prompt=batch, **kwb).images
        print("bench: warming batch graph", file=sys.stderr, flush=True)
        run_batch()
        t0 = time.perf_counter()
        imgs = run_batch()
        batch_sec = time.perf_counter() - t0
        assert imgs.shape[0] == batch
        batch_img_s = batch / batch_sec

    def timed_median(fn, n=3):
        """Median-of-n for the secondary modes: single-run readings drift
        several percent with host load (see PERF_NOTES methodology)."""
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    # encoder-cache fast mode (opt-in Faster-Diffusion approximation,
    # arXiv 2312.09608): decoder-only on reuse steps
    cache_sec = None
    cache_interval = int(os.environ.get("BENCH_CACHE_INTERVAL", "3"))
    if cache_interval > 1 and have_budget("cache graph"):
        def run_cached():
            pipe._cond_lat_cache.clear()  # cold path (see run())
            return pipe(encoder_cache_interval=cache_interval, **kw).images
        print("bench: warming cache graph", file=sys.stderr, flush=True)
        run_cached()
        cache_sec = timed_median(run_cached)

    # guidance-interval CFG (opt-in approximation, arXiv 2404.07724): steps
    # outside the window run cond-only (UNet batch 1 instead of 2)
    cfgint_sec = None
    cfg_window = os.environ.get("BENCH_CFG_WINDOW", "0.15,0.75")
    if cfg_window and have_budget("cfg-interval graph"):
        w0, w1 = (float(x) for x in cfg_window.split(","))

        def run_cfgint():
            pipe._cond_lat_cache.clear()  # cold path (see run())
            return pipe(cfg_guidance_start=w0, cfg_guidance_end=w1,
                        **kw).images
        print("bench: warming cfg-interval graph", file=sys.stderr, flush=True)
        run_cfgint()
        cfgint_sec = timed_median(run_cfgint)

    # int8-everything path (opt-in, LOSSY: int8 QK^T flash + int8 convs with
    # global activation scales) — the checkpoint-day quality gate is
    # `replay --all --score` under this mode; speed measured here
    int8_sec = None
    if os.environ.get("BENCH_INT8", "1") == "1" and have_budget("int8 graph"):
        from blobctrl_tpu.nn import attention
        from blobctrl_tpu.ops import conv3x3 as conv_mod
        # int8 linears (layers.set_linear_int8) measured NEUTRAL e2e
        # (PERF_NOTES) — extra loss for no speed, so they stay out of the
        # benched int8-everything bundle
        attention.set_attention_backend("auto", qk_int8=True,
                                        int8_global_k=True)
        conv_mod.set_conv_int8(True)
        pipe._denoise_cache.clear()
        try:
            print("bench: warming int8 graph", file=sys.stderr, flush=True)
            run()
            int8_sec = timed_median(run)
        finally:
            attention.set_attention_backend("auto", qk_int8=False,
                                            int8_global_k=False)
            conv_mod.set_conv_int8(False)
            pipe._denoise_cache.clear()

    # remove-mode edit (strength 0 -> statically UNet-only loop)
    remove_sec = None
    if os.environ.get("BENCH_REMOVE", "1") == "1" and have_budget("remove graph"):
        from blobctrl_tpu.blob import math as blob_math_mod
        kwr = dict(kw, gs_score=np.asarray(
            blob_math_mod.removal_score((size // 8, size // 8))),
            blobnet_conditioning_scale=0.0)
        del kwr["blobnet_control_guidance_end"]

        def run_remove():
            pipe._cond_lat_cache.clear()  # cold path (see run())
            return pipe(**kwr).images
        print("bench: warming remove graph", file=sys.stderr, flush=True)
        run_remove()
        remove_sec = timed_median(run_remove)

    # distinct-edit micro-batch (the serving path, pipeline.edit_batch): B
    # DIFFERENT requests in one device program. Single-chip this amortizes
    # the fixed encode/decode/dispatch cost; on a data mesh the batch shards
    # 1-per-chip (see PERF_NOTES "Distinct-edit micro-batching")
    eb_sec = None
    eb = int(os.environ.get("BENCH_EDIT_BATCH", "4"))
    if eb > 1 and have_budget("distinct-batch graph"):
        rng = np.random.RandomState(0)
        reqs = []
        for i in range(eb):
            r = dict(fg_image=rng.randint(0, 255, (size, size, 3)
                                          ).astype(np.uint8),
                     bg_image=rng.randint(0, 255, (size, size, 3)
                                          ).astype(np.uint8),
                     gs_score=kw["gs_score"], seed=i)
            for k in ("prompt_embeds", "negative_prompt_embeds",
                      "fg_dino_feats"):
                if k in kw:
                    r[k] = kw[k]
            reqs.append(r)
        shared = dict(height=size, width=size, num_inference_steps=steps,
                      guidance_scale=kw.get("guidance_scale", 7.5),
                      blobnet_conditioning_scale=kw.get(
                          "blobnet_conditioning_scale", 1.2))

        def run_eb():
            return pipe.edit_batch(reqs, **shared).images
        print("bench: warming distinct-batch graph", file=sys.stderr,
              flush=True)
        run_eb()
        eb_sec = timed_median(run_eb)

    baseline_img_s_chip = 1.0 / 1.5 / 4.0
    print(json.dumps({
        "metric": f"img/s/chip, {steps}-step {size}^2 SD1.5+BlobNet edit (bf16, CFG, UniPC)",
        "value": round(img_s_chip, 4),
        "unit": "img/s/chip",
        "vs_baseline": round(img_s_chip / baseline_img_s_chip, 3),
        "edit_seconds": round(sec, 4),
        "times": [round(t, 4) for t in times],
        "repeat_edit_seconds": round(repeat_sec, 4),
        "batch8_img_s_chip": round(batch_img_s, 4) if batch_img_s else None,
        "remove_edit_seconds": round(remove_sec, 4) if remove_sec else None,
        "encoder_cache_edit_seconds": round(cache_sec, 4) if cache_sec else None,
        "cfg_interval_edit_seconds": round(cfgint_sec, 4) if cfgint_sec else None,
        "int8_edit_seconds": round(int8_sec, 4) if int8_sec else None,
        "step_tflops": round(step_tflops, 3) if step_tflops else None,
        "achieved_tflops": (round(achieved_tflops, 2)
                            if achieved_tflops else None),
        "mfu": round(mfu, 4) if mfu else None,
        "mfu_vs_measured_matmul_peak": (
            round(achieved_tflops / MEASURED_MATMUL_PEAK, 4)
            if achieved_tflops else None),
        "distinct_batch4_seconds": round(eb_sec, 4) if eb_sec else None,
        "distinct_batch4_img_s_chip": (round(eb / eb_sec, 4)
                                       if eb_sec else None),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
