"""Per-bucket FLOP split of the flagship denoising step for the PERF_NOTES
roofline (UNet CFG-2 + BlobNet batch-1, 512^2 double-width).

Method: wrap the kernel call sites with trace-time FLOP accounting and
abstract-evaluate the step (jax.eval_shape — no device, no compile):

  * conv3x3 bucket  — every call into ops.conv3x3 (conv backend forced to
    "pallas", which routes exactly the same call set "auto" routes on TPU
    for this step: all production shapes pass the auto gates).
  * flash bucket    — attention calls the TPU "auto" routing would send to
    the Pallas kernel (kv % 128 == 0, seq >= _FLASH_MIN_SEQ, no mask);
    counted at the UNPADDED head dim — the d->128 MXU lane pad is a
    hardware tax, noted separately in the roofline.
  * other           — the XLA cost-model total of the pure-XLA lowering
    (bench.py's step_tflops source, 7.4319 TF) minus the two buckets.

Post-fusion compiled-graph cost diffs were tried first and are NOT usable:
XLA's rematerialization/fusion rewrites change counted FLOPs by whole TF
between backend variants.

Run anywhere (CPU fine): python scripts/flop_buckets.py
"""
import json
import sys

sys.path.insert(0, ".")

# the XLA cost model's total for the full step (pure-XLA lowering of
# __graft_entry__.entry(); measured via bench.py's MFU path)
TOTAL_TF = 7.4319


def main():
    import jax

    from blobctrl_tpu.nn import attention, resnet
    from blobctrl_tpu.ops import conv3x3 as conv_mod

    acc = {"conv": 0.0, "flash": 0.0, "xla_attn": 0.0}

    real_conv = conv_mod.conv3x3
    real_mha = attention.multi_head_attention

    def conv_wrap(x, kernel, *a, **kw):
        b, h, w, _ = x.shape
        kh, kw_, cin, cout = kernel.shape
        acc["conv"] += 2.0 * b * h * w * kh * kw_ * cin * cout
        return real_conv(x, kernel, *a, **kw)

    def mha_wrap(q, k, v, heads, mask=None, **kw):
        b, sq, c = q.shape
        sk = k.shape[1]
        d = c // heads
        flops = 2.0 * b * heads * sq * sk * d * 2  # QK^T + PV
        tpu_auto_flash = (mask is None and sk % 128 == 0
                          and sq >= attention._FLASH_MIN_SEQ
                          and sk >= attention._FLASH_MIN_SEQ)
        acc["flash" if tpu_auto_flash else "xla_attn"] += flops
        return real_mha(q, k, v, heads, mask=mask, **kw)

    conv_mod.conv3x3 = conv_wrap
    attention.multi_head_attention = mha_wrap
    resnet.set_conv_backend("pallas")
    try:
        import __graft_entry__ as ge
        fn, args = ge.entry()
        jax.eval_shape(fn, *args)
    finally:
        conv_mod.conv3x3 = real_conv
        attention.multi_head_attention = real_mha
        resnet.set_conv_backend("auto")

    conv_tf = acc["conv"] / 1e12
    flash_tf = acc["flash"] / 1e12
    other_tf = TOTAL_TF - conv_tf - flash_tf
    print(json.dumps({"total_tf": TOTAL_TF, "conv3x3_tf": round(conv_tf, 4),
                      "flash_tf": round(flash_tf, 4),
                      "xla_other_tf": round(other_tf, 4),
                      "xla_attn_within_other_tf": round(
                          acc["xla_attn"] / 1e12, 4)}))
    for name, f in (("conv3x3", conv_tf), ("flash", flash_tf),
                    ("xla_other", other_tf)):
        print(f"{name:10s} {f:6.3f} TF  floor@164TF = "
              f"{1e3 * f / 164:6.2f} ms/step")


if __name__ == "__main__":
    main()
