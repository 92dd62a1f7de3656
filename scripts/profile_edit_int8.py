"""Profile the production edit under the int8-everything mode: device-op
breakdown + e2e, to find where the per-kernel int8 wins (conv 1.6-1.8x,
flash-gk 1.11-1.14x in isolation) go in the full graph."""
import sys
import time

sys.path.insert(0, ".")


def main():
    from blobctrl_tpu.utils import benchkit
    benchkit.enable_compile_cache()
    from blobctrl_tpu.nn import attention, layers
    from blobctrl_tpu.ops import conv3x3 as conv_mod
    from blobctrl_tpu.utils import observability

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    pipe = benchkit.make_flagship_pipe()
    kw = benchkit.standard_edit_kwargs(size=size, steps=steps)

    attention.set_attention_backend("auto", qk_int8=True, int8_global_k=True)
    conv_mod.set_conv_int8(True)
    if "--linears" in sys.argv:   # measured neutral e2e; off by default
        layers.set_linear_int8(True)

    def run():
        return pipe(**kw).images

    run()
    t0 = time.perf_counter()
    run()
    print(f"e2e int8 ({steps} steps): {time.perf_counter() - t0:.3f}s",
          flush=True)
    ops = observability.profile_op_breakdown(run, repeats=2, top_k=30)
    total = sum(ops.values())
    print(f"device total: {total:.1f} ms/call")
    for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v:8.2f} ms  {100 * v / total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
