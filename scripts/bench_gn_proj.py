"""A/B the fused GroupNorm->1x1 proj Pallas kernel (ops/gn_matmul) against
the XLA chain at every production Transformer2D shape of the 512^2 edit —
the last unmeasured lever from VERDICT r4 Next #3 ("Mosaic epilogue fusion
of Transformer2D 1x1 proj_in/out").

proj_in  : GroupNorm(32) -> 1x1 conv          (prologue fusion)
proj_out : 1x1 conv -> + residual             (epilogue fusion)

Chained fori_loop timing as in bench_r3_levers.py (tunnel RTT floor ~29 ms).
Run on the real TPU, one process at a time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.utils import benchkit

benchkit.enable_compile_cache()

from blobctrl_tpu.nn import layers  # noqa: E402
from blobctrl_tpu.ops import gn_matmul  # noqa: E402

# (B, H, W, C, tag): UNet CFG-2 and BlobNet batch-1 Transformer2D inputs
SHAPES = [
    (2, 64, 128, 320, "L0 unet"),
    (1, 64, 128, 320, "L0 blob"),
    (2, 32, 64, 640, "L1 unet"),
    (1, 32, 64, 640, "L1 blob"),
    (2, 16, 32, 1280, "L2 unet"),
    (2, 8, 16, 1280, "mid unet"),
]


def timed(run, x, n_lo=10, n_hi=110, reps=3):
    def chain(n):
        n = jnp.asarray(n, jnp.int32)
        np.asarray(run(x, n))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(x, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (chain(n_hi) - chain(n_lo)) / (n_hi - n_lo)


def bench():
    tot = {"in_p": 0.0, "in_x": 0.0, "out_p": 0.0, "out_x": 0.0}
    for b, h, w, c, tag in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, c) * 0.5, jnp.bfloat16)
        res = jnp.asarray(rng.randn(b, h, w, c) * 0.5, jnp.bfloat16)
        norm = {"scale": jnp.asarray(rng.randn(c) * 0.2 + 1.0, jnp.float32),
                "bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32)}
        conv = {"kernel": jnp.asarray(rng.randn(1, 1, c, c) / np.sqrt(c),
                                      jnp.float32),
                "bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32)}

        @jax.jit
        def run_in_pallas(x, steps):
            def body(i, y):
                return gn_matmul.gn_proj(y, norm, conv, groups=32,
                                         eps=1e-6).astype(y.dtype)
            return jax.lax.fori_loop(0, steps, body, x)[:1, :1, :1, :8]

        @jax.jit
        def run_in_xla(x, steps):
            def body(i, y):
                o = layers.conv2d(conv, layers.group_norm(norm, y, 32,
                                                          eps=1e-6))
                return o.astype(y.dtype)
            return jax.lax.fori_loop(0, steps, body, x)[:1, :1, :1, :8]

        @jax.jit
        def run_out_pallas(x, steps):
            def body(i, y):
                return gn_matmul.matmul_residual(y, conv, res).astype(y.dtype)
            return jax.lax.fori_loop(0, steps, body, x)[:1, :1, :1, :8]

        @jax.jit
        def run_out_xla(x, steps):
            def body(i, y):
                return (layers.conv2d(conv, y) + res).astype(y.dtype)
            return jax.lax.fori_loop(0, steps, body, x)[:1, :1, :1, :8]

        # on-device numerics sanity (bf16 drift bar, exact-math parity is
        # tests/test_gn_matmul_kernel.py in fp32 interpret)
        yp = np.asarray(gn_matmul.gn_proj(x, norm, conv, groups=32,
                                          eps=1e-6), np.float32)
        yx = np.asarray(layers.conv2d(
            conv, layers.group_norm(norm, x, 32, eps=1e-6)), np.float32)
        err = np.abs(yp - yx).max() / max(np.abs(yx).max(), 1e-6)

        t_ip = timed(run_in_pallas, x)
        t_ix = timed(run_in_xla, x)
        t_op = timed(run_out_pallas, x)
        t_ox = timed(run_out_xla, x)
        tot["in_p"] += t_ip
        tot["in_x"] += t_ix
        tot["out_p"] += t_op
        tot["out_x"] += t_ox
        print(f"{tag:<9} {b}x{h}x{w}x{c:<5} "
              f"proj_in  pallas {t_ip*1e6:7.1f} us xla {t_ix*1e6:7.1f} us "
              f"({t_ix/t_ip:4.2f}x) | proj_out pallas {t_op*1e6:7.1f} us "
              f"xla {t_ox*1e6:7.1f} us ({t_ox/t_op:4.2f}x)  relerr {err:.1e}")
    print(f"TOTAL proj_in pallas {tot['in_p']*1e3:.3f} ms vs xla "
          f"{tot['in_x']*1e3:.3f} ms ({tot['in_x']/tot['in_p']:.2f}x); "
          f"proj_out pallas {tot['out_p']*1e3:.3f} ms vs xla "
          f"{tot['out_x']*1e3:.3f} ms ({tot['out_x']/tot['out_p']:.2f}x)")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    float(jnp.ones(()).sum())
    bench()
