"""Microbench the int8-everything kernels vs their exact bf16 counterparts,
in isolation, at the production shapes — decides whether the e2e int8 mode
can pay at all on this chip (the first e2e run measured it LOSING 2%).

Chained-loop timing per PERF_NOTES methodology (tunnel RTT floor ~29 ms,
interleaved variants).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.ops import flash_attention as fa
from blobctrl_tpu.ops.conv3x3 import conv3x3

CONV_SHAPES = [
    (2, 64, 128, 320, 320),
    (2, 32, 64, 640, 640),
    (2, 16, 32, 1280, 1280),
    (2, 64, 128, 960, 320),
]

ATTN_SHAPES = [
    # (B, H, S, D): L0 UNet CFG2, L0 BlobNet b1, L1, L2
    (2, 8, 8192, 40),
    (1, 8, 8192, 40),
    (2, 8, 2048, 80),
    (2, 8, 512, 160),
]


def timed(fn, x, n_lo=10, n_hi=110):
    @jax.jit
    def run(x, n):
        def body(i, y):
            return fn(y) * 0.999
        return jax.lax.fori_loop(0, n, body, x)

    def chain(n):
        n = jnp.asarray(n, jnp.int32)
        run(x, n).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(x, n).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (chain(n_hi) - chain(n_lo)) / (n_hi - n_lo)


def main():
    print(f"device: {jax.devices()[0]}")

    print("\n== conv3x3: bf16 halo vs int8 (incl. quantization overhead) ==")
    for (b, h, w, ci, co) in CONV_SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, ci), jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.02, jnp.bfloat16)
        kT = jnp.asarray(rng.randn(3, 3, co, ci) * 0.02, jnp.bfloat16)

        def make(mode_int8):
            def f(y):
                z = conv3x3(y, k, int8=mode_int8)
                return conv3x3(z, kT, int8=mode_int8)  # back to ci for chaining
            return f
        t_bf = timed(make(False), x) / 2
        t_i8 = timed(make(True), x) / 2
        print(f"  {b}x{h}x{w} {ci}->{co}: bf16 {t_bf*1e6:7.1f} us  "
              f"int8 {t_i8*1e6:7.1f} us  ratio {t_bf/t_i8:.2f}x")

    print("\n== flash: bf16 fixed-max vs int8 per-row vs int8 global-k ==")
    for (b, hh, s, d) in ATTN_SHAPES:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(b, hh, s, d), jnp.bfloat16)
        scale = 1.0 / np.sqrt(d)

        def make(**kw):
            def f(y):
                return fa.flash_attention(y, y, y, scale=scale, **kw)
            return f
        t_bf = timed(make(), q)
        t_row = timed(make(qk_int8=True), q)
        t_gk = timed(make(qk_int8=True, int8_global_k=True), q)
        print(f"  {b}x{hh}x{s}x{d}: bf16 {t_bf*1e6:7.1f} us  "
              f"i8row {t_row*1e6:7.1f} us  i8gk {t_gk*1e6:7.1f} us  "
              f"(gk {t_bf/t_gk:.2f}x)")


if __name__ == "__main__":
    main()
