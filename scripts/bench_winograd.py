"""Winograd F(2x2,3x3) Pallas kernel vs the implicit-GEMM conv3x3 kernel,
per production shape, chained-loop timing (see bench_conv_shapes.py for the
methodology: the axon tunnel RTT makes naive timing invalid).

Both paths run the fused GroupNorm+SiLU prologue. Interleaved per shape.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.nn import layers
from blobctrl_tpu.ops.conv3x3 import conv3x3
from blobctrl_tpu.ops import winograd

SHAPES = [
    (2, 64, 128, 320, 320),
    (2, 32, 64, 640, 640),
    (2, 32, 64, 320, 640),
    (2, 16, 32, 1280, 1280),
    (2, 16, 32, 640, 1280),
    (2, 8, 16, 1280, 1280),
    (2, 8, 16, 2560, 1280),
    (2, 16, 32, 2560, 1280),
    (2, 16, 32, 1920, 1280),
    (2, 32, 64, 1920, 640),
    (2, 32, 64, 960, 640),
    (2, 64, 128, 960, 320),
    (2, 64, 128, 640, 320),
]


def timed(fn, x, n_lo=20, n_hi=160):
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
    for (b, h, w, ci, co) in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, ci), jnp.bfloat16)
        proj = (jnp.asarray(rng.randn(co, ci) * 0.02, jnp.bfloat16)
                if ci != co else None)

        def reproject(y):
            if co == ci:
                return y
            return jnp.einsum("bhwc,cd->bhwd", y, proj)

        k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.02, jnp.bfloat16)
        bias = jnp.zeros((co,), jnp.float32)
        norm = {"scale": jnp.ones((ci,), jnp.float32),
                "bias": jnp.zeros((ci,), jnp.float32)}
        u = winograd.transform_weights(k)

        def direct_chain(y):
            s, sh = layers.group_norm_scale_shift(norm, y, 32)
            return reproject(conv3x3(y, k, bias, scale=s, shift=sh))

        def wino_chain(y):
            s, sh = layers.group_norm_scale_shift(norm, y, 32)
            return reproject(winograd.conv3x3_winograd(
                y, k, bias, scale=s, shift=sh, u=u))

        t_d = timed(direct_chain, x)
        t_w = timed(wino_chain, x)
        fl = 2 * b * h * w * 9 * ci * co
        win = "WINOGRAD" if t_w < t_d else "direct"
        print(f"{b:>2} {h:>3} {w:>4} {ci:>5} {co:>5} "
              f"direct {t_d*1e3:8.3f} ms ({fl/t_d/1e12:6.1f} TF)  "
              f"wino {t_w*1e3:8.3f} ms ({fl/t_w/1e12:6.1f} TF)  "
              f"{t_d/t_w:5.2f}x  {win}")


if __name__ == "__main__":
    main()
