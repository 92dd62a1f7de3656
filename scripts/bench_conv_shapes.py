"""Per-shape microbench: XLA GroupNorm+SiLU+conv3x3 chain vs the Pallas fused
kernel, at every production resnet shape of the 512^2 BlobCtrl edit
(UNet CFG batch 2 + BlobNet batch 1, double-width layout).

Chained-loop timing (the axon tunnel has a ~29 ms RTT floor; naive per-call
timing is invalid): time a lax.fori_loop of N dependent applications for two
N values and difference them.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.nn import layers
from blobctrl_tpu.ops.conv3x3 import conv3x3

SHAPES = [
    # (B, H, W, Cin, Cout)  — UNet CFG batch 2; double-width W = 2H
    (2, 64, 128, 320, 320),
    (2, 32, 64, 640, 640),
    (2, 32, 64, 320, 640),
    (2, 16, 32, 1280, 1280),
    (2, 16, 32, 640, 1280),
    (2, 8, 16, 1280, 1280),
    # up-path concat inputs
    (2, 8, 16, 2560, 1280),
    (2, 16, 32, 2560, 1280),
    (2, 16, 32, 1920, 1280),
    (2, 32, 64, 1920, 640),
    (2, 32, 64, 960, 640),
    (2, 64, 128, 960, 320),
    (2, 64, 128, 640, 320),
]


def timed(fn, x, n_lo=20, n_hi=320):
    @jax.jit
    def run(x, n):
        def body(i, y):
            return fn(y) * 0.999  # keep magnitudes bounded
        return jax.lax.fori_loop(0, n, body, x)

    def chain(n):
        n = jnp.asarray(n, jnp.int32)
        run(x, n).block_until_ready()  # warmup (compiles once per shape)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(x, n).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (chain(n_hi) - chain(n_lo)) / (n_hi - n_lo)


def main():
    print(f"device: {jax.devices()[0]}")
    rows = []
    for (b, h, w, ci, co) in SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(b, h, w, ci), jnp.bfloat16)

        proj = (jnp.asarray(rng.randn(co, ci) * 0.02, jnp.bfloat16)
                if ci != co else None)

        def reproject(y):
            # chainability for ci != co: dense 1x1 projection back to ci.
            # A slice would let XLA dead-code-eliminate the un-read output
            # channels of ITS conv (the Pallas kernel is opaque), skewing the
            # comparison; a matmul forces both paths to produce every channel.
            if co == ci:
                return y
            return jnp.einsum("bhwc,cd->bhwd", y, proj)
        k = jnp.asarray(rng.randn(3, 3, ci, co) * 0.02, jnp.bfloat16)
        bias = jnp.zeros((co,), jnp.float32)
        norm = {"scale": jnp.ones((ci,), jnp.float32),
                "bias": jnp.zeros((ci,), jnp.float32)}

        def xla_chain(y):
            z = layers.group_norm(norm, y, 32)
            z = layers.silu(z)
            z = layers.conv2d({"kernel": k, "bias": bias}, z, padding=1)
            return reproject(z)

        def pallas_chain(y):
            s, sh = layers.group_norm_scale_shift(norm, y, 32)
            return reproject(conv3x3(y, k, bias, scale=s, shift=sh))

        t_x = timed(xla_chain, x)
        t_p = timed(pallas_chain, x)
        fl = 2 * b * h * w * 9 * ci * co
        rows.append((b, h, w, ci, co, t_x * 1e3, t_p * 1e3,
                     fl / t_x / 1e12, fl / t_p / 1e12))
    print(f"{'B':>2} {'H':>3} {'W':>4} {'Cin':>5} {'Cout':>5} "
          f"{'xla_ms':>8} {'pal_ms':>8} {'xla_TF':>7} {'pal_TF':>7}  winner")
    for r in rows:
        win = "PALLAS" if r[6] < r[5] else "xla"
        print(f"{r[0]:>2} {r[1]:>3} {r[2]:>4} {r[3]:>5} {r[4]:>5} "
              f"{r[5]:>8.3f} {r[6]:>8.3f} {r[7]:>7.1f} {r[8]:>7.1f}  {win}")


if __name__ == "__main__":
    main()
