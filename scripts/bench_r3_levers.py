"""Round-3 lever microbench on real TPU (one process at a time!):

  A. ln_matmul (fused LayerNorm->projection) vs the unfused XLA LN + matmul,
     at every production transformer projection shape (QKV, cross-Q, GEGLU
     proj_in) of the 512^2 edit.
  B. flash attention pad_d (128-lane HBM padding) vs unpadded head-dim reads,
     at the production self-attention shapes.

Chained two-length fori_loop timing (tunnel RTT floor ~29 ms; see
PERF_NOTES "Measurement methodology"). Interleaved variant reps per shape.
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
from blobctrl_tpu.ops import ln_matmul as lnm  # noqa: E402
from blobctrl_tpu.ops import flash_attention as fa  # noqa: E402

# (M, C, N, tag) — M = batch*seq of UNet CFG-2 (BlobNet batch-1 shapes are
# the same M/2, covered implicitly)
LN_SHAPES = [
    (2 * 8192, 320, 960, "L0 qkv"),
    (2 * 8192, 320, 320, "L0 crossQ"),
    (2 * 8192, 320, 2560, "L0 geglu_in"),
    (2 * 2048, 640, 1920, "L1 qkv"),
    (2 * 2048, 640, 5120, "L1 geglu_in"),
    (2 * 512, 1280, 3840, "L2 qkv"),
    (2 * 512, 1280, 10240, "L2 geglu_in"),
    (2 * 128, 1280, 3840, "mid qkv"),
]

# (B*H, S, D, tag)
FLASH_SHAPES = [
    (2 * 8, 8192, 40, "L0 self"),
    (2 * 8, 2048, 80, "L1 self"),
    (2 * 8, 512, 160, "L2 self"),
]


def timed(run, x, n_lo=10, n_hi=110, reps=3):
    def chain(n):
        n = jnp.asarray(n, jnp.int32)
        np.asarray(run(x, n))  # warm + REAL sync (block_until_ready lies)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(x, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    return (chain(n_hi) - chain(n_lo)) / (n_hi - n_lo)


def bench_ln():
    print("== A: ln_matmul vs unfused LN+matmul ==")
    tot_f, tot_u = 0.0, 0.0
    for m, c, n, tag in LN_SHAPES:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(m, c) * 0.5, jnp.bfloat16)
        g = jnp.asarray(rng.randn(c) * 0.2 + 1.0, jnp.float32)
        b = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
        w = jnp.asarray(rng.randn(c, n) / np.sqrt(c), jnp.float32)
        wb = jnp.asarray(rng.randn(n) * 0.1, jnp.float32)

        @jax.jit
        def run_fused(x, steps):
            def body(i, y):
                o = lnm.ln_matmul(y, g, b, w, wb)
                return o[:, :c].astype(y.dtype)
            return jax.lax.fori_loop(0, steps, body, x)[:1, :8]

        @jax.jit
        def run_unfused(x, steps):
            def body(i, y):
                xn = layers.layer_norm({"scale": g, "bias": b}, y)
                o = jnp.dot(xn, w.astype(y.dtype)) + wb.astype(y.dtype)
                return o[:, :c].astype(y.dtype)
            return jax.lax.fori_loop(0, steps, body, x)[:1, :8]

        # numerics sanity on-device
        yf = np.asarray(lnm.ln_matmul(x, g, b, w, wb), np.float32)
        xn = layers.layer_norm({"scale": g, "bias": b}, x)
        yu = np.asarray(jnp.dot(xn, w.astype(x.dtype)) + wb.astype(x.dtype),
                        np.float32)
        err = np.abs(yf - yu).max() / max(np.abs(yu).max(), 1e-6)
        t_f = timed(run_fused, x)
        t_u = timed(run_unfused, x)
        tot_f += t_f
        tot_u += t_u
        print(f"{tag:<12} M={m:<6} C={c:<5} N={n:<6} fused {t_f*1e6:8.1f} us "
              f"unfused {t_u*1e6:8.1f} us  ({t_u/t_f:5.2f}x)  relerr {err:.2e}")
    print(f"TOTAL fused {tot_f*1e3:.3f} ms vs unfused {tot_u*1e3:.3f} ms "
          f"per pass over all shapes ({tot_u/tot_f:.2f}x)")


def bench_flash():
    print("== B: flash pad_d=True (128-pad HBM) vs pad_d=False ==")
    for bh, s, d, tag in FLASH_SHAPES:
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(1, bh, s, d) * 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, bh, s, d) * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.randn(1, bh, s, d) * 0.3, jnp.bfloat16)
        scale = 1.0 / np.sqrt(d)

        def make_run(pad):
            @jax.jit
            def run(q, steps):
                def body(i, y):
                    return fa.flash_attention(y, k, v, scale=scale, pad_d=pad)
                return jax.lax.fori_loop(0, steps, body, q)[:1, :1, :1, :8]
            return run

        run_pad, run_nopad = make_run(True), make_run(False)
        ya = np.asarray(fa.flash_attention(q, k, v, scale=scale, pad_d=True),
                        np.float32)
        yb = np.asarray(fa.flash_attention(q, k, v, scale=scale, pad_d=False),
                        np.float32)
        err = np.abs(ya - yb).max()
        t_pad = timed(run_pad, q)
        t_nopad = timed(run_nopad, q)
        print(f"{tag:<8} BH={bh:<3} S={s:<5} D={d:<4} pad {t_pad*1e6:8.1f} us "
              f"nopad {t_nopad*1e6:8.1f} us ({t_pad/t_nopad:5.2f}x)  "
              f"maxerr {err:.2e}")


if __name__ == "__main__":
    print(f"device: {jax.devices()[0]}")
    float(jnp.ones(()).sum())  # warm the first D2H fetch (can stall ~60 s)
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ln"):
        bench_ln()
    if which in ("all", "flash"):
        bench_flash()
