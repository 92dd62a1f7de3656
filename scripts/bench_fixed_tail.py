"""Dissect the fixed (non-loop) cost of an edit: device->host transfer rate
vs payload size, VAE decode/encode device time, and whether a chunked decode
lets the uint8 fetch overlap trailing compute (the VERDICT r3 #5 lever).

Methodology per PERF_NOTES: chained two-length fori_loop timing for device
work (block_until_ready lies over the tunnel); real fetches of FRESH arrays
(jax caches a host copy per Array object, so re-fetching the same object is
free); min-of-N; one TPU process at a time.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def fetch_rate():
    import jax
    import jax.numpy as jnp
    print("== device->host transfer (fresh array per rep) ==", flush=True)

    from functools import partial

    @partial(jax.jit, static_argnums=0)
    def make(n, i):
        return jnp.full((n,), i, jnp.uint8)

    for mb in (0.098, 0.786, 3.146, 12.583):
        n = int(mb * 1e6)
        make(n, 0).block_until_ready()
        ts = []
        for i in range(5):
            x = make(n, i + 1).block_until_ready()
            t0 = time.perf_counter()
            np.asarray(x)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"  {mb:7.3f} MB  {1e3 * t:7.1f} ms   {mb / t:6.1f} MB/s",
              flush=True)


def host_device_rate():
    import jax
    import jax.numpy as jnp
    print("== host->device transfer ==", flush=True)
    for mb in (0.786, 12.583):
        n = int(mb * 1e6)
        x = np.zeros((n,), np.uint8)
        jnp.asarray(x).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            jnp.asarray(x).block_until_ready()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"  {mb:7.3f} MB  {1e3 * t:7.1f} ms   {mb / t:6.1f} MB/s",
              flush=True)


def _timeit_chained(name, fn, x, reps=(2, 10)):
    """Two-length chained-loop timing; dependency via a non-foldable scalar
    feedback so XLA cannot DCE the body."""
    import jax
    import jax.numpy as jnp

    def chained(n):
        def body(i, c):
            y = fn(c)
            return c + (jnp.mean(y.astype(jnp.float32)) * 1e-12).astype(
                c.dtype)
        return jax.jit(lambda x0: jnp.sum(
            jax.lax.fori_loop(0, n, body, x0).astype(jnp.float32)))

    f_lo, f_hi = chained(reps[0]), chained(reps[1])
    np.asarray(f_lo(x)); np.asarray(f_hi(x))  # compile + warm
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); np.asarray(f_lo(x))
        t2 = time.perf_counter() - t0
        t0 = time.perf_counter(); np.asarray(f_hi(x))
        t10 = time.perf_counter() - t0
        ts.append((t10 - t2) / (reps[1] - reps[0]))
    print(f"  {name}: {1e3 * min(ts):6.1f} ms/call", flush=True)


def vae_times():
    import jax
    import jax.numpy as jnp
    from blobctrl_tpu.models import vae as vae_lib
    from blobctrl_tpu.nn import layers
    from blobctrl_tpu.models.vae import _mid_block

    cfg = vae_lib.VAEConfig()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        vae_lib.init_vae(jax.random.PRNGKey(0), cfg))
    print("== VAE device time (chained-loop) ==", flush=True)

    img2 = jnp.zeros((2, 512, 512, 3), jnp.bfloat16)

    def enc(x):
        m = vae_lib.encode(params, cfg, x)
        # fold latents back to image shape cheaply for the chain
        return m
    _timeit_chained("encode batch-2 512^2", enc, img2)

    lat = jnp.zeros((1, 64, 64, 4), jnp.bfloat16)
    _timeit_chained("decode 64^2->512^2  ",
                    lambda z: vae_lib.decode(params, cfg, z), lat)

    dec = params["decoder"]

    def mid_only(z):
        x = layers.conv2d(params["post_quant_conv"], z)
        x = layers.conv2d(dec["conv_in"], x, padding=1)
        return _mid_block(dec["mid_block"], x, cfg.norm_num_groups)
    _timeit_chained("decode mid-only     ", mid_only, lat)


def overlap_probe():
    """Does a device->host fetch of buffer A overlap device compute
    dispatched just before it? (async dispatch + tunnel transfer)"""
    import jax
    import jax.numpy as jnp

    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16).block_until_ready()

    @jax.jit
    def heavy(x):
        def body(i, c):
            return jnp.tanh(c @ x)
        return jnp.sum(jax.lax.fori_loop(0, 60, body, x).astype(
            jnp.float32))

    @jax.jit
    def make(i):
        return jnp.full((int(0.786e6),), i, jnp.uint8)

    np.asarray(heavy(a))  # compile + warm
    np.asarray(make(0))

    def t_compute():
        t0 = time.perf_counter()
        np.asarray(heavy(a))
        return time.perf_counter() - t0

    def t_fetch(i):
        x = make(i).block_until_ready()
        t0 = time.perf_counter()
        np.asarray(x)
        return time.perf_counter() - t0

    def t_both(i):
        x = make(i).block_until_ready()
        t0 = time.perf_counter()
        r = heavy(a)          # async dispatch
        np.asarray(x)         # fetch while compute runs?
        np.asarray(r)
        return time.perf_counter() - t0

    tc = min(t_compute() for _ in range(4))
    tf = min(t_fetch(i) for i in range(1, 5))
    tb = min(t_both(i) for i in range(5, 9))
    print(f"== overlap probe ==\n  compute {1e3*tc:.1f} ms, "
          f"fetch {1e3*tf:.1f} ms, both {1e3*tb:.1f} ms "
          f"(serial {1e3*(tc+tf):.1f}; full overlap {1e3*max(tc,tf):.1f})",
          flush=True)


def rtt():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(i):
        return i + 1

    np.asarray(tiny(jnp.int32(0)))
    ts = []
    for i in range(8):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.int32(i)))
        ts.append(time.perf_counter() - t0)
    print(f"== dispatch+tiny-fetch RTT == min {1e3*min(ts):.1f} ms "
          f"median {1e3*sorted(ts)[len(ts)//2]:.1f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["rtt", "fetch", "h2d", "vae", "overlap"]
    if "rtt" in which:
        rtt()
    if "fetch" in which:
        fetch_rate()
    if "h2d" in which:
        host_device_rate()
    if "vae" in which:
        vae_times()
    if "overlap" in which:
        overlap_probe()
