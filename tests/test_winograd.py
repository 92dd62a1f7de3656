"""Pallas Winograd F(2x2,3x3) conv vs lax.conv (interpret mode on CPU).

The Winograd kernel (ops/winograd.py) is an exact-math alternative to the
implicit-GEMM conv3x3 (2.25x fewer MXU MACs); same contract, even H/W only.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers
from blobctrl_tpu.ops import winograd
from blobctrl_tpu.ops import conv3x3 as conv3x3_mod
from blobctrl_tpu.ops.conv3x3 import conv3x3

RNG = np.random.RandomState(7)


@pytest.mark.parametrize("b,h,w,c,co", [
    (2, 8, 16, 320, 320),    # co not a multiple of the lane block -> padded
    (1, 6, 10, 64, 128),
    (2, 4, 8, 1280, 1280),
    (1, 8, 8, 320, 640),
    (2, 16, 4, 32, 32),      # multiple tile-row blocks exercise the halo row
])
def test_winograd_matches_xla(b, h, w, c, co):
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.05, jnp.float32)
    bias = jnp.asarray(RNG.randn(co), jnp.float32)
    ref = layers.conv2d({"kernel": k, "bias": bias}, x, padding=1)
    got = winograd.conv3x3_winograd(x, k, bias, interpret=True)
    rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


def test_winograd_fused_prologue_matches_xla():
    """silu(x*scale+shift) prologue (the resnet GN fold) inside the kernel."""
    b, h, w, c, co = 1, 8, 8, 64, 64
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.05, jnp.float32)
    bias = jnp.asarray(RNG.randn(co), jnp.float32)
    sc = jnp.asarray(RNG.randn(c), jnp.float32)
    sh = jnp.asarray(RNG.randn(c), jnp.float32)
    xin = jax.nn.silu(x * sc[None, None, None] + sh[None, None, None])
    ref = layers.conv2d({"kernel": k, "bias": bias}, xin, padding=1)
    got = winograd.conv3x3_winograd(x, k, bias, scale=sc, shift=sh,
                                    interpret=True)
    rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


def test_weight_transform_exact():
    """U = G g G^T is exact in fp32 (G entries are powers of two) and
    reconstructs the direct conv via the Winograd identity at one tile."""
    k = jnp.asarray(RNG.randn(3, 3, 8, 8) * 0.5, jnp.float32)
    u = winograd.transform_weights(k)
    assert u.shape == (16, 8, 8)
    # F(2,3) identity on a single 4x4 tile, channels reduced explicitly
    bt_mat = np.array([[1, 0, -1, 0], [0, 1, 1, 0],
                       [0, -1, 1, 0], [0, 1, 0, -1]], np.float32)
    at_mat = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)
    d = RNG.randn(4, 4, 8).astype(np.float32)
    v = np.einsum("ir,rsc,js->ijc", bt_mat, d, bt_mat)
    m = np.einsum("xc,xck->xk", v.reshape(16, 8),
                  np.asarray(u)).reshape(4, 4, 8)
    y = np.einsum("pi,ijk,qj->pqk", at_mat, m, at_mat)
    # the 2x2 Winograd outputs == SAME-conv outputs (1..2, 1..2) of the tile
    xd = jnp.asarray(d[None])
    full = layers.conv2d({"kernel": k,
                          "bias": jnp.zeros((8,), jnp.float32)}, xd, padding=1)
    got = np.asarray(full)[0, 1:3, 1:3]
    np.testing.assert_allclose(y, got, rtol=2e-4, atol=2e-4)


def test_winograd_routing_flag():
    """set_winograd routes conv3x3 through the Winograd kernel for even
    H/W (and only then), restoring the previous backend after."""
    b, h, w, c, co = 1, 8, 8, 32, 32
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.05, jnp.float32)
    bias = jnp.asarray(RNG.randn(co), jnp.float32)
    ref = layers.conv2d({"kernel": k, "bias": bias}, x, padding=1)
    prev = conv3x3_mod.winograd_enabled()
    conv3x3_mod.set_winograd(True)
    try:
        got = conv3x3(x, k, bias, interpret=True)
        rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
        assert rel < 1e-5, rel
        # odd W falls back to the implicit-GEMM kernel (no even-shape
        # requirement there)
        x_odd = jnp.asarray(RNG.randn(b, h, w - 1, c), jnp.float32)
        ref_odd = layers.conv2d({"kernel": k, "bias": bias}, x_odd, padding=1)
        got_odd = conv3x3(x_odd, k, bias, interpret=True)
        rel = float(jnp.abs(ref_odd - got_odd).max() / jnp.abs(ref_odd).max())
        assert rel < 1e-5, rel
    finally:
        conv3x3_mod.set_winograd(prev)
