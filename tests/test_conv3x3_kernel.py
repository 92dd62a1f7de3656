"""Pallas implicit-GEMM conv3x3 vs lax.conv (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers
from blobctrl_tpu.ops.conv3x3 import conv3x3

RNG = np.random.RandomState(11)


@pytest.mark.parametrize("b,h,w,c,co", [
    (2, 8, 16, 320, 320),    # co not a multiple of the block -> padded path
    (1, 6, 10, 64, 128),
    (2, 4, 8, 1280, 1280),
    (1, 8, 8, 320, 640),
    (2, 16, 4, 32, 32),
])
def test_conv3x3_matches_xla(b, h, w, c, co):
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.05, jnp.float32)
    bias = jnp.asarray(RNG.randn(co), jnp.float32)
    ref = layers.conv2d({"kernel": k, "bias": bias}, x, padding=1)
    got = conv3x3(x, k, bias, interpret=True)
    rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


@pytest.mark.parametrize("b,h,w,c,co", [
    (1, 6, 10, 64, 128),
    (2, 16, 4, 32, 32),      # multiple row blocks exercise the halo rows
])
def test_conv3x3_halo1_matches_views3(b, h, w, c, co):
    """Single-read halo variant == the 3-view variant == XLA."""
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.05, jnp.float32)
    bias = jnp.asarray(RNG.randn(co), jnp.float32)
    ref = layers.conv2d({"kernel": k, "bias": bias}, x, padding=1)
    got = conv3x3(x, k, bias, interpret=True, halo="halo1")
    rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


@pytest.mark.parametrize("amax", [None, 6.0])
def test_conv3x3_int8_exact_quantized_math(amax):
    """Opt-in int8 path == an explicit numpy int8 reference (exact integer
    accumulation, global x scale + per-Co weight scales), for BOTH the
    static-amax (production default) and dynamic activation-scale policies."""
    b, h, w, c, co = 1, 6, 10, 64, 128
    x = RNG.randn(b, h, w, c).astype(np.float32)
    k = (RNG.randn(3, 3, c, co) * 0.05).astype(np.float32)
    bias = RNG.randn(co).astype(np.float32)

    xs = (amax / 127.0) if amax is not None \
        else max(np.abs(x).max(), 1e-20) / 127.0
    xq = np.clip(np.round(x / xs), -127, 127)
    ws = np.maximum(np.abs(k).max(axis=(0, 1, 2)), 1e-20) / 127.0
    kq = np.clip(np.round(k / ws), -127, 127)
    import jax.numpy as jnp2
    ref = np.asarray(layers.conv2d(
        {"kernel": jnp2.asarray(kq), "bias": jnp2.zeros((co,))},
        jnp2.asarray(xq), padding=1))
    ref = ref * (xs * ws) + bias

    got = conv3x3(jnp.asarray(x), jnp.asarray(k), jnp.asarray(bias),
                  interpret=True, int8=True, act_amax=amax)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)

    # and the quantization drift vs the exact conv stays small on smooth data
    exact = np.asarray(layers.conv2d({"kernel": jnp.asarray(k),
                                      "bias": jnp.asarray(bias)},
                                     jnp.asarray(x), padding=1))
    rel = np.abs(np.asarray(got) - exact).max() / np.abs(exact).max()
    assert rel < (0.05 if amax is not None else 0.02), rel


def test_conv3x3_int8_static_amax_saturates():
    """Static-amax policy: out-of-range activations saturate to +-amax
    instead of wrapping."""
    x = np.zeros((1, 4, 8, 128), np.float32)
    x[0, 1, 3, 5] = 50.0  # far beyond amax=6
    k = np.zeros((3, 3, 128, 128), np.float32)
    k[1, 1, 5, 0] = 1.0   # center tap passthrough
    got = np.asarray(conv3x3(jnp.asarray(x), jnp.asarray(k), None,
                             interpret=True, int8=True, act_amax=6.0))
    np.testing.assert_allclose(got[0, 1, 3, 0], 6.0, rtol=1e-5)


def test_conv3x3_int8_wide_contraction_split():
    """int8 + the VMEM-driven channel split: halves quantize independently
    (dynamic scales here, so each half's scale adapts to its data)."""
    b, h, w, c, co = 1, 4, 8, 2560, 128
    x = RNG.randn(b, h, w, c).astype(np.float32) * 0.3
    k = (RNG.randn(3, 3, c, co) * 0.02).astype(np.float32)
    exact = np.asarray(layers.conv2d({"kernel": jnp.asarray(k)},
                                     jnp.asarray(x), padding=1))
    got = np.asarray(conv3x3(jnp.asarray(x), jnp.asarray(k), None,
                             interpret=True, int8=True, act_amax=None))
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert rel < 0.02, rel


def test_conv3x3_fused_silu_prologue():
    """conv3x3(silu(x*a+s)) == explicit chain, incl. zero-pad-after-activation
    semantics at the borders."""
    b, h, w, c, co = 2, 8, 16, 320, 320
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.05, jnp.float32)
    bias = jnp.asarray(RNG.randn(co), jnp.float32)
    a = jnp.asarray(RNG.rand(b, c) + 0.5, jnp.float32)
    s = jnp.asarray(RNG.randn(b, c) * 0.1, jnp.float32)
    xa = jax.nn.silu(x * a[:, None, None, :] + s[:, None, None, :])
    ref = layers.conv2d({"kernel": k, "bias": bias}, xa, padding=1)
    got = conv3x3(x, k, bias, scale=a, shift=s, interpret=True)
    rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


def test_group_norm_scale_shift_folding():
    """group_norm(x) == x * scale + shift with the folded affine terms."""
    b, h, w, c, g = 2, 6, 10, 64, 8
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    p = {"scale": jnp.asarray(RNG.rand(c) + 0.5, jnp.float32),
         "bias": jnp.asarray(RNG.randn(c) * 0.2, jnp.float32)}
    ref = layers.group_norm(p, x, g)
    a, s = layers.group_norm_scale_shift(p, x, g)
    got = x * a[:, None, None, :] + s[:, None, None, :]
    assert float(jnp.abs(ref - got).max()) < 1e-5


def test_resnet_block_pallas_route_matches_xla():
    """resnet_block with the Pallas conv backend (interpret) == XLA backend,
    exercising the fused GroupNorm+SiLU+conv prologue end-to-end."""
    from blobctrl_tpu.nn import resnet

    b, h, w, c, co, temb_dim = 2, 8, 16, 64, 128, 32
    key = jax.random.PRNGKey(3)
    params = resnet.init_resnet_block(key, c, co, temb_dim)
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    temb = jnp.asarray(RNG.randn(b, temb_dim), jnp.float32)

    ref = resnet.resnet_block(params, x, temb, norm_groups=8)
    resnet.set_conv_backend("interpret")
    try:
        got = resnet.resnet_block(params, x, temb, norm_groups=8)
    finally:
        resnet.set_conv_backend("auto")
    rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


def test_upsample_pallas_route_matches_xla():
    from blobctrl_tpu.nn import resnet

    key = jax.random.PRNGKey(4)
    params = resnet.init_upsample(key, 64, 128)
    x = jnp.asarray(RNG.randn(1, 4, 8, 64), jnp.float32)
    ref = resnet.upsample_2d(params, x)
    resnet.set_conv_backend("interpret")
    try:
        got = resnet.upsample_2d(params, x)
    finally:
        resnet.set_conv_backend("auto")
    rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


def test_conv3x3_wide_contraction_split():
    """c > 1408 splits the contraction into two kernel calls (VMEM budget);
    result must match the unsplit XLA conv, including the fused prologue."""
    b, h, w, c, co = 1, 8, 16, 1920, 256
    x = jnp.asarray(RNG.randn(b, h, w, c) * 0.1, jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.02, jnp.float32)
    bias = jnp.asarray(RNG.randn(co), jnp.float32)
    a = jnp.asarray(RNG.rand(b, c) + 0.5, jnp.float32)
    s = jnp.asarray(RNG.randn(b, c) * 0.1, jnp.float32)
    xa = jax.nn.silu(x * a[:, None, None, :] + s[:, None, None, :])
    ref = layers.conv2d({"kernel": k, "bias": bias}, xa, padding=1)
    got = conv3x3(x, k, bias, scale=a, shift=s, interpret=True)
    rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


def test_conv3x3_odd_wide_contraction_1029ch():
    """BlobNet's conv_in width: odd c=1029 takes the lane-aligned split."""
    b, h, w, c, co = 1, 8, 16, 1029, 128
    x = jnp.asarray(RNG.randn(b, h, w, c) * 0.1, jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.02, jnp.float32)
    bias = jnp.asarray(RNG.randn(co), jnp.float32)
    ref = layers.conv2d({"kernel": k, "bias": bias}, x, padding=1)
    got = conv3x3(x, k, bias, interpret=True)
    rel = float(jnp.abs(ref - got).max() / jnp.abs(ref).max())
    assert rel < 1e-5, rel


def test_quantize_conv_tree_structure():
    """quantize_conv_tree adds kernel_q/w_scale beside 3x3 conv kernels
    only (not 1x1 convs, not linear kernels), reuses non-conv leaves, and
    is idempotent."""
    from blobctrl_tpu.ops import conv3x3 as conv_mod
    k33 = jnp.asarray(RNG.randn(3, 3, 8, 16) * 0.1, jnp.float32)
    k11 = jnp.asarray(RNG.randn(1, 1, 8, 16), jnp.float32)
    klin = jnp.asarray(RNG.randn(8, 16), jnp.float32)
    tree = {"conv1": {"kernel": k33, "bias": jnp.zeros((16,))},
            "shortcut": {"kernel": k11},
            "proj": {"kernel": klin},
            "blocks": [{"conv": {"kernel": k33}}]}
    q = conv_mod.quantize_conv_tree(tree)
    assert set(q["conv1"]) == {"kernel", "bias", "kernel_q", "w_scale"}
    assert q["conv1"]["kernel_q"].dtype == jnp.int8
    assert q["conv1"]["kernel_q"].shape == (3, 3, 8, 16)
    assert q["conv1"]["w_scale"].shape == (16,)
    assert set(q["shortcut"]) == {"kernel"}
    assert set(q["proj"]) == {"kernel"}
    assert "kernel_q" in q["blocks"][0]["conv"]
    assert q["conv1"]["kernel"] is k33  # original leaves pass through
    q2 = conv_mod.quantize_conv_tree(q)  # idempotent
    assert q2["conv1"]["kernel_q"] is q["conv1"]["kernel_q"]


@pytest.mark.parametrize("amax", [None, 6.0])
def test_conv3x3_prequantized_matches_int8_reference(amax):
    """Pre-quantized kernel_q/w_scale reproduce the explicit numpy int8
    reference (exact integer accumulation under the SAME wq/ws). Bit-equality
    vs the in-graph weight quantization is NOT asserted: XLA may compile the
    w/ws divide as a reciprocal multiply in one graph and not the other,
    flipping weights at rounding ties by one int8 step."""
    from blobctrl_tpu.ops import conv3x3 as conv_mod
    b, h, w, c, co = 1, 6, 10, 64, 128
    x = RNG.randn(b, h, w, c).astype(np.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.05, jnp.float32)
    bias = RNG.randn(co).astype(np.float32)
    wq, ws = conv_mod._quantize_kernel_i8(k)
    wq_np, ws_np = np.asarray(wq, np.int64), np.asarray(ws)

    xs = (amax / 127.0) if amax is not None \
        else max(np.abs(x).max(), 1e-20) / 127.0
    xq = np.clip(np.round(x / xs), -127, 127)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((b, h, w, co))
    for dh in range(3):
        for dw in range(3):
            ref += np.einsum("bhwc,cd->bhwd",
                             xp[:, dh:dh + h, dw:dw + w, :], wq_np[dh, dw])
    ref = ref * (xs * ws_np) + bias

    got = conv3x3(jnp.asarray(x), k, jnp.asarray(bias), interpret=True,
                  int8=True, act_amax=amax, kernel_q=wq, w_scale=ws)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5, atol=2e-5)


def test_conv3x3_prequantized_wide_split_drift():
    """Pre-quantized weights through the VMEM channel split (shared scales
    across halves) stay within the int8 drift bound."""
    from blobctrl_tpu.ops import conv3x3 as conv_mod
    b, h, w, c, co = 1, 4, 8, 2560, 128
    x = jnp.asarray(RNG.randn(b, h, w, c) * 0.3, jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.02, jnp.float32)
    wq, ws = conv_mod._quantize_kernel_i8(k)
    exact = np.asarray(layers.conv2d({"kernel": k}, x, padding=1))
    got = np.asarray(conv3x3(x, k, None, interpret=True, int8=True,
                             act_amax=None, kernel_q=wq, w_scale=ws))
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert rel < 0.02, rel


def test_conv3x3_grad_matches_xla():
    """custom VJP: Pallas forward, XLA backward — grads of the fused op
    (incl. the GN-affine + SiLU prologue) must match differentiating the
    plain XLA chain. This is what training routes through on TPU."""
    b, h, w, c, co = 2, 8, 8, 16, 32
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.05, jnp.float32)
    bias = jnp.asarray(RNG.randn(co), jnp.float32)
    scale = jnp.asarray(RNG.rand(b, c) + 0.5, jnp.float32)
    shift = jnp.asarray(RNG.randn(b, c) * 0.1, jnp.float32)
    cot = jnp.asarray(RNG.randn(b, h, w, co), jnp.float32)

    def loss_pallas(x, k, bias, scale, shift):
        return jnp.sum(conv3x3(x, k, bias, scale, shift,
                               interpret=True) * cot)

    def loss_xla(x, k, bias, scale, shift):
        y = jax.nn.silu(x * scale[:, None, None, :] + shift[:, None, None, :])
        out = layers.conv2d({"kernel": k, "bias": bias}, y, padding=1)
        return jnp.sum(out * cot)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4))(x, k, bias, scale,
                                                         shift)
    ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, k, bias, scale,
                                                      shift)
    for g, r, name in zip(got, ref, ("x", "kernel", "bias", "scale",
                                     "shift")):
        rel = float(jnp.abs(g - r).max() / (jnp.abs(r).max() + 1e-12))
        assert rel < 1e-5, (name, rel)


def test_conv3x3_grad_no_prologue():
    """Same, without scale/shift (the conv3x3_routed call sites)."""
    b, h, w, c, co = 1, 8, 8, 8, 16
    x = jnp.asarray(RNG.randn(b, h, w, c), jnp.float32)
    k = jnp.asarray(RNG.randn(3, 3, c, co) * 0.05, jnp.float32)

    def loss_pallas(x, k):
        return jnp.sum(conv3x3(x, k, interpret=True) ** 2)

    def loss_xla(x, k):
        return jnp.sum(layers.conv2d({"kernel": k}, x, padding=1) ** 2)

    got = jax.grad(loss_pallas, argnums=(0, 1))(x, k)
    ref = jax.grad(loss_xla, argnums=(0, 1))(x, k)
    for g, r in zip(got, ref):
        rel = float(jnp.abs(g - r).max() / (jnp.abs(r).max() + 1e-12))
        assert rel < 1e-5, rel
