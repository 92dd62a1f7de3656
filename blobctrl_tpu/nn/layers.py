"""Functional NN primitives (NHWC, pytree params).

Every layer is a pair of functions:
  * ``init_*(key, ...) -> params``  — random init (training / tests)
  * ``lower-case apply fn(params, x, ...) -> y`` — pure forward

Conv kernels are stored HWIO (TPU-native for NHWC convs); linear kernels are
stored (in, out).  Converters from torch layouts live in
``blobctrl_tpu.params.convert``.

Numerics follow the reference stack (diffusers v0.30 / torch): GroupNorm and
LayerNorm statistics are computed in fp32 regardless of the compute dtype.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


# ---------------------------------------------------------------------------
# dtype helpers
# ---------------------------------------------------------------------------

def cast(tree, dtype):
    """Cast every floating-point leaf of a pytree to ``dtype``."""
    if dtype is None:
        return tree
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree,
    )


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def init_linear(key, d_in: int, d_out: int, use_bias: bool = True, scale: Optional[float] = None):
    """Kaiming-uniform init matching torch.nn.Linear defaults."""
    k1, _ = jax.random.split(key)
    bound = scale if scale is not None else 1.0 / math.sqrt(d_in)
    p = {"kernel": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -bound, bound)}
    if use_bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


# Opt-in int8 linear path: activations quantize under a STATIC amax (so
# the quantize fuses into the producing fusion — the same policy as
# ops/conv3x3's int8 conv); weights arrive PRE-quantized per-output-channel
# (``kernel_q``/``w_scale`` leaves from ops.conv3x3.quantize_conv_tree).
# MEASURED NEUTRAL e2e on v5e (1.004x on top of int8 conv+flash, PERF_NOTES
# "Round-3 levers"): the transformer projections are small-K GEMMs XLA
# already runs well in bf16, and the quantize passes offset the int8 MXU
# gain. Default OFF and NOT part of the benched int8-everything bundle
# (extra loss for no speed); kept for re-evaluation at other shapes.
_LINEAR_INT8 = False
_LINEAR_INT8_AMAX = 12.0


def set_linear_int8(flag: bool, amax: float = -1.0):
    """Toggle the int8 linear path; amax > 0 overrides the static
    activation amax (values beyond saturate)."""
    global _LINEAR_INT8, _LINEAR_INT8_AMAX
    _LINEAR_INT8 = bool(flag)
    if amax > 0:
        _LINEAR_INT8_AMAX = float(amax)


def linear_int8_enabled() -> bool:
    return _LINEAR_INT8


def quantize_act_i8(x: Array, amax: float | None = None):
    """x -> (int8 values, scalar f32 scale) under the static amax."""
    if amax is None:
        amax = _LINEAR_INT8_AMAX
    xs = jnp.asarray(amax / 127.0, jnp.float32)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                  -127, 127).astype(jnp.int8)
    return xq, xs


def matmul_i8(x: Array, kernel_q: Array, w_scale: Array,
              bias: Array | None, out_dtype) -> Array:
    """(..., K) f x (K, N) int8 -> (..., N): quantize x statically, int32
    MXU accumulation, exact rescale by (x_scale * w_scale[n]) + bias."""
    xq, xs = quantize_act_i8(x)
    y = lax.dot_general(xq, kernel_q,
                        (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (w_scale.astype(jnp.float32) * xs)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def linear(params, x: Array) -> Array:
    if _LINEAR_INT8 and "kernel_q" in params:
        return matmul_i8(x, params["kernel_q"], params["w_scale"],
                         params.get("bias"), x.dtype)
    y = jnp.dot(x, params["kernel"].astype(x.dtype))
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Conv2D (NHWC / HWIO)
# ---------------------------------------------------------------------------

def init_conv(key, kh: int, kw: int, c_in: int, c_out: int, use_bias: bool = True, zero: bool = False):
    k1, _ = jax.random.split(key)
    if zero:
        kernel = jnp.zeros((kh, kw, c_in, c_out), jnp.float32)
    else:
        bound = 1.0 / math.sqrt(c_in * kh * kw)
        kernel = jax.random.uniform(k1, (kh, kw, c_in, c_out), jnp.float32, -bound, bound)
    p = {"kernel": kernel}
    if use_bias:
        p["bias"] = jnp.zeros((c_out,), jnp.float32)
    return p


def conv2d(params, x: Array, stride: Union[int, Tuple[int, int]] = 1,
           padding: Union[int, Tuple[int, int], str] = 0) -> Array:
    """2-D convolution over NHWC input with an HWIO kernel."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    elif isinstance(padding, tuple) and isinstance(padding[0], int):
        padding = ((padding[0], padding[0]), (padding[1], padding[1]))
    if (_LINEAR_INT8 and "kernel_q" in params
            and params["kernel_q"].shape[:2] == (1, 1) and stride == (1, 1)):
        # 1x1 conv == channel matmul: int8 path (transformer proj_in/out)
        kq = params["kernel_q"]
        return matmul_i8(x, kq.reshape(kq.shape[2:]), params["w_scale"],
                         params.get("bias"), x.dtype)
    kernel = params["kernel"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, kernel,
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Normalization (fp32 statistics)
# ---------------------------------------------------------------------------

def init_norm(c: int):
    return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}


def group_norm(params, x: Array, num_groups: int, eps: float = 1e-5) -> Array:
    """GroupNorm over an NHWC (or N...C) tensor; stats over (spatial, C/G)."""
    orig_dtype = x.dtype
    n = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, -1, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    xf = xf.reshape(n, *spatial, c)
    y = xf * params["scale"] + params["bias"]
    return y.astype(orig_dtype)


def group_norm_scale_shift(params, x: Array, num_groups: int,
                           eps: float = 1e-5):
    """Fold GroupNorm statistics into per-(batch, channel) affine terms.

    Returns fp32 ``(scale, shift)`` each of shape (N, C) such that
    ``group_norm(params, x) == x * scale + shift`` (up to rounding).  Used by
    the fused GroupNorm+SiLU+conv3x3 Pallas path: the stats are a cheap
    reduction; the normalize+activate pass then fuses into the conv prologue
    instead of a separate HBM round-trip.
    """
    n = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    xf = x.astype(jnp.float32).reshape(n, -1, g, c // g)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    rs = lax.rsqrt(var + eps)
    rs = jnp.broadcast_to(rs, (n, 1, g, c // g)).reshape(n, c)
    mu = jnp.broadcast_to(mean, (n, 1, g, c // g)).reshape(n, c)
    scale = rs * params["scale"][None].astype(jnp.float32)
    shift = params["bias"][None].astype(jnp.float32) - mu * scale
    return scale, shift


def layer_norm(params, x: Array, eps: float = 1e-5) -> Array:
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    if params is not None:
        xf = xf * params["scale"]
        if "bias" in params:
            xf = xf + params["bias"]
    return xf.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Activations / resampling
# ---------------------------------------------------------------------------

def silu(x: Array) -> Array:
    return jax.nn.silu(x)


def gelu(x: Array) -> Array:
    """torch.nn.functional.gelu default = exact erf formulation."""
    return jax.nn.gelu(x, approximate=False)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


ACTIVATIONS = {"silu": silu, "swish": silu, "gelu": gelu, "quick_gelu": quick_gelu,
               "relu": jax.nn.relu, "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x))}


def nearest_upsample_2x(x: Array) -> Array:
    """Nearest-neighbor 2x upsample of NHWC (matches torch interpolate 'nearest')."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


def bilinear_resize(x: Array, out_h: int, out_w: int) -> Array:
    """Bilinear resize of NHWC matching torch.nn.functional.interpolate
    (mode='bilinear', align_corners=False), i.e. half-pixel centers.

    Mirrors F.interpolate used by the reference blob pyramid
    (/root/reference/blobctrl/utils/utils.py:292) and score resizing (:73).
    """
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)

    def axis_weights(in_size, out_size):
        scale = in_size / out_size
        coords = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
        coords = jnp.clip(coords, 0.0, in_size - 1)
        lo = jnp.floor(coords).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = coords - lo.astype(jnp.float32)
        return lo, hi, frac

    hlo, hhi, hfrac = axis_weights(h, out_h)
    wlo, whi, wfrac = axis_weights(w, out_w)

    top = xf[:, hlo]
    bot = xf[:, hhi]
    rows = top + (bot - top) * hfrac[None, :, None, None]
    left = rows[:, :, wlo]
    right = rows[:, :, whi]
    out = left + (right - left) * wfrac[None, None, :, None]
    return out.astype(orig_dtype)
