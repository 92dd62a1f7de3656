"""ResnetBlock2D + Down/Upsample, matching diffusers numerics
(/root/reference/diffusers/src/diffusers/models/resnet.py ResnetBlock2D,
Downsample2D, Upsample2D) in NHWC.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers
from blobctrl_tpu.parallel import kernel_sharding

Array = jax.Array

# Conv backend for the stride-1 3x3 convs in the resnet stack:
#   "xla"       — lax.conv_general_dilated everywhere
#   "pallas"    — the Pallas implicit-GEMM conv3x3 kernel (with the fused
#                 GroupNorm+SiLU prologue) wherever shapes qualify
#   "interpret" — as "pallas" but in Pallas interpret mode (CPU tests)
#   "auto"      — "pallas" on TPU, "xla" otherwise
# Read statically at trace time, like nn.attention's backend switch.
_CONV_BACKEND = "auto"


def set_conv_backend(backend: str):
    global _CONV_BACKEND
    assert backend in ("xla", "pallas", "interpret", "auto"), backend
    _CONV_BACKEND = backend


def get_conv_backend() -> str:
    return _CONV_BACKEND


def _route_conv(x: Array, role: str = "column"):
    """-> (use_pallas, interpret) for a stride-1 same-size 3x3 conv on x.

    Measured on v5e (scripts/bench_conv_shapes.py + bench_conv_backends.py):
    isolated per-shape timing says the Pallas kernel wins at most but not all
    production shapes (it loses ~7% at 320->320 from the c_out 320->384 lane
    pad, and at the tiny 8x16 level-3 spatials where the row grid starves) —
    yet END-TO-END, routing *everything* beats both all-XLA and the per-shape
    mixed routing (3.85 s vs 3.96 / 4.02): mixed backends break XLA's fusion
    chains around the leftover GroupNorm+SiLU stragglers. So "auto" routes
    every shape the kernel tiles (h % 8 == 0, full-row blocks).

    Under an active kernel-sharding profile the heuristic sees the PER-DEVICE
    channel count ('row' convs shard their input channels), so a shard too
    thin for the MXU lanes routes to the sharded XLA conv instead."""
    if _CONV_BACKEND == "xla":
        return False, False
    b, h, w, c = x.shape
    if h % 8 != 0 or w < 8:
        return False, False
    if _CONV_BACKEND == "interpret":
        return True, True
    if _CONV_BACKEND == "pallas":
        return True, False
    c_local = kernel_sharding.local_channels(x, role)
    return c_local >= 32 and jax.default_backend() == "tpu", False


def _pallas_conv_fn(interpret: bool):
    from blobctrl_tpu.ops import conv3x3 as conv3x3_op

    def conv_fn(x, kernel, bias, scale, shift, kernel_q, w_scale):
        return conv3x3_op.conv3x3(x, kernel, bias, scale=scale, shift=shift,
                                  interpret=interpret, kernel_q=kernel_q,
                                  w_scale=w_scale)
    return conv_fn


def _conv3x3_maybe_fused(conv_params, x: Array, scale=None, shift=None,
                         interpret: bool = False,
                         role: str = "column") -> Array:
    from blobctrl_tpu.ops import conv3x3 as conv3x3_op
    # kernel_q/w_scale appear when the tree went through quantize_conv_tree
    # (int8 mode); conv3x3 ignores them unless the int8 path is active
    prof = kernel_sharding.current()
    if prof is not None:
        # Pallas under SPMD: GSPMD cannot partition Mosaic kernels, so the
        # call is wrapped in a shard_map matching the weight's Megatron role
        # (parallel.kernel_sharding module docstring)
        assert scale is None and shift is None  # GN folds inside shard_map
        return kernel_sharding.shard_conv3x3(
            _pallas_conv_fn(interpret), role, x, conv_params, prof)
    return conv3x3_op.conv3x3(x, conv_params["kernel"],
                              conv_params.get("bias"),
                              scale=scale, shift=shift, interpret=interpret,
                              kernel_q=conv_params.get("kernel_q"),
                              w_scale=conv_params.get("w_scale"))


def conv3x3_routed(conv_params, x: Array) -> Array:
    """Stride-1 same-size 3x3 conv through the routed backend. For callers
    outside resnet_block (BlobNet's 1029-ch conv_in, the VAE decoder's
    upsample convs): profiled at 16-30% MFU on the XLA path vs 60-90% in the
    Pallas kernel."""
    use_pallas, interpret = _route_conv(x)
    if use_pallas:
        return _conv3x3_maybe_fused(conv_params, x, interpret=interpret)
    return layers.conv2d(conv_params, x, padding=1)


def init_resnet_block(key, c_in: int, c_out: int, temb_dim: Optional[int]):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "norm1": layers.init_norm(c_in),
        "conv1": layers.init_conv(k1, 3, 3, c_in, c_out),
        "norm2": layers.init_norm(c_out),
        "conv2": layers.init_conv(k2, 3, 3, c_out, c_out),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = layers.init_linear(k3, temb_dim, c_out)
    if c_in != c_out:
        p["conv_shortcut"] = layers.init_conv(k4, 1, 1, c_in, c_out)
    return p


def resnet_block(params, x: Array, temb: Optional[Array] = None,
                 norm_groups: int = 32, eps: float = 1e-5) -> Array:
    def norm_act_conv(conv_params, norm_params, y, role):
        use_pallas, interpret = _route_conv(y, role)
        if use_pallas:
            prof = kernel_sharding.current()
            if prof is not None:
                # sharded: the GN fold happens INSIDE the shard_map body —
                # group stats are shard-local and the fold never crosses the
                # manual boundary (see kernel_sharding.shard_conv3x3)
                return kernel_sharding.shard_conv3x3(
                    _pallas_conv_fn(interpret), role, y, conv_params, prof,
                    norm=norm_params, norm_groups=norm_groups, eps=eps)
            # GroupNorm folded to per-(B,C) affine; normalize+SiLU fuse into
            # the Pallas conv prologue instead of an extra HBM round-trip
            s, sh = layers.group_norm_scale_shift(norm_params, y, norm_groups,
                                                  eps)
            return _conv3x3_maybe_fused(conv_params, y, scale=s, shift=sh,
                                        interpret=interpret, role=role)
        y = layers.group_norm(norm_params, y, norm_groups, eps)
        y = layers.silu(y)
        return layers.conv2d(conv_params, y, padding=1)

    # Megatron roles mirror parallel.mesh._model_spec_for: conv1 column-
    # parallel (output channels sharded), conv2 row-parallel (input channels
    # sharded, one psum) — so the conv1 -> time-add -> GN -> conv2 chain
    # rides the sharded channel dim end to end
    h = norm_act_conv(params["conv1"], params["norm1"], x, "column")
    if temb is not None and "time_emb_proj" in params:
        t = layers.linear(params["time_emb_proj"], layers.silu(temb))
        h = h + t[:, None, None, :]
    h = norm_act_conv(params["conv2"], params["norm2"], h, "row")
    if "conv_shortcut" in params:
        x = layers.conv2d(params["conv_shortcut"], x)
    return x + h


def init_downsample(key, c: int):
    return {"conv": layers.init_conv(key, 3, 3, c, c)}


def downsample_2d(params, x: Array) -> Array:
    return layers.conv2d(params["conv"], x, stride=2, padding=1)


def init_upsample(key, c_in: int, c_out: Optional[int] = None):
    return {"conv": layers.init_conv(key, 3, 3, c_in, c_out or c_in)}


def upsample_2d(params, x: Array, out_hw: Optional[tuple] = None) -> Array:
    if out_hw is None:
        x = layers.nearest_upsample_2x(x)
    else:
        # non-2x sizes only occur for odd inputs; nearest resize
        n, h, w, c = x.shape
        oh, ow = out_hw
        hi = (jnp.arange(oh) * h // oh).astype(jnp.int32)
        wi = (jnp.arange(ow) * w // ow).astype(jnp.int32)
        x = x[:, hi][:, :, wi]
    use_pallas, interpret = _route_conv(x)
    if use_pallas:
        return _conv3x3_maybe_fused(params["conv"], x, interpret=interpret)
    return layers.conv2d(params["conv"], x, padding=1)
