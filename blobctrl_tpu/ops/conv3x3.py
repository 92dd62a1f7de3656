"""Pallas TPU 3x3 same-conv as implicit GEMM (9 accumulating tap matmuls).

Replaces XLA's conv lowering for the UNet/BlobNet resnet stack, where
lax.conv_general_dilated measures only ~36-40 TFLOPS (~19% MFU) on v5e at the
production shapes (64x128x320 ... 8x16x1280) while the equivalent matmul runs
at ~164 TFLOPS. The kernel processes row-blocks of the (pre-padded) input,
runs the 9 tap matmuls on the MXU accumulating in an fp32 VMEM scratch, and
writes each output block once.

Row halo without overlapping BlockSpecs: the padded input is passed THREE
times as row-shifted views (rows [0:H], [1:H+1], [2:H+2]); tap row dh reads
its slice from view dh, so every block is a plain disjoint tiling. Costs 3x
the input HBM reads (~20 us at the largest shape) — noise next to the matmul
win.

Covers the reference's conv workhorse (diffusers ResnetBlock2D 3x3 convs,
/root/reference/diffusers/src/diffusers/models/resnet.py:327-340). Stride-2
downsample convs and 1x1 convs stay on the XLA path (matmul-shaped already).

The optional scale/shift prologue computes conv3x3(silu(x * a + b)) — the
GroupNorm(+time-shift)+SiLU+conv resnet chain — with the elementwise part as
one XLA fusion feeding the pad (measured free next to the conv itself).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


# Input-read strategy: "views3" passes the padded input three times as
# row-shifted views (3x input HBM reads, the r2 behavior); "halo1" reads the
# center block once plus two single halo rows (1x + 2 rows) and assembles
# the shifted tap windows with VMEM concats. Measured on v5e (interleaved
# A/B): halo1 wins at EVERY production shape — 1.04x (64x128x320), 1.05x
# (32x64x640), 1.17x (16x32x1280), 1.10x (960->320 concat) — bit-exact.
_HALO_MODE = "halo1"

# Opt-in int8 conv path (global activation scale + per-output-channel weight
# scales, int32 MXU accumulation): ~2x MXU rate, LOSSY — part of the
# int8-everything mode to be gated on outside-mask PSNR with real weights.
_CONV_INT8 = False
# Activation-scale policy for the int8 path. A STATIC amax (activations
# assumed in [-amax, amax]; values beyond saturate) lets XLA fuse the
# quantize into the producing fusion (GN+SiLU prologue) with NO extra pass;
# the dynamic per-call max-abs alternative (act_amax=None) was measured to
# EAT the whole int8 win in extra reduce/convert passes (~10-15 ms/step:
# convert_reduce 5.3 + clamp/slice/copy ~6 + abs_reduce 0.8 per step) —
# same spirit as the flash kernel's fixed-max softmax. 12.0 comfortably
# covers post-GN+SiLU ranges; validate on checkpoint day with
# `replay --all --score --int8`.
_CONV_INT8_ACT_AMAX: float | None = 12.0


def set_halo_mode(mode: str):
    global _HALO_MODE
    assert mode in ("views3", "halo1"), mode
    _HALO_MODE = mode


# Winograd F(2x2,3x3) routing (ops/winograd.py): 2.25x fewer MXU MACs at
# the cost of VPU transform passes. Opt-in pending the e2e A/B.
_WINOGRAD = False


def set_winograd(flag: bool):
    global _WINOGRAD
    _WINOGRAD = bool(flag)


def winograd_enabled() -> bool:
    return _WINOGRAD


def set_conv_int8(flag: bool, act_amax: float | None = "unset"):
    """Toggle the int8 conv path; optionally set the static activation amax
    (None = dynamic per-call max-abs, measured slower)."""
    global _CONV_INT8, _CONV_INT8_ACT_AMAX
    _CONV_INT8 = bool(flag)
    if act_amax != "unset":
        _CONV_INT8_ACT_AMAX = act_amax


def conv_int8_enabled() -> bool:
    return _CONV_INT8


def _quantize_kernel_i8(kern: Array) -> tuple[Array, Array]:
    """(3,3,C,Co) conv or (K,N) linear kernel -> (int8 kernel, per-output-
    channel f32 scales) — the same symmetric quantization the in-graph conv
    path uses (all axes but the last are contraction axes)."""
    wf = kern.astype(jnp.float32)
    red = tuple(range(wf.ndim - 1))
    ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=red), 1e-20) / 127.0
    wq = jnp.clip(jnp.round(wf / ws), -127, 127).astype(jnp.int8)
    return wq, ws


# Transformer-block projections eligible for the int8 linear path
# (nn/layers.matmul_i8): the long-sequence compute-heavy matmuls — attention
# q/k/v/out, GEGLU ff, and the Transformer2D 1x1 conv proj_in/proj_out
# (a channel matmul). Name filter keeps time/class embeddings, CLIP heads
# etc. in bf16.
_LINEAR_INT8_NAMES = frozenset(
    {"to_q", "to_k", "to_v", "to_out", "proj_in", "proj_out"})


def quantize_conv_tree(params):
    """Pre-quantize the hot kernels of a param tree for the int8 modes:
    adds ``kernel_q`` (int8) and ``w_scale`` (per-out-channel f32) beside
    each (3,3,C,Co) conv ``kernel`` (the int8 conv path) AND beside each
    2-D transformer projection kernel whose module name is in
    _LINEAR_INT8_NAMES (the int8 linear path, nn/layers.matmul_i8).
    Idempotent; non-quantized leaves are returned as-is (same objects —
    only the quantized tensors are new device buffers).

    Why: quantizing weights in-graph puts the abs-max reduce + round/clip +
    int8 materialization INSIDE the 50-step denoise loop (XLA does not hoist
    them out of lax.fori_loop) — measured as several ms/step of abs_reduce/
    multiply/slice_convert buckets. Pre-quantizing once also halves the
    kernel HBM reads vs bf16. Stride-2 downsample convs match the shape
    filter too and carry unused (small) extra leaves — harmless.

    Note: pre-quantized scales span the FULL input-channel range; the
    VMEM-driven wide-contraction split then shares one scale across both
    halves (the in-graph path gives each half its own, slightly finer,
    scale). Both are exact int8 math, just different quantization grids.
    """
    kernels = {}

    def collect(p, path):
        if isinstance(p, dict):
            k = p.get("kernel", None)
            is_conv33 = (getattr(k, "ndim", 0) == 4 and k.shape[0] == 3
                         and k.shape[1] == 3)
            is_hot_linear = (path and path[-1] in _LINEAR_INT8_NAMES
                             and (getattr(k, "ndim", 0) == 2
                                  or (getattr(k, "ndim", 0) == 4
                                      and k.shape[:2] == (1, 1))))
            if (is_conv33 or is_hot_linear) and "kernel_q" not in p:
                kernels[path] = k
            for name, v in p.items():
                collect(v, path + (name,))
        elif isinstance(p, (list, tuple)):
            for i, v in enumerate(p):
                collect(v, path + (i,))

    collect(params, ())
    if not kernels:
        return params
    qs = jax.jit(lambda ks: {p: _quantize_kernel_i8(k)
                             for p, k in ks.items()})(kernels)

    def rebuild(p, path):
        if isinstance(p, dict):
            out = {k: rebuild(v, path + (k,)) for k, v in p.items()}
            if path in qs:
                out["kernel_q"], out["w_scale"] = qs[path]
            return out
        if isinstance(p, list):
            return [rebuild(v, path + (i,)) for i, v in enumerate(p)]
        if isinstance(p, tuple):
            return tuple(rebuild(v, path + (i,)) for i, v in enumerate(p))
        return p

    return rebuild(params, ())


def _conv3x3_kernel_halo(x_ref, h1_ref, h2_ref, w_ref, b_ref, o_ref, acc_ref):
    # x_ref: (1, BH, W+2, C) = padded rows [ih*BH, ih*BH+BH); h1/h2_ref:
    # (1, 1, W+2, C) = the two halo rows below the block. Tap row dh uses
    # rows [dh, dh+BH) of the (BH+2)-row window.
    bh, w = o_ref.shape[1], o_ref.shape[2]
    c = x_ref.shape[3]
    acc_ref[:] = jnp.broadcast_to(b_ref[0][None], acc_ref.shape)
    # (bh+2)-row window in VMEM; tap row dh reads window[dh:dh+bh]
    window = jnp.concatenate([x_ref[0], h1_ref[0], h2_ref[0]], axis=0)
    rows = (window[0:bh], window[1:bh + 1], window[2:bh + 2])
    for dh, row in enumerate(rows):
        for dw in range(3):
            xs = row[:, dw:dw + w, :].reshape(bh * w, c)
            acc_ref[:] += jax.lax.dot_general(
                xs, w_ref[dh * 3 + dw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc_ref[:].reshape(bh, w, o_ref.shape[3]).astype(o_ref.dtype)


def _conv3x3_kernel_halo_i8(x_ref, h1_ref, h2_ref, w_ref, s_ref, b_ref,
                            o_ref, acc_ref):
    """int8 variant of the halo kernel: x and w arrive int8 (x under ONE
    global scale, w per-output-channel), taps accumulate in int32 on the
    MXU (2x the bf16 rate on v5e), and one fp32 rescale pass maps the
    result back. Part of the opt-in int8-everything mode — lossier than
    bf16; gate on outside-mask PSNR once real checkpoints exist
    (PERF_NOTES 'Round-3 levers' item 5)."""
    bh, w = o_ref.shape[1], o_ref.shape[2]
    c = x_ref.shape[3]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    window = jnp.concatenate([x_ref[0], h1_ref[0], h2_ref[0]], axis=0)
    rows = (window[0:bh], window[1:bh + 1], window[2:bh + 2])
    for dh, row in enumerate(rows):
        for dw in range(3):
            xs = row[:, dw:dw + w, :].reshape(bh * w, c)
            acc_ref[:] += jax.lax.dot_general(
                xs, w_ref[dh * 3 + dw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
    out = acc_ref[:].astype(jnp.float32) * s_ref[0][None] + b_ref[0][None]
    o_ref[0] = out.reshape(bh, w, o_ref.shape[3]).astype(o_ref.dtype)


def _conv3x3_kernel(x0_ref, x1_ref, x2_ref, w_ref, b_ref, o_ref, acc_ref):
    # x*_ref: (1, BH, W+2, C) row-shifted views; w_ref: (9, C, BC);
    # b_ref: (1, BC) f32; o_ref: (1, BH, W, BC); acc_ref: (BH*W, BC) f32
    bh, w = o_ref.shape[1], o_ref.shape[2]
    c = x0_ref.shape[3]
    acc_ref[:] = jnp.broadcast_to(b_ref[0][None], acc_ref.shape)
    for dh, x_ref in enumerate((x0_ref, x1_ref, x2_ref)):
        row = x_ref[0]
        for dw in range(3):
            xs = row[:, dw:dw + w, :].reshape(bh * w, c)
            acc_ref[:] += jax.lax.dot_general(
                xs, w_ref[dh * 3 + dw], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc_ref[:].reshape(bh, w, o_ref.shape[3]).astype(o_ref.dtype)


def _pick_co_block(c_in: int, c_out: int, itemsize: int) -> int:
    # bound the resident weight tile (9, C, BC) to ~3 MB of VMEM: Mosaic
    # double-buffers every input block, so the effective footprint is 2x —
    # at the up-block concat widths a fatter tile OOMs scoped VMEM (16 MB)
    for bc in (256, 128):
        if c_out % bc == 0 and 9 * c_in * bc * itemsize <= 3 * 1024 * 1024:
            return bc
    return 128


def _pick_row_block(h: int, w: int, c: int) -> int:
    # target M = bh*W around 2048 with a VMEM ceiling on the x tiles
    bh = max(8, min(h, 2048 // max(w, 1)))
    while h % bh != 0:
        bh //= 2
    # 1.25 MB per view x 3 views x 2 (double buffering) caps the input side
    while bh * (w + 2) * c * 2 > 1280 * 1024 and bh > 8:
        bh //= 2
    return max(bh, 1) if h % max(bh, 1) == 0 else h


def conv3x3(x: Array, kernel: Array, bias: Array | None = None,
            scale: Array | None = None, shift: Array | None = None,
            interpret: bool = False, halo: str | None = None,
            int8: bool | None = None,
            act_amax: float | None = "unset",
            kernel_q: Array | None = None,
            w_scale: Array | None = None) -> Array:
    """3x3 stride-1 same-conv. x: (B, H, W, C) NHWC; kernel: (3, 3, C, Co)
    HWIO; bias: (Co,).

    With scale/shift (each (B, C) or (C,)): computes
    conv3x3(silu(x * scale + shift)) with conv zero-padding applied after the
    activation (the fused resnet prologue; GroupNorm statistics are folded
    into scale/shift by the caller).

    kernel_q/w_scale: pre-quantized int8 weights from quantize_conv_tree;
    used only when the int8 path is active (skips the per-call weight
    quantization, which otherwise runs inside the denoise loop every step).

    Module-flag defaults (halo, int8) resolve HERE, outside jit, so the
    set_* toggles take effect without stale-cache surprises.
    """
    if halo is None:
        halo = _HALO_MODE
    if int8 is None:
        int8 = _CONV_INT8
    if act_amax == "unset":
        act_amax = _CONV_INT8_ACT_AMAX
    if not int8:
        kernel_q = w_scale = None
    if (_WINOGRAD and not int8 and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0):
        from blobctrl_tpu.ops import winograd
        return winograd.conv3x3_winograd(x, kernel, bias, scale, shift,
                                         interpret=interpret)
    return _diff_conv3x3(interpret, halo, int8, act_amax)(
        (x, kernel, bias, scale, shift, kernel_q, w_scale))


def _xla_reference(x: Array, kernel: Array, bias, scale, shift) -> Array:
    """Exact-math XLA implementation of the fused op's semantics —
    conv3x3(silu(x*scale+shift)) with the same fp32 prologue/accumulation.
    Serves as the backward rule of the custom VJP below."""
    b, _, _, c = x.shape
    if scale is not None:
        s = scale if scale.ndim == 2 else jnp.broadcast_to(scale[None], (b, c))
        xf = (x.astype(jnp.float32) * s[:, None, None, :].astype(jnp.float32))
        if shift is not None:
            sh = (shift if shift.ndim == 2
                  else jnp.broadcast_to(shift[None], (b, c)))
            xf = xf + sh[:, None, None, :].astype(jnp.float32)
        x = jax.nn.silu(xf).astype(x.dtype)
    out_dtype = x.dtype
    # all-f32 compute: mixed bf16/f32 operands trip the conv transpose rule
    # when this function is differentiated (the only use of this path)
    out = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), kernel.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _diff_conv3x3(interpret: bool, halo: str, int8: bool,
                  act_amax: float | None):
    """conv3x3 with a custom VJP: Pallas forward, exact-math XLA backward
    (Pallas kernels define no autodiff rules, so training on TPU would
    otherwise fail to trace). The backward always differentiates the exact
    op — with int8 on, that is a straight-through exact-math estimator.
    Residuals are the raw inputs; the XLA forward is recomputed inside bwd
    (remat-by-default, matching TrainConfig.remat)."""

    @jax.custom_vjp
    def f(args):
        x, kernel, bias, scale, shift, kernel_q, w_scale = args
        return _conv3x3(x, kernel, bias, scale, shift, interpret=interpret,
                        halo=halo, int8=int8, act_amax=act_amax,
                        kernel_q=kernel_q, w_scale=w_scale)

    def fwd(args):
        return f(args), args

    def bwd(args, g):
        x, kernel, bias, scale, shift, kernel_q, w_scale = args
        _, vjp = jax.vjp(lambda t: _xla_reference(*t),
                         (x, kernel, bias, scale, shift))
        gx, gk, gb, gs, gsh = vjp(g)[0]

        def zero_ct(a):
            if a is None:
                return None
            if jnp.issubdtype(a.dtype, jnp.integer):  # int8 kernel_q: float0
                return np.zeros(a.shape, jax.dtypes.float0)
            return jnp.zeros_like(a)

        return ((gx, gk, gb, gs, gsh, zero_ct(kernel_q), zero_ct(w_scale)),)

    f.defvjp(fwd, bwd)
    return f


@functools.partial(jax.jit, static_argnames=("interpret", "halo", "int8",
                                             "act_amax"))
def _conv3x3(x: Array, kernel: Array, bias: Array | None = None,
             scale: Array | None = None, shift: Array | None = None,
             interpret: bool = False, halo: str = "halo1",
             int8: bool = False, act_amax: float | None = None,
             kernel_q: Array | None = None,
             w_scale: Array | None = None) -> Array:
    b, h, w, c = x.shape
    c_out = kernel.shape[-1]

    if scale is not None:
        if scale.ndim == 1:
            scale = jnp.broadcast_to(scale[None], (b, c))
        if shift is None:
            shift = jnp.zeros((b, c), x.dtype)
        elif shift.ndim == 1:
            shift = jnp.broadcast_to(shift[None], (b, c))
        # elementwise prologue in fp32 (reads/writes stay in x.dtype; the
        # folded GroupNorm affine loses precision if applied in bf16)
        xf = (x.astype(jnp.float32) * scale[:, None, None, :].astype(jnp.float32)
              + shift[:, None, None, :].astype(jnp.float32))
        x = jax.nn.silu(xf).astype(x.dtype)

    # scoped-VMEM budget check: Mosaic double-buffers every in/out block, so
    # the footprint is 2 x (3 row views + weight tile + out) + the fp32 acc.
    # Over ~14 MB (16 MB limit minus slack for neighboring fusions), halve
    # the contraction into two kernel calls; partial sums add in one XLA
    # fusion. Covers the UNet up-path concat widths (1920/2560) and the
    # wide-row level-0 shapes at large batch.
    it = jnp.dtype(x.dtype).itemsize
    bc_est = _pick_co_block(c, c_out, it)
    bh_est = _pick_row_block(h, w, c)
    est = (2 * (3 * bh_est * (w + 2) * c + 9 * c * bc_est) * it
           + bh_est * w * bc_est * 4 + 2 * bh_est * w * bc_est * it)
    if est > 14 * 1024 * 1024 and c >= 256:
        # lane-aligned first chunk; works for odd widths too (1029-ch
        # BlobNet conv_in)
        half = min((c // 2 + 127) // 128 * 128, c - 128)
        # int8 recursion: with in-graph quantization each half quantizes
        # under its own scales; pre-quantized halves share the full-range
        # scales (sliced along C — exact partial-sum math either way)
        y0 = _conv3x3(x[..., :half], kernel[:, :, :half], bias,
                      interpret=interpret, halo=halo, int8=int8,
                      act_amax=act_amax,
                      kernel_q=None if kernel_q is None
                      else kernel_q[:, :, :half], w_scale=w_scale)
        y1 = _conv3x3(x[..., half:], kernel[:, :, half:], None,
                      interpret=interpret, halo=halo, int8=int8,
                      act_amax=act_amax,
                      kernel_q=None if kernel_q is None
                      else kernel_q[:, :, half:], w_scale=w_scale)
        return y0 + y1

    out_dtype = x.dtype
    rescale = None
    if int8:
        # ONE global activation scale (per-row scales cannot factor out of
        # the 9-tap sum: each output pixel mixes 9 differently-scaled input
        # rows) + per-output-channel weight scales. LOSSY — opt-in.
        # Static act_amax: no max-abs pass; the quantize fuses into the
        # producer (prologue) and out-of-range values saturate.
        if act_amax is not None:
            xs = jnp.asarray(act_amax / 127.0, jnp.float32)
        else:
            xs = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32))),
                             1e-20) / 127.0
        x = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                     -127, 127).astype(jnp.int8)
        if kernel_q is not None:
            wq, ws = kernel_q.reshape(9, c, c_out), w_scale
        else:
            wf = kernel.reshape(9, c, c_out).astype(jnp.float32)
            ws = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1)), 1e-20) / 127.0
            wq = jnp.clip(jnp.round(wf / ws[None, None]),
                          -127, 127).astype(jnp.int8)
        rescale = xs * ws  # (Co,) f32

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    bc = _pick_co_block(c, c_out, jnp.dtype(x.dtype).itemsize)
    co_pad = (c_out + bc - 1) // bc * bc - c_out
    wk = wq if int8 else kernel.reshape(9, c, c_out).astype(x.dtype)
    bb = (bias if bias is not None else jnp.zeros((c_out,))).astype(jnp.float32)
    if co_pad:
        wk = jnp.pad(wk, ((0, 0), (0, 0), (0, co_pad)))
        bb = jnp.pad(bb, ((0, co_pad),))
        if int8:
            rescale = jnp.pad(rescale, ((0, co_pad),))
    n_co = (c_out + co_pad) // bc
    bb = bb.reshape(1, c_out + co_pad)
    if int8:
        rescale = rescale.reshape(1, c_out + co_pad)

    bh = _pick_row_block(h, w, c)
    if int8:
        # the i8 kernel's epilogue (int32 acc -> fp32 rescale temp -> out)
        # keeps ~16 B/elem of block-proportional VMEM stack live; cap it or
        # the 512-res VAE-decode shapes blow the 16 MB scoped limit
        while bh > 1 and bh % 2 == 0 and 16 * bh * w * bc > 8 * 1024 * 1024:
            bh //= 2
    n_h = h // bh

    w_spec = pl.BlockSpec((9, c, bc), lambda ib, ih, ic: (0, 0, ic),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, bc), lambda ib, ih, ic: (0, ic),
                          memory_space=pltpu.VMEM)
    common = dict(
        grid=(b, n_h, n_co),
        out_specs=pl.BlockSpec((1, bh, w, bc),
                               lambda ib, ih, ic: (ib, ih, 0, ic),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out + co_pad), out_dtype),
        scratch_shapes=[pltpu.VMEM((bh * w, bc),
                                   jnp.int32 if int8 else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )
    flops = 2 * b * h * w * 9 * c * (c_out + co_pad)
    out_bytes = b * h * w * (c_out + co_pad) * jnp.dtype(out_dtype).itemsize

    if int8:
        # int8 only ships the halo variant (the production default)
        out = pl.pallas_call(
            _conv3x3_kernel_halo_i8,
            in_specs=[
                pl.BlockSpec((1, bh, w + 2, c),
                             lambda ib, ih, ic: (ib, ih, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w + 2, c),
                             lambda ib, ih, ic: (ib, ih * bh + bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w + 2, c),
                             lambda ib, ih, ic: (ib, ih * bh + bh + 1, 0, 0),
                             memory_space=pltpu.VMEM),
                w_spec,
                pl.BlockSpec((1, bc), lambda ib, ih, ic: (0, ic),
                             memory_space=pltpu.VMEM),
                b_spec,
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=xp.size + wk.size + out_bytes,
                transcendentals=0,
            ),
            **common,
        )(xp, xp, xp, wk, rescale, bb)
        return out[..., :c_out] if co_pad else out

    mode = halo
    if mode == "halo1":
        # single center read + two halo rows; block height 1 makes the
        # dim-1 block index a row index, so the index map addresses the
        # exact halo rows below each block
        out = pl.pallas_call(
            _conv3x3_kernel_halo,
            in_specs=[
                pl.BlockSpec((1, bh, w + 2, c),
                             lambda ib, ih, ic: (ib, ih, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w + 2, c),
                             lambda ib, ih, ic: (ib, ih * bh + bh, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, w + 2, c),
                             lambda ib, ih, ic: (ib, ih * bh + bh + 1, 0, 0),
                             memory_space=pltpu.VMEM),
                w_spec, b_spec,
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(xp.size + wk.size) * xp.dtype.itemsize
                + out_bytes,
                transcendentals=0,
            ),
            **common,
        )(xp, xp, xp, wk, bb)
    else:
        # three row-shifted views of the padded input (tap row dh reads
        # view dh)
        x0 = xp[:, 0:h, :, :]
        x1 = xp[:, 1:h + 1, :, :]
        x2 = xp[:, 2:h + 2, :, :]

        def xspec():
            return pl.BlockSpec((1, bh, w + 2, c),
                                lambda ib, ih, ic: (ib, ih, 0, 0),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            _conv3x3_kernel,
            in_specs=[xspec(), xspec(), xspec(), w_spec, b_spec],
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=(3 * xp.size + wk.size) * xp.dtype.itemsize
                + out_bytes,
                transcendentals=0,
            ),
            **common,
        )(x0, x1, x2, wk, bb)
    return out[..., :c_out] if co_pad else out
