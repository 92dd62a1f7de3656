"""Pallas TPU Winograd F(2x2, 3x3) stride-1 same-conv.

The implicit-GEMM conv3x3 kernel (ops/conv3x3.py) is MXU-bound at the
production shapes (95-183 TFLOPS of a measured 164 matmul peak), so the only
way to cut its ~17 ms/step bucket further with exact-path math is to do
FEWER MACs. Winograd F(2x2,3x3) computes each 2x2 output tile from a 4x4
input tile with 16 MACs/channel instead of the direct 36 — a 2.25x MXU
reduction — at the cost of cheap +/- transform passes on the VPU.

Why a Pallas kernel and not an XLA-level rewrite: the transformed tensors
V and M are 4x the activation size; at the level-0 shapes that is ~170 MB
of extra HBM round-trips per call, which eats the whole MXU win (the
arithmetic is in PERF_NOTES). Keeping V and M in VMEM makes the HBM traffic
identical to the direct kernel (input read once + output written once).

TPU layout choices:
  * BOTH parities (row and column) are deinterleaved OUTSIDE the kernel
    (plane[rp][cp] = xp[:, rp::2, cp::2, :], one cheap XLA pass that fuses
    with the pad): the 4x4 tile rows 2p..2p+3 / columns 2q..2q+3 then
    become unit-stride windows [p:p+bt] / [q:q+n] of the four planes —
    Mosaic never sees a strided access (in-kernel stride-2 slices lower to
    a gather Mosaic rejects: "Only 2D gather is supported").
  * Transforms run in fp32 (the +/- pre-sums would otherwise round in
    bf16); V is cast to the input dtype only at the MXU boundary, and M
    accumulates in fp32 via preferred_element_type, so the numerics match
    the direct kernel's (bf16 inputs, fp32 accumulation) up to summation
    order.

Transform matrices (Winograd/Toom-Cook, interpolation points 0, 1, -1, inf):
  B^T = [[1,0,-1,0],[0,1,1,0],[0,-1,1,0],[0,1,0,-1]]   (input, +/- only)
  G   = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]       (weights, exact in fp32)
  A^T = [[1,1,1,0],[0,1,-1,-1]]                        (output, +/- only)

Covers the same surface as ops/conv3x3.py (the diffusers ResnetBlock2D 3x3
workhorse, /root/reference/diffusers/src/diffusers/models/resnet.py:327-340)
for even H and W — every production shape of the 512^2 edit qualifies. Odd
shapes and the int8 path stay on the implicit-GEMM kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_GT = np.array([[1.0, 0.5, 0.5, 0.0],
                [0.0, 0.5, -0.5, 0.0],
                [0.0, 0.5, 0.5, 1.0]], dtype=np.float64)  # G^T (3,4)


def transform_weights(kernel: Array) -> Array:
    """(3,3,C,Co) HWIO -> (16, C, Co) Winograd-domain weights U = G g G^T.

    fp32, exact (G's entries are powers of two). Called outside the kernel;
    inside a denoise lax.fori_loop XLA's loop-invariant code motion hoists
    it, so it runs once per compiled edit, not once per step.
    """
    g = kernel.astype(jnp.float32)
    gt = jnp.asarray(_GT, jnp.float32)
    # U[i,j] = sum_{r,s} G[i,r] G[j,s] g[r,s]. HIGHEST precision: on TPU the
    # default rounds fp32 einsum inputs to bf16, which would quantize U
    # twice (once here, once at the MXU-boundary cast).
    u = jnp.einsum("ri,rsck,sj->ijck", gt, g, gt,
                   precision=jax.lax.Precision.HIGHEST)
    return u.reshape(16, *kernel.shape[2:])


def _htrans(e, o, bt):
    """B^T along rows from the two row-parity planes: 2 x (bt+1, n1, C)
    fp32 -> 4 x (bt, n1, C). Tile row p uses padded rows 2p..2p+3 =
    (e[p], o[p], e[p+1], o[p+1]) — unit-stride dim-0 windows."""
    r0 = e[0:bt]
    r1 = o[0:bt]
    r2 = e[1:bt + 1]
    r3 = o[1:bt + 1]
    return (r0 - r2, r1 + r2, r2 - r1, r1 - r3)


def _winograd_kernel(xee_ref, hee_ref, xoe_ref, hoe_ref,
                     xeo_ref, heo_ref, xoo_ref, hoo_ref,
                     u_ref, b_ref, o_ref):
    # x{r}{c}_ref: (1, bt, n+1, C) row-parity-r / col-parity-c planes of
    # the padded input; h{r}{c}: (1, 1, n+1, C) the halo row below the
    # block; u_ref: (16, C, BC); b_ref: (1, BC) f32; o_ref: (1, 2bt, 2n, BC).
    bt = o_ref.shape[1] // 2
    n = o_ref.shape[2] // 2
    c = xee_ref.shape[3]
    bc = o_ref.shape[3]
    dt = xee_ref.dtype

    def plane(x_ref, h_ref):
        return jnp.concatenate([x_ref[0], h_ref[0]],
                               axis=0).astype(jnp.float32)

    te = _htrans(plane(xee_ref, hee_ref), plane(xoe_ref, hoe_ref), bt)
    to = _htrans(plane(xeo_ref, heo_ref), plane(xoo_ref, hoo_ref), bt)

    # W-direction B^T per H-index i: tile columns 2q..2q+3 are
    # (te[q], to[q], te[q+1], to[q+1]) — unit-stride sublane windows.
    m = [None] * 16
    for i in range(4):
        x0 = te[i][:, 0:n]
        x1 = to[i][:, 0:n]
        x2 = te[i][:, 1:n + 1]
        x3 = to[i][:, 1:n + 1]
        v = (x0 - x2, x1 + x2, x2 - x1, x1 - x3)
        for j in range(4):
            vf = v[j].astype(dt).reshape(bt * n, c)
            m[4 * i + j] = jax.lax.dot_general(
                vf, u_ref[4 * i + j], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

    # A^T M A: rows then columns, all +/- in fp32.
    p0 = [m[0 + j] + m[4 + j] + m[8 + j] for j in range(4)]
    p1 = [m[4 + j] - m[8 + j] - m[12 + j] for j in range(4)]
    bias = b_ref[0][None]
    y = [[(p[0] + p[1] + p[2]) + bias, (p[1] - p[2] - p[3]) + bias]
         for p in (p0, p1)]

    # Assemble out[2p+a, 2q+b] = y[a][b][p*n+q]: interleave columns via a
    # (bt, n, 2, BC)->(bt, 2n, BC) reshape, rows via the untiled dim 0.
    rows = []
    for a in range(2):
        yr = jnp.stack([y[a][0].reshape(bt, n, bc),
                        y[a][1].reshape(bt, n, bc)], axis=2)
        rows.append(yr.reshape(bt, 1, 2 * n, bc))
    out = jnp.concatenate(rows, axis=1).reshape(2 * bt, 2 * n, bc)
    o_ref[0] = out.astype(o_ref.dtype)


def _pick_co_block(c_in: int, c_out: int, itemsize: int) -> int:
    # bound the resident transformed-weight tile (16, C, BC); it is 16/9
    # the direct kernel's so use a slightly tighter cap
    for bc in (256, 128):
        if c_out % bc == 0 and 16 * c_in * bc * itemsize <= 3 * 1024 * 1024:
            return bc
    return 128


def _pick_tile_rows(h: int, w: int, c: int) -> int:
    """Tile-row block bt: GEMM M-dim = bt * w/2, target ~256-512 rows."""
    ht = h // 2
    bt = max(1, min(ht, 512 // max(w // 2, 1)))
    while ht % bt != 0:
        bt -= 1
    # cap the fp32 transform temps: ~(4 V + 16 M) * (bt * n) * max(C, BC) * 4
    while bt > 1 and ht % bt == 0 and bt * (w // 2) * c * 4 * 6 > 6 * 1024 * 1024:
        nbt = bt // 2
        while nbt > 1 and ht % nbt != 0:
            nbt -= 1
        if nbt == bt:
            break
        bt = nbt
    return bt


def conv3x3_winograd(x: Array, kernel: Array, bias: Array | None = None,
                     scale: Array | None = None, shift: Array | None = None,
                     interpret: bool = False,
                     u: Array | None = None) -> Array:
    """Winograd F(2x2,3x3) stride-1 same-conv. Same contract as
    ops.conv3x3.conv3x3 (NHWC x, HWIO kernel, optional fused
    silu(x*scale+shift) prologue); requires even H and W.

    u: optional pre-transformed (16, C, Co) weights (transform_weights);
    computed on the fly otherwise.
    """
    if u is None:
        u = transform_weights(kernel)
    return _conv3x3_winograd(x, u, bias, scale, shift, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv3x3_winograd(x: Array, u: Array, bias: Array | None = None,
                      scale: Array | None = None, shift: Array | None = None,
                      interpret: bool = False) -> Array:
    b, h, w, c = x.shape
    c_out = u.shape[-1]
    assert h % 2 == 0 and w % 2 == 0, (h, w)

    if scale is not None:
        if scale.ndim == 1:
            scale = jnp.broadcast_to(scale[None], (b, c))
        if shift is None:
            shift = jnp.zeros((b, c), x.dtype)
        elif shift.ndim == 1:
            shift = jnp.broadcast_to(shift[None], (b, c))
        xf = (x.astype(jnp.float32) * scale[:, None, None, :].astype(jnp.float32)
              + shift[:, None, None, :].astype(jnp.float32))
        x = jax.nn.silu(xf).astype(x.dtype)

    it = jnp.dtype(x.dtype).itemsize
    bc = _pick_co_block(c, c_out, it)
    bt = _pick_tile_rows(h, w, c)
    n = w // 2

    # VMEM budget (double-buffered ins/outs + fp32 transform temps); split
    # the contraction like the direct kernel when a block would not fit.
    est = (2 * (2 * (bt * 2 + 2) * (n + 1) * c * it + 16 * c * bc * it
                + 2 * bt * 2 * n * bc * it)
           + 6 * bt * n * max(c, bc) * 4 + 16 * bt * n * bc * 4)
    if est > 14 * 1024 * 1024 and c >= 256:
        half = min((c // 2 + 127) // 128 * 128, c - 128)
        y0 = _conv3x3_winograd(x[..., :half], u[:, :half], bias,
                               interpret=interpret)
        y1 = _conv3x3_winograd(x[..., half:], u[:, half:], None,
                               interpret=interpret)
        return y0 + y1

    out_dtype = x.dtype
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # row-parity x col-parity planes, each (B, h//2 + 1, n+1, C)
    planes = [xp[:, rp::2, cp::2, :] for rp in (0, 1) for cp in (0, 1)]

    co_pad = (c_out + bc - 1) // bc * bc - c_out
    uw = u.astype(x.dtype)
    bb = (bias if bias is not None else jnp.zeros((c_out,))).astype(jnp.float32)
    if co_pad:
        uw = jnp.pad(uw, ((0, 0), (0, 0), (0, co_pad)))
        bb = jnp.pad(bb, ((0, co_pad),))
    n_co = (c_out + co_pad) // bc
    bb = bb.reshape(1, c_out + co_pad)

    n_hb = (h // 2) // bt
    rows_blk = 2 * bt

    def plane_specs():
        # center block of bt tile-rows + the one halo row below it
        return [
            pl.BlockSpec((1, bt, n + 1, c),
                         lambda ib, ih, ic: (ib, ih, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n + 1, c),
                         lambda ib, ih, ic: (ib, ih * bt + bt, 0, 0),
                         memory_space=pltpu.VMEM),
        ]

    flops = 2 * b * h * w * 4 * c * (c_out + co_pad)  # 16/4 MACs per output
    out_bytes = b * h * w * (c_out + co_pad) * it
    out = pl.pallas_call(
        _winograd_kernel,
        grid=(b, n_hb, n_co),
        in_specs=plane_specs() + plane_specs() + plane_specs()
        + plane_specs() + [
            pl.BlockSpec((16, c, bc), lambda ib, ih, ic: (0, 0, ic),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc), lambda ib, ih, ic: (0, ic),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows_blk, w, bc),
                               lambda ib, ih, ic: (ib, ih, 0, ic),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out + co_pad), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=xp.size * it + uw.size * it + out_bytes,
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes[0], planes[0], planes[2], planes[2],
      planes[1], planes[1], planes[3], planes[3], uw, bb)
    return out[..., :c_out] if co_pad else out
