"""Pallas TPU kernel: fused Gaussian blob splatting + depth-ordered alpha
compositing.

Replaces the reference's torch.linalg.solve + materialized (N, M, H, W)
intermediates (/root/reference/blobctrl/utils/utils.py:126-181) with a single
pass per image tile: per-pixel Mahalanobis distance via the closed-form 2x2
inverse, sigmoid scoring, size gating, and back-to-front suffix-product
compositing — all in VMEM. One kernel launch produces the composited
d_scores; nothing of size M x H x W ever touches HBM.

The pure-JAX reference implementation lives in blobctrl_tpu.blob.math;
this kernel is numerically identical (tested) and is used for large grids
(viz-resolution splats) on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


_UNROLL_M = 8  # static unroll below this; lax loops above (O(1) code size)


def _splat_kernel(params_ref, out_ref, scores_scratch, *, m: int, height: int,
                  width: int, blk_h: int):
    """params_ref: (M, 8) SMEM rows [cx_px, cy_px, inv_a, inv_bc, inv_d,
    gate, 0, 0] (centers pre-scaled to pixels, inverse covariance pre-divided
    by the normalized grid scale). out_ref: (1, M+1, blk_h, W).

    The per-blob loops unroll statically for the demo-scale M (fastest) but
    switch to lax.fori_loop with dynamic scratch indexing past _UNROLL_M so
    compile time and program size stay O(1) in M for many-blob scenes."""
    tile = pl.program_id(1)
    y0 = tile * blk_h

    col = jax.lax.broadcasted_iota(jnp.int32, (blk_h, width), 1).astype(jnp.float32)
    row = (jax.lax.broadcasted_iota(jnp.int32, (blk_h, width), 0).astype(jnp.float32)
           + y0 * 1.0)

    # compute raw scores per blob into scratch
    def score(k):
        dx = (col - params_ref[0, k, 0]) * (1.0 / width)
        dy = (row - params_ref[0, k, 1]) * (1.0 / height)
        d2 = (params_ref[0, k, 2] * dx * dx + params_ref[0, k, 3] * dx * dy
              + params_ref[0, k, 4] * dy * dy)
        s = jax.nn.sigmoid(-d2)
        s = jnp.minimum(s * 2.0, 1.0)
        s = jnp.where(params_ref[0, k, 5] < 0.5, jnp.float32(1e-6), s)
        scores_scratch[k] = s

    # back-to-front compositing: d_k = s_k * prod_{j>k}(1 - s_j)
    def composite(k, tail):
        s = scores_scratch[k]
        out_ref[0, k + 1] = (s * tail).astype(out_ref.dtype)
        return tail * (1.0 - s)

    ones = jnp.ones((blk_h, width), jnp.float32)
    if m <= _UNROLL_M:
        for k in range(m):
            score(k)
        tail = ones
        for k in range(m - 1, -1, -1):
            tail = composite(k, tail)
    else:
        jax.lax.fori_loop(0, m, lambda k, c: (score(k), c)[1], 0)
        tail = jax.lax.fori_loop(
            0, m, lambda i, tail: composite(m - 1 - i, tail), ones)
    out_ref[0, 0] = tail.astype(out_ref.dtype)  # bg layer: s_bg=1 => d_bg=tail


@functools.partial(jax.jit, static_argnames=("score_hw", "interpret", "blk_h"))
def splat_scores_pallas(xs: Array, ys: Array, covs: Array, sizes: Array,
                        score_hw, interpret: bool = False,
                        blk_h: int = 128) -> Array:
    """Same contract as blob_math.splat_scores but channels-FIRST output
    (N, M+1, H, W) from the kernel, transposed to (N, H, W, M+1) to match."""
    h, w = score_hw
    n, m = xs.shape
    f32 = jnp.float32

    cov = covs.astype(f32)
    a, b = cov[..., 0, 0], cov[..., 0, 1]
    c, d = cov[..., 1, 0], cov[..., 1, 1]
    det = a * d - b * c
    params = jnp.stack([
        xs.astype(f32) * w,
        ys.astype(f32) * h,
        d / det,
        -(b + c) / det,
        a / det,
        (sizes.astype(f32) >= 0.5).astype(f32),
        jnp.zeros_like(a), jnp.zeros_like(a),
    ], axis=-1)  # (N, M, 8)

    blk_h = min(blk_h, h)
    while h % blk_h != 0:
        blk_h //= 2
    blk_h = max(blk_h, 1)
    grid = (n, h // blk_h)

    out = pl.pallas_call(
        functools.partial(_splat_kernel, m=m, height=h, width=w, blk_h=blk_h),
        grid=grid,
        in_specs=[pl.BlockSpec((1, m, 8), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, m + 1, blk_h, w),
                               lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m + 1, h, w), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, blk_h, w), jnp.float32)],
        interpret=interpret,
    )(params)
    return jnp.moveaxis(out, 1, -1)


def splat_scores_auto(xs, ys, covs, sizes, score_hw):
    """Dispatch: Pallas kernel on TPU for large grids, pure JAX otherwise."""
    from blobctrl_tpu.blob import math as blob_math
    h, w = score_hw
    if jax.default_backend() == "tpu" and h * w >= 128 * 128 and w % 128 == 0:
        return splat_scores_pallas(xs, ys, covs, sizes, score_hw)
    return blob_math.splat_scores(xs, ys, covs, sizes, score_hw)
