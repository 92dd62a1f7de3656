"""Pallas TPU fused LayerNorm -> matmul (the transformer-block prologue).

Every BasicTransformerBlock sublayer is LN(x) @ W (QKV projection, cross-
attention query, GEGLU input projection). XLA compiles that as a separate
LayerNorm fusion (read x, write xn) followed by a matmul (read xn again) —
three activation passes over HBM plus a kernel boundary, the dominant slice
of the ~18 ms/step "small fusions" bucket (PERF_NOTES). This kernel reads x
once, computes the row moments and the normalized activation in VMEM, and
feeds the MXU directly: one x read, one y write.

Replaces the torch LayerNorm+Linear pairs of the reference's
BasicTransformerBlock (/root/reference/diffusers/src/diffusers/models/
attention.py norm1/attn1, norm2/attn2, norm3/ff).

Layout: x (M, C) rows = flattened (batch, seq); W (C, N). Grid
(m_blocks, n_blocks) with n innermost and "arbitrary" so the normalized
block (VMEM scratch) is computed once per m block (at n==0) and reused for
every n block; Mosaic keeps the x block resident across the inner n loop
(its index map does not depend on n), so x is fetched once.

Numerics match nn/layers.layer_norm exactly in structure: moments and
normalization in fp32, matmul inputs cast to the IO dtype, fp32 MXU
accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _ln_matmul_kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, o_ref, xn_ref, *,
                      eps: float):
    i_n = pl.program_id(1)

    @pl.when(i_n == 0)
    def _normalize():
        xf = x_ref[:].astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * g_ref[0] + b_ref[0]
        xn_ref[:] = xn.astype(xn_ref.dtype)

    acc = jax.lax.dot_general(xn_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (acc + wb_ref[0]).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block(total: int, target: int, align: int = 128) -> int:
    b = min(target, _round_up(total, align))
    while total % b != 0 and b > align:
        b -= align
    return b if total % b == 0 else total


@functools.partial(jax.jit, static_argnames=("eps", "interpret",
                                             "block_m", "block_n"))
def ln_matmul(x: Array, gamma: Array, beta: Array, w: Array,
              w_bias: Array | None = None, eps: float = 1e-5,
              interpret: bool = False, block_m: int = 512,
              block_n: int = 512) -> Array:
    """LayerNorm(x; gamma, beta) @ w (+ w_bias).

    x: (..., C); w: (C, N) -> (..., N). Rows are flattened internally; M and
    N are padded to tileable sizes (zero rows normalize to finite garbage
    and are sliced off).
    """
    orig_shape = x.shape
    c = x.shape[-1]
    n = w.shape[1]
    m = 1
    for s in orig_shape[:-1]:
        m *= s
    xf = x.reshape(m, c)

    bm = _pick_block(_round_up(m, 256), block_m, 256)
    bn = _pick_block(_round_up(n, 128), block_n, 128)
    mp, np_ = _round_up(m, bm), _round_up(n, bn)

    if mp != m:
        xf = jnp.pad(xf, ((0, mp - m), (0, 0)))
    wk = w.astype(x.dtype)
    wb = (w_bias if w_bias is not None else jnp.zeros((n,))).astype(jnp.float32)
    if np_ != n:
        wk = jnp.pad(wk, ((0, 0), (0, np_ - n)))
        wb = jnp.pad(wb, ((0, np_ - n),))

    out = pl.pallas_call(
        functools.partial(_ln_matmul_kernel, eps=eps),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, c), lambda im, i_n: (im, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda im, i_n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda im, i_n: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, bn), lambda im, i_n: (0, i_n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda im, i_n: (0, i_n),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda im, i_n: (im, i_n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, c), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * c * np_,
            bytes_accessed=(xf.size + wk.size + mp * np_) * xf.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, gamma.astype(jnp.float32).reshape(1, c),
      beta.astype(jnp.float32).reshape(1, c), wk, wb.reshape(1, np_))

    out = out[:m, :n]
    return out.reshape(orig_shape[:-1] + (n,))
