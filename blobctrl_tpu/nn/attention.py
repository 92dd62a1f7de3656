"""Attention, feed-forward (GEGLU), and the basic transformer block.

Matches diffusers' ``Attention`` + ``BasicTransformerBlock`` numerics
(/root/reference/diffusers/src/diffusers/models/attention_processor.py:262
AttnProcessor2_0 path, /root/reference/diffusers/src/diffusers/models/attention.py)
— SD-1.5 flavor: no qkv bias, bias on to_out, pre-LayerNorm blocks, GEGLU FF.

The inner scaled-dot-product attention dispatches to either plain XLA
(softmax in fp32 — great for short sequences / cross-attention over 77 text
tokens) or the Pallas TPU flash-attention kernel in
``blobctrl_tpu.ops.flash_attention`` (for the long 8k-token self-attention
that the double-width latent layout produces).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers
from blobctrl_tpu.parallel import kernel_sharding

Array = jax.Array

# Attention backend: "xla" | "pallas" | "interpret" | "auto".
# "auto" uses the Pallas flash kernel for long self-attention on TPU and XLA
# otherwise; "interpret" forces the flash kernel in Pallas interpret mode
# (CPU tests of the kernel + its shard_map wrapper).
# Set via set_attention_backend(); read statically at trace time.
_ATTENTION_BACKEND = "auto"
# Sequence length at or above which "auto" routes to the flash kernel.
_FLASH_MIN_SEQ = 1024
# Opt-in int8 QK^T inside the flash kernel (per-row exact rescale; ~1%
# relative output drift, 2x MXU rate on the padded QK^T stage).
_ATTENTION_INT8 = False
# With int8, use ONE global k scale instead of per-row k scales: collapses
# the exact rescale's two S^2 VPU passes into a single exp2-folded FMA
# (ops/flash_attention._flash_kernel_int8g). Lossier; this is the variant
# the int8-everything mode uses.
_ATTENTION_INT8_GLOBAL_K = False
# Fold the head-merge transpose into the output projection (einsum over
# (head, d)). Toggleable for A/B measurement; same math either way.
_OUT_PROJ_FOLD = True
# Fuse each pre-LayerNorm into its following projection matmul with the
# Pallas ln_matmul kernel (one x read instead of LN-write + matmul-read).
# Measured on v5e (scripts/bench_r3_levers.py, interleaved): the kernel
# LOSES at the production shapes (0.87x overall; 0.68-0.86x at L0/L1, only
# L2 qkv wins 1.16x) — the unfused timing implies XLA already fuses the LN
# chain into the matmul on this backend, so the Pallas version only brings
# worse MXU tiling at K=320/640. Default OFF; kept for re-evaluation on
# other shapes/toolchains. "auto": off (historical name); "on"; "off";
# "interpret": forced on in interpret mode (CPU tests).
_LN_MATMUL_FUSE = "off"


def set_out_proj_fold(flag: bool):
    global _OUT_PROJ_FOLD
    _OUT_PROJ_FOLD = bool(flag)


def set_ln_matmul_fuse(mode: str):
    global _LN_MATMUL_FUSE
    assert mode in ("auto", "on", "off", "interpret"), mode
    _LN_MATMUL_FUSE = mode


def _use_ln_fuse() -> bool:
    if _LN_MATMUL_FUSE in ("off", "auto"):
        return False
    return True  # "on" | "interpret"


def set_attention_backend(backend: str, qk_int8: Optional[bool] = None,
                          int8_global_k: Optional[bool] = None):
    global _ATTENTION_BACKEND, _ATTENTION_INT8, _ATTENTION_INT8_GLOBAL_K
    assert backend in ("xla", "pallas", "interpret", "auto"), backend
    _ATTENTION_BACKEND = backend
    if qk_int8 is not None:
        _ATTENTION_INT8 = bool(qk_int8)
    if int8_global_k is not None:
        _ATTENTION_INT8_GLOBAL_K = bool(int8_global_k)


def get_attention_backend() -> str:
    return _ATTENTION_BACKEND


def sdpa_xla(q: Array, k: Array, v: Array, scale: float,
             mask: Optional[Array] = None) -> Array:
    """Plain XLA attention. q,k,v: (B, H, S, D). fp32 softmax accumulation."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v)


def _use_flash(q_seq: int, kv_seq: int, head_dim: int, has_mask: bool) -> bool:
    if _ATTENTION_BACKEND == "xla":
        return False
    if has_mask:
        return False
    if kv_seq % 128 != 0:
        # the kernel cannot tile such kv (77-token cross-attention) —
        # always the XLA path, even when the backend is forced to "pallas"
        return False
    if _ATTENTION_BACKEND == "interpret":
        return True
    if jax.default_backend() != "tpu":
        return False
    if _ATTENTION_BACKEND == "pallas":
        return True
    return q_seq >= _FLASH_MIN_SEQ and kv_seq >= _FLASH_MIN_SEQ


def multi_head_attention(q: Array, k: Array, v: Array, heads: int,
                         mask: Optional[Array] = None,
                         return_heads: bool = False) -> Array:
    """q: (B, Sq, C), k/v: (B, Sk, C) -> (B, Sq, C), or (B, H, Sq, D) when
    return_heads (lets the caller fold the head-merge transpose into the
    output projection)."""
    b, sq, c = q.shape
    sk = k.shape[1]
    d = c // heads
    scale = 1.0 / (d ** 0.5)

    def split(x, s):
        return x.reshape(b, s, heads, d).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, sq), split(k, sk), split(v, sk)
    if _use_flash(sq, sk, d, mask is not None):
        from blobctrl_tpu.ops import flash_attention

        def flash(q3, k3, v3):
            return flash_attention.flash_attention(
                q3, k3, v3, scale=scale, qk_int8=_ATTENTION_INT8,
                interpret=_ATTENTION_BACKEND == "interpret",
                int8_global_k=_ATTENTION_INT8_GLOBAL_K)

        prof = kernel_sharding.current()
        if prof is not None:
            # Pallas under SPMD: heads ride the model axes (to_q/k/v are
            # column-parallel, so they arrive local), batch the data axes —
            # zero collectives (parallel.kernel_sharding module docstring)
            out = kernel_sharding.shard_flash_attention(flash, qh, kh, vh,
                                                        prof)
        else:
            out = flash(qh, kh, vh)
    else:
        out = sdpa_xla(qh, kh, vh, scale, mask)
    if return_heads:
        return out
    return out.transpose(0, 2, 1, 3).reshape(b, sq, c)


# ---------------------------------------------------------------------------
# diffusers-style Attention module
# ---------------------------------------------------------------------------

def init_attention(key, query_dim: int, heads: int, cross_dim: Optional[int] = None,
                   out_bias: bool = True):
    kq, kk, kv, ko = jax.random.split(key, 4)
    kv_dim = cross_dim if cross_dim is not None else query_dim
    return {
        "to_q": layers.init_linear(kq, query_dim, query_dim, use_bias=False),
        "to_k": layers.init_linear(kk, kv_dim, query_dim, use_bias=False),
        "to_v": layers.init_linear(kv, kv_dim, query_dim, use_bias=False),
        "to_out": layers.init_linear(ko, query_dim, query_dim, use_bias=out_bias),
    }


def attention(params, x: Array, heads: int, context: Optional[Array] = None,
              mask: Optional[Array] = None, norm=None) -> Array:
    """norm: optional pre-LN params — when given and ln_matmul fusion is
    enabled, the LayerNorm fuses into the projection matmul (x arrives
    UN-normalized); otherwise the LN is applied here first."""
    fuse = norm is not None and _use_ln_fuse()
    if fuse and context is None and "bias" in params["to_q"]:
        # biased self-attention (not an SD-1.5 shape): k/v would read the
        # un-normalized x below — fall back to the explicit LN
        fuse = False
    if norm is not None and not fuse:
        x = layers.layer_norm(norm, x)
    if context is None and "bias" not in params["to_q"]:
        # self-attention: fuse the three projections into one matmul. The
        # weight concat is loop-invariant, so XLA hoists it out of the
        # denoising fori_loop (int8 mode concats the pre-quantized kernels
        # + per-channel scales the same way).
        if layers.linear_int8_enabled() and "kernel_q" in params["to_q"]:
            w_qkv_q = jnp.concatenate([params[n]["kernel_q"]
                                       for n in ("to_q", "to_k", "to_v")],
                                      axis=1)
            wsc = jnp.concatenate([params[n]["w_scale"]
                                   for n in ("to_q", "to_k", "to_v")])
            qkv = layers.matmul_i8(x, w_qkv_q, wsc, None, x.dtype)
        else:
            wq = params["to_q"]["kernel"]
            wk = params["to_k"]["kernel"]
            wv = params["to_v"]["kernel"]
            w_qkv = jnp.concatenate([wq, wk, wv], axis=1)
            if fuse:
                from blobctrl_tpu.ops import ln_matmul as lnm
                qkv = lnm.ln_matmul(x, norm["scale"], norm["bias"], w_qkv,
                                    interpret=_LN_MATMUL_FUSE == "interpret")
            else:
                qkv = jnp.dot(x, w_qkv.astype(x.dtype))
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        if fuse:
            from blobctrl_tpu.ops import ln_matmul as lnm
            q = lnm.ln_matmul(x, norm["scale"], norm["bias"],
                              params["to_q"]["kernel"],
                              params["to_q"].get("bias"),
                              interpret=_LN_MATMUL_FUSE == "interpret")
        else:
            q = layers.linear(params["to_q"], x)
        k = layers.linear(params["to_k"], context if context is not None else x)
        v = layers.linear(params["to_v"], context if context is not None else x)
    out_h = multi_head_attention(q, k, v, heads, mask, return_heads=True)
    if not _OUT_PROJ_FOLD:
        b, h, sq, d = out_h.shape
        out = out_h.transpose(0, 2, 1, 3).reshape(b, sq, h * d)
        return layers.linear(params["to_out"], out)
    # output projection folded over (head, d): XLA's alternative — fusing the
    # head-merge transpose into the matmul — ran at ~10 TFLOPS on v5e (the
    # strided layout starves the MXU); the (h,d)-contraction einsum is the
    # same math (fp32 accumulation either way) without the strided operand.
    b, h, sq, d = out_h.shape
    prof = kernel_sharding.current()
    if layers.linear_int8_enabled() and "kernel_q" in params["to_out"]:
        xq, xs = layers.quantize_act_i8(out_h)
        if prof is not None:
            return kernel_sharding.shard_attn_out_proj(
                xq, params["to_out"]["kernel_q"],
                params["to_out"].get("bias"), prof, x_scale=xs,
                w_scale=params["to_out"]["w_scale"], out_dtype=out_h.dtype)
        w_o = params["to_out"]["kernel_q"].reshape(h, d, h * d)
        y = jnp.einsum("bhsd,hdc->bsc", xq, w_o,
                       preferred_element_type=jnp.int32)
        y = (y.astype(jnp.float32)
             * (params["to_out"]["w_scale"].astype(jnp.float32) * xs))
        if "bias" in params["to_out"]:
            y = y + params["to_out"]["bias"].astype(jnp.float32)
        return y.astype(out_h.dtype)
    if prof is not None:
        # sharded: consume the row-parallel (C, C) kernel at its native
        # P(model, None) placement; the (h, d, c) reshape happens on the
        # local shard inside the shard_map (reshaping the sharded kernel
        # out here forces an involuntary-remat transition in GSPMD)
        return kernel_sharding.shard_attn_out_proj(
            out_h, params["to_out"]["kernel"], params["to_out"].get("bias"),
            prof)
    w_o = params["to_out"]["kernel"].astype(out_h.dtype).reshape(h, d, h * d)
    y = jnp.einsum("bhsd,hdc->bsc", out_h, w_o,
                   preferred_element_type=jnp.float32).astype(out_h.dtype)
    if "bias" in params["to_out"]:
        y = y + params["to_out"]["bias"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# FeedForward (GEGLU)
# ---------------------------------------------------------------------------

def init_feed_forward(key, dim: int, mult: int = 4):
    k1, k2 = jax.random.split(key)
    inner = dim * mult
    return {
        "proj_in": layers.init_linear(k1, dim, inner * 2),
        "proj_out": layers.init_linear(k2, inner, dim),
    }


def feed_forward(params, x: Array, norm=None) -> Array:
    """norm: optional pre-LN params, fused into proj_in when enabled."""
    if norm is not None and _use_ln_fuse():
        from blobctrl_tpu.ops import ln_matmul as lnm
        h = lnm.ln_matmul(x, norm["scale"], norm["bias"],
                          params["proj_in"]["kernel"],
                          params["proj_in"].get("bias"),
                          interpret=_LN_MATMUL_FUSE == "interpret")
    else:
        if norm is not None:
            x = layers.layer_norm(norm, x)
        h = layers.linear(params["proj_in"], x)
    h, gate = jnp.split(h, 2, axis=-1)
    h = h * layers.gelu(gate)
    return layers.linear(params["proj_out"], h)


# ---------------------------------------------------------------------------
# BasicTransformerBlock: self-attn -> cross-attn -> GEGLU FF (pre-LN)
# ---------------------------------------------------------------------------

def init_transformer_block(key, dim: int, heads: int, cross_dim: Optional[int]):
    """cross_dim=None matches diffusers: NO second attention at all (the
    BlobNet configuration — blobnet.py:517 passes cross_attention_dim=None,
    which makes BasicTransformerBlock build only norm1/attn1/norm3/ff)."""
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm1": layers.init_norm(dim),
        "attn1": init_attention(k1, dim, heads),
        "norm3": layers.init_norm(dim),
        "ff": init_feed_forward(k3, dim),
    }
    if cross_dim is not None:
        p["norm2"] = layers.init_norm(dim)
        p["attn2"] = init_attention(k2, dim, heads, cross_dim=cross_dim)
    return p


def transformer_block(params, x: Array, heads: int,
                      context: Optional[Array] = None) -> Array:
    # pre-LNs are passed down so they can fuse into the projection matmuls
    # (ops/ln_matmul.py) when enabled; the callees apply them explicitly
    # otherwise — identical math either way
    x = x + attention(params["attn1"], x, heads, norm=params["norm1"])
    if "attn2" in params:
        x = x + attention(params["attn2"], x, heads, context=context,
                          norm=params["norm2"])
    x = x + feed_forward(params["ff"], x, norm=params["norm3"])
    return x
