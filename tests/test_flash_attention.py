"""Flash-attention kernel parity vs the XLA reference path (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import attention
from blobctrl_tpu.ops import flash_attention as fa
from tests.oracles import assert_close

RNG = np.random.RandomState(5)


@pytest.mark.parametrize("b,h,s,d", [
    (1, 2, 256, 40),     # padded head_dim, multiple kv blocks
    (2, 2, 512, 64),
    (1, 1, 384, 80),     # seq not a multiple of block_q
    (1, 2, 128, 160),
])
def test_flash_matches_xla(b, h, s, d):
    q = RNG.randn(b, h, s, d).astype(np.float32)
    k = RNG.randn(b, h, s, d).astype(np.float32)
    v = RNG.randn(b, h, s, d).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    ref = attention.sdpa_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale)
    got = fa.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             scale=scale, block_q=128, block_kv=128,
                             interpret=True)
    assert_close(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-4,
                 name=f"flash_{b}_{h}_{s}_{d}")


@pytest.mark.parametrize("d", [40, 80])
def test_flash_exp2_fold_matches_unfolded(d):
    """exp2-folded fixed-max kernel (scale*log2e in q, shift as an extra
    contraction lane) == the plain fixed-max kernel == XLA softmax."""
    b, h, s = 1, 2, 256
    q = RNG.randn(b, h, s, d).astype(np.float32)
    k = RNG.randn(b, h, s, d).astype(np.float32)
    v = RNG.randn(b, h, s, d).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    ref = attention.sdpa_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                             scale)
    fa.set_exp2_fold(True)
    try:
        folded = fa.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                    jnp.asarray(v), scale=scale, block_q=128,
                                    block_kv=128, interpret=True)
        fa.set_exp2_fold(False)
        plain = fa.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                   jnp.asarray(v), scale=scale, block_q=128,
                                   block_kv=128, interpret=True)
    finally:
        fa.set_exp2_fold(True)
    assert_close(np.asarray(folded), np.asarray(ref), atol=1e-5, rtol=1e-4,
                 name=f"exp2fold_vs_xla_d{d}")
    assert_close(np.asarray(folded), np.asarray(plain), atol=1e-5, rtol=1e-4,
                 name=f"exp2fold_vs_plain_d{d}")


@pytest.mark.parametrize("d", [40, 80, 160])
def test_flash_unpadded_d_matches_padded(d):
    """pad_d=False reads q/k/v at their true head dim from HBM (Mosaic pads
    only in VMEM) — must be numerically identical to the padded layout."""
    b, h, s = 1, 2, 256
    q = RNG.randn(b, h, s, d).astype(np.float32)
    k = RNG.randn(b, h, s, d).astype(np.float32)
    v = RNG.randn(b, h, s, d).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    padded = fa.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                scale=scale, block_q=128, block_kv=128,
                                interpret=True, pad_d=True)
    unpadded = fa.flash_attention(jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), scale=scale, block_q=128,
                                  block_kv=128, interpret=True, pad_d=False)
    np.testing.assert_allclose(np.asarray(unpadded), np.asarray(padded),
                               atol=1e-6, rtol=1e-6)


def test_flash_bf16_io():
    q = (RNG.randn(1, 2, 256, 40) * 0.5).astype(np.float32)
    k = (RNG.randn(1, 2, 256, 40) * 0.5).astype(np.float32)
    v = (RNG.randn(1, 2, 256, 40) * 0.5).astype(np.float32)
    scale = 0.158
    ref = attention.sdpa_xla(jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
                             jnp.asarray(v, jnp.bfloat16), scale)
    got = fa.flash_attention(jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
                             jnp.asarray(v, jnp.bfloat16), scale=scale,
                             block_q=128, block_kv=128, interpret=True)
    assert_close(np.asarray(got, np.float32), np.asarray(ref, np.float32),
                 atol=2e-2, rtol=2e-2, name="flash_bf16")


@pytest.mark.parametrize("b,h,s,d", [
    (1, 2, 256, 40),
    (1, 1, 384, 80),
])
def test_flash_int8_qk_bounded_drift(b, h, s, d):
    """Opt-in int8 QK^T: per-row symmetric quantization with exact rescale.
    ~1% relative drift vs the fp path; structure (shapes, finiteness,
    agreement direction) must hold."""
    q = RNG.randn(b, h, s, d).astype(np.float32)
    k = RNG.randn(b, h, s, d).astype(np.float32)
    v = RNG.randn(b, h, s, d).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    ref = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        block_q=128, block_kv=128, interpret=True))
    got = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        block_q=128, block_kv=128, interpret=True, qk_int8=True))
    assert np.isfinite(got).all()
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert 0.0 < rel < 0.03, rel


def test_flash_int8_global_k_exact_quantized_math():
    """int8_global_k kernel == an explicit numpy reference of the SAME
    quantized math (per-row q scales, one global k scale, softmax over the
    rescaled int32 scores) — the kernel's exp2/fixed-max folding must be
    exactly equivalent to that softmax."""
    b, h, s, d = 1, 2, 256, 40
    q = RNG.randn(b, h, s, d).astype(np.float32)
    k = RNG.randn(b, h, s, d).astype(np.float32)
    v = RNG.randn(b, h, s, d).astype(np.float32)
    scale = 1.0 / np.sqrt(d)

    qs = np.maximum(np.abs(q).max(axis=-1, keepdims=True), 1e-20) / 127.0
    qi = np.clip(np.round(q / qs), -127, 127)
    ka = max(np.abs(k).max(), 1e-20) / 127.0
    ki = np.clip(np.round(k / ka), -127, 127)
    s_i = np.einsum("bhqd,bhkd->bhqk", qi, ki)
    logits = s_i * qs * ka * scale
    p = np.exp(logits - logits.max(axis=-1, keepdims=True))
    ref = np.einsum("bhqk,bhkd->bhqd", p / p.sum(-1, keepdims=True), v)

    got = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        block_q=128, block_kv=128, interpret=True, qk_int8=True,
        int8_global_k=True))
    assert_close(got, ref.astype(np.float32), atol=2e-5, rtol=1e-4,
                 name="flash_int8_global_k")

    # and bounded drift vs the exact fp path
    exact = np.asarray(fa.flash_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale,
        block_q=128, block_kv=128, interpret=True))
    rel = np.abs(got - exact).max() / np.abs(exact).max()
    assert 0.0 < rel < 0.05, rel


def test_int8_quantize_rows_roundtrip():
    x = jnp.asarray(RNG.randn(2, 3, 64, 40).astype(np.float32)) * 3.7
    qi, qs = fa._quantize_rows(x)
    assert qi.dtype == jnp.int8
    back = qi.astype(jnp.float32) * qs
    assert float(jnp.abs(back - x).max()) <= float(qs.max()) * 0.5 + 1e-6


def test_flash_grad_matches_xla():
    """custom VJP: Pallas forward, XLA-softmax backward — grads through
    flash_attention must match differentiating sdpa_xla. This is what
    training routes through on TPU."""
    b, h, s, d = 1, 2, 256, 40
    q = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    cot = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)

    def loss_flash(q, k, v):
        out = fa.flash_attention(q, k, v, scale=scale, block_q=128,
                                 block_kv=128, interpret=True)
        return jnp.sum(out * cot)

    def loss_xla(q, k, v):
        return jnp.sum(attention.sdpa_xla(q, k, v, scale) * cot)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, ref, "qkv"):
        rel = float(jnp.abs(g - r).max() / (jnp.abs(r).max() + 1e-12))
        assert rel < 1e-4, (name, rel)


def test_chunked_reference_matches_plain():
    """The memory-safe q-chunked backward reference == plain reference,
    including the q-pad path (Sq not a multiple of the chunk)."""
    b, h, s, d = 1, 2, 200, 24
    q = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)
    ref = fa._xla_sdpa_reference(q, k, v, 0.17)
    got = fa._xla_sdpa_chunked(q, k, v, 0.17)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_flash_grad_chunked_bwd(monkeypatch):
    """Long-sequence backward (q-chunked, rematerialized) grads == the plain
    reference grads. Forced small thresholds stand in for the production
    S=8192 shapes where the plain backward cannot fit."""
    monkeypatch.setattr(fa, "_CHUNKED_BWD_ELEMS", 0)
    monkeypatch.setattr(fa, "_BWD_CHUNK_Q", 96)  # 256 -> pad to 288
    b, h, s, d = 1, 2, 256, 40
    q = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    cot = jnp.asarray(RNG.randn(b, h, s, d), jnp.float32)

    def loss_flash(q, k, v):
        out = fa.flash_attention(q, k, v, scale=scale, block_q=128,
                                 block_kv=128, interpret=True)
        return jnp.sum(out * cot)

    def loss_xla(q, k, v):
        return jnp.sum(attention.sdpa_xla(q, k, v, scale) * cot)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, ref, "qkv"):
        rel = float(jnp.abs(g - r).max() / (jnp.abs(r).max() + 1e-12))
        assert rel < 1e-4, (name, rel)
