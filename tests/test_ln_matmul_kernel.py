"""Fused LayerNorm->matmul Pallas kernel vs the unfused reference path
(interpret mode; exact math in fp32)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers
from blobctrl_tpu.ops import ln_matmul as lnm

RNG = np.random.RandomState(3)


def _ref(x, gamma, beta, w, wb):
    xn = layers.layer_norm({"scale": jnp.asarray(gamma),
                            "bias": jnp.asarray(beta)}, jnp.asarray(x))
    y = jnp.dot(xn, jnp.asarray(w).astype(xn.dtype),
                preferred_element_type=jnp.float32)
    if wb is not None:
        y = y + jnp.asarray(wb)
    return np.asarray(y, np.float32)


@pytest.mark.parametrize("m,c,n", [
    (256, 320, 960),     # L0 QKV (N padded 960->1024 internally)
    (512, 64, 128),      # tiny
    (300, 320, 320),     # M not block-aligned (row padding path)
    (128, 1280, 640),    # wide C
])
def test_ln_matmul_matches_reference(m, c, n):
    x = RNG.randn(m, c).astype(np.float32)
    gamma = RNG.randn(c).astype(np.float32) * 0.5 + 1.0
    beta = RNG.randn(c).astype(np.float32) * 0.1
    w = (RNG.randn(c, n).astype(np.float32) / np.sqrt(c))
    wb = RNG.randn(n).astype(np.float32) * 0.1

    got = lnm.ln_matmul(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                        jnp.asarray(w), jnp.asarray(wb), interpret=True)
    ref = _ref(x, gamma, beta, w, wb)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               atol=2e-5, rtol=2e-5)


def test_ln_matmul_no_bias_and_batched_shape():
    x = RNG.randn(2, 77, 64).astype(np.float32)   # (B, S, C) shape preserved
    gamma = np.ones(64, np.float32)
    beta = np.zeros(64, np.float32)
    w = RNG.randn(64, 128).astype(np.float32) / 8.0
    got = lnm.ln_matmul(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta),
                        jnp.asarray(w), None, interpret=True)
    assert got.shape == (2, 77, 128)
    ref = _ref(x.reshape(-1, 64), gamma, beta, w, None).reshape(2, 77, 128)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("cross", [True, False])
def test_transformer_block_fused_matches_unfused(cross):
    """The wired-in fusion (attention/feed_forward norm= path) is the same
    math as the explicit pre-LN path."""
    from blobctrl_tpu.nn import attention as attn_lib
    key = jax.random.PRNGKey(0)
    dim, heads, ctx = 64, 2, 48
    params = attn_lib.init_transformer_block(key, dim, heads,
                                             ctx if cross else None)
    x = jnp.asarray(RNG.randn(2, 77, dim).astype(np.float32))
    c = jnp.asarray(RNG.randn(2, 7, ctx).astype(np.float32)) if cross else None

    attn_lib.set_ln_matmul_fuse("off")
    try:
        ref = attn_lib.transformer_block(params, x, heads, context=c)
        attn_lib.set_ln_matmul_fuse("interpret")
        got = attn_lib.transformer_block(params, x, heads, context=c)
    finally:
        attn_lib.set_ln_matmul_fuse("auto")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_ln_matmul_bf16_io():
    x = (RNG.randn(256, 320) * 2).astype(np.float32)
    gamma = RNG.randn(320).astype(np.float32) * 0.3 + 1.0
    beta = RNG.randn(320).astype(np.float32) * 0.1
    w = (RNG.randn(320, 960) / np.sqrt(320)).astype(np.float32)
    wb = RNG.randn(960).astype(np.float32) * 0.1
    got = lnm.ln_matmul(jnp.asarray(x, jnp.bfloat16), jnp.asarray(gamma),
                        jnp.asarray(beta), jnp.asarray(w), jnp.asarray(wb),
                        interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = _ref(jnp.asarray(x, jnp.bfloat16), gamma, beta,
               jnp.asarray(w, jnp.bfloat16), wb)
    # same bf16 IO discipline as the unfused path -> only tiny reorder drift
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               atol=0.05, rtol=0.05)
