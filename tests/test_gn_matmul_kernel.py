"""Exact-math parity for ops/gn_matmul (fused GroupNorm-apply -> 1x1 proj,
the Transformer2D prologue/epilogue kernel, VERDICT r4 Next #3 lever b)
against the XLA reference chain layers.group_norm -> layers.conv2d —
interpret mode, fp32, tolerance 1e-5 (same bar as the other Pallas kernels).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blobctrl_tpu.nn import layers
from blobctrl_tpu.ops import gn_matmul


def _setup(b, h, w, c, n, seed=0):
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 4)
    x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
    norm = {"scale": jax.random.normal(ks[1], (c,)) * 0.2 + 1.0,
            "bias": jax.random.normal(ks[2], (c,)) * 0.1}
    conv = layers.init_conv(ks[3], 1, 1, c, n)
    return x, norm, conv


@pytest.mark.parametrize("shape", [(1, 8, 16, 32, 32), (2, 8, 8, 64, 64),
                                   (2, 4, 8, 32, 64)])
def test_gn_proj_matches_xla(shape):
    b, h, w, c, n = shape
    x, norm, conv = _setup(b, h, w, c, n)
    groups = 8
    ref = layers.conv2d(conv, layers.group_norm(norm, x, groups, eps=1e-6))
    got = gn_matmul.gn_proj(x, norm, conv, groups=groups, eps=1e-6,
                            interpret=True, block_m=32, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gn_proj_with_residual_epilogue():
    b, h, w, c, n = 2, 8, 8, 32, 32
    x, norm, conv = _setup(b, h, w, c, n, seed=1)
    res = jax.random.normal(jax.random.PRNGKey(9), (b, h, w, n), jnp.float32)
    ref = layers.conv2d(conv, layers.group_norm(norm, x, 8, eps=1e-6)) + res
    got = gn_matmul.gn_proj(x, norm, conv, groups=8, eps=1e-6, residual=res,
                            interpret=True, block_m=32, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_matmul_residual_matches_xla():
    b, h, w, c, n = 2, 8, 16, 64, 64
    x, _, conv = _setup(b, h, w, c, n, seed=2)
    res = jax.random.normal(jax.random.PRNGKey(5), (b, h, w, n), jnp.float32)
    ref = layers.conv2d(conv, x) + res
    got = gn_matmul.matmul_residual(x, conv, res, interpret=True,
                                    block_m=32, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gn_proj_unaligned_channels():
    # N not a multiple of 128 exercises the pad/slice path
    b, h, w, c, n = 1, 4, 8, 32, 48
    x, norm, conv = _setup(b, h, w, c, n, seed=3)
    ref = layers.conv2d(conv, layers.group_norm(norm, x, 4, eps=1e-6))
    got = gn_matmul.gn_proj(x, norm, conv, groups=4, eps=1e-6,
                            interpret=True, block_m=16, block_n=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
