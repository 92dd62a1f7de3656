"""Pallas blob-splat kernel parity vs the pure-JAX implementation."""

import numpy as np
import pytest

import jax.numpy as jnp

from blobctrl_tpu.blob import math as blob_math
from blobctrl_tpu.ops import blob_splat
from tests.oracles import assert_close

RNG = np.random.RandomState(21)


def random_blobs(n, m):
    xs = RNG.uniform(0.2, 0.8, (n, m)).astype(np.float32)
    ys = RNG.uniform(0.2, 0.8, (n, m)).astype(np.float32)
    covs = np.zeros((n, m, 2, 2), np.float32)
    for i in range(n):
        for j in range(m):
            _, c = blob_math.ellipse_to_gaussian(
                0, 0, RNG.uniform(0.05, 0.2), RNG.uniform(0.05, 0.3),
                RNG.uniform(0, np.pi))
            covs[i, j] = c
    sizes = np.ones((n, m), np.float32)
    return xs, ys, covs, sizes


@pytest.mark.parametrize("n,m,hw", [
    (1, 1, (64, 128)),
    (2, 3, (128, 128)),
    (1, 5, (64, 256)),
    (1, 11, (64, 128)),  # > _UNROLL_M: the lax.fori_loop many-blob path
])
def test_splat_kernel_matches_reference_impl(n, m, hw):
    xs, ys, covs, sizes = random_blobs(n, m)
    if m >= 2:
        sizes[0, 1] = 0.0  # gated blob
    ref = blob_math.splat_scores(jnp.asarray(xs), jnp.asarray(ys),
                                 jnp.asarray(covs), jnp.asarray(sizes), hw)
    got = blob_splat.splat_scores_pallas(jnp.asarray(xs), jnp.asarray(ys),
                                         jnp.asarray(covs), jnp.asarray(sizes),
                                         hw, interpret=True)
    assert_close(np.asarray(got), np.asarray(ref), atol=1e-5, name=f"splat{hw}")


def test_splat_auto_dispatch_cpu():
    xs, ys, covs, sizes = random_blobs(1, 2)
    out = blob_splat.splat_scores_auto(jnp.asarray(xs), jnp.asarray(ys),
                                       jnp.asarray(covs), jnp.asarray(sizes),
                                       (64, 64))
    assert out.shape == (1, 64, 64, 3)
