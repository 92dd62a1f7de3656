"""The opt-in GN+proj_in fusion flag routes transformer_2d through
ops/gn_matmul and matches the XLA path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.nn import transformer_2d as t2d


def test_transformer_2d_gn_proj_fuse_matches():
    k = jax.random.PRNGKey(0)
    params = t2d.init_transformer_2d(k, channels=32, heads=2, num_layers=1,
                                     cross_dim=16, norm_groups=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16), jnp.float32)
    ref = t2d.transformer_2d(params, x, heads=2, context=ctx, norm_groups=8)
    t2d.set_gn_proj_fuse(True)
    try:
        got = t2d.transformer_2d(params, x, heads=2, context=ctx,
                                 norm_groups=8)
    finally:
        t2d.set_gn_proj_fuse(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
