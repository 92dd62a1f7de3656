"""Parity tests: core layers vs torch (fp32, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers, embeddings, attention
from tests.oracles import assert_close, nchw_to_nhwc, nhwc_to_nchw

torch = pytest.importorskip("torch")

RNG = np.random.RandomState(0)


def t(x):
    return torch.from_numpy(np.asarray(x))


def test_conv2d_matches_torch():
    x = RNG.randn(2, 7, 9, 6).astype(np.float32)
    w = RNG.randn(16, 6, 3, 3).astype(np.float32)  # OIHW
    b = RNG.randn(16).astype(np.float32)
    ref = torch.nn.functional.conv2d(t(nhwc_to_nchw(x)), t(w), t(b), stride=2, padding=1)
    params = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    got = layers.conv2d(params, jnp.asarray(x), stride=2, padding=1)
    assert_close(got, nchw_to_nhwc(ref.numpy()), name="conv2d")


def test_group_norm_matches_torch():
    x = RNG.randn(2, 5, 5, 8).astype(np.float32)
    g = torch.nn.GroupNorm(4, 8, eps=1e-5)
    with torch.no_grad():
        g.weight.copy_(t(RNG.randn(8).astype(np.float32)))
        g.bias.copy_(t(RNG.randn(8).astype(np.float32)))
    ref = g(t(nhwc_to_nchw(x))).detach().numpy()
    params = {"scale": jnp.asarray(g.weight.detach().numpy()), "bias": jnp.asarray(g.bias.detach().numpy())}
    got = layers.group_norm(params, jnp.asarray(x), 4, eps=1e-5)
    assert_close(got, nchw_to_nhwc(ref), name="group_norm")


def test_layer_norm_matches_torch():
    x = RNG.randn(2, 7, 16).astype(np.float32)
    ln = torch.nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.copy_(t(RNG.randn(16).astype(np.float32)))
        ln.bias.copy_(t(RNG.randn(16).astype(np.float32)))
    ref = ln(t(x)).detach().numpy()
    params = {"scale": jnp.asarray(ln.weight.detach().numpy()), "bias": jnp.asarray(ln.bias.detach().numpy())}
    got = layers.layer_norm(params, jnp.asarray(x))
    assert_close(got, ref, name="layer_norm")


def test_gelu_and_silu():
    x = RNG.randn(100).astype(np.float32)
    assert_close(layers.gelu(jnp.asarray(x)),
                 torch.nn.functional.gelu(t(x)).numpy(), name="gelu")
    assert_close(layers.silu(jnp.asarray(x)),
                 torch.nn.functional.silu(t(x)).numpy(), name="silu")


def test_bilinear_resize_matches_torch():
    for (h, w, oh, ow) in [(8, 8, 4, 4), (8, 8, 64, 64), (5, 7, 3, 9), (64, 64, 32, 32)]:
        x = RNG.randn(2, h, w, 3).astype(np.float32)
        ref = torch.nn.functional.interpolate(
            t(nhwc_to_nchw(x)), (oh, ow), mode="bilinear", align_corners=False).numpy()
        got = layers.bilinear_resize(jnp.asarray(x), oh, ow)
        assert_close(got, nchw_to_nhwc(ref), name=f"resize {h}x{w}->{oh}x{ow}")


def test_nearest_upsample_matches_torch():
    x = RNG.randn(1, 4, 6, 3).astype(np.float32)
    ref = torch.nn.functional.interpolate(t(nhwc_to_nchw(x)), scale_factor=2, mode="nearest").numpy()
    got = layers.nearest_upsample_2x(jnp.asarray(x))
    assert_close(got, nchw_to_nhwc(ref), name="nearest2x")


def test_sinusoidal_timestep_embedding_matches_diffusers():
    from tests.oracles import import_diffusers
    import_diffusers()
    from diffusers.models.embeddings import get_timestep_embedding
    ts = np.array([0, 1, 10, 500, 999], dtype=np.float32)
    for flip in (True, False):
        ref = get_timestep_embedding(t(ts), 320, flip_sin_to_cos=flip,
                                     downscale_freq_shift=0.0).numpy()
        got = embeddings.sinusoidal_timestep_embedding(jnp.asarray(ts), 320, flip, 0.0)
        assert_close(got, ref, name=f"timesteps flip={flip}")


def test_attention_matches_torch_sdpa():
    b, s, c, heads = 2, 33, 32, 4
    q = RNG.randn(b, s, c).astype(np.float32)
    k = RNG.randn(b, s, c).astype(np.float32)
    v = RNG.randn(b, s, c).astype(np.float32)
    d = c // heads

    def split(x):
        return t(x).reshape(b, s, heads, d).transpose(1, 2)

    ref = torch.nn.functional.scaled_dot_product_attention(split(q), split(k), split(v))
    ref = ref.transpose(1, 2).reshape(b, s, c).numpy()
    got = attention.multi_head_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads)
    assert_close(got, ref, name="mha")
