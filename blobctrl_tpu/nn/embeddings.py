"""Timestep embeddings.

Numerics match diffusers' ``Timesteps`` / ``TimestepEmbedding``
(/root/reference/diffusers/src/diffusers/models/embeddings.py) so that
converted SD-1.5 / BlobNet weights reproduce reference activations.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers


def sinusoidal_timestep_embedding(timesteps: jax.Array, dim: int,
                                  flip_sin_to_cos: bool = True,
                                  downscale_freq_shift: float = 0.0,
                                  max_period: float = 10000.0) -> jax.Array:
    """timesteps: (B,) float/int -> (B, dim) fp32 sinusoidal embedding."""
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    return emb


def init_timestep_embedding(key, in_dim: int, time_embed_dim: int):
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": layers.init_linear(k1, in_dim, time_embed_dim),
        "linear_2": layers.init_linear(k2, time_embed_dim, time_embed_dim),
    }


def timestep_embedding(params, t_emb: jax.Array, act: str = "silu") -> jax.Array:
    h = layers.linear(params["linear_1"], t_emb)
    h = layers.ACTIVATIONS[act](h)
    return layers.linear(params["linear_2"], h)
