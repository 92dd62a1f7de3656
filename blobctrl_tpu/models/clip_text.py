"""CLIP text encoder (ViT-L/14 text tower for SD-1.5 prompt embedding).

Matches transformers CLIPTextModel numerics: token+position embeddings,
pre-LN blocks with quick_gelu MLP, causal attention mask, final layer norm.
Used by the pipeline's encode_prompt (reference
/root/reference/blobctrl/pipelines/pipeline_blobnet.py:507-687), including
the clip_skip variant (penultimate hidden state + final LN).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"


def _attn(params, x: Array, heads: int, mask: Array) -> Array:
    b, s, c = x.shape
    d = c // heads
    q = layers.linear(params["q_proj"], x)
    k = layers.linear(params["k_proj"], x)
    v = layers.linear(params["v_proj"], x)
    split = lambda t: t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, split(v))
    out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
    return layers.linear(params["out_proj"], out)


def apply(params, cfg: CLIPTextConfig, input_ids: Array,
          output_hidden_states: bool = False):
    """input_ids: (B, S) int32. Returns last_hidden_state (B, S, C) after the
    final layer norm, or (last_hidden_state, hidden_states list) if requested
    (hidden_states[i] = pre-final-LN activations entering layer i, matching
    transformers' output_hidden_states)."""
    b, s = input_ids.shape
    x = params["token_embedding"][input_ids] + params["position_embedding"][:s]
    eps = cfg.layer_norm_eps
    act = layers.ACTIVATIONS[cfg.hidden_act]

    causal = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)[None, None]

    hidden_states: List[Array] = [x]
    for layer in params["layers"]:
        h = layers.layer_norm(layer["layer_norm1"], x, eps)
        x = x + _attn(layer["self_attn"], h, cfg.num_heads, causal)
        h = layers.layer_norm(layer["layer_norm2"], x, eps)
        h = layers.linear(layer["mlp"]["fc1"], h)
        h = act(h)
        x = x + layers.linear(layer["mlp"]["fc2"], h)
        hidden_states.append(x)

    out = layers.layer_norm(params["final_layer_norm"], x, eps)
    if output_hidden_states:
        return out, hidden_states
    return out


def encode_with_clip_skip(params, cfg: CLIPTextConfig, input_ids: Array,
                          clip_skip: Optional[int] = None) -> Array:
    """diffusers encode_prompt semantics (pipeline_blobnet.py:598-613):
    clip_skip=None -> final hidden state (post final LN);
    clip_skip=k -> hidden_states[-(k+2)] passed through the final LN."""
    out, hs = apply(params, cfg, input_ids, output_hidden_states=True)
    if clip_skip is None:
        return out
    return layers.layer_norm(params["final_layer_norm"], hs[-(clip_skip + 2)],
                             cfg.layer_norm_eps)


def init(key, cfg: CLIPTextConfig):
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_layers))
    p = {
        "token_embedding": jax.random.normal(next(keys), (cfg.vocab_size, cfg.hidden_size)) * 0.02,
        "position_embedding": jax.random.normal(next(keys), (cfg.max_positions, cfg.hidden_size)) * 0.02,
        "layers": [],
        "final_layer_norm": layers.init_norm(cfg.hidden_size),
    }
    c, m = cfg.hidden_size, cfg.intermediate_size
    for _ in range(cfg.num_layers):
        p["layers"].append({
            "layer_norm1": layers.init_norm(c),
            "self_attn": {n: layers.init_linear(next(keys), c, c)
                          for n in ("q_proj", "k_proj", "v_proj", "out_proj")},
            "layer_norm2": layers.init_norm(c),
            "mlp": {"fc1": layers.init_linear(next(keys), c, m),
                    "fc2": layers.init_linear(next(keys), m, c)},
        })
    return p
