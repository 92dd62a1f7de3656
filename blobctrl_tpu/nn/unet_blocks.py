"""UNet down/mid/up blocks with BlobCtrl's residual-injection protocol as a
first-class functional argument.

Reference behavior being reproduced (do-not-copy; numerics + ordering only):
  * /root/reference/diffusers/src/diffusers/models/unets/unet_2d_blocks.py
    CrossAttnDownBlock2D.forward:1241 / DownBlock2D:1378 — a residual is added
    after every resnet(+attn) pair and after the downsampler;
    CrossAttnUpBlock2D:2514 / UpBlock2D:2677 — same for up blocks, which can
    also return their per-layer hidden states (consumed by BlobNet).
  * The "right-half add": when the feature map is double-width (W == 2H, the
    BlobCtrl width-concat layout), residuals apply only to the right (noisy)
    half (e.g. unet_2d_blocks.py:1304-1307).

Injection lists are consumed positionally at trace time (static structure),
so the whole protocol disappears into one fused XLA graph.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import resnet as rn, transformer_2d as t2d

Array = jax.Array


def add_injection(x: Array, r: Array) -> Array:
    """Add residual to x; if x is double-width (W != H), only the right half.

    NHWC; shapes are static at trace time. XLA fuses the scatter-add into the
    surrounding elementwise graph.
    """
    h, w = x.shape[1], x.shape[2]
    if w == h:
        return x + r.astype(x.dtype)
    return x.at[:, :, w - h:, :].add(r.astype(x.dtype))


class InjectionQueue:
    """Trace-time positional consumer of BlobNet residuals."""

    def __init__(self, residuals: Optional[Sequence[Array]]):
        self._items: Optional[List[Array]] = list(residuals) if residuals is not None else None

    @property
    def active(self) -> bool:
        return self._items is not None

    def apply(self, x: Array) -> Array:
        if self._items is None:
            return x
        return add_injection(x, self._items.pop(0))

    def assert_empty(self):
        if self._items is not None and len(self._items) != 0:
            raise ValueError(f"{len(self._items)} unconsumed injection residuals")


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def init_down_block(key, c_in: int, c_out: int, temb_dim: int, num_layers: int,
                    heads: Optional[int], cross_dim: Optional[int],
                    add_downsample: bool, norm_groups: int = 32,
                    transformer_layers: int = 1):
    """heads=None -> plain DownBlock2D (no attention)."""
    keys = jax.random.split(key, 2 * num_layers + 1)
    p = {"resnets": []}
    if heads is not None:
        p["attentions"] = []
    for i in range(num_layers):
        cin = c_in if i == 0 else c_out
        p["resnets"].append(rn.init_resnet_block(keys[2 * i], cin, c_out, temb_dim))
        if heads is not None:
            p["attentions"].append(t2d.init_transformer_2d(
                keys[2 * i + 1], c_out, heads, transformer_layers, cross_dim, norm_groups))
    if add_downsample:
        p["downsample"] = rn.init_downsample(keys[-1], c_out)
    return p


def init_mid_block(key, channels: int, temb_dim: int, heads: int,
                   cross_dim: Optional[int], norm_groups: int = 32,
                   transformer_layers: int = 1):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "resnets": [rn.init_resnet_block(k1, channels, channels, temb_dim),
                    rn.init_resnet_block(k2, channels, channels, temb_dim)],
        "attentions": [t2d.init_transformer_2d(k3, channels, heads,
                                               transformer_layers, cross_dim, norm_groups)],
    }


def init_up_block(key, c_in: int, c_out: int, prev_out: int, temb_dim: int,
                  num_layers: int, heads: Optional[int], cross_dim: Optional[int],
                  add_upsample: bool, norm_groups: int = 32,
                  transformer_layers: int = 1):
    keys = jax.random.split(key, 2 * num_layers + 1)
    p = {"resnets": []}
    if heads is not None:
        p["attentions"] = []
    for i in range(num_layers):
        res_skip = c_in if (i == num_layers - 1) else c_out
        res_in = prev_out if i == 0 else c_out
        p["resnets"].append(rn.init_resnet_block(keys[2 * i], res_in + res_skip, c_out, temb_dim))
        if heads is not None:
            p["attentions"].append(t2d.init_transformer_2d(
                keys[2 * i + 1], c_out, heads, transformer_layers, cross_dim, norm_groups))
    if add_upsample:
        p["upsample"] = rn.init_upsample(keys[-1], c_out)
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def down_block(params, x: Array, temb: Array, context: Optional[Array],
               heads: Optional[int], inject: InjectionQueue,
               norm_groups: int = 32, eps: float = 1e-5,
               remat: bool = False) -> Tuple[Array, List[Array]]:
    out_states = []
    attns = params.get("attentions")
    for i, res_p in enumerate(params["resnets"]):
        def layer(x, res_p=res_p, i=i):
            h = rn.resnet_block(res_p, x, temb, norm_groups, eps)
            if attns is not None:
                h = t2d.transformer_2d(attns[i], h, heads, context, norm_groups)
            return h
        x = jax.checkpoint(layer)(x) if remat else layer(x)
        x = inject.apply(x)
        out_states.append(x)
    if "downsample" in params:
        x = rn.downsample_2d(params["downsample"], x)
        x = inject.apply(x)
        out_states.append(x)
    return x, out_states


def mid_block(params, x: Array, temb: Array, context: Optional[Array],
              heads: int, norm_groups: int = 32, eps: float = 1e-5,
              remat: bool = False) -> Array:
    def body(x):
        h = rn.resnet_block(params["resnets"][0], x, temb, norm_groups, eps)
        for attn_p, res_p in zip(params["attentions"], params["resnets"][1:]):
            h = t2d.transformer_2d(attn_p, h, heads, context, norm_groups)
            h = rn.resnet_block(res_p, h, temb, norm_groups, eps)
        return h
    return jax.checkpoint(body)(x) if remat else body(x)


def up_block(params, x: Array, skips: List[Array], temb: Array,
             context: Optional[Array], heads: Optional[int],
             inject: InjectionQueue, upsample_hw: Optional[tuple] = None,
             norm_groups: int = 32, eps: float = 1e-5,
             collect_states: bool = False, remat: bool = False
             ) -> Tuple[Array, List[Array]]:
    out_states = []
    attns = params.get("attentions")
    for i, res_p in enumerate(params["resnets"]):
        skip = skips.pop()
        def layer(x, skip, res_p=res_p, i=i):
            h = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            h = rn.resnet_block(res_p, h, temb, norm_groups, eps)
            if attns is not None:
                h = t2d.transformer_2d(attns[i], h, heads, context, norm_groups)
            return h
        x = jax.checkpoint(layer)(x, skip) if remat else layer(x, skip)
        x = inject.apply(x)
        if collect_states:
            out_states.append(x)
    if "upsample" in params:
        x = rn.upsample_2d(params["upsample"], x, upsample_hw)
        x = inject.apply(x)
        if collect_states:
            out_states.append(x)
    return x, out_states
