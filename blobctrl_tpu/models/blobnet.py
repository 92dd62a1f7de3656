"""BlobNet: a full UNet copy (down+mid+up) whose per-layer activations are
tapped through zero-initialized 1x1 convolutions and returned as residuals
for injection into the main UNet.

Behavioral reference: /root/reference/blobctrl/models/blobnet.py:83-956.
For SD-1.5 geometry it emits 12 down + 1 mid + 15 up residuals per step
(SURVEY.md §2.2). Its transformer blocks self-attend (the published
checkpoint was built via from_unet with cross_attention_dim=None,
blobnet.py:517, and the pipeline passes no encoder_hidden_states).

Unlike the reference (which mutates module state), this is a pure function:
(params, config, sample, t, scale) -> (down_res, mid_res, up_res) pytree.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from blobctrl_tpu.nn import layers
from blobctrl_tpu.nn import resnet as rn
from blobctrl_tpu.nn import unet_blocks as ub
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.parallel import kernel_sharding

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class BlobNetConfig:
    # conv_in consumes in_channels + conditioning_channels
    # (4 latent + 1 score + 1024 DINOv2 splat = 1029 for BlobCtrl).
    in_channels: int = 4
    conditioning_channels: int = 1025
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    up_block_has_attn: Tuple[bool, ...] = (False, True, True, True)
    layers_per_block: int = 2
    cross_attention_dim: Optional[int] = None  # self-attention (see module docstring)
    num_heads: int = 8
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    transformer_layers_per_block: int = 1
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0

    def as_unet_config(self) -> unet_lib.UNetConfig:
        return unet_lib.UNetConfig(
            in_channels=self.in_channels + self.conditioning_channels,
            out_channels=4,
            block_out_channels=self.block_out_channels,
            down_block_has_attn=self.down_block_has_attn,
            up_block_has_attn=self.up_block_has_attn,
            layers_per_block=self.layers_per_block,
            cross_attention_dim=self.cross_attention_dim,
            num_heads=self.num_heads,
            norm_num_groups=self.norm_num_groups,
            norm_eps=self.norm_eps,
            transformer_layers_per_block=self.transformer_layers_per_block,
            flip_sin_to_cos=self.flip_sin_to_cos,
            freq_shift=self.freq_shift,
        )


def _zero_conv(c: int):
    return {"kernel": jnp.zeros((1, 1, c, c), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32)}


def init_blobnet(key, cfg: BlobNetConfig):
    ucfg = cfg.as_unet_config()
    params = unet_lib.init_unet(key, ucfg)
    # BlobNet has no output head.
    del params["conv_norm_out"], params["conv_out"]

    boc = cfg.block_out_channels
    n = len(boc)
    lpb = cfg.layers_per_block

    # Tap channels in reference order (blobnet.py:346-393, :396-400, :483-491).
    down_taps = [boc[0]]
    for i in range(n):
        down_taps += [boc[i]] * lpb
        if i < n - 1:
            down_taps += [boc[i]]
    up_taps = []
    rev = list(reversed(boc))
    for i in range(n):
        up_taps += [rev[i]] * (lpb + 1)
        if i < n - 1:
            up_taps += [rev[i]]

    params["zero_down"] = [_zero_conv(c) for c in down_taps]
    params["zero_mid"] = _zero_conv(boc[-1])
    params["zero_up"] = [_zero_conv(c) for c in up_taps]
    return params


def from_unet(unet_params, cfg: BlobNetConfig, key=None):
    """Training-time init: clone SD UNet weights into a fresh BlobNet
    (reference BlobNetModel.from_unet, blobnet.py:493-572).

    - conv_in's kernel is zero-padded over the extra conditioning input
      channels; the UNet's input channels copy into the first slots and the
      bias copies whole (:550-554).
    - Time embedding and all down/mid/up block weights copy over (:556-570).
      The reference uses load_state_dict(strict=False) there because the
      UNet's cross-attention (attn2/norm2) and output head have no BlobNet
      counterpart (cross_attention_dim=None builds no second attention,
      :517) — here the walk follows the BlobNet structure, so those UNet
      extras are skipped and any BlobNet weight WITHOUT a matching UNet
      source raises (the reference's ``len(missing) == 0`` assert).
    - The zero taps keep their zero init (zero_module, :959-962).
    """
    init = init_blobnet(key if key is not None else jax.random.PRNGKey(0),
                        cfg)

    def copy(dst, src, path):
        name = "/".join(map(str, path))
        if isinstance(dst, dict):
            out = {}
            for k, v in dst.items():
                if k in ("zero_down", "zero_mid", "zero_up"):
                    out[k] = v
                    continue
                if k not in src:
                    raise ValueError(f"UNet params missing {name}/{k}")
                out[k] = copy(v, src[k], path + (k,))
            return out
        if isinstance(dst, list):
            if len(src) != len(dst):
                raise ValueError(
                    f"{name}: {len(dst)} BlobNet entries vs {len(src)} UNet")
            return [copy(d, s, path + (i,))
                    for i, (d, s) in enumerate(zip(dst, src))]
        src = jnp.asarray(src)
        if path == ("conv_in", "kernel"):
            if src.shape[2] > dst.shape[2] or src.shape[:2] + src.shape[3:] \
                    != dst.shape[:2] + dst.shape[3:]:
                raise ValueError(
                    f"conv_in: UNet {src.shape} does not embed in {dst.shape}")
            return jnp.zeros_like(dst).at[:, :, :src.shape[2], :].set(
                src.astype(dst.dtype))
        if src.shape != dst.shape:
            raise ValueError(f"{name}: UNet {src.shape} != BlobNet {dst.shape}")
        return src.astype(dst.dtype)

    return copy(init, unet_params, ())


def num_residuals(cfg: BlobNetConfig) -> Tuple[int, int, int]:
    n, lpb = len(cfg.block_out_channels), cfg.layers_per_block
    down = 1 + n * lpb + (n - 1)
    up = n * (lpb + 1) + (n - 1)
    return down, 1, up


@kernel_sharding.scoped("blobnet")
def blobnet_apply(params, cfg: BlobNetConfig, sample: Array, timesteps: Array,
                  conditioning_scale: Union[float, Array] = 1.0,
                  guess_mode: bool = False,
                  remat: bool = False
                  ) -> Tuple[List[Array], Array, List[Array]]:
    """sample: (B, H, 2W, 1029) NHWC double-width blob conditioning input.

    Returns (down_residuals, mid_residual, up_residuals) at full double width;
    the pipeline crops the right half before injecting into the main UNet
    (pipeline_blobnet.py:1085-1087).
    """
    ucfg = cfg.as_unet_config()
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps[None], (sample.shape[0],))
    ng, eps, heads = cfg.norm_num_groups, cfg.norm_eps, cfg.num_heads

    emb = unet_lib.time_embed(params, ucfg, timesteps, sample.dtype)
    no_inject = ub.InjectionQueue(None)

    # 1029-ch conv_in: profiled at 26 TFLOPS on the XLA path (1.84 ms/step)
    x = rn.conv3x3_routed(params["conv_in"], sample)
    down_states: List[Array] = [x]
    for i, block_p in enumerate(params["down_blocks"]):
        block_ctx = None  # self-attention only
        block_heads = heads if cfg.down_block_has_attn[i] else None
        x, states = ub.down_block(block_p, x, emb, block_ctx, block_heads,
                                  no_inject, ng, eps, remat=remat)
        down_states.extend(states)

    x = ub.mid_block(params["mid_block"], x, emb, None, heads, ng, eps, remat=remat)
    mid_state = x

    up_states: List[Array] = []
    res_stack = list(down_states)
    for i, block_p in enumerate(params["up_blocks"]):
        k = len(block_p["resnets"])
        skips, res_stack = res_stack[-k:], res_stack[:-k]
        upsample_hw = res_stack[-1].shape[1:3] if res_stack else None
        block_heads = heads if cfg.up_block_has_attn[i] else None
        x, states = ub.up_block(block_p, x, skips, emb, None, block_heads,
                                no_inject, upsample_hw, ng, eps,
                                collect_states=True, remat=remat)
        up_states.extend(states)

    scale = conditioning_scale
    if not isinstance(scale, (int, float)):
        scale = jnp.asarray(scale)
        if scale.ndim == 1:  # per-sample scale
            scale = scale[:, None, None, None]

    if guess_mode:
        # logspace 0.1 -> 1.0 ramp (blobnet.py:929-934): down residuals get
        # ramp[:-1], mid gets ramp[-1], and up residuals are zip'd against
        # the SAME ramp — which in the reference silently TRUNCATES the up
        # list when len(up) > len(ramp) (true for SD-1.5: 15 > 13, which
        # would break the injection count). We reproduce the ramp pairing
        # but keep all residuals, extending with ramp[-1].
        ramp = jnp.logspace(-1, 0, len(down_states) + 1)
        down_scales = [scale * r for r in ramp[:-1]]
        mid_scale = scale * ramp[-1]
        up_scales = [scale * ramp[min(i, len(ramp) - 1)]
                     for i in range(len(up_states))]
    else:
        down_scales = [scale] * len(down_states)
        mid_scale = scale
        up_scales = [scale] * len(up_states)

    # strict zips: a config/checkpoint mismatch must raise, not silently drop
    # residuals (the defect class of reference quirk 1, SURVEY.md §5)
    down_res = [layers.conv2d(zp, s) * sc
                for zp, s, sc in zip(params["zero_down"], down_states,
                                     down_scales, strict=True)]
    mid_res = layers.conv2d(params["zero_mid"], mid_state) * mid_scale
    up_res = [layers.conv2d(zp, s) * sc
              for zp, s, sc in zip(params["zero_up"], up_states, up_scales,
                                   strict=True)]
    return down_res, mid_res, up_res
