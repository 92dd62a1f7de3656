"""DDIM sampler, restructured TPU-first: all per-step scalars are precomputed
host-side into coefficient tables; the jitted step is two multiplies and an
add, indexable from inside lax.fori_loop.

Numerics match diffusers DDIMScheduler (epsilon prediction,
clip_sample=False — the SD-1.5 configuration — for any eta; eta>0 adds the
DDIM variance noise, parity-tested against diffusers' `variance_noise` path;
/root/reference/diffusers/src/diffusers/schedulers/scheduling_ddim.py).
Note: the BlobNetPipeline exposes the reference's default (eta=0); stochastic
DDIM is a scheduler-level capability used directly via make(eta=...) +
step(..., noise_key=...).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.schedulers import common

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    timesteps: np.ndarray        # (S,) int64, descending — host side
    timesteps_jax: Array         # (S,) on device
    # x_{t-1} = c_x0[i] * x0 + c_eps[i] * eps + sigma[i] * noise
    # where x0 = (x - s_t[i] * eps) / a_t[i]
    a_t: Array                   # (S,) sqrt(alphas_cumprod[t])
    s_t: Array                   # (S,) sqrt(1 - alphas_cumprod[t])
    c_x0: Array                  # (S,)
    c_eps: Array                 # (S,)
    sigma: Array                 # (S,) eta-scaled DDIM variance
    eta: float = 0.0
    init_noise_sigma: float = 1.0

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


def make(num_inference_steps: int, num_train_timesteps: int = 1000,
         beta_start: float = 0.00085, beta_end: float = 0.012,
         beta_schedule: str = "scaled_linear", spacing: str = "leading_ddim",
         steps_offset: int = 1, set_alpha_to_one: bool = False,
         eta: float = 0.0, timesteps=None) -> DDIMSchedule:
    betas = common.make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = common.alphas_cumprod_from_betas(betas).astype(np.float64)

    final_acp = 1.0 if set_alpha_to_one else float(acp[0])
    if timesteps is not None:
        # custom sampling schedule (beyond the reference: diffusers DDIM has
        # no custom-timestep support in v0.30). prev_t follows the schedule
        # itself (next element; final step -> final_acp) — identical to the
        # stride formula on the default leading_ddim grid.
        ts = common.validate_custom_timesteps(timesteps, num_train_timesteps)
        if len(ts) != num_inference_steps:
            raise ValueError(f"num_inference_steps={num_inference_steps} but "
                             f"{len(ts)} custom timesteps were given")
        prev_ts = np.concatenate([ts[1:], [-1]])
    else:
        ts = common.make_timesteps(num_inference_steps, num_train_timesteps,
                                   spacing, steps_offset)
        prev_ts = ts - num_train_timesteps // num_inference_steps
    acp_t = acp[ts]
    acp_prev = np.where(prev_ts >= 0, acp[np.clip(prev_ts, 0, None)], final_acp)

    a_t = np.sqrt(acp_t)
    s_t = np.sqrt(1.0 - acp_t)
    # eta-scaled variance (scheduling_ddim.py _get_variance)
    variance = (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
    sigma = eta * np.sqrt(np.maximum(variance, 0.0))
    c_x0 = np.sqrt(acp_prev)
    c_eps = np.sqrt(np.maximum(1.0 - acp_prev - sigma ** 2, 0.0))

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return DDIMSchedule(timesteps=ts, timesteps_jax=jnp.asarray(ts),
                        a_t=f32(a_t), s_t=f32(s_t), c_x0=f32(c_x0),
                        c_eps=f32(c_eps), sigma=f32(sigma), eta=eta)


def step(sched: DDIMSchedule, i: Array, model_output: Array, sample: Array,
         noise_key=None, noise: Optional[Array] = None) -> Array:
    """One DDIM step; i is the step index (0-based, traced or static).
    For eta > 0 pass noise_key (per-call fold_in recommended) or a
    pre-drawn ``noise`` array (sample-shaped; takes precedence — the
    pipeline uses this to draw per-request noise in batched edits)."""
    a_t = sched.a_t[i]
    s_t = sched.s_t[i]
    eps = model_output.astype(jnp.float32)
    x0 = (sample - s_t * eps) / a_t
    out = sched.c_x0[i] * x0 + sched.c_eps[i] * eps
    if sched.eta > 0.0:
        if noise is None:
            assert noise_key is not None, "eta > 0 needs a noise key"
            noise = jax.random.normal(jax.random.fold_in(noise_key, i),
                                      sample.shape, jnp.float32)
        out = out + sched.sigma[i] * noise
    return out.astype(sample.dtype)


def add_noise(sched_acp_sqrt: Array, sched_1m_acp_sqrt: Array, t: Array,
              sample: Array, noise: Array) -> Array:
    """Forward process q(x_t | x_0) for training: tables indexed by train t."""
    a = sched_acp_sqrt[t][:, None, None, None]
    s = sched_1m_acp_sqrt[t][:, None, None, None]
    return a * sample + s * noise


def training_tables(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
                    beta_end: float = 0.012, beta_schedule: str = "scaled_linear"):
    """(sqrt_acp, sqrt_1m_acp) lookup tables for add_noise during training."""
    betas = common.make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = common.alphas_cumprod_from_betas(betas).astype(np.float64)
    return jnp.asarray(np.sqrt(acp), jnp.float32), jnp.asarray(np.sqrt(1 - acp), jnp.float32)
