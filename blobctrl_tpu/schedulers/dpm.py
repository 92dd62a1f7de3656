"""DPM-Solver++ (2M) multistep sampler — the reference CLI's imported
alternative scheduler (/root/reference/scripts/blobctrl_inference.py:11-16;
diffusers scheduling_dpmsolver_multistep.py, algorithm_type="dpmsolver++",
epsilon prediction, lower_order_final).

Same TPU-first structure as unipc.py: all scalars precomputed host-side in
float64; the device step is gathers + FMAs with a 1-deep history, jittable
inside lax.fori_loop.

Per-step device math (x0-prediction form):
  order 1:  x <- c_x[i] * x - c_0[i] * m0
  order 2:  x <- c_x[i] * x - c_0[i] * m0 - c_1[i] * (m0 - m1)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.schedulers import common

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DPMSchedule:
    timesteps: np.ndarray
    timesteps_jax: Array
    conv_a: Array   # (S,) alpha for eps->x0
    conv_s: Array   # (S,) sigma for eps->x0
    c_x: Array      # (S,)
    c_0: Array      # (S,)
    c_1: Array      # (S,)
    init_noise_sigma: float = 1.0

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


def make(num_inference_steps: int, num_train_timesteps: int = 1000,
         beta_start: float = 0.00085, beta_end: float = 0.012,
         beta_schedule: str = "scaled_linear", solver_order: int = 2,
         lower_order_final: bool = True, spacing: str = "linspace",
         steps_offset: int = 0, final_sigmas_type: str = "zero") -> DPMSchedule:
    betas = common.make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = common.alphas_cumprod_from_betas(betas).astype(np.float64)
    all_sigmas = np.sqrt((1.0 - acp) / acp)
    ts = common.make_timesteps(num_inference_steps, num_train_timesteps,
                               spacing, steps_offset)
    S = len(ts)
    sigmas = np.interp(ts, np.arange(len(all_sigmas)), all_sigmas)
    sigma_last = 0.0 if final_sigmas_type == "zero" else float(all_sigmas[0])
    sigmas = np.concatenate([sigmas, [sigma_last]])

    def a_s(sig):
        a = 1.0 / np.sqrt(sig * sig + 1.0)
        return a, sig * a

    def lam(sig):
        a, s = a_s(sig)
        with np.errstate(divide="ignore"):
            return np.log(a) - np.log(s)

    conv_a = np.zeros(S)
    conv_s = np.zeros(S)
    c_x = np.zeros(S)
    c_0 = np.zeros(S)
    c_1 = np.zeros(S)

    lower_order_nums = 0
    for i in range(S):
        conv_a[i], conv_s[i] = a_s(sigmas[i])
        alpha_t, sigma_t = a_s(sigmas[i + 1])
        h = lam(sigmas[i + 1]) - lam(sigmas[i])
        c_x[i] = sigma_t / a_s(sigmas[i])[1]
        e = np.expm1(-h)  # e^{-h} - 1
        c_0[i] = alpha_t * e

        order = min(solver_order, lower_order_nums + 1)
        if lower_order_final:
            order = min(order, S - i)
        if order >= 2:
            h_0 = lam(sigmas[i]) - lam(sigmas[i - 1])
            r0 = h_0 / h
            c_1[i] = alpha_t * e * 0.5 / r0
        if not np.isfinite(c_1[i]):
            c_1[i] = 0.0
        lower_order_nums = min(lower_order_nums + 1, solver_order)

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return DPMSchedule(timesteps=ts, timesteps_jax=jnp.asarray(ts),
                       conv_a=f32(conv_a), conv_s=f32(conv_s),
                       c_x=f32(c_x), c_0=f32(c_0), c_1=f32(c_1))


def init_state(sched: DPMSchedule, sample: Array):
    return (sample, jnp.zeros_like(sample, dtype=jnp.float32))


def step(sched: DPMSchedule, i: Array, model_output: Array, state):
    sample, m1 = state
    x = sample.astype(jnp.float32)
    m0 = (x - sched.conv_s[i] * model_output.astype(jnp.float32)) / sched.conv_a[i]
    new_x = sched.c_x[i] * x - sched.c_0[i] * m0 - sched.c_1[i] * (m0 - m1)
    return (new_x.astype(sample.dtype), m0)


def final_sample(state):
    return state[0]
