"""UniPC multistep sampler, restructured TPU-first.

Key design decision vs the reference
(/root/reference/diffusers/src/diffusers/schedulers/scheduling_unipc_multistep.py):
every scalar in UniPC's predictor/corrector (lambdas, rks, rhos, B_h, phi
terms, warm-up order logic, lower_order_final) depends ONLY on the static
timestep schedule — never on data. So all of it is precomputed host-side in
float64 into per-step coefficient tables, and the on-device step inside
``lax.fori_loop`` reduces to a handful of gathers + fused multiply-adds over a
fixed-size history ring buffer. No data-dependent control flow, no
torch.linalg.solve on device, one XLA graph for the whole denoise loop.

Semantics covered: predict_x0=True, solver_type in {bh1,bh2}, epsilon /
v_prediction / sample prediction, dynamic thresholding, disable_corrector,
lower_order_final, arbitrary solver_order >= 1,
final_sigmas_type="zero"|"sigma_min" — the full BlobCtrl configuration
(UniPC over SD-1.5's scaled_linear betas) plus the reference scheduler's
unused-by-BlobCtrl options
(scheduling_unipc_multistep.py:111-901: prediction_type :171, thresholding
_threshold_sample :358-386, disable_corrector :190).

Per-step device math (i = step index, K = solver_order):
  corrector (i>0):  x <- cc_x[i]*x_last - cc_m0[i]*m_prev
                         - cc_B[i]*(sum_j cc_hist[i,j]*(hist_j - m_prev)
                                    + cc_mt[i]*(m_t - m_prev))
  predictor:        x <- cp_x[i]*x - cp_m0[i]*m_t
                         - cp_B[i]*(sum_j cp_hist[i,j]*(hist_j - m_t))
where the 1/rk factors of the reference's D1s are folded into the host-side
coefficients.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.schedulers import common

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class UniPCSchedule:
    timesteps: np.ndarray      # (S,) int64 descending, host
    timesteps_jax: Array       # (S,)
    solver_order: int
    # conversion eps -> x0 at step i
    conv_a: Array              # (S,) alpha_t at sigmas[i]
    conv_s: Array              # (S,) sigma_t at sigmas[i]
    # corrector tables (row 0 is all-zero; corrector disabled at i=0)
    cc_x: Array                # (S,)
    cc_m0: Array               # (S,)
    cc_B: Array                # (S,)
    cc_mt: Array               # (S,)
    cc_hist: Array             # (S, K-1) coefs on (hist_j - m_prev)
    # predictor tables
    cp_x: Array                # (S,)
    cp_m0: Array               # (S,)
    cp_B: Array                # (S,)
    cp_hist: Array             # (S, K-1)
    init_noise_sigma: float = 1.0
    prediction_type: str = "epsilon"     # "epsilon" | "v_prediction" | "sample"
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    cc_on: Array = None        # (S,) 1.0 where the corrector runs

    @property
    def num_steps(self) -> int:
        return len(self.timesteps)


def _alpha_sigma(sigma: float) -> Tuple[float, float]:
    alpha = 1.0 / np.sqrt(sigma * sigma + 1.0)
    return alpha, sigma * alpha


def _lam(sigma: float) -> float:
    a, s = _alpha_sigma(sigma)
    with np.errstate(divide="ignore"):  # sigma=0 (final step) -> lambda=+inf
        return np.log(a) - np.log(s)


def _bh_coeffs(h: float, order: int, solver_type: str):
    """Returns (h_phi_1, B_h, b_vec(order,)) for predict_x0 (hh = -h)."""
    hh = -h
    h_phi_1 = np.expm1(hh)
    B_h = hh if solver_type == "bh1" else np.expm1(hh)
    b = []
    h_phi_k = h_phi_1 / hh - 1.0
    factorial_i = 1.0
    for i in range(1, order + 1):
        b.append(h_phi_k * factorial_i / B_h)
        factorial_i *= i + 1
        h_phi_k = h_phi_k / hh - 1.0 / factorial_i
    return h_phi_1, B_h, np.array(b)


def make(num_inference_steps: int, num_train_timesteps: int = 1000,
         beta_start: float = 0.00085, beta_end: float = 0.012,
         beta_schedule: str = "scaled_linear", solver_order: int = 2,
         solver_type: str = "bh2", lower_order_final: bool = True,
         spacing: str = "linspace", steps_offset: int = 0,
         final_sigmas_type: str = "zero",
         prediction_type: str = "epsilon", thresholding: bool = False,
         dynamic_thresholding_ratio: float = 0.995,
         sample_max_value: float = 1.0,
         disable_corrector: Tuple[int, ...] = (),
         timesteps=None) -> UniPCSchedule:
    if prediction_type not in ("epsilon", "v_prediction", "sample"):
        raise ValueError(f"unknown prediction_type {prediction_type!r}")
    betas = common.make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    acp = common.alphas_cumprod_from_betas(betas).astype(np.float64)
    all_sigmas = np.sqrt((1.0 - acp) / acp)
    if timesteps is not None:
        # custom sampling schedule (beyond the reference: diffusers' UniPC
        # set_timesteps has no timesteps arg in v0.30 — here every table
        # derives from ts, so any descending schedule drops in)
        ts = common.validate_custom_timesteps(timesteps, num_train_timesteps)
        if len(ts) != num_inference_steps:
            raise ValueError(f"num_inference_steps={num_inference_steps} but "
                             f"{len(ts)} custom timesteps were given")
    else:
        ts = common.make_timesteps(num_inference_steps, num_train_timesteps,
                                   spacing, steps_offset)
    S = len(ts)
    K = solver_order

    sigmas = np.interp(ts, np.arange(len(all_sigmas)), all_sigmas)
    sigma_last = 0.0 if final_sigmas_type == "zero" else float(all_sigmas[0])
    sigmas = np.concatenate([sigmas, [sigma_last]])  # (S+1,)

    conv_a = np.zeros(S)
    conv_s = np.zeros(S)
    cc_x = np.zeros(S)
    cc_m0 = np.zeros(S)
    cc_B = np.zeros(S)
    cc_mt = np.zeros(S)
    cc_hist = np.zeros((S, max(K - 1, 1)))
    cp_x = np.zeros(S)
    cp_m0 = np.zeros(S)
    cp_B = np.zeros(S)
    cp_hist = np.zeros((S, max(K - 1, 1)))

    def uni_coeffs(t_idx: int, s0_idx: int, hist_idxs, order: int, corrector: bool):
        """Shared UniP/UniC coefficient construction.

        hist_idxs: sigma indices of the older model outputs, nearest first
        (the reference's m_{i-1}, m_{i-2}, ...). Returns
        (c_x, c_m0, c_B, hist_coefs(order-1,), mt_coef)."""
        sigma_t, sigma_s0 = sigmas[t_idx], sigmas[s0_idx]
        alpha_t, sig_t = _alpha_sigma(sigma_t)
        h = _lam(sigma_t) - _lam(sigma_s0)

        rks = []
        for si in hist_idxs[:order - 1]:
            rks.append((_lam(sigmas[si]) - _lam(sigma_s0)) / h)
        rks_full = np.array(rks + [1.0])

        h_phi_1, B_h, b = _bh_coeffs(h, order, solver_type)
        R = np.stack([rks_full ** (p - 1) for p in range(1, order + 1)])

        if corrector:
            if order == 1:
                rhos = np.array([0.5])
            else:
                rhos = np.linalg.solve(R, b)
            hist_coefs = np.array([rhos[j] / rks[j] for j in range(order - 1)])
            mt_coef = rhos[-1]
        else:
            if order == 1:
                hist_coefs = np.zeros(0)
            elif order == 2:
                hist_coefs = np.array([0.5 / rks[0]])
            else:
                rhos = np.linalg.solve(R[:-1, :-1], b[:-1])
                hist_coefs = np.array([rhos[j] / rks[j] for j in range(order - 1)])
            mt_coef = 0.0

        # predict_x0: x_t = (sigma_t/sigma_s0) x - alpha_t h_phi_1 m0 - alpha_t B_h (...)
        c_x = sig_t / _alpha_sigma(sigma_s0)[1]
        c_m0 = alpha_t * h_phi_1
        c_B = alpha_t * B_h
        # At the final step with final_sigmas_type="zero", h = inf. For bh1
        # B_h = -inf, which makes the reference NaN (it multiplies -inf by a
        # zero residual). The correct limit is a pure x0 step: the residual
        # sum is 0 there, so zero its coefficient instead of propagating inf.
        if not np.isfinite(c_B):
            c_B = 0.0
        hist_coefs = np.where(np.isfinite(hist_coefs), hist_coefs, 0.0)
        if not np.isfinite(mt_coef):
            mt_coef = 0.0
        return c_x, c_m0, c_B, hist_coefs, mt_coef

    # replicate the reference's order bookkeeping (step():870-893)
    lower_order_nums = 0
    prev_this_order = 0
    for i in range(S):
        # conversion tables at sigmas[i]
        a_i, s_i = _alpha_sigma(sigmas[i])
        conv_a[i], conv_s[i] = a_i, s_i

        if lower_order_final:
            this_order = min(K, S - i)
        else:
            this_order = K
        this_order = min(this_order, lower_order_nums + 1)

        # corrector at step i (order = previous step's this_order)
        if i > 0:
            order_c = prev_this_order
            hist_idxs = [i - 1 - j for j in range(1, order_c)]
            c_x, c_m0, c_B, hc, mt = uni_coeffs(i, i - 1, hist_idxs, order_c, True)
            cc_x[i], cc_m0[i], cc_B[i], cc_mt[i] = c_x, c_m0, c_B, mt
            cc_hist[i, :len(hc)] = hc

        # predictor at step i
        hist_idxs = [i - j for j in range(1, this_order)]
        c_x, c_m0, c_B, hc, _ = uni_coeffs(i + 1, i, hist_idxs, this_order, False)
        cp_x[i], cp_m0[i], cp_B[i] = c_x, c_m0, c_B
        cp_hist[i, :len(hc)] = hc

        prev_this_order = this_order
        lower_order_nums = min(lower_order_nums + 1, K)

    # reference step():822 — the corrector at step i is skipped when (i-1)
    # is listed in disable_corrector ("self.step_index - 1 not in
    # self.disable_corrector")
    cc_on = np.ones(S)
    for d in disable_corrector:
        if 0 <= d + 1 < S:
            cc_on[d + 1] = 0.0

    f32 = lambda x: jnp.asarray(x, jnp.float32)
    return UniPCSchedule(
        timesteps=ts, timesteps_jax=jnp.asarray(ts), solver_order=K,
        conv_a=f32(conv_a), conv_s=f32(conv_s),
        cc_x=f32(cc_x), cc_m0=f32(cc_m0), cc_B=f32(cc_B), cc_mt=f32(cc_mt),
        cc_hist=f32(cc_hist),
        cp_x=f32(cp_x), cp_m0=f32(cp_m0), cp_B=f32(cp_B), cp_hist=f32(cp_hist),
        prediction_type=prediction_type, thresholding=thresholding,
        dynamic_thresholding_ratio=dynamic_thresholding_ratio,
        sample_max_value=sample_max_value, cc_on=f32(cc_on))


def _threshold_sample(x: Array, ratio: float, max_value: float) -> Array:
    """Dynamic thresholding (Imagen §3.1; _threshold_sample,
    scheduling_unipc_multistep.py:358-386): per-sample quantile of |x0|,
    clamp to [-s, s], divide by s. Static shapes — jit/fori_loop safe."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    s = jnp.quantile(jnp.abs(flat), ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value)[:, None]
    flat = jnp.clip(flat, -s, s) / s
    return flat.reshape(x.shape)


def init_state(sched: UniPCSchedule, sample: Array):
    """Loop-carried state: (sample, last_sample, hist ring buffer).

    hist[K-1] is the most recent converted model output (x0 prediction)."""
    K = sched.solver_order
    zeros = jnp.zeros_like(sample, dtype=jnp.float32)
    hist = jnp.stack([zeros] * K)
    return (sample, zeros, hist)


def step(sched: UniPCSchedule, i: Array, model_output: Array, state):
    """One UniPC step (corrector-for-previous + predictor). i: 0-based index,
    traced (works inside lax.fori_loop) or static."""
    sample, last_sample, hist = state
    K = sched.solver_order
    f32 = jnp.float32
    out = model_output.astype(f32)
    sample32 = sample.astype(f32)

    # model output -> x0 prediction at current sigma
    # (convert_model_output, scheduling_unipc_multistep.py:453-520)
    if sched.prediction_type == "epsilon":
        m_t = (sample32 - sched.conv_s[i] * out) / sched.conv_a[i]
    elif sched.prediction_type == "v_prediction":
        m_t = sched.conv_a[i] * sample32 - sched.conv_s[i] * out
    else:  # "sample"
        m_t = out
    if sched.thresholding:
        m_t = _threshold_sample(m_t, sched.dynamic_thresholding_ratio,
                                sched.sample_max_value)

    # corrector (refines `sample` using the previous step's history)
    m_prev = hist[K - 1]
    acc = sched.cc_mt[i] * (m_t - m_prev)
    for j in range(K - 1):
        acc = acc + sched.cc_hist[i, j] * (hist[K - 2 - j] - m_prev)
    corrected = (sched.cc_x[i] * last_sample.astype(f32)
                 - sched.cc_m0[i] * m_prev - sched.cc_B[i] * acc)
    use_corr = (i > 0) if sched.cc_on is None else (
        (i > 0) & (sched.cc_on[i] > 0))
    sample32 = jnp.where(use_corr, corrected, sample32)

    # push current output into the ring
    hist = jnp.concatenate([hist[1:], m_t[None]], axis=0)

    # predictor
    acc = jnp.zeros_like(m_t)
    for j in range(K - 1):
        acc = acc + sched.cp_hist[i, j] * (hist[K - 2 - j] - m_t)
    new_sample = (sched.cp_x[i] * sample32 - sched.cp_m0[i] * m_t
                  - sched.cp_B[i] * acc)

    return (new_sample.astype(sample.dtype), sample32.astype(sample.dtype), hist)


def final_corrected_sample(state):
    """After the loop, the final predictor output is state[0] (matching the
    reference, which returns the last predictor result)."""
    return state[0]
