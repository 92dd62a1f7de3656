"""Scheduler parity: full synthetic denoising trajectories vs the vendored
torch schedulers (DDIM, UniPC) — same pseudo model outputs, compare samples."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.schedulers import ddim as jddim
from blobctrl_tpu.schedulers import unipc as junipc
from tests.oracles import assert_close, import_diffusers

torch = pytest.importorskip("torch")

SHAPE = (1, 4, 8, 8)


def fake_model_outputs(num_steps, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randn(*SHAPE).astype(np.float32) * 0.3 for _ in range(num_steps)]


def test_ddim_trajectory_matches_diffusers():
    import_diffusers()
    from diffusers import DDIMScheduler
    steps = 10
    ref_sched = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                              beta_schedule="scaled_linear", steps_offset=1,
                              clip_sample=False, set_alpha_to_one=False)
    ref_sched.set_timesteps(steps)
    sched = jddim.make(steps)
    np.testing.assert_array_equal(sched.timesteps, ref_sched.timesteps.numpy())

    outs = fake_model_outputs(steps)
    x_ref = torch.from_numpy(np.ones(SHAPE, np.float32))
    x = jnp.asarray(np.ones(SHAPE, np.float32))
    for i, t in enumerate(ref_sched.timesteps):
        x_ref = ref_sched.step(torch.from_numpy(outs[i]), t, x_ref).prev_sample
        x = jddim.step(sched, i, jnp.asarray(outs[i]), x)
    assert_close(np.asarray(x), x_ref.numpy(), atol=1e-4, rtol=1e-3, name="ddim")


@pytest.mark.parametrize("steps,order,solver_type", [
    (10, 2, "bh2"), (10, 2, "bh1"), (7, 3, "bh2"), (3, 2, "bh2"), (50, 2, "bh2"),
])
def test_unipc_trajectory_matches_diffusers(steps, order, solver_type):
    import_diffusers()
    from diffusers import UniPCMultistepScheduler
    ref_sched = UniPCMultistepScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        solver_order=order, solver_type=solver_type)
    ref_sched.set_timesteps(steps)
    sched = junipc.make(steps, solver_order=order, solver_type=solver_type)
    np.testing.assert_array_equal(sched.timesteps, ref_sched.timesteps.numpy())

    outs = fake_model_outputs(steps, seed=steps + order)
    x_ref = torch.from_numpy(np.ones(SHAPE, np.float32))
    x = jnp.asarray(np.ones(SHAPE, np.float32))
    state = junipc.init_state(sched, x)
    for i, t in enumerate(ref_sched.timesteps):
        x_ref = ref_sched.step(torch.from_numpy(outs[i]), t, x_ref).prev_sample
        state = junipc.step(sched, jnp.asarray(i), jnp.asarray(outs[i]), state)
        if solver_type == "bh1" and i == steps - 2:
            # the reference NaNs on the final bh1 step (B_h=-inf with zero
            # final sigma); we fix that — compare up to the last finite step
            break
    got = junipc.final_corrected_sample(state)
    if solver_type == "bh1":
        # also check our final step stays finite where the reference NaNs
        state2 = junipc.step(sched, jnp.asarray(steps - 1),
                             jnp.asarray(outs[steps - 1]), state)
        assert np.isfinite(np.asarray(state2[0])).all()
    assert_close(np.asarray(got), x_ref.numpy(), atol=5e-4, rtol=5e-3,
                 name=f"unipc{steps}-o{order}-{solver_type}")


@pytest.mark.parametrize("kwargs", [
    dict(prediction_type="v_prediction"),
    dict(prediction_type="sample"),
    dict(thresholding=True, sample_max_value=1.5),
    dict(prediction_type="v_prediction", thresholding=True),
    dict(disable_corrector=(0, 3)),
], ids=["vpred", "sample", "thresh", "vpred+thresh", "disable_corrector"])
def test_unipc_extended_options_match_diffusers(kwargs):
    """The reference scheduler's options that no BlobCtrl entry point uses
    (scheduling_unipc_multistep.py:111-901) — covered anyway so the module
    is a complete UniPC, not just the BlobCtrl slice."""
    import_diffusers()
    from diffusers import UniPCMultistepScheduler
    steps = 10
    ref_kwargs = dict(kwargs)
    if "disable_corrector" in ref_kwargs:
        ref_kwargs["disable_corrector"] = list(ref_kwargs["disable_corrector"])
    ref_sched = UniPCMultistepScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        solver_order=2, solver_type="bh2", **ref_kwargs)
    ref_sched.set_timesteps(steps)
    sched = junipc.make(steps, solver_order=2, solver_type="bh2", **kwargs)

    outs = fake_model_outputs(steps, seed=11)
    x_ref = torch.from_numpy(np.ones(SHAPE, np.float32))
    x = jnp.asarray(np.ones(SHAPE, np.float32))
    state = junipc.init_state(sched, x)
    for i, t in enumerate(ref_sched.timesteps):
        x_ref = ref_sched.step(torch.from_numpy(outs[i]), t, x_ref).prev_sample
        state = junipc.step(sched, jnp.asarray(i), jnp.asarray(outs[i]), state)
    got = junipc.final_corrected_sample(state)
    assert_close(np.asarray(got), x_ref.numpy(), atol=5e-4, rtol=5e-3,
                 name=f"unipc-ext-{kwargs}")


def test_unipc_rejects_unknown_prediction_type():
    with pytest.raises(ValueError):
        junipc.make(5, prediction_type="flow")


def test_unipc_step_jits_in_fori_loop():
    steps = 8
    sched = junipc.make(steps)
    outs = jnp.stack([jnp.asarray(o) for o in fake_model_outputs(steps)])
    x0 = jnp.ones(SHAPE, jnp.float32)

    @jax.jit
    def run(x0, outs):
        state = junipc.init_state(sched, x0)

        def body(i, state):
            return junipc.step(sched, i, outs[i], state)

        state = jax.lax.fori_loop(0, steps, body, state)
        return junipc.final_corrected_sample(state)

    got = run(x0, outs)

    # eager reference
    state = junipc.init_state(sched, x0)
    for i in range(steps):
        state = junipc.step(sched, jnp.asarray(i), outs[i], state)
    assert_close(np.asarray(got), np.asarray(junipc.final_corrected_sample(state)),
                 atol=1e-6, name="unipc_jit")


@pytest.mark.parametrize("steps", [5, 10, 50])
def test_dpmsolver_trajectory_matches_diffusers(steps):
    from blobctrl_tpu.schedulers import dpm as jdpm
    import_diffusers()
    from diffusers import DPMSolverMultistepScheduler
    ref_sched = DPMSolverMultistepScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        algorithm_type="dpmsolver++", solver_order=2)
    ref_sched.set_timesteps(steps)
    sched = jdpm.make(steps)
    np.testing.assert_array_equal(sched.timesteps, ref_sched.timesteps.numpy())

    outs = fake_model_outputs(steps, seed=steps)
    x_ref = torch.from_numpy(np.ones(SHAPE, np.float32))
    state = jdpm.init_state(sched, jnp.asarray(np.ones(SHAPE, np.float32)))
    for i, t in enumerate(ref_sched.timesteps):
        x_ref = ref_sched.step(torch.from_numpy(outs[i]), t, x_ref).prev_sample
        state = jdpm.step(sched, jnp.asarray(i), jnp.asarray(outs[i]), state)
    assert_close(np.asarray(jdpm.final_sample(state)), x_ref.numpy(),
                 atol=5e-4, rtol=5e-3, name=f"dpm{steps}")


def test_ddim_eta_variance_matches_diffusers():
    """eta>0 DDIM: compare against the torch scheduler fed the SAME noise."""
    jddim2 = jddim  # module-level import
    import_diffusers()
    from diffusers import DDIMScheduler
    steps, eta = 10, 0.7
    ref_sched = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                              beta_schedule="scaled_linear", steps_offset=1,
                              clip_sample=False, set_alpha_to_one=False)
    ref_sched.set_timesteps(steps)
    sched = jddim2.make(steps, eta=eta)

    outs = fake_model_outputs(steps, seed=77)
    key = jax.random.PRNGKey(4)
    x_ref = torch.from_numpy(np.ones(SHAPE, np.float32))
    x = jnp.asarray(np.ones(SHAPE, np.float32))
    for i, t in enumerate(ref_sched.timesteps):
        noise = np.asarray(jax.random.normal(jax.random.fold_in(key, i),
                                             SHAPE, jnp.float32))
        x_ref = ref_sched.step(torch.from_numpy(outs[i]), t, x_ref, eta=eta,
                               variance_noise=torch.from_numpy(noise)).prev_sample
        x = jddim2.step(sched, jnp.asarray(i), jnp.asarray(outs[i]), x,
                        noise_key=key)
    assert_close(np.asarray(x), x_ref.numpy(), atol=1e-3, rtol=1e-2,
                 name="ddim_eta")


@pytest.mark.parametrize("steps,algo,stype,karras", [
    (10, "dpmsolver++", "midpoint", True),     # DPM++ 2M Karras
    (10, "dpmsolver++", "heun", False),
    (10, "sde-dpmsolver++", "midpoint", False),  # DPM++ 2M SDE
    (10, "sde-dpmsolver++", "heun", True),
    (25, "sde-dpmsolver++", "midpoint", True),   # DPM++ 2M SDE Karras
])
def test_dpm_variants_match_diffusers(steps, algo, stype, karras):
    """SDE / Karras / heun DPM-Solver++ variants vs the torch oracle, feeding
    both sides the same per-step variance noise."""
    from blobctrl_tpu.schedulers import dpm as jdpm
    import_diffusers()
    from diffusers import DPMSolverMultistepScheduler
    ref_sched = DPMSolverMultistepScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        algorithm_type=algo, solver_type=stype, solver_order=2,
        use_karras_sigmas=karras)
    ref_sched.set_timesteps(steps)
    sched = jdpm.make(steps, algorithm_type=algo, solver_type=stype,
                      use_karras_sigmas=karras)
    np.testing.assert_array_equal(sched.timesteps, ref_sched.timesteps.numpy())
    assert sched.stochastic == (algo == "sde-dpmsolver++")

    outs = fake_model_outputs(steps, seed=steps)
    key = jax.random.PRNGKey(9)
    x_ref = torch.from_numpy(np.ones(SHAPE, np.float32))
    state = jdpm.init_state(sched, jnp.asarray(np.ones(SHAPE, np.float32)))
    for i, t in enumerate(ref_sched.timesteps):
        noise = np.asarray(jax.random.normal(jax.random.fold_in(key, i),
                                             SHAPE, jnp.float32))
        kw = ({"variance_noise": torch.from_numpy(noise)}
              if algo == "sde-dpmsolver++" else {})
        x_ref = ref_sched.step(torch.from_numpy(outs[i]), t, x_ref,
                               **kw).prev_sample
        state = jdpm.step(sched, jnp.asarray(i), jnp.asarray(outs[i]), state,
                          noise=jnp.asarray(noise))
    assert_close(np.asarray(jdpm.final_sample(state)), x_ref.numpy(),
                 atol=1e-3, rtol=1e-2, name=f"dpm_{algo}_{stype}_k{karras}")
