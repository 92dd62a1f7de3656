"""Reference __call__ surface extensions: custom `timesteps`, DDIM `eta`,
`cross_attention_kwargs` runtime LoRA scale, and `callback_on_step_end`.

The torch reference accepts all four kwargs (pipeline_blobnet.py:943-1001)
but with narrower semantics: its registered schedulers all raise on custom
timesteps (diffusers v0.30 UniPC/DDIM have no support), eta is forwarded
only to DDIM via prepare_extra_step_kwargs, the LoRA scale is read from
cross_attention_kwargs every step (:1044-1050), and callbacks may re-inject
tensors (:1107-1123). Here the denoise loop is ONE compiled TPU graph, so
callbacks are read-only (documented divergence) and custom timesteps work
for every scheduler because all coefficient tables are host-precomputed
from the timestep list.
"""

import warnings

import numpy as np
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.slow  # extra denoise-graph compiles
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.apps import flagship
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.pipeline import BlobNetPipeline
from blobctrl_tpu.schedulers import common as sched_common
from blobctrl_tpu.schedulers import ddim as ddim_lib
from blobctrl_tpu.schedulers import dpm as dpm_lib
from blobctrl_tpu.schedulers import unipc as unipc_lib


@pytest.fixture(scope="module")
def pipe():
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    return BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))


def _kwargs(steps=6, **over):
    rng = np.random.RandomState(0)
    kw = dict(
        fg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        bg_image=rng.randint(0, 255, (64, 64, 3)).astype(np.uint8),
        gs_score=np.stack([np.ones((1, 8, 8)),
                           rng.rand(1, 8, 8)], -1).astype(np.float32),
        height=64, width=64, num_inference_steps=steps, guidance_scale=7.5,
        prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        negative_prompt_embeds=rng.randn(1, 7, 16).astype(np.float32),
        seed=1, fg_dino_feats=rng.randn(1, 16).astype(np.float32),
        blobnet_control_guidance_end=0.8)
    kw.update(over)
    return kw


# ---------------------------------------------------------------------------
# scheduler-level custom timesteps (fast: no pipeline graphs)
# ---------------------------------------------------------------------------

def test_custom_timesteps_on_default_grid_reproduce_default_tables():
    """Passing the scheduler's own default grid as a custom schedule must
    yield identical coefficient tables (the custom path is a strict
    generalization, not a different discretization)."""
    for make, name in ((unipc_lib.make, "unipc"), (ddim_lib.make, "ddim"),
                       (dpm_lib.make, "dpm")):
        default = make(10)
        custom = make(10, timesteps=tuple(int(t) for t in default.timesteps))
        for field, val in vars(default).items():
            cval = getattr(custom, field)
            if isinstance(val, (jnp.ndarray, np.ndarray)):
                np.testing.assert_allclose(
                    np.asarray(cval), np.asarray(val), rtol=0, atol=0,
                    err_msg=f"{name}.{field}")
            else:
                assert cval == val, f"{name}.{field}"


def test_dpm_custom_timesteps_trajectory_matches_diffusers():
    """Irregular custom schedule vs the torch oracle (the ONE diffusers
    scheduler that supports custom timesteps,
    scheduling_dpmsolver_multistep.py set_timesteps)."""
    torch = pytest.importorskip("torch")
    from tests.oracles import assert_close, import_diffusers
    import_diffusers()
    from diffusers import DPMSolverMultistepScheduler
    ts = [900, 700, 480, 310, 180, 90, 30, 0]
    ref_sched = DPMSolverMultistepScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        algorithm_type="dpmsolver++", solver_order=2)
    ref_sched.set_timesteps(num_inference_steps=None, timesteps=ts)
    sched = dpm_lib.make(len(ts), timesteps=tuple(ts))
    np.testing.assert_array_equal(sched.timesteps, ref_sched.timesteps.numpy())

    shape = (1, 4, 8, 8)
    rng = np.random.RandomState(3)
    outs = [rng.randn(*shape).astype(np.float32) * 0.3 for _ in ts]
    x_ref = torch.from_numpy(np.ones(shape, np.float32))
    state = dpm_lib.init_state(sched, jnp.asarray(np.ones(shape, np.float32)))
    for i, t in enumerate(ref_sched.timesteps):
        x_ref = ref_sched.step(torch.from_numpy(outs[i]), t, x_ref).prev_sample
        state = dpm_lib.step(sched, jnp.asarray(i), jnp.asarray(outs[i]), state)
    assert_close(np.asarray(dpm_lib.final_sample(state)), x_ref.numpy(),
                 atol=5e-4, rtol=5e-3, name="dpm_custom_ts")


def test_custom_timesteps_validation():
    with pytest.raises(ValueError, match="descending"):
        sched_common.validate_custom_timesteps([100, 200, 300])
    with pytest.raises(ValueError, match="descending"):
        sched_common.validate_custom_timesteps([300, 300, 100])
    with pytest.raises(ValueError, match=r"\[0, 1000\)"):
        sched_common.validate_custom_timesteps([1000, 500, 0])
    with pytest.raises(ValueError, match=r"\[0, 1000\)"):
        sched_common.validate_custom_timesteps([500, 100, -1])
    with pytest.raises(ValueError, match="non-empty"):
        sched_common.validate_custom_timesteps([])
    with pytest.raises(ValueError, match="Karras"):
        dpm_lib.make(3, timesteps=(500, 250, 0), use_karras_sigmas=True)
    for make in (unipc_lib.make, ddim_lib.make, dpm_lib.make):
        with pytest.raises(ValueError, match="custom timesteps"):
            make(5, timesteps=(500, 250, 0))


# ---------------------------------------------------------------------------
# pipeline surface
# ---------------------------------------------------------------------------

def test_pipeline_custom_timesteps_default_grid_is_exact(pipe):
    """timesteps=<the default grid> builds a distinct graph that must
    reproduce the default-grid run exactly."""
    base = pipe(**_kwargs()).images
    grid = tuple(int(t) for t in unipc_lib.make(6).timesteps)
    custom = pipe(timesteps=grid, **_kwargs()).images
    np.testing.assert_allclose(base, custom, atol=1e-6)


def test_pipeline_custom_timesteps_irregular(pipe):
    """An irregular schedule runs on every scheduler family and actually
    changes the discretization (differs from the uniform grid)."""
    base = pipe(**_kwargs()).images
    ts = (950, 600, 330, 150, 40, 0)
    out = pipe(timesteps=ts, **_kwargs()).images
    assert np.isfinite(out).all()
    assert np.abs(out.astype(np.float32) - base.astype(np.float32)).max() > 0
    out_ddim = pipe(timesteps=ts, scheduler="ddim", **_kwargs()).images
    assert np.isfinite(out_ddim).all()


def test_pipeline_ddim_eta(pipe):
    """eta>0 adds seeded DDIM variance noise: reproducible for a fixed seed,
    different from the deterministic eta=0 run; eta is ignored for unipc
    (same graph, same result — mirroring prepare_extra_step_kwargs)."""
    det = pipe(scheduler="ddim", **_kwargs()).images
    sto1 = pipe(scheduler="ddim", eta=0.8, **_kwargs()).images
    sto2 = pipe(scheduler="ddim", eta=0.8, **_kwargs()).images
    np.testing.assert_array_equal(sto1, sto2)
    assert np.abs(sto1.astype(np.float32) - det.astype(np.float32)).max() > 0
    base = pipe(**_kwargs()).images
    ignored = pipe(eta=0.8, **_kwargs()).images  # unipc: eta is meaningless
    np.testing.assert_array_equal(base, ignored)


def test_callback_on_step_end_sees_every_step(pipe):
    """The callback fires once per scheduler step with (i, t, latents) and
    the run's output is unchanged by observing it."""
    base = pipe(**_kwargs()).images
    seen = []

    def cb(p, i, t, tensors):
        assert p is pipe
        lat = tensors["latents"]
        assert isinstance(lat, np.ndarray) and lat.shape == (1, 8, 8, 4)
        assert np.isfinite(lat).all()
        seen.append((i, t))

    out = pipe(callback_on_step_end=cb, **_kwargs()).images
    np.testing.assert_allclose(base, out, atol=1e-6)
    assert [i for i, _ in sorted(seen)] == list(range(6))
    expected_t = [int(t) for t in unipc_lib.make(6).timesteps]
    assert [t for _, t in sorted(seen)] == expected_t
    # the hook is cleared after the call
    assert pipe._step_callback is None


def test_callback_interval_skips_transfers_but_keeps_final_step(pipe):
    """callback_interval=N fires only on i % N == 0 plus the final step
    (the lax.cond skips the d2h latent transfer on silent steps), without
    changing the output."""
    base = pipe(**_kwargs()).images
    seen = []

    def cb(p, i, t, tensors):
        assert tensors["latents"].shape == (1, 8, 8, 4)
        seen.append(int(i))

    out = pipe(callback_on_step_end=cb, callback_interval=4,
               **_kwargs()).images
    np.testing.assert_allclose(base, out, atol=1e-6)
    assert sorted(seen) == [0, 4, 5]  # 6 steps: multiples of 4 + final

    with pytest.raises(ValueError, match="callback_interval"):
        pipe(callback_on_step_end=cb, callback_interval=0, **_kwargs())


def test_callback_tensor_updates_warn_once(pipe):
    """Returning tensor updates from the callback is a reference behavior
    the one-graph design cannot honor — warn (once), don't crash."""
    def cb(p, i, t, tensors):
        return {"latents": tensors["latents"] * 0.5}

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pipe(callback_on_step_end=cb, **_kwargs()).images
    ignored = [x for x in w if "IGNORED" in str(x.message)]
    assert len(ignored) == 1


def test_callback_tensor_inputs_validation(pipe):
    with pytest.raises(ValueError, match="image_embeds"):
        pipe(callback_on_step_end=lambda *a: None,
             callback_on_step_end_tensor_inputs=("latents", "image_embeds"),
             **_kwargs())


def test_cross_attention_kwargs_surface(pipe):
    """Only the LoRA 'scale' key is meaningful (the reference's sole use);
    unknown keys refuse loudly; scale without a recorded adapter refuses."""
    with pytest.raises(NotImplementedError, match="ip_adapter_masks"):
        pipe(cross_attention_kwargs={"ip_adapter_masks": 1}, **_kwargs())
    with pytest.raises(ValueError, match="no LoRA adapter"):
        pipe(cross_attention_kwargs={"scale": 0.5}, **_kwargs())
    # with a zero-delta adapter recorded, the scale routes through
    # set_lora_scale (numerically a no-op: B == 0, so weights are untouched)
    from blobctrl_tpu.models import lora as lora_lib
    pipe._lora_tree = lora_lib.init_lora(jax.random.PRNGKey(1),
                                         pipe.unet_params, rank=2)
    pipe._lora_alpha = None
    pipe._lora_scale = 1.0
    try:
        base = pipe(**_kwargs()).images
        out = pipe(cross_attention_kwargs={"scale": 0.25}, **_kwargs()).images
        assert pipe._lora_scale == 0.25
        np.testing.assert_array_equal(base, out)
    finally:
        pipe._lora_tree = None
        pipe._lora_scale = 1.0


def test_set_lora_scale_rescales_exactly():
    """Nonzero adapter: scale s then back to 0 restores the pristine weights
    (fp32 params here, so the delta-increment roundtrip is near-exact)."""
    from blobctrl_tpu.models import lora as lora_lib
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    params = unet_lib.init_unet(key, unet_cfg)
    tree = lora_lib.init_lora(jax.random.PRNGKey(1), params, rank=2)
    # make B nonzero so rescaling actually moves weights
    for ab in tree.values():
        ab["B"] = jax.random.normal(jax.random.PRNGKey(2), ab["B"].shape,
                                    jnp.float32) * 0.1
    k0_path = next(iter(tree))
    path = [int(p) if p.isdigit() else p for p in k0_path.split("/")]

    def get_kernel(t):
        node = t
        for p in path:
            node = node[p]
        return np.asarray(node["kernel"])

    pristine = get_kernel(params)
    merged = lora_lib.merge_lora(params, tree, scale=1.0)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    p2 = BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=merged, blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))
    p2._lora_tree, p2._lora_alpha, p2._lora_scale = tree, None, 1.0

    assert np.abs(get_kernel(p2.unet_params) - pristine).max() > 1e-3
    p2.set_lora_scale(0.0)
    np.testing.assert_allclose(get_kernel(p2.unet_params), pristine,
                               rtol=1e-5, atol=1e-6)
    p2.set_lora_scale(2.0)
    np.testing.assert_allclose(
        get_kernel(p2.unet_params),
        pristine + 2.0 * (get_kernel(merged) - pristine),
        rtol=1e-5, atol=1e-6)
    p2.set_lora_scale(2.0)  # no-op fast path
    assert p2._lora_scale == 2.0
