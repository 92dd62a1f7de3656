"""StableDiffusionBlobNetPipeline, TPU-native.

Public surface mirrors the reference pipeline's __call__ kwargs
(/root/reference/blobctrl/pipelines/pipeline_blobnet.py:743-773): prompt /
fg_image / bg_image / gs_score / height / width / num_inference_steps /
guidance_scale / negative_prompt / num_images_per_prompt / latents /
prompt_embeds / blobnet_conditioning_scale / blobnet_control_guidance_start /
blobnet_control_guidance_end / clip_skip / output_type.

TPU-first structure:
  * ONE jitted graph per edit: batched VAE encode of both conditioning
    images, score/appearance splat prep, the entire denoising loop — CFG
    duplication, width-concat input construction, BlobNet forward, 28
    right-half residual injections, UNet forward, CFG combine, scheduler
    step (lax.fori_loop) — and the VAE decode (the reference runs ~50 eager
    torch iterations with eager encode/decode around them,
    pipeline_blobnet.py:1024-1123). CLIP / DINOv2 run separately (optional
    modules, invoked only when raw prompts / images are given).
  * All per-step scalars (timesteps, blobnet_keep window, scheduler
    coefficients) are precomputed host-side into tables indexed by the loop
    counter.
  * NHWC layout; compute dtype configurable (bf16 on TPU).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import clip_text as clip_lib
from blobctrl_tpu.models import dinov2 as dino_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.schedulers import ddim as ddim_lib
from blobctrl_tpu.schedulers import dpm as dpm_lib
from blobctrl_tpu.schedulers import unipc as unipc_lib

Array = jax.Array

# Public scheduler-name surface (CLI choices, server /v1/info). "dpm" also
# accepts any underscore combination of sde/karras/heun tokens.
SCHEDULER_NAMES = ("unipc", "ddim", "dpm", "dpm_karras", "dpm_sde",
                   "dpm_sde_karras", "dpm_heun")


@dataclasses.dataclass
class PipelineOutput:
    images: np.ndarray  # (B, H, W, 3) float in [0, 1]
    nsfw_content_detected: Optional[np.ndarray] = None


def preprocess_image_transport(image, height: int, width: int) -> np.ndarray:
    """PIL/ndarray -> (1, H, W, 3) in the cheapest EXACT transport form:
    uint8 0..255 whenever the [-1, 1] float preprocess is exactly
    u8/255*2-1 (every PIL or integer-ndarray input is — PIL LANCZOS resize
    re-quantizes to uint8, same as the reference's VaeImageProcessor), else
    float32 in [0, 1]. The device normalizes in f32, bit-identical to the
    host form, at 1/4 the host->device bytes (PERF_NOTES "fixed cost")."""
    if not hasattr(image, "convert"):
        arr = np.asarray(image)
        # decide normalization by DTYPE, not by value (a near-black uint8
        # image with max<=1 is still 0..255-scaled)
        is_int = np.issubdtype(arr.dtype, np.integer)
        if is_int and arr.ndim == 3:
            # integer images take the exact PIL uint8 path below, so the same
            # pixels give bit-identical latents regardless of input type
            from PIL import Image
            image = Image.fromarray(arr.astype(np.uint8))
        else:
            image = arr.astype(np.float32)
            if is_int or image.max() > 1.5:
                image = image / 255.0
            if image.shape[-3] != height or image.shape[-2] != width:
                # same LANCZOS kernel as the PIL path (PIL mode-'F' resize
                # applies it to float channels without uint8 quantization)
                from PIL import Image
                if image.ndim == 3:
                    image = image[None]
                image = np.stack([
                    np.stack([
                        np.asarray(Image.fromarray(im[..., c], mode="F").resize(
                            (width, height), Image.LANCZOS))
                        for c in range(im.shape[-1])], axis=-1)
                    for im in image])
    if hasattr(image, "convert"):  # PIL
        image = image.convert("RGB")
        if image.size != (width, height):
            from PIL import Image
            image = image.resize((width, height), Image.LANCZOS)
        image = np.asarray(image, dtype=np.uint8)
    if image.ndim == 3:
        image = image[None]
    return image


def _transport_to_signal(image: np.ndarray) -> np.ndarray:
    """uint8-or-unit-float transport form -> float32 [-1, 1] (host)."""
    if image.dtype == np.uint8:
        image = image.astype(np.float32) / 255.0
    return image * 2.0 - 1.0


def preprocess_image(image, height: int, width: int) -> np.ndarray:
    """PIL/ndarray -> (1, H, W, 3) float32 in [-1, 1]. Host-side; matches
    VaeImageProcessor.preprocess (PIL lanczos resize, then scale)."""
    return _transport_to_signal(preprocess_image_transport(image, height,
                                                           width))


def _uniform_transport(images) -> list:
    """Give every image in the list one common transport dtype: uint8 only
    if ALL are uint8 (the jitted edit concatenates them), else f32 [-1,1]."""
    if all(im.dtype == np.uint8 for im in images):
        return list(images)
    return [_transport_to_signal(im) if im.dtype == np.uint8
            else im * 2.0 - 1.0 for im in images]


def blobnet_keep_schedule(num_steps: int, start: float, end: float) -> np.ndarray:
    """pipeline_blobnet.py:1006-1012: per-step gate for the control window."""
    keeps = [1.0 - float(i / num_steps < start or (i + 1) / num_steps > end)
             for i in range(num_steps)]
    return np.asarray(keeps, np.float32)


class BlobNetPipeline:
    """Functional pipeline bundle. All params stay resident on device across
    calls (the multi-round-edit north star)."""

    def __init__(self, *, unet_cfg: unet_lib.UNetConfig, unet_params,
                 blobnet_cfg: blobnet_lib.BlobNetConfig, blobnet_params,
                 vae_cfg: vae_lib.VAEConfig, vae_params,
                 clip_cfg: Optional[clip_lib.CLIPTextConfig] = None,
                 clip_params=None,
                 dino_cfg: Optional[dino_lib.DINOv2Config] = None,
                 dino_params=None,
                 tokenizer: Optional[Callable[[Sequence[str]], np.ndarray]] = None,
                 dtype=jnp.float32,
                 dino_image_size: int = 224,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 safety_checker: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 blackout_nsfw: bool = False):
        self.unet_cfg, self.unet_params = unet_cfg, unet_params
        self.blobnet_cfg, self.blobnet_params = blobnet_cfg, blobnet_params
        self.vae_cfg, self.vae_params = vae_cfg, vae_params
        self.clip_cfg, self.clip_params = clip_cfg, clip_params
        self.dino_cfg, self.dino_params = dino_cfg, dino_params
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.dino_image_size = dino_image_size
        self.mesh = mesh
        # explicit safety policy: the reference registers a checker but
        # comments out the call (pipeline_blobnet.py:1140-1141); here it runs
        # iff a checker is supplied
        self.safety_checker = safety_checker
        self.blackout_nsfw = blackout_nsfw
        self._denoise_cache = {}
        # encoder memo caches: repeated prompts / object images across edit
        # rounds cost zero dispatches (keys carry the param-tree identity)
        self._prompt_cache = {}
        self._dino_cache = {}
        # conditioning-latent memo (single-chip): repeated fg/bg images skip
        # the image upload AND the in-graph VAE encode (keys carry pixel
        # content + vae-params identity + the global numeric-mode flags)
        self._cond_lat_cache = {}
        self._dummy_cache = {}
        self._param_versions = {}

    def shard_to_mesh(self, mesh=None, model_parallel: bool = False,
                      hybrid_cfg_data: bool = False):
        """Place all params on a device mesh (replicated, or with large
        kernels sharded over the model axis). Batch inputs are sharded per
        call over the data axis; weights stay resident across edits.

        hybrid_cfg_data (single-edit latency recipe, PERF_NOTES "TP latency
        projection" path 2): the UNet's CFG pair is data-parallel except one
        tiny gather at the guidance combine, so the UNet shards its batch
        over ``data`` and its weights over ``model`` only, while BlobNet
        (batch 1, shared by both CFG rows via the dedup) tensor-shards over
        BOTH axes — halving the UNet all-reduce payload per chip vs pure TP
        at the same chip count. Implies model_parallel."""
        from blobctrl_tpu.parallel import kernel_sharding
        from blobctrl_tpu.parallel import mesh as mesh_lib
        if mesh is not None:
            self.mesh = mesh
        assert self.mesh is not None, "no mesh given"
        self._hybrid_cfg_data = bool(hybrid_cfg_data)
        if hybrid_cfg_data:
            model_parallel = True
        for name in ("unet_params", "blobnet_params", "vae_params",
                     "clip_params", "dino_params"):
            p = getattr(self, name)
            if p is not None:
                axes = (("data", "model")
                        if hybrid_cfg_data and name == "blobnet_params"
                        else ("model",))
                setattr(self, name, mesh_lib.shard_params(
                    self.mesh, p, model_parallel=model_parallel, axes=axes))
        # kernel-sharding profiles: how each model's activations are sharded
        # inside the graph, so the Pallas call sites can wrap themselves in
        # shard_maps GSPMD cannot synthesize (parallel.kernel_sharding).
        # batch axes list "data" unconditionally — the per-call divisibility
        # check drops it when the batch cannot split (single-edit B=1).
        KP = kernel_sharding.KernelProfile

        def prof(model_axes, batch_axes=("data",)):
            return KP(self.mesh, batch=batch_axes,
                      model=model_axes if model_parallel else ())

        self._kernel_profiles = {
            "unet": prof(("model",)),
            "blobnet": prof(("data", "model") if hybrid_cfg_data
                            else ("model",),
                            () if hybrid_cfg_data else ("data",)),
            "vae": prof(("model",), () if hybrid_cfg_data else ("data",)),
        }
        self._denoise_cache.clear()  # sharding strategy changes the graph
        for stale in ("_encode_image_fn", "_decode_latents_fn"):
            if getattr(self, stale, None) is not None:
                setattr(self, stale, None)
        return self

    # ------------------------------------------------------------------
    # encoders
    # ------------------------------------------------------------------

    def encode_prompt(self, prompt, negative_prompt, num_images_per_prompt: int,
                      do_cfg: bool, clip_skip: Optional[int] = None,
                      prompt_embeds: Optional[np.ndarray] = None,
                      negative_prompt_embeds: Optional[np.ndarray] = None) -> Array:
        """Returns (2B, 77, C) [negative; positive] if do_cfg else (B, 77, C).

        Dispatch discipline (PERF_NOTES "Fixed cost, round 4": every device
        dispatch costs ~17-28 ms through the tunnel): string prompts run
        CLIP (positive AND negative), the num_images repeat, and the CFG
        concat as ONE jitted dispatch, memoized by token ids — a repeated
        prompt across edit rounds (the interactive norm) costs zero
        dispatches. Host-array embeds combine in numpy and ride ONE upload
        at the compute dtype."""
        nipp = num_images_per_prompt

        def host_like(x):
            return x is not None and not isinstance(x, jax.Array)

        # ---- host-embeds path: combine in numpy, upload once ----
        if host_like(prompt_embeds) and (not do_cfg
                                         or host_like(negative_prompt_embeds)):
            pe = np.repeat(np.asarray(prompt_embeds), nipp, axis=0)
            if do_cfg:
                npe = np.repeat(np.asarray(negative_prompt_embeds), nipp,
                                axis=0)
                pe = np.concatenate([npe, pe], axis=0)
            if self.dtype == jnp.bfloat16 and pe.dtype == np.float32:
                # exact: the graph consumes embeds via astype(bf16); host
                # f32->bf16 rounding == device rounding (both RNE)
                pe = pe.astype(jnp.bfloat16)
            return jnp.asarray(pe)

        # ---- string path: one jitted, memoized dispatch ----
        if prompt_embeds is None:
            assert self.tokenizer is not None and self.clip_params is not None, \
                "string prompts require a tokenizer + CLIP params"
            if isinstance(prompt, str):
                prompt = [prompt]
            ids = np.asarray(self.tokenizer(prompt))
            nids = None
            if do_cfg and negative_prompt_embeds is None:
                if negative_prompt is None:
                    negative_prompt = [""] * len(prompt)
                elif isinstance(negative_prompt, str):
                    negative_prompt = [negative_prompt] * len(prompt)
                nids = np.asarray(self.tokenizer(negative_prompt))
            if nids is not None or not do_cfg:
                key = (ids.tobytes(), None if nids is None else nids.tobytes(),
                       nipp, clip_skip, do_cfg,
                       self._params_version("clip_params"),
                       self._numeric_state())
                hit = self._prompt_cache.get(key)
                if hit is not None:
                    return hit
                cfg = self.clip_cfg

                def make():
                    def fn(params, ids, nids):
                        pe = clip_lib.encode_with_clip_skip(params, cfg,
                                                            ids, clip_skip)
                        pe = jnp.repeat(pe, nipp, axis=0)
                        if nids is not None:
                            npe = jnp.repeat(clip_lib.apply(params, cfg,
                                                            nids),
                                             nipp, axis=0)
                            pe = jnp.concatenate([npe, pe], axis=0)
                        return pe
                    return fn
                pe = self._lazy_jit(f"_encode_prompt_fn_{clip_skip}_{nipp}_"
                                    f"{nids is not None}", make)(
                    self.clip_params, jnp.asarray(ids),
                    None if nids is None else jnp.asarray(nids))
                if len(self._prompt_cache) >= 16:
                    self._prompt_cache.pop(next(iter(self._prompt_cache)))
                self._prompt_cache[key] = pe
                return pe
            # fall through: string positives but user-supplied negatives
            prompt_embeds = clip_lib.encode_with_clip_skip(
                self.clip_params, self.clip_cfg, jnp.asarray(ids), clip_skip)

        # ---- mixed / device-array fallback (rare): previous behavior ----
        prompt_embeds = jnp.asarray(prompt_embeds)
        bsz = prompt_embeds.shape[0]
        prompt_embeds = jnp.repeat(prompt_embeds, nipp, axis=0)
        if not do_cfg:
            return prompt_embeds
        if negative_prompt_embeds is None:
            assert self.tokenizer is not None and self.clip_params is not None, \
                ("guidance_scale > 1 needs negative conditioning: pass "
                 "negative_prompt_embeds (or attach a tokenizer + CLIP "
                 "params for string prompts)")
            if negative_prompt is None:
                negative_prompt = [""] * bsz
            elif isinstance(negative_prompt, str):
                negative_prompt = [negative_prompt] * bsz
            ids = jnp.asarray(self.tokenizer(negative_prompt))
            negative_prompt_embeds = clip_lib.apply(self.clip_params, self.clip_cfg, ids)
        negative_prompt_embeds = jnp.repeat(jnp.asarray(negative_prompt_embeds),
                                            nipp, axis=0)
        return jnp.concatenate([negative_prompt_embeds, prompt_embeds], axis=0)

    # params are jit ARGUMENTS (not baked-in constants), so shard_to_mesh /
    # param swaps take effect; configs/dtype are trace-time constants.

    def _lazy_jit(self, name: str, make_fn):
        fn = getattr(self, name, None)
        if fn is None:
            fn = jax.jit(self._with_kernel_profiles(make_fn()))
            setattr(self, name, fn)
        return fn

    def _with_kernel_profiles(self, fn):
        """Wrap a to-be-jitted callable so the kernel-sharding profiles from
        shard_to_mesh are active while JAX traces it (the Pallas call sites
        read them to wrap themselves in shard_maps — parallel.kernel_sharding).
        Reads self._kernel_profiles at trace time; shard_to_mesh invalidates
        every cached trace, so a recipe change always retraces under the new
        profiles."""
        from blobctrl_tpu.parallel import kernel_sharding
        import functools

        @functools.wraps(fn)
        def traced(*args, **kwargs):
            with kernel_sharding.activate(
                    getattr(self, "_kernel_profiles", None)):
                return fn(*args, **kwargs)
        return traced

    def _conv_params(self, name: str):
        """Param tree for ``name``, augmented with pre-quantized int8
        weights (kernel_q/w_scale beside the hot conv AND transformer-linear
        kernels) when an opt-in int8 mode is on. Quantized ONCE per tree and
        cached by identity — the in-graph alternative requantizes every
        denoise step (XLA does not hoist the abs-max/round/convert chain out
        of lax.fori_loop). self.*_params stay unaugmented (checkpoints,
        exports, sharding see bf16 only)."""
        from blobctrl_tpu.nn import layers as layers_mod
        from blobctrl_tpu.ops import conv3x3 as conv_mod
        p = getattr(self, name)
        if p is None or not (conv_mod.conv_int8_enabled()
                             or layers_mod.linear_int8_enabled()):
            return p
        cache = getattr(self, "_int8_param_cache", None)
        if cache is None:
            cache = self._int8_param_cache = {}
        ent = cache.get(name)
        if ent is None or ent[0] is not p:
            ent = (p, conv_mod.quantize_conv_tree(p))
            cache[name] = ent
        return ent[1]

    def _encode_image(self, image: Array) -> Array:
        """VAE encode to scaled latents, deterministic (distribution mode)."""
        fn = self._lazy_jit("_encode_image_fn", lambda:
                            lambda params, img: vae_lib.encode_to_scaled_latents(
                                params, self.vae_cfg, img.astype(self.dtype)))
        return fn(self._conv_params("vae_params"), image)

    def _decode_latents(self, latents: Array) -> Array:
        fn = self._lazy_jit("_decode_latents_fn", lambda:
                            lambda params, lat: jnp.clip(
                                vae_lib.decode_from_scaled_latents(
                                    params, self.vae_cfg, lat.astype(self.dtype)
                                ).astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0))
        return fn(self._conv_params("vae_params"), latents)

    def _dummy(self, shape, dtype):
        """Device-resident zeros used as placeholder operands (same aval as
        the real tensor, so no retrace) — uploading them costs nothing after
        the first call."""
        key = (tuple(shape), jnp.dtype(dtype).str)
        hit = self._dummy_cache.get(key)
        if hit is None:
            hit = self._dummy_cache[key] = jnp.zeros(shape, dtype)
        return hit

    @staticmethod
    def _numeric_state() -> tuple:
        """Global numeric-mode flags that change what compiled graphs
        compute for the SAME params (the pre-quantized-int8 and backend
        toggles). Memoized device results must key on them."""
        from blobctrl_tpu.nn import attention, resnet
        from blobctrl_tpu.ops import conv3x3 as conv_mod
        return (conv_mod.conv_int8_enabled(), resnet.get_conv_backend(),
                attention.get_attention_backend(),
                attention._ATTENTION_INT8, attention._ATTENTION_INT8_GLOBAL_K)

    def _params_version(self, name: str) -> tuple:
        """Stable cache-key component for the named param tree. Bare id()
        is unsafe: replacing the attribute can free the old tree, whose id
        a NEW tree may then reuse — a stale, bit-wrong memo hit. The version
        map holds a strong ref to the keyed tree, so while an entry is live
        its identity check is sound, and a replaced tree always gets a fresh
        version number."""
        tree = getattr(self, name)
        ent = self._param_versions.get(name)
        if ent is None or ent[0] is not tree:
            ent = (tree, 0 if ent is None else ent[1] + 1)
            self._param_versions[name] = ent
        return (name, ent[1])

    def _cond_lat_key(self, fgbg_np, height, width) -> tuple:
        import hashlib
        return (hashlib.blake2b(np.ascontiguousarray(fgbg_np).tobytes(),
                                digest_size=16).digest(),
                fgbg_np.shape, str(fgbg_np.dtype), height, width,
                self._params_version("vae_params"), self._numeric_state())

    def _dino_key(self, images_u8) -> tuple:
        import hashlib
        return (hashlib.blake2b(b"".join(np.ascontiguousarray(x).tobytes()
                                         for x in images_u8),
                                digest_size=16).digest(),
                tuple(np.asarray(x).shape for x in images_u8),
                self.dino_image_size, self._params_version("dino_params"),
                self._numeric_state())

    def _dino_pooled_cached(self, images_u8) -> Array:
        """(M, Cd) pooled embeddings for a list of uint8 object images,
        memoized by pixel content: a repeated object across edit rounds (the
        interactive norm — move/resize/rotate keep fg_image fixed) costs
        zero dispatches (~17-28 ms each through the tunnel, PERF_NOTES)."""
        key = self._dino_key(images_u8)
        hit = self._dino_cache.get(key)
        if hit is None:
            px = dino_lib.preprocess_u8(np.stack(images_u8),
                                        size=self.dino_image_size)
            hit = self._encode_dino(jnp.asarray(px))
            if len(self._dino_cache) >= 32:
                self._dino_cache.pop(next(iter(self._dino_cache)))
            self._dino_cache[key] = hit
        return hit

    def _encode_dino(self, pixel_values: Array) -> Array:
        """pixel_values: ImageNet-normalized f32, or uint8 transport form
        (resized/cropped only) normalized here on device — exact, at 1/4
        the upload bytes. jit retraces per dtype."""
        def make():
            def fn(params, px):
                if px.dtype == jnp.uint8:
                    px = dino_lib.normalize_pixels(px)
                return dino_lib.apply(params, self.dino_cfg,
                                      px.astype(self.dtype)
                                      )[1].astype(jnp.float32)
            return fn
        return self._lazy_jit("_encode_dino_fn", make)(self.dino_params,
                                                       pixel_values)

    # ------------------------------------------------------------------
    # jitted denoise loop
    # ------------------------------------------------------------------

    def _get_edit_fn(self, scheduler_name: str, num_steps: int,
                     do_cfg: bool, use_blobnet: bool = True,
                     encoder_cache: bool = False, decode: bool = True,
                     cfg_interval: bool = False, eta: float = 0.0,
                     custom_timesteps: Optional[Tuple[int, ...]] = None,
                     step_callback: int = 0):
        """One jitted graph for the WHOLE edit: batched VAE encode of both
        conditioning images, score/feature-splat prep, the denoise loop, and
        the VAE decode. Fusing the fixed path matters on top of the loop: the
        device tunnel costs ~30 ms per synchronized dispatch and the separate
        encode/prep/decode calls measured ~0.5 s of the 3.9 s edit
        (scripts/profile_fixed.py)."""
        # guidance_scale is a traced operand (sweeping it must not recompile
        # the 50-step graph), so it is NOT part of the cache key; neither is
        # the encoder-cache key-step mask (an operand array)
        hybrid = (self.mesh is not None
                  and getattr(self, "_hybrid_cfg_data", False) and do_cfg)
        if cfg_interval and hybrid:
            raise ValueError(
                "cfg_guidance interval is incompatible with the hybrid "
                "CFG-data sharding recipe (cond-only steps drop the CFG "
                "batch dim the recipe shards over)")
        # eta only parameterizes DDIM's variance tables (diffusers mirrors
        # this: prepare_extra_step_kwargs forwards eta only to schedulers
        # that accept it) — normalize so unipc/dpm callers share one graph
        eta = eta if scheduler_name == "ddim" else 0.0
        key = (scheduler_name, num_steps, do_cfg, use_blobnet, encoder_cache,
               decode, hybrid, cfg_interval, eta, custom_timesteps,
               step_callback)
        if key in self._denoise_cache:
            return self._denoise_cache[key]

        if hybrid:
            from jax.sharding import NamedSharding, PartitionSpec
            _cfg_shard = NamedSharding(self.mesh, PartitionSpec("data"))
            _rep_shard = NamedSharding(self.mesh, PartitionSpec())

            def cfg_batch_constraint(x):
                """Pin the CFG batch dim to the data axis (the uncond/cond
                rows land on different chip groups; GSPMD inserts only the
                tiny gather at the guidance combine)."""
                return jax.lax.with_sharding_constraint(x, _cfg_shard)

            def pre_cfg_replicate(x):
                """Replicate a batch-B tensor BEFORE it is CFG-duplicated
                into the data-sharded batch. Without this, GSPMD sees
                concatenate(channel-sharded, channel-sharded) with a
                batch-sharded output constraint and falls back to
                'involuntary full rematerialization'; with it, the reshard
                decomposes into a clean all-gather (here) plus a local
                batch slice (at the constraint)."""
                return jax.lax.with_sharding_constraint(x, _rep_shard)
        else:
            def cfg_batch_constraint(x):
                return x

            def pre_cfg_replicate(x):
                return x

        if scheduler_name == "unipc":
            sched = unipc_lib.make(num_steps, timesteps=custom_timesteps)
        elif scheduler_name == "ddim":
            sched = ddim_lib.make(num_steps, eta=eta,
                                  timesteps=custom_timesteps)
        elif scheduler_name == "dpm" or scheduler_name.startswith("dpm_"):
            # "dpm" plus any of the suffix tokens: _sde, _karras, _heun —
            # e.g. "dpm_sde_karras" = DPM++ 2M SDE Karras. Anything else
            # ("dpmsolver", "dpm_", "dpm_sd") raises rather than silently
            # running the plain variant.
            toks = scheduler_name.split("_")[1:]
            unknown = set(toks) - {"sde", "karras", "heun"}
            if unknown or (scheduler_name != "dpm" and not toks) or "" in toks:
                raise ValueError(
                    f"unknown dpm variant {scheduler_name!r}; tokens after "
                    f"'dpm_' must be among sde/karras/heun")
            toks = set(toks)
            sched = dpm_lib.make(
                num_steps,
                algorithm_type="sde-dpmsolver++" if "sde" in toks else "dpmsolver++",
                solver_type="heun" if "heun" in toks else "midpoint",
                use_karras_sigmas="karras" in toks,
                timesteps=custom_timesteps)
        else:
            raise ValueError(f"unknown scheduler {scheduler_name}")

        unet_cfg, blobnet_cfg, dtype = self.unet_cfg, self.blobnet_cfg, self.dtype
        vae_cfg = self.vae_cfg

        def crop_right(r: Array) -> Array:
            return r[:, :, r.shape[2] - r.shape[1]:, :]

        def denoise(unet_params, blobnet_params, latents, prompt_embeds,
                    fg_lat, bg_lat, fg_score, bg_score, fg_feats, cond_scales,
                    guidance_scale, key_mask, cfg_mask, noise_key):
            """latents: (B, h, w, 4) f32. fg/bg_lat: (CB, h, w, 4);
            fg/bg_score: (CB, h, w, 1); fg_feats: (CB, h, w, Cd);
            cond_scales: (S,) f32; key_mask: (S,) bool (all True = exact);
            cfg_mask: (S,) bool, used only when cfg_interval (see below).
            CB = CFG batch (2B or B).

            CFG dedup: BlobNet takes no text conditioning, so its two CFG
            rows would be bit-identical (the reference runs it redundantly at
            batch 2B, pipeline_blobnet.py:1043-1068). We run BlobNet at batch
            B and broadcast the residuals — exact same numbers, half the
            BlobNet FLOPs.

            Encoder caching (opt-in, Faster-Diffusion arXiv 2312.09608): on
            steps where key_mask[i] is False, BlobNet and the UNet *encoder*
            (conv_in + down + mid) are skipped entirely and the previous key
            step's encoder state — mid activation, 12 skips, and the 15
            BlobNet up residuals — is reused; only the decoder runs, with the
            current step's time embedding."""
            n = latents.shape[0]
            # static conditioning tensors, pre-concatenated once:
            blob_cond_left = jnp.concatenate(
                [fg_lat[:n], fg_score[:n], fg_feats[:n]], axis=-1).astype(dtype)
            blob_cond_right_extras = jnp.concatenate(
                [fg_score[:n], fg_feats[:n]], axis=-1).astype(dtype)
            unet_cond_left = cfg_batch_constraint(jnp.concatenate(
                [bg_lat, bg_score], axis=-1).astype(dtype))
            bg_score_d = cfg_batch_constraint(bg_score.astype(dtype))
            pe = cfg_batch_constraint(prompt_embeds.astype(dtype))

            def encode_step(i, sample_d):
                """Full conditioning path: BlobNet + UNet encoder. Returns
                (x_mid, skip_stack, up_residuals)."""
                t = sched.timesteps_jax[i].astype(jnp.float32)
                lmi = (jnp.concatenate([sample_d] * 2, axis=0)
                       if do_cfg else sample_d)
                unet_right = jnp.concatenate([lmi, bg_score_d], axis=-1)
                unet_in = cfg_batch_constraint(
                    jnp.concatenate([unet_cond_left, unet_right], axis=2))

                if use_blobnet:
                    # BlobNet at batch B (no CFG duplication; see docstring)
                    blob_right = jnp.concatenate(
                        [sample_d, blob_cond_right_extras], axis=-1)
                    blob_in = jnp.concatenate([blob_cond_left, blob_right], axis=2)

                    def blob_on(blob_in):
                        return blobnet_lib.blobnet_apply(
                            blobnet_params, blobnet_cfg, blob_in, t,
                            conditioning_scale=cond_scales[i].astype(dtype))

                    def blob_off(blob_in):
                        return jax.tree_util.tree_map(
                            jnp.zeros_like, jax.eval_shape(blob_on, blob_in))

                    # steps outside the control window (blobnet_keep == 0)
                    # skip the entire BlobNet forward
                    down, mid, up = jax.lax.cond(
                        cond_scales[i] != 0.0, blob_on, blob_off, blob_in)

                    def bcast(r):
                        r = crop_right(r)
                        if do_cfg:
                            r = pre_cfg_replicate(r)
                            r = cfg_batch_constraint(
                                jnp.concatenate([r, r], axis=0))
                        return r

                    x_mid, skips = unet_lib.unet_encode(
                        unet_params, unet_cfg, unet_in, t, pe,
                        down_block_add_samples=[bcast(r) for r in down],
                        mid_block_add_sample=bcast(mid))
                    up_res = tuple(bcast(r) for r in up)
                else:
                    # remove mode: conditioning scale is statically 0 — the
                    # BlobNet residuals would all be zeros (reference computes
                    # them anyway and multiplies by 0, pipeline_blobnet.py:1040)
                    x_mid, skips = unet_lib.unet_encode(
                        unet_params, unet_cfg, unet_in, t, pe)
                    up_res = ()
                return x_mid, skips, up_res

            def decode_step(i, enc):
                x_mid, skips, up_res = enc
                t = sched.timesteps_jax[i].astype(jnp.float32)
                noise_pred = unet_lib.unet_decode(
                    unet_params, unet_cfg, x_mid, skips, t, pe,
                    up_block_add_samples=list(up_res) if up_res else None)
                w = noise_pred.shape[2]
                noise_pred = noise_pred[:, :, w // 2:, :].astype(jnp.float32)
                if do_cfg:
                    uncond, cond = jnp.split(noise_pred, 2, axis=0)
                    noise_pred = uncond + guidance_scale * (cond - uncond)
                return noise_pred

            def cond_only_step(i, sample_d):
                """Guidance-interval CFG (opt-in, arXiv 2404.07724): on steps
                outside the CFG window the guidance combine degenerates to the
                conditional prediction alone (uncond + 1*(cond - uncond) ==
                cond), so the uncond UNet rows are skipped entirely — the
                UNet runs at batch B instead of 2B. BlobNet already runs at
                batch B (CFG dedup), so its cost is unchanged."""
                t = sched.timesteps_jax[i].astype(jnp.float32)
                unet_right = jnp.concatenate([sample_d, bg_score_d[n:]],
                                             axis=-1)
                unet_in = jnp.concatenate([unet_cond_left[n:], unet_right],
                                          axis=2)
                pe_cond = pe[n:]
                if use_blobnet:
                    blob_right = jnp.concatenate(
                        [sample_d, blob_cond_right_extras], axis=-1)
                    blob_in = jnp.concatenate([blob_cond_left, blob_right],
                                              axis=2)

                    def blob_on(blob_in):
                        return blobnet_lib.blobnet_apply(
                            blobnet_params, blobnet_cfg, blob_in, t,
                            conditioning_scale=cond_scales[i].astype(dtype))

                    def blob_off(blob_in):
                        return jax.tree_util.tree_map(
                            jnp.zeros_like, jax.eval_shape(blob_on, blob_in))

                    down, mid, up = jax.lax.cond(
                        cond_scales[i] != 0.0, blob_on, blob_off, blob_in)
                    x_mid, skips = unet_lib.unet_encode(
                        unet_params, unet_cfg, unet_in, t, pe_cond,
                        down_block_add_samples=[crop_right(r) for r in down],
                        mid_block_add_sample=crop_right(mid))
                    up_res = [crop_right(r) for r in up]
                else:
                    x_mid, skips = unet_lib.unet_encode(
                        unet_params, unet_cfg, unet_in, t, pe_cond)
                    up_res = None
                noise_pred = unet_lib.unet_decode(
                    unet_params, unet_cfg, x_mid, skips, t, pe_cond,
                    up_block_add_samples=up_res)
                w = noise_pred.shape[2]
                return noise_pred[:, :, w // 2:, :].astype(jnp.float32)

            if scheduler_name == "unipc":
                state = unipc_lib.init_state(sched, latents)
            elif scheduler_name.startswith("dpm"):
                state = dpm_lib.init_state(sched, latents)
            else:
                state = (latents,)

            def variance_noise(i, shape):
                """Per-step variance noise for stochastic schedulers.
                noise_key is either ONE key (single-edit path: one draw at
                the batched shape, matching the torch reference's single
                generator) or a (B, 2) stack of per-request keys (edit_batch:
                row b is drawn from request b's own key at the solo shape,
                so batched trajectories bit-match solo runs)."""
                if noise_key.ndim == 2:
                    return jax.vmap(lambda k: jax.random.normal(
                        jax.random.fold_in(k, i), shape[1:],
                        jnp.float32))(noise_key)
                return jax.random.normal(jax.random.fold_in(noise_key, i),
                                         shape, jnp.float32)

            def sched_step(i, noise_pred, state):
                if scheduler_name == "unipc":
                    return unipc_lib.step(sched, i, noise_pred, state)
                if scheduler_name.startswith("dpm"):
                    noise = None
                    if sched.stochastic:
                        noise = variance_noise(i, state[0].shape)
                    return dpm_lib.step(sched, i, noise_pred, state,
                                        noise=noise)
                return (ddim_lib.step(
                    sched, i, noise_pred, state[0],
                    noise=(variance_noise(i, state[0].shape)
                           if sched.eta > 0.0 else None)),)

            if step_callback:
                # per-step host callback (reference callback_on_step_end,
                # pipeline_blobnet.py:1107-1123). The jitted graph calls a
                # bound trampoline that reads self._step_callback, so
                # swapping the user callback never recompiles. Read-only:
                # see __call__ for the documented divergence.
                # step_callback > 1 fires only every Nth step (plus the
                # final step): the lax.cond skips the whole device->host
                # latent transfer on silent steps, which is what makes
                # preview streaming affordable over a thin d2h link.
                inner_sched_step = sched_step
                cb_every = int(step_callback)

                def sched_step(i, noise_pred, state):
                    new_state = inner_sched_step(i, noise_pred, state)
                    if cb_every > 1:
                        jax.lax.cond(
                            jnp.logical_or(i % cb_every == 0,
                                           i == num_steps - 1),
                            lambda lat: jax.debug.callback(
                                self._emit_step_callback, i,
                                sched.timesteps_jax[i], lat),
                            lambda lat: None,
                            new_state[0])
                    else:
                        jax.debug.callback(self._emit_step_callback, i,
                                           sched.timesteps_jax[i],
                                           new_state[0])
                    return new_state

            if not encoder_cache:
                if cfg_interval and do_cfg:
                    def body(i, state):
                        sample_d = state[0].astype(dtype)
                        noise_pred = jax.lax.cond(
                            cfg_mask[i],
                            lambda s: decode_step(i, encode_step(i, s)),
                            lambda s: cond_only_step(i, s),
                            sample_d)
                        return sched_step(i, noise_pred, state)
                else:
                    def body(i, state):
                        sample_d = state[0].astype(dtype)
                        noise_pred = decode_step(i, encode_step(i, sample_d))
                        return sched_step(i, noise_pred, state)

                state = jax.lax.fori_loop(0, num_steps, body, state)
                return state[0]

            # encoder-cache variant: carry the encoder state across steps
            enc0 = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype),
                jax.eval_shape(encode_step, 0, latents.astype(dtype)))

            def body(i, carry):
                state, enc = carry
                sample_d = state[0].astype(dtype)
                enc = jax.lax.cond(key_mask[i],
                                   lambda s, e: encode_step(i, s),
                                   lambda s, e: e, sample_d, enc)
                noise_pred = decode_step(i, enc)
                return sched_step(i, noise_pred, state), enc

            state, _ = jax.lax.fori_loop(0, num_steps, body, (state, enc0))
            return state[0]

        @jax.jit  # no donation: caller-supplied latents must stay valid
        @self._with_kernel_profiles
        def edit(unet_params, blobnet_params, vae_params, fg_img, bg_img,
                 lat2_in, use_lat2, gs, pooled, prompt_embeds, latents,
                 cond_scales, guidance_scale, key_mask, cfg_mask, noise_key):
            """fg_img/bg_img: (Bg, H, W, 3) uint8 0..255 (the exact
            transport form) or f32 in [-1, 1]; gs: (Bg, h, w, M+1)
            composited score layers [bg, fg_1..fg_M]; pooled: (Bg, M, Cd)
            per-edit, per-blob DINOv2 embeddings. Bg = 1 for the single-edit
            path (conditioning broadcast over num_images_per_prompt) or B for
            edit_batch's B distinct edits. Everything else as in denoise();
            the CFG tile replicates the Bg block to match prompt_embeds'
            [negative-block; positive-block] ordering.

            lat2_in/use_lat2: conditioning-latent memo (interactive rounds
            keep fg/bg fixed while the blob moves). use_lat2 (traced bool)
            selects lat2_in — the PREVIOUS round's returned conditioning
            latents, device-resident — over the in-graph VAE encode; the
            image operands are then device-resident dummies, so a repeat
            round uploads no image bytes at all. One graph serves both (a
            lax.cond branch, not a second compile); lat2 is always returned
            (stays on device — never fetched) so the host can memoize it."""
            cfg_batch = prompt_embeds.shape[0]
            # both conditioning images through ONE batched VAE encode.
            # bg_img=None means fg_img is the pre-stacked [fg; bg] pair (the
            # single-chip path stacks host-side: one h2d transfer instead of
            # two saves ~10 ms of per-transfer latency through the tunnel).
            # uint8 transport form normalizes here, in f32 — bit-identical
            # to the host-side float path at 1/4 the upload bytes
            if bg_img is None:
                cond = fg_img
                bg_batch = cond.shape[0] // 2
            else:
                bg_batch = fg_img.shape[0]
                cond = jnp.concatenate([fg_img, bg_img], axis=0)

            def encode_cond():
                c = cond
                if c.dtype == jnp.uint8:
                    c = c.astype(jnp.float32) / 255.0 * 2.0 - 1.0
                return vae_lib.encode_to_scaled_latents(
                    vae_params, vae_cfg, c.astype(dtype)).astype(jnp.float32)

            lat2 = jax.lax.cond(use_lat2, lambda: lat2_in, encode_cond)
            tile = lambda x: jnp.tile(x, (cfg_batch // bg_batch, 1, 1, 1))
            fg_lat, bg_lat = tile(lat2[:bg_batch]), tile(lat2[bg_batch:])
            bg_score = tile(gs[..., 0:1])
            fg_layers = gs[..., 1:]
            fg_score = tile(jnp.sum(fg_layers, axis=-1, keepdims=True))
            # feature splat: per-blob score layers x per-blob appearance
            # vectors (the general splat_features_from_scores, utils.py:74-77)
            fg_feats = tile(jnp.einsum("nhwm,nmc->nhwc", fg_layers, pooled))
            final = denoise(unet_params, blobnet_params, latents,
                            prompt_embeds, fg_lat, bg_lat, fg_score, bg_score,
                            fg_feats, cond_scales, guidance_scale, key_mask,
                            cfg_mask, noise_key)
            if not decode:
                return final, lat2
            img = vae_lib.decode_from_scaled_latents(
                vae_params, vae_cfg, final.astype(dtype))
            img = jnp.clip(img.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)
            # uint8 transport: the device->host link in this environment
            # moves ~16 MB/s, so fetching 512^2 float32 pixels costs ~190 ms
            # per edit; uint8 is 4x smaller. The host converts back to the
            # public float32 [0, 1] contract (1/255 quantization — below the
            # fp16 noise floor of the reference stack, and images are saved
            # as uint8 PNGs anyway).
            return jnp.round(img * 255.0).astype(jnp.uint8), lat2

        self._denoise_cache[key] = (edit, sched)
        return edit, sched

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def _emit_step_callback(self, i, t, latents):
        """Host trampoline for callback_on_step_end (runs via
        jax.debug.callback after each scheduler step)."""
        cb = getattr(self, "_step_callback", None)
        if cb is None:
            return
        ret = cb(self, int(i), int(t), {"latents": np.asarray(latents)})
        if ret and not getattr(self, "_step_callback_warned", False):
            self._step_callback_warned = True
            import warnings
            warnings.warn(
                "callback_on_step_end returned tensor updates; they are "
                "IGNORED here — the denoise loop is one compiled TPU graph, "
                "so callbacks are read-only (progress/preview). The torch "
                "reference would re-inject 'latents'.")

    def set_lora_scale(self, scale: float):
        """Runtime LoRA scale (the reference reads it from
        cross_attention_kwargs['scale'] each step,
        pipeline_blobnet.py:1044-1050). Merge-at-use is linear in scale, so
        rescaling applies the delta increment (new - current) onto the
        merged weights — exact up to one bf16 rounding per change. Requires
        the pipeline to have been built by params.io.load_pipeline (which
        records the adapter tree)."""
        if getattr(self, "_lora_tree", None) is None:
            raise ValueError(
                "no LoRA adapter recorded on this pipeline — load it via "
                "params.io.load_pipeline, or merge manually with "
                "models.lora.merge_lora(scale=...)")
        from blobctrl_tpu.models import lora as lora_lib
        current = getattr(self, "_lora_scale", 1.0)
        if scale == current:
            return
        self.unet_params = lora_lib.merge_lora(
            self.unet_params, self._lora_tree, scale=scale - current,
            alpha=self._lora_alpha)
        self._lora_scale = scale
        # pre-quantized int8 weight caches were built from the old weights
        cache = getattr(self, "_int8_param_cache", None)
        if cache:
            cache.clear()

    def __call__(self, prompt: Union[str, List[str], None] = None,
                 fg_image=None, bg_image=None, gs_score=None,
                 height: int = 512, width: int = 512,
                 num_inference_steps: int = 50,
                 guidance_scale: float = 7.5,
                 negative_prompt: Union[str, List[str], None] = None,
                 num_images_per_prompt: int = 1,
                 seed: Optional[int] = None,
                 latents: Optional[np.ndarray] = None,
                 prompt_embeds: Optional[np.ndarray] = None,
                 negative_prompt_embeds: Optional[np.ndarray] = None,
                 blobnet_conditioning_scale: float = 1.0,
                 blobnet_control_guidance_start: float = 0.0,
                 blobnet_control_guidance_end: float = 1.0,
                 clip_skip: Optional[int] = None,
                 scheduler: str = "unipc",
                 output_type: str = "np",
                 encoder_cache_interval: int = 0,
                 encoder_cache_warmup: int = 5,
                 cfg_guidance_start: float = 0.0,
                 cfg_guidance_end: float = 1.0,
                 fg_dino_feats: Optional[np.ndarray] = None,
                 fg_vae_image=None,
                 ip_adapter_image=None,
                 ip_adapter_image_embeds=None,
                 timesteps: Optional[Sequence[int]] = None,
                 eta: float = 0.0,
                 cross_attention_kwargs: Optional[dict] = None,
                 callback_on_step_end: Optional[Callable] = None,
                 callback_on_step_end_tensor_inputs: Sequence[str] = ("latents",),
                 callback_interval: int = 1,
                 return_sample: bool = False) -> PipelineOutput:
        """Runs one element-level edit. gs_score: (1, h, w, 2) channels-last
        [bg, fg] composited score map (see blob.math.blob_score_from_ellipse),
        or (1, 2, h, w) NCHW which is transposed automatically.

        timesteps: custom descending sampling schedule for ANY scheduler
        (every coefficient table derives from it host-side; the reference
        accepts this kwarg but raises for every scheduler it registers —
        diffusers v0.30 UniPC has no custom-timestep support).
        eta: DDIM variance (scheduler="ddim" only, like the reference's
        prepare_extra_step_kwargs; ignored elsewhere).
        cross_attention_kwargs: only {"scale": s} is meaningful (runtime
        LoRA scale, reference pipeline_blobnet.py:1044-1050) — routed to
        set_lora_scale().
        callback_on_step_end: called after every scheduler step as
        cb(pipe, i, t, {"latents": np.ndarray}). READ-ONLY divergence from
        the reference: the loop is one compiled TPU graph, so returned
        tensor updates are ignored (warned once). Fetching latents each
        step costs device->host bandwidth — leave None for the fast path.
        callback_interval: fire the callback only on steps where
        i % callback_interval == 0, plus the final step (a lax.cond skips
        the device->host latent transfer entirely on silent steps). Static:
        each distinct interval compiles its own graph."""
        if ip_adapter_image is not None or ip_adapter_image_embeds is not None:
            raise NotImplementedError(
                "IP-Adapter conditioning is not supported (the reference "
                "exposes these kwargs but its own path is broken — "
                "pipeline_blobnet.py:1116 reads an undefined variable)")
        if return_sample:
            raise NotImplementedError(
                "return_sample is a dead path in the reference: it calls "
                "blobnet.conv_norm_out/conv_act/conv_out which BlobNetModel "
                "never defines (SURVEY.md §5 defects 1-2)")
        if cross_attention_kwargs:
            unknown = set(cross_attention_kwargs) - {"scale"}
            if unknown:
                raise NotImplementedError(
                    f"cross_attention_kwargs keys {sorted(unknown)} not "
                    "supported — the reference forwards them to attention "
                    "processors, whose only BlobCtrl use is the LoRA "
                    "'scale' (pipeline_blobnet.py:1044-1050)")
            if cross_attention_kwargs.get("scale") is not None:
                self.set_lora_scale(float(cross_attention_kwargs["scale"]))
        if int(callback_interval) < 1:
            raise ValueError(
                f"callback_interval must be >= 1, got {callback_interval}")
        bad = set(callback_on_step_end_tensor_inputs) - {"latents"}
        if bad:
            raise ValueError(
                f"callback_on_step_end_tensor_inputs must be within "
                f"['latents'], got {sorted(bad)} (the reference also lists "
                "image_embeds only for the broken IP-Adapter branch)")
        custom_timesteps = None
        if timesteps is not None:
            custom_timesteps = tuple(int(t) for t in timesteps)
            num_inference_steps = len(custom_timesteps)
        do_cfg = guidance_scale > 1.0

        if prompt is not None and isinstance(prompt, str):
            batch_size = 1
        elif prompt is not None:
            batch_size = len(prompt)
        else:
            batch_size = np.asarray(prompt_embeds).shape[0]

        pe = self.encode_prompt(prompt, negative_prompt, num_images_per_prompt,
                                do_cfg, clip_skip, prompt_embeds,
                                negative_prompt_embeds)
        cfg_batch = pe.shape[0]
        n = batch_size * num_images_per_prompt
        h, w = height // 8, width // 8

        # latents. seed=None draws FRESH noise each call (matching the torch
        # reference's default-generator behavior) — pass a seed for
        # reproducibility. The same seed also drives stochastic-scheduler
        # (sde-dpmsolver++) per-step variance noise.
        if seed is None:
            import os as _os
            seed = int.from_bytes(_os.urandom(4), "little")
        key = jax.random.PRNGKey(seed)
        if latents is None:
            latents = jax.random.normal(key, (n, h, w, 4), jnp.float32)
        else:
            latents = jnp.asarray(latents, jnp.float32)
            if latents.shape[1] == 4 and latents.shape[-1] != 4:
                latents = jnp.transpose(latents, (0, 2, 3, 1))

        # image conditioning
        # multi-blob: fg_image may be a list of object canvases; the VAE
        # left-half conditioning uses fg_vae_image when given (a combined
        # canvas), otherwise the first entry, while DINOv2 embeds each
        # object separately
        if fg_vae_image is None:
            fg_vae_image = (fg_image[0] if isinstance(fg_image, (list, tuple))
                            else fg_image)
        fg, bg = _uniform_transport([
            preprocess_image_transport(fg_vae_image, height, width),
            preprocess_image_transport(bg_image, height, width)])
        assert fg.shape[0] == 1 and bg.shape[0] == 1, \
            "fg/bg conditioning images must be single images"

        # scores: accept NCHW (1,M+1,h,w) or NHWC (1,h,w,M+1). Slot 0 is the
        # background layer; slots 1..M are depth-ordered fg blobs. M=1 is the
        # reference's case; M>1 generalizes it (compositional multi-object
        # edits): the BlobNet score channel is the sum of the composited fg
        # layers (disjoint by construction) and the appearance splat pairs
        # each blob with its own DINOv2 embedding.
        gs = self._normalize_gs(gs_score, h, w)
        num_blobs = gs.shape[-1] - 1

        # DINOv2 appearance feature splat. With M>1 blobs, fg_image may be a
        # list of M object images (or fg_dino_feats (M, Cd)) — each blob's
        # composited score layer splats its own appearance embedding.
        if fg_dino_feats is None:
            assert self.dino_params is not None, \
                "DINOv2 params required unless fg_dino_feats is given"
            pooled = self._dino_pooled_cached(
                self._dino_uint8_list(fg_image))  # (M', Cd)
        else:
            pooled = jnp.asarray(fg_dino_feats, jnp.float32)
            if pooled.ndim == 3:
                pooled = pooled[:, 0]
        if pooled.shape[0] == 1 and num_blobs > 1:
            pooled = jnp.tile(pooled, (num_blobs, 1))
        assert pooled.shape[0] == num_blobs, \
            f"{pooled.shape[0]} appearance embeddings for {num_blobs} blobs"

        cond_scales = (blobnet_keep_schedule(num_inference_steps,
                                             blobnet_control_guidance_start,
                                             blobnet_control_guidance_end)
                       * float(blobnet_conditioning_scale))

        gs = jnp.asarray(gs)

        # multi-chip: shard batch-major tensors over the data axis (weights
        # are placed by shard_to_mesh); XLA GSPMD propagates the rest.
        # Single chip: stack fg+bg host-side so the conditioning pair rides
        # ONE h2d transfer (bg=None tells the edit fn it's pre-stacked).
        cond_lat = None
        cond_key = None
        if self.mesh is not None:
            from blobctrl_tpu.parallel import mesh as mesh_lib
            data_size = self.mesh.shape["data"]

            def put(x):
                if x.shape[0] % data_size == 0:
                    return jax.device_put(x, mesh_lib.batch_sharding(self.mesh))
                return jax.device_put(x, mesh_lib.replicated(self.mesh))

            latents = put(latents)
            pe = put(pe)
            fg, bg, gs = put(jnp.asarray(fg)), put(jnp.asarray(bg)), put(gs)
            lat2_shape = (2, h, w, 4)
        else:
            # conditioning-latent memo: interactive rounds move the blob but
            # keep fg/bg fixed — a repeat round feeds the previous round's
            # device-resident latents (use_lat2 branch) and uploads dummy
            # image bytes (device-cached zeros: zero wire cost)
            fgbg = np.concatenate([fg, bg], axis=0)
            cond_key = self._cond_lat_key(fgbg, height, width)
            cond_lat = self._cond_lat_cache.get(cond_key)
            fg = (self._dummy(fgbg.shape, fgbg.dtype) if cond_lat is not None
                  else jnp.asarray(fgbg))
            bg = None
            lat2_shape = (2, h, w, 4)

        use_blobnet = bool(np.any(cond_scales != 0.0))

        # Faster-Diffusion encoder propagation (opt-in, approximate): key
        # steps run the full conditioning path; the rest reuse the cached
        # encoder state. Warmup steps, control-window edges, and the final
        # step are always keys (the approximation is worst where the
        # trajectory bends).
        encoder_cache = encoder_cache_interval > 1
        key_mask = np.ones(num_inference_steps, bool)
        if encoder_cache:
            for i in range(num_inference_steps):
                is_key = (i < encoder_cache_warmup
                          or i % encoder_cache_interval == 0
                          or i == num_inference_steps - 1
                          or cond_scales[i] != cond_scales[i - 1])
                key_mask[i] = is_key

        # Guidance-interval CFG (opt-in, approximate; arXiv 2404.07724):
        # apply the CFG combine only inside the [start, end) step window —
        # outside it, only the conditional UNet rows run (noise_pred = cond,
        # i.e. the guidance_scale=1 limit). Same keep convention as the
        # BlobNet control window. Default (0, 1) = exact, every step guided.
        cfg_mask = blobnet_keep_schedule(num_inference_steps,
                                         cfg_guidance_start,
                                         cfg_guidance_end) > 0.0
        cfg_interval = bool(do_cfg and not cfg_mask.all())
        if cfg_interval and encoder_cache:
            raise ValueError(
                "cfg_guidance interval cannot be combined with "
                "encoder_cache_interval: the cached encoder state carries "
                "the CFG batch dim that cond-only steps drop")

        edit, sched = self._get_edit_fn(scheduler, num_inference_steps,
                                        do_cfg, use_blobnet, encoder_cache,
                                        decode=output_type != "latent",
                                        cfg_interval=cfg_interval,
                                        eta=eta,
                                        custom_timesteps=custom_timesteps,
                                        step_callback=(
                                            int(callback_interval)
                                            if callback_on_step_end
                                            is not None else 0))
        self._step_callback = callback_on_step_end
        self._step_callback_warned = False
        try:
            out, lat2 = edit(self._conv_params("unet_params"),
                             self._conv_params("blobnet_params"),
                             self._conv_params("vae_params"),
                             fg, bg,
                             cond_lat if cond_lat is not None
                             else self._dummy(lat2_shape, jnp.float32),
                             jnp.asarray(cond_lat is not None),
                             gs, pooled[None], pe, latents,
                             jnp.asarray(cond_scales),
                             jnp.asarray(float(guidance_scale), jnp.float32),
                             jnp.asarray(key_mask),
                             jnp.asarray(cfg_mask),
                             jax.random.fold_in(key, 0x5de))
            if cond_key is not None and cond_lat is None:
                # lat2 stays device-resident (no fetch); next round with the
                # same fg/bg skips both the image upload and the VAE encode
                if len(self._cond_lat_cache) >= 8:
                    self._cond_lat_cache.pop(next(iter(self._cond_lat_cache)))
                self._cond_lat_cache[cond_key] = lat2
            if callback_on_step_end is not None:
                # debug.callback is async: make every step's callback land
                # before returning (and before _step_callback is cleared)
                jax.effects_barrier()
        finally:
            self._step_callback = None

        if output_type == "latent":
            return PipelineOutput(images=np.asarray(out))
        images = np.asarray(out).astype(np.float32) / 255.0
        has_nsfw = None
        if self.safety_checker is not None:
            has_nsfw = np.asarray(self.safety_checker(images))
            if self.blackout_nsfw:
                images = images.copy()
                images[has_nsfw] = 0.0
        return PipelineOutput(images=images, nsfw_content_detected=has_nsfw)

    # ------------------------------------------------------------------
    # batched distinct edits (production serving path)
    # ------------------------------------------------------------------

    @staticmethod
    def _normalize_gs(gs_score, h: int, w: int) -> np.ndarray:
        """gs_score in NHWC (…,h,w,M+1) or NCHW (…,M+1,h,w), with or without
        the leading batch dim → (1, h, w, M+1) float32 NHWC."""
        gs = np.asarray(gs_score, np.float32)
        if gs.ndim == 3:
            gs = gs[None]
        # exact layout check against the known latent grid
        if gs.shape[1] == h and gs.shape[2] == w:
            pass  # NHWC
        elif gs.shape[2] == h and gs.shape[3] == w:
            gs = np.transpose(gs, (0, 2, 3, 1))  # NCHW
        else:
            raise ValueError(f"gs_score shape {gs.shape} does not match the "
                             f"latent grid ({h}, {w}) in NHWC or NCHW layout")
        return gs

    @staticmethod
    def _dino_uint8_list(fg_image) -> list:
        """fg_image (PIL / ndarray / list of either / batched (M,H,W,3)
        ndarray) → list of uint8 HWC arrays for DINOv2 preprocessing."""
        if isinstance(fg_image, (list, tuple)):
            fg_images = fg_image
        elif (not hasattr(fg_image, "convert")
              and np.asarray(fg_image).ndim == 4):
            fg_images = list(np.asarray(fg_image))  # batched ndarray
        else:
            fg_images = [fg_image]
        out = []
        for im in fg_images:
            if hasattr(im, "convert"):
                out.append(np.asarray(im.convert("RGB"), np.uint8))
            else:
                out.append(np.asarray(im, np.uint8))
        return out

    def edit_batch(self, requests: List[dict],
                   height: int = 512, width: int = 512,
                   num_inference_steps: int = 50,
                   guidance_scale: float = 7.5,
                   blobnet_conditioning_scale: float = 1.0,
                   blobnet_control_guidance_start: float = 0.0,
                   blobnet_control_guidance_end: float = 1.0,
                   clip_skip: Optional[int] = None,
                   scheduler: str = "unipc",
                   output_type: str = "np") -> PipelineOutput:
        """Runs B *distinct* edits as ONE batched device program — the
        production serving path (dynamic micro-batching in apps/server.py).

        The reference stack has no analog: its pipeline batches only
        ``num_images_per_prompt`` samples of a single edit
        (pipeline_blobnet.py:743-773). On TPU the per-image step cost is flat
        in batch (PERF_NOTES "Batch scaling"), so batching distinct requests
        amortizes the fixed encode/decode/dispatch cost and serves N
        concurrent users in one graph execution.

        ``requests``: list of dicts, each with keys
          prompt (str), negative_prompt (str, optional), fg_image, bg_image,
          gs_score, seed (int, optional), fg_dino_feats (optional (M, Cd)),
          fg_vae_image (optional, multi-blob combined canvas).
        All requests share the sampler configuration (the keyword arguments)
        and must carry the same blob count M — the server groups compatible
        requests before calling this.

        Determinism: each batched edit is numerically equivalent to running
        the same request alone with the same seed — for stochastic schedulers
        (sde-dpmsolver++) too. Initial noise AND per-step variance noise are
        both drawn per-request from that request's own PRNGKey(seed) chain,
        exactly as __call__ does (the torch reference cannot make this
        guarantee: one shared generator means stochastic trajectories never
        bit-match across batch shapes there).
        """
        B = len(requests)
        if B == 0:
            raise ValueError("edit_batch needs at least one request")
        do_cfg = guidance_scale > 1.0
        h, w = height // 8, width // 8

        if any("prompt_embeds" in r for r in requests):
            # pre-computed text embeddings (embedding-only pipelines / tests)
            def row(r, key):
                v = r.get(key)
                if v is None:
                    raise ValueError(f"all requests must carry {key} when "
                                     "any does (mixed batches would need a "
                                     "tokenizer for the rest)")
                v = np.asarray(v, np.float32)
                return v[0] if v.ndim == 3 else v
            pe_arr = np.stack([row(r, "prompt_embeds") for r in requests])
            npe_arr = None
            if do_cfg:
                npe_arr = np.stack(
                    [row(r, "negative_prompt_embeds") for r in requests])
            pe = self.encode_prompt(None, None, 1, do_cfg, clip_skip,
                                    pe_arr, npe_arr)
        else:
            prompts = [r.get("prompt") or "" for r in requests]
            negatives = [r.get("negative_prompt") or "" for r in requests]
            pe = self.encode_prompt(prompts, negatives, 1, do_cfg, clip_skip)

        # per-request initial noise AND per-request variance-noise keys,
        # drawn exactly as the single-edit path draws them for that seed
        import os as _os
        lats, noise_keys = [], []
        for r in requests:
            seed = r.get("seed")
            if seed is None:
                seed = int.from_bytes(_os.urandom(4), "little")
            k = jax.random.PRNGKey(seed)
            noise_keys.append(jax.random.fold_in(k, 0x5de))
            lats.append(jax.random.normal(k, (1, h, w, 4), jnp.float32))
        latents = jnp.concatenate(lats, axis=0)

        fgs, bgs, gss = [], [], []
        for r in requests:
            fg_image = r["fg_image"]
            fg_vae = r.get("fg_vae_image")
            if fg_vae is None:
                fg_vae = (fg_image[0]
                          if isinstance(fg_image, (list, tuple)) else fg_image)
            fgs.append(preprocess_image_transport(fg_vae, height, width))
            bgs.append(preprocess_image_transport(r["bg_image"], height,
                                                  width))
            gss.append(self._normalize_gs(r["gs_score"], h, w))
        # one transport dtype across the whole batch (fg and bg concatenate
        # inside the jitted edit): uint8 only if every image is uint8
        both = _uniform_transport(fgs + bgs)
        if self.mesh is not None:
            fg = jnp.asarray(np.concatenate(both[:B], axis=0))
            bg = jnp.asarray(np.concatenate(both[B:], axis=0))
        else:
            # single chip: [all fg rows; all bg rows] as ONE h2d transfer
            fg = jnp.asarray(np.concatenate(both, axis=0))
            bg = None
        num_blobs = gss[0].shape[-1] - 1
        if any(g.shape[-1] - 1 != num_blobs for g in gss):
            raise ValueError("all requests in a batch must carry the same "
                             "blob count M")
        gs_np = np.concatenate(gss, axis=0)

        # appearance embeddings: one DINOv2 dispatch for every image in the
        # batch (each device call costs ~30 ms through the tunnel)
        pooled_rows: List[Optional[np.ndarray]] = [None] * B
        to_encode, spans = [], []
        for b, r in enumerate(requests):
            feats = r.get("fg_dino_feats")
            if feats is not None:
                f = np.asarray(feats, np.float32)
                if f.ndim == 3:
                    f = f[:, 0]
                if f.ndim == 1:
                    f = f[None]
                pooled_rows[b] = f
            else:
                assert self.dino_params is not None, \
                    "DINOv2 params required unless fg_dino_feats is given"
                imgs = self._dino_uint8_list(r["fg_image"])
                hit = self._dino_cache.get(self._dino_key(imgs))
                if hit is not None:
                    pooled_rows[b] = np.asarray(hit)
                else:
                    spans.append((b, imgs))
                    to_encode.extend(imgs)
        if to_encode:
            # cache misses ride ONE batched dispatch; hits cost none
            px = dino_lib.preprocess_u8(np.stack(to_encode),
                                        size=self.dino_image_size)
            enc = np.asarray(self._encode_dino(jnp.asarray(px)))
            off = 0
            for b, imgs in spans:
                m = len(imgs)
                pooled_rows[b] = enc[off:off + m]
                key = self._dino_key(imgs)
                if len(self._dino_cache) >= 32:
                    self._dino_cache.pop(next(iter(self._dino_cache)))
                self._dino_cache[key] = jnp.asarray(enc[off:off + m])
                off += m
        rows = []
        for b, f in enumerate(pooled_rows):
            if f.shape[0] == 1 and num_blobs > 1:
                f = np.tile(f, (num_blobs, 1))
            assert f.shape[0] == num_blobs, \
                (f"request {b}: {f.shape[0]} appearance embeddings for "
                 f"{num_blobs} blobs")
            rows.append(f)
        pooled = jnp.asarray(np.stack(rows))  # (B, M, Cd)

        cond_scales = (blobnet_keep_schedule(num_inference_steps,
                                             blobnet_control_guidance_start,
                                             blobnet_control_guidance_end)
                       * float(blobnet_conditioning_scale))
        use_blobnet = bool(np.any(cond_scales != 0.0))
        gs = jnp.asarray(gs_np)

        if self.mesh is not None:
            from blobctrl_tpu.parallel import mesh as mesh_lib
            data_size = self.mesh.shape["data"]

            def put(x):
                if x.shape[0] % data_size == 0:
                    return jax.device_put(x, mesh_lib.batch_sharding(self.mesh))
                return jax.device_put(x, mesh_lib.replicated(self.mesh))

            latents, pe = put(latents), put(pe)
            fg, bg, gs = put(fg), put(bg), put(gs)

        edit, _ = self._get_edit_fn(scheduler, num_inference_steps, do_cfg,
                                    use_blobnet,
                                    decode=output_type != "latent")
        key_mask = np.ones(num_inference_steps, bool)
        # per-request conditioning images differ across a serving batch, so
        # the cond-latent memo stays off here (use_lat2=False, dummy lat2)
        out, _ = edit(self._conv_params("unet_params"),
                      self._conv_params("blobnet_params"),
                      self._conv_params("vae_params"),
                      fg, bg,
                      self._dummy((fg.shape[0] if bg is None
                                   else 2 * fg.shape[0],
                                   latents.shape[1], latents.shape[2], 4),
                                  jnp.float32),
                      jnp.asarray(False),
                      gs, pooled, pe, latents,
                      jnp.asarray(cond_scales),
                      jnp.asarray(float(guidance_scale), jnp.float32),
                      jnp.asarray(key_mask),
                      jnp.asarray(key_mask),
                      jnp.stack(noise_keys))

        if output_type == "latent":
            return PipelineOutput(images=np.asarray(out))
        images = np.asarray(out).astype(np.float32) / 255.0
        has_nsfw = None
        if self.safety_checker is not None:
            has_nsfw = np.asarray(self.safety_checker(images))
            if self.blackout_nsfw:
                images = images.copy()
                images[has_nsfw] = 0.0
        return PipelineOutput(images=images, nsfw_content_detected=has_nsfw)
