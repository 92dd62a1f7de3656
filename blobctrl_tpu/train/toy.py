"""From-scratch toy BlobCtrl: synthetic scenes, full training, trained gates.

The reference ships no training code and its checkpoints are not on disk, so
two claims were previously untestable end-to-end:

  1. that the training subsystem (train/train_step.py, train/data.py
     conventions, checkpointing) actually produces a WORKING blob-controlled
     generative model, and
  2. that the opt-in fast modes (int8-everything, encoder caching,
     guidance-interval CFG) stay close to the exact path on TRAINED weights —
     random-weight drift bounds only exercise chaotic bf16 amplification
     (PERF_NOTES.md "Numerics"), they say nothing about quality.

This module closes both: it trains a tiny VAE + BlobNet + UNet from scratch
on synthetic "colored ellipse on gradient background" scenes (a miniature of
the BlobData recipe implied by the reference inference path, see
train/data.py), using the SAME pipeline surface, double-width layout,
right-half loss and background conventions as production:

  * bg conditioning = image with the object (target) region BLACKED, matching
    apps/session.py build_edited_background (start white, target black);
  * a non-overlapping distractor region is WHITED in some examples, teaching
    "white = erase/inpaint background" — the move edit's source region;
  * ~10% object-free examples with an all-bg score supervise remove mode;
  * ~10% dropped text embeddings make classifier-free guidance meaningful.

scripts/train_toy.py trains and saves the checkpoint (assets/toy_ckpt/);
tests/test_toy_quality_gate.py replays edits against it.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from blobctrl_tpu.blob import math as blob_math
from blobctrl_tpu.blob import viz as viz_lib

# (name, RGB) — class identity doubles as the "prompt" and the "appearance":
# the toy text embedding and the toy DINOv2 pooled embedding are fixed random
# vectors per color class (the roles CLIP / DINOv2 play in production).
COLORS: Tuple[Tuple[str, Tuple[int, int, int]], ...] = (
    ("red", (214, 48, 38)), ("green", (52, 168, 83)),
    ("blue", (66, 103, 210)), ("yellow", (233, 196, 34)),
    ("magenta", (186, 60, 170)), ("cyan", (58, 186, 186)),
)


def toy_configs(ctx: int = 16, dino_c: int = 16, size: int = 128):
    """Tiny-but-trainable geometry, scaled by image size. size=128 (the r3
    gate): 2-level UNet/BlobNet at 16^2 latents, ~0.9M params. size>=256
    (VERDICT r4 Next #4): 3-level nets at 32^2 latents — one more level of
    the production topology (attention at the top two levels, conv-only
    bottom, like SD-1.5's attention-free innermost block). 4-level f8 VAE
    either way."""
    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.models import vae as vae_lib

    if size >= 256:
        blocks = (32, 64, 96)
        down_attn, up_attn = (True, True, False), (False, True, True)
    else:
        blocks = (32, 64)
        down_attn, up_attn = (True, False), (False, True)
    unet_cfg = unet_lib.UNetConfig(
        in_channels=5, out_channels=4, block_out_channels=blocks,
        down_block_has_attn=down_attn, up_block_has_attn=up_attn,
        layers_per_block=2, cross_attention_dim=ctx, num_heads=2,
        norm_num_groups=8)
    blobnet_cfg = blobnet_lib.BlobNetConfig(
        in_channels=4, conditioning_channels=1 + dino_c,
        block_out_channels=blocks, down_block_has_attn=down_attn,
        up_block_has_attn=up_attn, layers_per_block=2,
        cross_attention_dim=None, num_heads=2, norm_num_groups=8)
    vae_cfg = vae_lib.VAEConfig(
        block_out_channels=(16, 32, 32, 32), layers_per_block=1,
        norm_num_groups=8)
    return unet_cfg, blobnet_cfg, vae_cfg


def class_embeddings(ctx: int = 16, length: int = 7, seed: int = 7,
                     dino_c: int = 16) -> Dict[str, np.ndarray]:
    """Fixed random per-class embeddings: 'text' (n, length, ctx) plays
    CLIP's role, 'appearance' (n, dino_c) plays DINOv2 pooler_output's."""
    rng = np.random.RandomState(seed)
    n = len(COLORS)
    return {
        "text": (rng.randn(n, length, ctx) * 0.5).astype(np.float32),
        "appearance": rng.randn(n, dino_c).astype(np.float32),
    }


# ---------------------------------------------------------------------------
# synthetic scenes
# ---------------------------------------------------------------------------

def _gradient_background(rng: np.random.RandomState, size: int) -> np.ndarray:
    g0, g1 = rng.uniform(90, 175, 2)
    c0 = np.clip(g0 + rng.uniform(-14, 14, 3), 0, 255)
    c1 = np.clip(g1 + rng.uniform(-14, 14, 3), 0, 255)
    t = np.linspace(0.0, 1.0, size)[:, None, None]
    if rng.rand() < 0.5:
        t = t.transpose(1, 0, 2)
    return np.broadcast_to((1 - t) * c0 + t * c1, (size, size, 3)).copy()


def _random_ellipse(rng: np.random.RandomState, size: int,
                    lo: float = 0.24, hi: float = 0.46):
    d1 = rng.uniform(lo, hi) * size
    d2 = rng.uniform(lo, hi) * size
    xc = rng.uniform(0.28, 0.72) * size
    yc = rng.uniform(0.28, 0.72) * size
    return ((float(xc), float(yc)), (float(d1), float(d2)),
            float(rng.uniform(0, 180)))


def make_scene(rng: np.random.RandomState, size: int = 128,
               with_object: bool = True, n_objects: int = 1):
    """One synthetic scene. Returns dict with image/mask uint8, cls,
    ellipse (cv2 convention) for the FIRST object (back-compat), plus
    "objects": a list of {cls, ellipse, mask} for every object placed
    (multi-blob scenes, VERDICT r4 Next #4). Objects get distinct classes
    and non-overlapping ellipses."""
    img = _gradient_background(rng, size)
    objects: List[Dict] = []
    if with_object and n_objects <= 1:
        # single-object draw sequence kept EXACTLY as r3 (randint + one
        # ellipse): the committed 128^2 gate thresholds were calibrated on
        # scenes from this stream
        cls = int(rng.randint(len(COLORS)))
        ell = _random_ellipse(rng, size)
        mask = viz_lib.ellipse_mask(ell, size, size)
        color = np.asarray(COLORS[cls][1], np.float32)
        a = (mask.astype(np.float32) / 255.0)[..., None]
        img = (1 - a) * img + a * color
        objects.append({"cls": cls, "ellipse": ell, "mask": mask})
    elif with_object:
        classes = rng.permutation(len(COLORS))[:n_objects]
        # multi-object scenes draw smaller ellipses so two always fit
        lo, hi = 0.14, 0.26
        for cls in classes:
            ell = None
            for _ in range(40):  # place clear of every earlier object
                cand = _random_ellipse(rng, size, lo=lo, hi=hi)
                if all(_ellipses_clear(o["ellipse"], cand)
                       for o in objects):
                    ell = cand
                    break
            if ell is None:
                continue  # no non-overlapping spot found; fewer objects
            mask = viz_lib.ellipse_mask(ell, size, size)
            color = np.asarray(COLORS[int(cls)][1], np.float32)
            a = (mask.astype(np.float32) / 255.0)[..., None]
            img = (1 - a) * img + a * color
            objects.append({"cls": int(cls), "ellipse": ell, "mask": mask})
    first = objects[0] if objects else {
        "cls": -1, "ellipse": None, "mask": np.zeros((size, size), np.uint8)}
    return {"image": np.clip(img, 0, 255).astype(np.uint8),
            "mask": first["mask"], "cls": first["cls"],
            "ellipse": first["ellipse"], "objects": objects}


def _ellipses_clear(a, b) -> bool:
    """Conservative non-overlap check (bounding-circle distance)."""
    (x0, y0), (da, db), _ = a
    (x1, y1), (dc, dd), _ = b
    return np.hypot(x0 - x1, y0 - y1) > (max(da, db) + max(dc, dd)) / 2.0 + 2.0


def _distractor_ellipse(rng: np.random.RandomState, size: int,
                        avoid) -> Optional[tuple]:
    """A white-out region that does not overlap the object ellipse(s).
    avoid: one ellipse, a list of ellipses, or None."""
    avoid_list = ([] if avoid is None
                  else avoid if isinstance(avoid, list) else [avoid])
    for _ in range(20):
        cand = _random_ellipse(rng, size, lo=0.18, hi=0.38)
        if all(_ellipses_clear(a, cand) for a in avoid_list if a is not None):
            return cand
    return None


# ---------------------------------------------------------------------------
# training examples (mirrors train/data.py with the toy encoders)
# ---------------------------------------------------------------------------

def build_dataset(n: int, size: int = 128, seed: int = 0,
                  p_no_object: float = 0.1, p_distractor: float = 0.6,
                  p_text_drop: float = 0.1, p_two_objects: float = 0.0,
                  ctx: int = 16, dino_c: int = 16) -> Dict[str, np.ndarray]:
    """Host-side arrays for `n` examples (images in uint8; latents are encoded
    later in one batched pass — see encode_dataset).

    p_two_objects: fraction of scenes carrying TWO objects (distinct class,
    non-overlapping) — multi-blob composition training (VERDICT r4 Next #4):
    the summed score layers and per-layer appearance splat are exactly what
    the pipeline's multi-blob path feeds the BlobNet at inference. The text
    embedding names only the first object, so the second is carried purely
    by its appearance splat (the compose-UI situation)."""
    from blobctrl_tpu.blob import editor as editor_lib

    emb = class_embeddings(ctx=ctx, dino_c=dino_c)
    rng = np.random.RandomState(seed)
    lh = lw = size // 8
    out = {k: [] for k in ("image", "fg_image", "bg_image", "fg_score",
                           "bg_score", "text_embeds", "appearance")}
    # Dataset prep is host-side work: pin the per-scene splat to the CPU
    # backend so n scenes don't become n dispatches over the (possibly
    # tunneled) accelerator — measured minutes-per-scene through the axon
    # tunnel vs ~1 ms/scene on host once compiled.
    import contextlib
    import jax
    try:
        _cpu = jax.local_devices(backend="cpu")[0]
        _ctx = jax.default_device(_cpu)
    except RuntimeError:  # no cpu backend registered (unusual)
        _ctx = contextlib.nullcontext()
    with _ctx:
        return _build_dataset_scenes(n, size, rng, emb, out, lh, lw,
                                     p_no_object, p_distractor, p_text_drop,
                                     p_two_objects, dino_c, editor_lib)


def _build_dataset_scenes(n, size, rng, emb, out, lh, lw, p_no_object,
                          p_distractor, p_text_drop, p_two_objects, dino_c,
                          editor_lib):
    for _ in range(n):
        with_object = rng.rand() >= p_no_object
        # p_two_objects == 0 must not consume a draw: the r3 128^2 dataset
        # stream (and its cached npz) stays bit-identical
        n_obj = (2 if with_object and p_two_objects > 0
                 and rng.rand() < p_two_objects else 1)
        sc = make_scene(rng, size, with_object, n_objects=n_obj)
        img = sc["image"]
        if sc["objects"]:
            objs = sc["objects"]
            bg = img
            if len(objs) == 1:
                # r3 convention: the single object re-centered on the canvas
                fg_img = editor_lib.object_region_on_canvas(
                    img, objs[0]["mask"], canvas=size)
            else:
                # multi-blob: object pixels pasted in place on a white
                # canvas (a combined canvas, like the pipeline's
                # fg_vae_image for compose edits) — position is carried by
                # the score layers either way
                fg_img = np.full((size, size, 3), 255, np.uint8)
                for o in objs:
                    keep = o["mask"][..., None] > 127
                    fg_img = np.where(keep, img, fg_img)
            for o in objs:
                bg = viz_lib.composite_mask_and_image(o["mask"], bg,
                                                      (0, 0, 0))
            gs = np.asarray(blob_math.blob_scores_from_ellipses(
                [o["ellipse"] for o in objs], size, size, (lh, lw)),
                np.float32)
            # feature splat: sum of per-layer score x per-class appearance —
            # identical to the pipeline's einsum over (layer, appearance)
            app = np.stack([emb["appearance"][o["cls"]] for o in objs])
            fg_score = gs[0, ..., 1:].sum(-1, keepdims=True)
            fg_feats = np.einsum("hwm,mc->hwc", gs[0, ..., 1:], app)
            avoid = [o["ellipse"] for o in objs]
            text = emb["text"][objs[0]["cls"]]
        else:
            fg_img = np.full((size, size, 3), 255, np.uint8)
            gs = np.stack([np.ones((1, lh, lw)), np.zeros((1, lh, lw))],
                          -1).astype(np.float32)
            bg = img
            fg_score = gs[0, ..., 1:2]
            fg_feats = np.zeros((lh, lw, dino_c), np.float32)
            avoid = []
            text = np.zeros_like(emb["text"][0])
        if rng.rand() < p_distractor:
            d = _distractor_ellipse(rng, size, avoid or None)
            if d is not None:
                dmask = viz_lib.ellipse_mask(d, size, size)
                bg = viz_lib.composite_mask_and_image(dmask, bg,
                                                      (255, 255, 255))
        if rng.rand() < p_text_drop:
            text = np.zeros_like(text)
        out["image"].append(img)
        out["fg_image"].append(fg_img)
        out["bg_image"].append(bg)
        out["fg_score"].append(fg_score)
        out["bg_score"].append(gs[0, ..., 0:1])
        out["text_embeds"].append(text)
        out["appearance"].append(fg_feats)
    return {k: np.stack(v) for k, v in out.items()}


def encode_dataset(vae_params, vae_cfg, data: Dict[str, np.ndarray],
                   batch: int = 64) -> Dict[str, np.ndarray]:
    """uint8 images -> scaled latents with the (trained) toy VAE; assembles
    the exact batch dict train/train_step.py consumes."""
    import jax
    import jax.numpy as jnp
    from blobctrl_tpu.models import vae as vae_lib

    @jax.jit
    def enc(img_f32):
        return vae_lib.encode_to_scaled_latents(vae_params, vae_cfg, img_f32)

    def encode_all(imgs_u8):
        outs = []
        for i in range(0, len(imgs_u8), batch):
            x = imgs_u8[i:i + batch].astype(np.float32) / 127.5 - 1.0
            outs.append(np.asarray(enc(jnp.asarray(x)), np.float32))
        return np.concatenate(outs)

    fg_score = data["fg_score"].astype(np.float32)
    app = data["appearance"].astype(np.float32)
    # "appearance": (N, h, w, C) pre-splat per-pixel features (multi-blob
    # datasets), or (N, C) per-example class vectors (the r3 layout, still
    # accepted for cached datasets) — splat against the summed score then
    fg_feats = app if app.ndim == 4 else fg_score * app[:, None, None, :]
    return {
        "x0_latents": encode_all(data["image"]),
        "fg_latents": encode_all(data["fg_image"]),
        "bg_latents": encode_all(data["bg_image"]),
        "fg_score": fg_score,
        "bg_score": data["bg_score"].astype(np.float32),
        "fg_feats": fg_feats,
        "text_embeds": data["text_embeds"].astype(np.float32),
    }


# ---------------------------------------------------------------------------
# VAE training (plain AE + tiny KL; scaling factor measured afterwards)
# ---------------------------------------------------------------------------

def train_toy_vae(images_u8: np.ndarray, vae_cfg, steps: int = 1500,
                  batch: int = 64, lr: float = 1e-3, kl_weight: float = 1e-4,
                  seed: int = 0, log_every: int = 250):
    """MSE reconstruction + tiny KL. Returns (params, cfg-with-measured-
    scaling-factor, final_loss). The scaling factor is set to 1/std(latents)
    so unit diffusion noise matches the latent scale (the role 0.18215 plays
    for SD-1.5)."""
    import jax
    import jax.numpy as jnp
    import optax
    from blobctrl_tpu.models import vae as vae_lib

    key = jax.random.PRNGKey(seed)
    params = vae_lib.init_vae(key, vae_cfg)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    # uint8 on device (1/4 the HBM); normalize per minibatch inside the graph
    x_all = jnp.asarray(images_u8)
    n = len(images_u8)

    # remat the encoder/decoder: at 256^2 batch 64 the un-rematerialized
    # VAE backward wants ~18 GB of saved conv activations (> the 15.75 GB
    # v5e HBM, compile-time OOM); checkpointing recomputes them segment-wise
    enc_ckpt = jax.checkpoint(lambda p, x: vae_lib.encode(p, vae_cfg, x))
    dec_ckpt = jax.checkpoint(lambda p, z: vae_lib.decode(p, vae_cfg, z))

    def one_step(x_data, carry, xs):
        params, opt_state = carry
        idx, key = xs
        x = jnp.take(x_data, idx, axis=0).astype(jnp.float32) / 127.5 - 1.0

        def loss_fn(p):
            moments = enc_ckpt(p, x)
            mean, logvar = jnp.split(moments, 2, axis=-1)
            logvar = jnp.clip(logvar, -30.0, 20.0)
            z = vae_lib.sample_latents(moments, key)
            rec = dec_ckpt(p, z)
            mse = jnp.mean(jnp.square(rec - x))
            kl = 0.5 * jnp.mean(jnp.square(mean) + jnp.exp(logvar)
                                - 1.0 - logvar)
            return mse + kl_weight * kl, mse

        (_, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), mse

    # K steps per dispatch: per-step host dispatches round-trip the ~30 ms
    # tunnel (PERF_NOTES "Measurement methodology"); scan keeps the whole
    # chunk on device
    chunk = min(100, steps)

    # x_all rides as a jit ARGUMENT, not a closure: a closed-over device
    # array lowers as an HLO constant, and at 256^2 the 800 MB dataset
    # literal overflows the axon tunnel's remote-compile request body
    # (HTTP 413) — as an argument it stays device-resident across calls
    @jax.jit
    def run_chunk(params, opt_state, x_data, idxs, keys):
        (params, opt_state), mses = jax.lax.scan(
            functools.partial(one_step, x_data), (params, opt_state),
            (idxs, keys))
        return params, opt_state, mses[-1]

    rng = np.random.RandomState(seed)
    mse = None
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        idxs = jnp.asarray(rng.randint(0, n, (k, batch)), jnp.int32)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, k)
        params, opt_state, mse = run_chunk(params, opt_state, x_all, idxs,
                                           keys)
        done += k
        if log_every and done % log_every < chunk:
            print(f"vae step {done}/{steps} mse {float(mse):.5f}", flush=True)

    @jax.jit
    def latent_mean(x_u8):
        x = x_u8.astype(jnp.float32) / 127.5 - 1.0
        return vae_lib.sample_latents(vae_lib.encode(params, vae_cfg, x))

    zs = np.asarray(latent_mean(x_all[:256]))
    scaling = float(1.0 / (zs.std() + 1e-8))
    cfg = dataclasses.replace(vae_cfg, scaling_factor=scaling)
    return params, cfg, float(mse)


# ---------------------------------------------------------------------------
# diffusion training
# ---------------------------------------------------------------------------

def train_toy_diffusion(batch_data: Dict[str, np.ndarray], unet_cfg,
                        blobnet_cfg, steps: int = 8000, batch: int = 64,
                        lr: float = 3e-4, seed: int = 0,
                        log_every: int = 500):
    """Full from-scratch training: BlobNet + full UNet
    (TrainConfig.train_unet_full). Returns (unet_params, blobnet_params,
    final_loss)."""
    import jax
    import jax.numpy as jnp
    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.train import train_step as ts

    key = jax.random.PRNGKey(seed)
    k_u, k_b, key = jax.random.split(key, 3)
    cfg = ts.TrainConfig(learning_rate=lr, weight_decay=1e-3,
                         train_unet_full=True, remat=False)
    state = ts.init_train_state(cfg, blobnet_lib.init_blobnet(k_b, blobnet_cfg),
                                unet_lib.init_unet(k_u, unet_cfg))
    step_fn = ts.make_train_step(cfg, unet_cfg, blobnet_cfg)

    n = len(batch_data["x0_latents"])
    dev_data = {k: jnp.asarray(v) for k, v in batch_data.items()}

    # K steps per dispatch (see train_toy_vae): the per-step Python loop is
    # tunnel-dispatch-bound at these tiny shapes
    chunk = min(100, steps)

    @jax.jit
    def run_chunk(state, data, idxs, keys):
        def body(state, xs):
            idx, key = xs
            mb = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
            state, metrics = step_fn(state, None, mb, key)
            return state, metrics["loss"]

        return jax.lax.scan(body, state, (idxs, keys))

    rng = np.random.RandomState(seed + 1)
    loss = None
    done = 0
    while done < steps:
        k = min(chunk, steps - done)
        idxs = jnp.asarray(rng.randint(0, n, (k, batch)), jnp.int32)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, k)
        state, losses = run_chunk(state, dev_data, idxs, keys)
        done += k
        if log_every and done % log_every < chunk:
            loss = float(losses[-1])
            print(f"diff step {done}/{steps} loss {loss:.5f}", flush=True)
    if loss is None:
        loss = float(losses[-1])
    params = jax.device_get(state["params"])
    return params["unet"], params["blobnet"], loss


# ---------------------------------------------------------------------------
# checkpoint: one safetensors file + a JSON sidecar
# ---------------------------------------------------------------------------

def _unflatten(flat: Dict[str, np.ndarray]):
    nested: dict = {}
    for k, v in flat.items():
        node = nested
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def fix(node):
        if not isinstance(node, dict):
            return node
        if node and all(p.isdigit() for p in node):
            return [fix(node[str(i)]) for i in range(len(node))]
        return {k: fix(v) for k, v in node.items()}

    return fix(nested)


def save_toy(ckpt_dir: str, unet_params, blobnet_params, vae_params,
             meta: Dict):
    from safetensors.numpy import save_file
    from blobctrl_tpu.train.checkpoint import _flatten
    os.makedirs(ckpt_dir, exist_ok=True)
    sd = {}
    # fp16 storage halves the committed artifact; inference runs bf16 anyway
    for prefix, tree in (("unet", unet_params), ("blobnet", blobnet_params),
                         ("vae", vae_params)):
        for k, v in _flatten(tree, f"{prefix}.").items():
            sd[k] = np.ascontiguousarray(np.asarray(v, np.float16))
    save_file(sd, os.path.join(ckpt_dir, "toy.safetensors"))
    with open(os.path.join(ckpt_dir, "toy.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)


def load_toy(ckpt_dir: str):
    """Returns (pipeline, meta). The pipeline is the production
    BlobNetPipeline over the trained toy weights."""
    from safetensors.numpy import load_file
    from blobctrl_tpu.pipeline import BlobNetPipeline

    with open(os.path.join(ckpt_dir, "toy.json")) as f:
        meta = json.load(f)
    sd = load_file(os.path.join(ckpt_dir, "toy.safetensors"))
    trees: Dict[str, Dict[str, np.ndarray]] = {"unet": {}, "blobnet": {},
                                               "vae": {}}
    for k, v in sd.items():
        prefix, rest = k.split(".", 1)
        trees[prefix][rest] = np.asarray(v, np.float32)
    unet_cfg, blobnet_cfg, vae_cfg = toy_configs(ctx=meta["ctx"],
                                                 dino_c=meta["dino_c"],
                                                 size=meta.get("size", 128))
    vae_cfg = dataclasses.replace(vae_cfg,
                                  scaling_factor=meta["vae_scaling_factor"])
    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=_unflatten(trees["unet"]),
        blobnet_cfg=blobnet_cfg, blobnet_params=_unflatten(trees["blobnet"]),
        vae_cfg=vae_cfg, vae_params=_unflatten(trees["vae"]))
    return pipe, meta


# ---------------------------------------------------------------------------
# evaluation helpers (the quality-gate surface)
# ---------------------------------------------------------------------------

def edit_kwargs(scene: Dict, target_ellipse, size: int = 128,
                steps: int = 50, guidance: float = 4.0, seed: int = 3,
                ctx: int = 16, dino_c: int = 16) -> Dict:
    """Pipeline kwargs for 'move the object to target_ellipse' on a scene
    from make_scene — the session's conventions (start white, target black)."""
    emb = class_embeddings(ctx=ctx, dino_c=dino_c)
    img, mask, cls = scene["image"], scene["mask"], scene["cls"]
    from blobctrl_tpu.blob import editor as editor_lib
    fg_img = editor_lib.object_region_on_canvas(img, mask, canvas=size)
    bg = viz_lib.composite_mask_and_image(mask, img, (255, 255, 255))
    tmask = viz_lib.ellipse_mask(target_ellipse, size, size)
    bg = viz_lib.composite_mask_and_image(tmask, bg, (0, 0, 0))
    lh = lw = size // 8
    gs = np.asarray(blob_math.blob_score_from_ellipse(
        target_ellipse, size, size, (lh, lw)), np.float32)
    return dict(
        fg_image=fg_img, bg_image=bg, gs_score=gs, height=size, width=size,
        num_inference_steps=steps, guidance_scale=guidance, seed=seed,
        prompt_embeds=emb["text"][cls][None],
        negative_prompt_embeds=np.zeros_like(emb["text"][cls])[None],
        fg_dino_feats=emb["appearance"][cls][None])


def compose_kwargs(scene: Dict, target_ellipse, size: int = 128,
                   steps: int = 50, guidance: float = 4.0, seed: int = 3,
                   ctx: int = 16, dino_c: int = 16) -> Dict:
    """Pipeline kwargs for a 2-blob COMPOSE edit on a 2-object scene from
    make_scene(n_objects=2): move the first object to target_ellipse while
    the second stays in place — exercises the multi-blob path (summed score
    layers + per-blob appearance splat) end-to-end on trained weights."""
    emb = class_embeddings(ctx=ctx, dino_c=dino_c)
    objs = scene["objects"]
    assert len(objs) >= 2, "compose_kwargs needs a 2-object scene"
    o0, o1 = objs[0], objs[1]
    img = scene["image"]
    # combined canvas, same convention as the multi-blob training examples:
    # each object's pixels at ITS SCORE LAYER's position (training scenes
    # have score == object position, so the moved object pastes at the
    # target center)
    fg_img = np.full((size, size, 3), 255, np.uint8)
    (sx, sy), _, _ = o0["ellipse"]
    (tx, ty), _, _ = target_ellipse
    ys, xs = np.nonzero(o0["mask"] > 127)
    ny = np.clip(ys + int(round(ty - sy)), 0, size - 1)
    nx = np.clip(xs + int(round(tx - sx)), 0, size - 1)
    fg_img[ny, nx] = img[ys, xs]
    fg_img = np.where(o1["mask"][..., None] > 127, img, fg_img)
    # session conventions: white = erase (o0's vacated source), black =
    # generate (o0's target + o1's kept-in-place region)
    bg = viz_lib.composite_mask_and_image(o0["mask"], img, (255, 255, 255))
    tmask = viz_lib.ellipse_mask(target_ellipse, size, size)
    bg = viz_lib.composite_mask_and_image(tmask, bg, (0, 0, 0))
    bg = viz_lib.composite_mask_and_image(o1["mask"], bg, (0, 0, 0))
    lh = lw = size // 8
    gs = np.asarray(blob_math.blob_scores_from_ellipses(
        [target_ellipse, o1["ellipse"]], size, size, (lh, lw)), np.float32)
    feats = np.stack([emb["appearance"][o0["cls"]],
                      emb["appearance"][o1["cls"]]])
    return dict(
        fg_image=fg_img, bg_image=bg, gs_score=gs, height=size, width=size,
        num_inference_steps=steps, guidance_scale=guidance, seed=seed,
        prompt_embeds=emb["text"][o0["cls"]][None],
        negative_prompt_embeds=np.zeros_like(emb["text"][o0["cls"]])[None],
        fg_dino_feats=feats)


def remove_kwargs(scene: Dict, size: int = 128, steps: int = 50,
                  seed: int = 3, ctx: int = 16, dino_c: int = 16) -> Dict:
    """Pipeline kwargs for 'remove the object' on a scene from make_scene.
    Unlike the reference recipe (strength 0, which bypasses BlobNet —
    blobctrl_inference.py:184-185), the toy keeps BlobNet active with the
    all-bg score: the toy was trained that way (object-free examples run
    BlobNet at scale 1), so bypassing it is out-of-distribution for THIS
    model. Both recipes are supported by the pipeline."""
    img, mask = scene["image"], scene["mask"]
    bg = viz_lib.composite_mask_and_image(mask, img, (255, 255, 255))
    lh = lw = size // 8
    gs = np.stack([np.ones((1, lh, lw)), np.zeros((1, lh, lw))],
                  -1).astype(np.float32)
    return dict(
        fg_image=np.full((size, size, 3), 255, np.uint8), bg_image=bg,
        gs_score=gs, height=size, width=size, num_inference_steps=steps,
        guidance_scale=4.0, seed=seed,
        prompt_embeds=np.zeros((1, 7, ctx), np.float32),
        negative_prompt_embeds=np.zeros((1, 7, ctx), np.float32),
        fg_dino_feats=np.zeros((1, dino_c), np.float32))


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean(np.square(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32))))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def color_error_inside(image01: np.ndarray, ellipse, cls: int,
                       size: int = 128, erode_frac: float = 0.75) -> float:
    """Mean abs error (in [0,1] units) between the generated pixels inside
    the (shrunken) target ellipse and the class color — the blob-control
    check: did the object appear where the blob says?"""
    (xc, yc), (d1, d2), ang = ellipse
    inner = ((xc, yc), (d1 * erode_frac, d2 * erode_frac), ang)
    m = viz_lib.ellipse_mask(inner, size, size) > 127
    color = np.asarray(COLORS[cls][1], np.float32) / 255.0
    return float(np.abs(image01[m] - color).mean())
