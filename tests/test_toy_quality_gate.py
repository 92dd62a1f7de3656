"""Trained-model gates: the committed toy checkpoint (assets/toy_ckpt,
trained from scratch by scripts/train_toy.py with this repo's own training
stack) replays a held-out move edit through the production pipeline.

Two things the random-weight tests cannot show:
  1. the training subsystem produces a WORKING blob-controlled model
     (object appears at the target blob in the right appearance class, the
     vacated source region is inpainted to background);
  2. the opt-in fast modes stay close to the exact path on trained weights
     (smooth outputs), not just bounded under chaotic bf16 amplification.

int8-everything needs the Mosaic kernels (TPU); its trained-weights drift is
measured by scripts/toy_quality_gate.py on TPU (PERF_NOTES "Trained-toy
quality gate": int8 48.6 dB, int8+cache 47.9 dB at 50 steps).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # three 20-step denoise-graph compiles

from blobctrl_tpu.train import toy

CKPT = os.path.join(os.path.dirname(__file__), "..", "assets", "toy_ckpt")


@pytest.fixture(scope="module")
def setup():
    pipe, meta = toy.load_toy(CKPT)
    size = meta["size"]
    rng = np.random.RandomState(10_000)  # held out: training used seed 0
    scene = toy.make_scene(rng, size)
    target = toy._random_ellipse(rng, size)
    kw = toy.edit_kwargs(scene, target, size=size, steps=20)
    exact = pipe(**kw).images[0]
    return pipe, size, scene, target, kw, exact


def test_trained_blob_control(setup):
    """Move edit: right color at the target blob, with class discrimination,
    and the source region inpainted (no object left behind).
    Calibrated on CPU at 20 steps: 0.013 / 0.139 / 0.215."""
    _, size, scene, target, _, exact = setup
    err = toy.color_error_inside(exact, target, scene["cls"], size)
    assert err < 0.05, err
    wrong = min(toy.color_error_inside(exact, target, c, size)
                for c in range(len(toy.COLORS)) if c != scene["cls"])
    assert wrong > 2 * err, (err, wrong)
    src = toy.color_error_inside(exact, scene["ellipse"], scene["cls"], size)
    assert src > 0.1, src


def test_trained_remove_mode(setup):
    """Remove edit: the object's region fills with scene background (no
    object color left; inside statistics match outside). Calibrated on CPU
    at 20 steps: err 0.219, inside/outside mean gap < 0.01."""
    pipe, size, scene, _, _, _ = setup
    from blobctrl_tpu.blob import viz as viz_lib
    kw = toy.remove_kwargs(scene, size=size, steps=20)
    out = pipe(**kw).images[0]
    err = toy.color_error_inside(out, scene["ellipse"], scene["cls"], size)
    assert err > 0.1, err
    m = viz_lib.ellipse_mask(scene["ellipse"], size, size) > 127
    gap = float(np.abs(out[m].mean(0) - out[~m].mean(0)).max())
    assert gap < 0.08, gap


def test_encoder_cache_drift_trained(setup):
    """Calibrated 56.0 dB at 20 steps (TPU 50-step: 56.4 dB)."""
    pipe, size, scene, target, kw, exact = setup
    cached = pipe(encoder_cache_interval=3, encoder_cache_warmup=5,
                  **kw).images[0]
    assert toy.psnr(exact, cached) > 35.0
    err = toy.color_error_inside(cached, target, scene["cls"], size)
    assert err < 0.05, err


def test_cfg_interval_drift_trained(setup):
    """Calibrated 44.2 dB at 20 steps (TPU 50-step: 47.0 dB)."""
    pipe, size, scene, target, kw, exact = setup
    win = pipe(cfg_guidance_start=0.15, cfg_guidance_end=0.75, **kw).images[0]
    assert toy.psnr(exact, win) > 30.0
    err = toy.color_error_inside(win, target, scene["cls"], size)
    assert err < 0.05, err
