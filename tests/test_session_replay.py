"""Session + golden-state replay through tiny random-weight pipelines (full
path validation without the published checkpoints)."""

import os

import numpy as np
import pytest as _pytest_mod

pytestmark = _pytest_mod.mark.slow  # ten 512^2 pipeline compiles
import pytest

import jax
import jax.numpy as jnp

from blobctrl_tpu.apps import replay as replay_lib
from blobctrl_tpu.apps import session as session_lib
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.apps import flagship
from blobctrl_tpu.pipeline import BlobNetPipeline

DEMO_ROOT = "/root/reference/assets/results/demo"


@pytest.fixture(scope="module")
def tiny_pipeline():
    from blobctrl_tpu.models import dinov2 as dino_lib
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    dino_cfg = dino_lib.DINOv2Config(hidden_size=16, num_layers=2, num_heads=2,
                                     intermediate_size=32, patch_size=14,
                                     image_size=28)
    return BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg),
        dino_cfg=dino_cfg, dino_params=dino_lib.init(key, dino_cfg),
        dino_image_size=28)


def fake_prompt_encoder(pipe):
    """Bypass CLIP (no tiny clip in this fixture): fixed prompt embeds."""
    rng = np.random.RandomState(0)
    pe = rng.randn(1, 7, 16).astype(np.float32)

    def encode(prompt, negative_prompt, nipp, do_cfg, clip_skip=None,
               prompt_embeds=None, negative_prompt_embeds=None):
        n = len(prompt) if isinstance(prompt, list) else 1
        e = jnp.asarray(np.tile(pe, (n * nipp, 1, 1)))
        return jnp.concatenate([e, e], axis=0) if do_cfg else e

    pipe.encode_prompt = encode
    return pipe


def test_session_full_edit_flow(tiny_pipeline):
    cv2 = pytest.importorskip("cv2")
    pipe = fake_prompt_encoder(tiny_pipeline)
    sess = session_lib.BlobCtrlSession(pipe, sam_predictor=None, size=64)

    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
    out = sess.set_image(img)
    assert out.shape == (64, 64, 3)

    mask = np.zeros((64, 64), np.uint8)
    cv2.ellipse(mask, ((30, 30), (20, 30), 15.0), 255, -1)
    sess.set_mask(mask)
    ellipse = sess.generate_blob()
    assert sess.fg_image.shape == (64, 64, 3)

    sess.move(10, 5)
    sess.resize(1.2)
    sess.rotate(20)
    viz = sess.blob_visualization()
    assert viz.shape == (64, 64, 3)

    res = sess.run("a tiny test", num_samples=1, num_inference_steps=2,
                   fg_image=sess.fg_image)
    assert res.images.shape == (1, 64, 64, 3)
    assert np.isfinite(res.images).all()

    # remove mode
    res2 = sess.run("a tiny test", num_samples=1, num_inference_steps=2,
                    remove=True)
    assert res2.images.shape == (1, 64, 64, 3)


@pytest.mark.skipif(not os.path.isdir(DEMO_ROOT), reason="no demo assets")
def test_replay_golden_state_path(tiny_pipeline):
    """Replays move_hat (tiny weights, 2 steps) — validates state parsing,
    blob score construction, and the full pipeline path; PSNR parity needs
    the real checkpoints."""
    pipe = fake_prompt_encoder(tiny_pipeline)
    demo = os.path.join(DEMO_ROOT, "move_hat")
    images, state, final_ellipse = replay_lib.replay(
        pipe, demo, num_inference_steps=2, num_samples=1)
    assert images.shape == (1, 512, 512, 3)
    assert np.isfinite(images).all()
    assert state["seed"] == 1248464818

    _, _, _, expected = replay_lib.load_images(demo)
    if expected:
        start = replay_lib._ellipse_from_state(state["ellipse_lists"][0][0])
        psnr = replay_lib.outside_mask_psnr(images[0], expected[0],
                                            [start, final_ellipse])
        assert np.isfinite(psnr)  # real parity threshold needs checkpoints


@pytest.mark.skipif(not os.path.isdir(DEMO_ROOT), reason="no demo assets")
def test_score_all_one_command(tiny_pipeline, capsys):
    """The checkpoint-day one-command scorer: replays states, scores PSNR vs
    the RECORDED results_gallery pixels, prints the table + JSON summary.
    With tiny random weights the PSNR is low — assert it is computed, finite,
    and actually driven by the recorded pixels."""
    pipe = fake_prompt_encoder(tiny_pipeline)
    rows = replay_lib.score_all(pipe, DEMO_ROOT, names=["move_hat"],
                                num_inference_steps=1, num_samples=1)
    assert len(rows) == 1
    r = rows[0]
    assert r["name"] == "move_hat" and r["num_scored"] >= 1
    assert r["psnr_db"] is not None and np.isfinite(r["psnr_db"])
    assert all(np.isfinite(p) for p in r["per_sample"])

    # the metric uses the recorded pixels: identical inputs -> inf PSNR,
    # and the recorded golden differs from our random-weight output
    _, _, _, expected = replay_lib.load_images(os.path.join(DEMO_ROOT,
                                                            "move_hat"))
    state = replay_lib.load_state(os.path.join(DEMO_ROOT, "move_hat"))
    ellipses = [replay_lib._ellipse_from_state(e[0])
                for e in state["ellipse_lists"]]
    self_psnr = replay_lib.outside_mask_psnr(
        expected[0] / 255.0, expected[0], ellipses)
    assert self_psnr == float("inf")
    assert r["psnr_db"] < 40.0  # random weights are far from the golden

    summary = replay_lib.print_score_table(rows)
    out = capsys.readouterr().out
    assert "move_hat" in out and "outside-mask PSNR" in out
    assert summary["states_scored"] == 1
    assert summary["mean_psnr_db"] == pytest.approx(r["psnr_db"])


@pytest.mark.skipif(not os.path.isdir(DEMO_ROOT), reason="no demo assets")
def test_replay_remove_mode(tiny_pipeline):
    pipe = fake_prompt_encoder(tiny_pipeline)
    demo = os.path.join(DEMO_ROOT, "remove_cow")
    images, state, _ = replay_lib.replay(pipe, demo, num_inference_steps=2,
                                         num_samples=1)
    assert state["remove_blob_box"] is True
    assert images.shape == (1, 512, 512, 3)


def test_session_state_roundtrip(tiny_pipeline, tmp_path):
    """save_state emits the reference demo-state schema; load_state restores
    it and the replay harness consumes it."""
    cv2 = pytest.importorskip("cv2")
    pipe = fake_prompt_encoder(tiny_pipeline)
    sess = session_lib.BlobCtrlSession(pipe, size=64)
    rng = np.random.RandomState(2)
    sess.set_image(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8))
    mask = np.zeros((64, 64), np.uint8)
    cv2.ellipse(mask, ((30, 30), (20, 30), 15.0), 255, -1)
    sess.set_mask(mask)
    sess.generate_blob()
    sess.move(8, -4)
    sess.rotate(15)

    out_dir = str(tmp_path / "demo_state")
    sess.save_state(out_dir, prompt="a test scene", num_samples=1,
                    num_inference_steps=2)

    # reload into a fresh session
    sess2 = session_lib.BlobCtrlSession(pipe, size=64)
    state = sess2.load_state(out_dir)
    assert state["scene_prompt"] == "a test scene"
    assert len(sess2.editor.entries) == 3
    assert sess2.editor.current == sess.editor.current

    # the replay harness can consume the saved directory
    images, state2, _ = replay_lib.replay(pipe, out_dir, num_inference_steps=2,
                                          num_samples=1)
    assert images.shape == (1, 64, 64, 3)


def test_session_multi_blob(tiny_pipeline):
    cv2 = pytest.importorskip("cv2")
    pipe = fake_prompt_encoder(tiny_pipeline)  # per-blob DINOv2 still real
    sess = session_lib.BlobCtrlSession(pipe, size=64)
    rng = np.random.RandomState(5)
    sess.set_image(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8))
    obj1 = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    obj2 = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
    res = sess.run_multi(
        "two things", num_inference_steps=2,
        blobs=[(((20.0, 20.0), (16.0, 24.0), 10.0), obj1),
               (((44.0, 40.0), (14.0, 20.0), 80.0), obj2)],
        guidance_scale=7.5)
    assert res.images.shape == (1, 64, 64, 3)
    assert np.isfinite(res.images).all()
    assert len(res.images_with_ellipse) == 1


ALL_DEMOS = sorted(os.listdir(DEMO_ROOT)) if os.path.isdir(DEMO_ROOT) else []


@pytest.mark.skipif(not ALL_DEMOS, reason="no demo assets")
@pytest.mark.parametrize("demo", ALL_DEMOS)
def test_replay_all_nine_golden_states(tiny_pipeline, demo):
    """Every shipped demo state parses and runs end-to-end (1 step, tiny
    weights) — the full-fidelity PSNR comparison additionally needs the
    published checkpoints."""
    pipe = fake_prompt_encoder(tiny_pipeline)
    images, state, ellipse = replay_lib.replay(
        pipe, os.path.join(DEMO_ROOT, demo), num_inference_steps=1,
        num_samples=1)
    assert images.shape == (1, 512, 512, 3)
    assert np.isfinite(images).all()
    assert ellipse[1][0] > 0
