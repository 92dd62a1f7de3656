"""Recorded-golden PIXEL tests: the reference demo states' weight-independent
artifacts (blob visualization, edited backgrounds, ellipse masks/overlays)
must match the recorded PNGs BIT-FOR-BIT.

The recorded assets were dumped from gradio component values
(blobctrl_app.py:826-875), each of which passed through gradio's image cache
(lossy WEBP, PIL-default quality 80) one or more times depending on the
session's click history. Our renders, re-encoded through 1-3 such hops,
reproduce the recorded files exactly — pixel ground truth with no checkpoint
involved.

Known stale fixtures (recorded pixels provably inconsistent with their own
state.json, i.e. NOT reproducible by the reference app either):
  * move_cup — tracking delta (-1,119) != ellipse delta (-4,121), and the
    start ellipse visible in the recorded edited_result_gallery_0 white
    region fits axes ~(82.8, 111.0) vs the state's (83.4, 115.8).
  * enlarge_deer / shrink_dragon ori_result_gallery — the recorded masks fit
    axes (188.7, 327.8) / (207.0, 357.5) vs the states' (196.2, 341.1) /
    (206.4, 377.8): rendered from an earlier SAM fit, then superseded.
These are excluded from the bit-exact gate (with consistency checks pinning
the evidence) and held to structural thresholds instead.
"""

import json
import os

import numpy as np
import pytest

from blobctrl_tpu.apps import ui_render

DEMO_ROOT = "/root/reference/assets/results/demo"

pytestmark = pytest.mark.skipif(not os.path.isdir(DEMO_ROOT),
                                reason="no reference demo assets")

# editable_blob + edited_result_gallery are state-consistent (and verified
# bit-exact) for every recorded state except move_cup.
EXACT_STATES = ["compose_cake", "compose_rabbit", "enlarge_deer", "move_hat",
                "remove_cow", "remove_shit", "replace_knife",
                "resize_teddy_bear", "shrink_dragon"]
# states whose ori_result_gallery is also state-consistent
ORI_EXACT_STATES = ["compose_cake", "compose_rabbit", "move_hat",
                    "remove_cow", "remove_shit", "replace_knife",
                    "resize_teddy_bear"]

EDIT_KEYS = ["editable_blob", "edited_background", "edited_mask"]
ORI_KEYS = ["ori_0_ellipse_overlay", "ori_3_ellipse_mask",
            "ori_4_ellipse_masked"]


@pytest.fixture(scope="module")
def scores():
    return ui_render.score_ui_all(DEMO_ROOT)


@pytest.mark.parametrize("name", EXACT_STATES)
def test_edit_artifacts_bit_exact(scores, name):
    """Blob viz + edited background + edited mask == recorded pixels,
    bit-for-bit (modulo the known webp cache hops)."""
    for key in EDIT_KEYS:
        s = scores[name][key]
        assert s["exact"], (name, key, s)
        assert s["hops"] <= ui_render.MAX_CACHE_HOPS


@pytest.mark.parametrize("name", ORI_EXACT_STATES)
def test_ori_gallery_bit_exact(scores, name):
    keys = list(ORI_KEYS)
    if name.startswith("compose_"):
        # compose states: set_init_ellipse derives the WHOLE gallery from
        # the ellipse (blobctrl_app.py:1398-1436), so the SAM-dependent
        # indices 1-2 are scoreable (and exact) there too
        keys += ["ori_1_ellipse_masked", "ori_2_ellipse_mask"]
    for key in keys:
        s = scores[name][key]
        assert s["exact"], (name, key, s)


def test_total_exact_count(scores):
    """52 of the 64 recorded UI artifacts are reproduced bit-exactly; the
    other 12 are the documented stale fixtures."""
    n = sum(int(s["exact"]) for arts in scores.values()
            for s in arts.values())
    assert n >= 52, n


def test_move_cup_fixture_is_stale_and_structurally_close(scores):
    """Pin the evidence that move_cup's recorded pixels don't come from its
    recorded state (so if upstream ever fixes the fixture, this fails and
    move_cup moves into the exact gate), with a sharp structural bound:
    ellipse-fit both masks and show the recorded mask's center sits on the
    final TRACKING POINT (< 1.5 px) rather than on state.json's final
    ellipse center (> 2 px away), while our render sits on the state's
    ellipse center to < 0.5 px with the same axes to < 1.5 px — i.e. the
    renderer is faithful to the state and the fixture is a displaced
    recording of an earlier state, not a different blob."""
    cv2 = pytest.importorskip("cv2")
    with open(os.path.join(DEMO_ROOT, "move_cup", "state",
                           "state.json")) as f:
        state = json.load(f)
    tp = state["tracking_points"]
    e = state["ellipse_lists"]
    tp_delta = (tp[1][0] - tp[0][0], tp[1][1] - tp[0][1])
    ell_delta = (e[1][0][0][0] - e[0][0][0][0],
                 e[1][0][0][1] - e[0][0][0][1])
    assert tuple(map(round, ell_delta)) != tp_delta, (
        "move_cup state.json became self-consistent — re-evaluate the "
        "exact-gate exclusion")

    orig = ui_render._load_png(os.path.join(DEMO_ROOT, "move_cup",
                                            "input_image",
                                            "input_image.png"))
    out = ui_render.render_tracking_ui(orig, tp, e, 512, 512)
    rec = ui_render._load_png(os.path.join(
        DEMO_ROOT, "move_cup", "edited_result_gallery",
        "edited_result_gallery_1.png"))[..., 0]

    def fit(mask):
        cnts, _ = cv2.findContours(mask.astype(np.uint8), cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
        return cv2.fitEllipse(max(cnts, key=cv2.contourArea))

    ours_fit = fit(out["edited_mask"] > 127)
    rec_fit = fit(rec > 127)
    state_center = np.asarray(e[1][0][0])   # final ellipse center
    final_tp = np.asarray(tp[1], float)     # final tracking point

    # our render is faithful to the recorded state
    assert np.linalg.norm(np.asarray(ours_fit[0]) - state_center) < 0.5, \
        (ours_fit[0], state_center)
    # the recorded mask is NOT (the staleness proof, > 2 px off the state)
    rec_vs_state = np.linalg.norm(np.asarray(rec_fit[0]) - state_center)
    assert rec_vs_state > 2.0, (
        "recorded mask now matches state.json's ellipse — move move_cup "
        f"into the exact gate (center distance {rec_vs_state:.2f} px)")
    # ... because it encodes the final tracking point instead
    assert np.linalg.norm(np.asarray(rec_fit[0]) - final_tp) < 1.5, \
        (rec_fit[0], final_tp)
    # same blob geometry either way: axes agree to < 1.5 px
    assert np.all(np.abs(np.asarray(rec_fit[1])
                         - np.asarray(ours_fit[1])) < 1.5), \
        (rec_fit[1], ours_fit[1])


def test_stale_ori_fixtures_detectably_inconsistent():
    """enlarge_deer / shrink_dragon recorded ori masks encode a different
    ellipse than state.json's init entry (> 5 px long-axis difference):
    the exclusion is evidence-based, not tolerance-laundering."""
    cv2 = pytest.importorskip("cv2")
    for name in ("enlarge_deer", "shrink_dragon"):
        with open(os.path.join(DEMO_ROOT, name, "state", "state.json")) as f:
            state = json.load(f)
        rec = ui_render._load_png(os.path.join(
            DEMO_ROOT, name, "ori_result_gallery",
            "ori_result_gallery_3.png"))[..., 0]
        cnts, _ = cv2.findContours((rec > 127).astype(np.uint8),
                                   cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
        fit = cv2.fitEllipse(max(cnts, key=cv2.contourArea))
        state_axes = state["ellipse_lists"][0][0][1]
        assert abs(fit[1][1] - state_axes[1]) > 5.0, (name, fit, state_axes)


def test_webp_hop_is_required_not_a_fudge():
    """The cache-hop model isn't hiding renderer error: WITHOUT the webp hop
    the diff is broad (the recorded file really is a lossy re-encode), and
    WITH it the match is exact — for a state whose raw diff is large."""
    demo = os.path.join(DEMO_ROOT, "move_hat")
    with open(os.path.join(demo, "state", "state.json")) as f:
        state = json.load(f)
    orig = ui_render._load_png(os.path.join(demo, "input_image",
                                            "input_image.png"))
    out = ui_render.render_tracking_ui(orig, state["tracking_points"],
                                       state["ellipse_lists"], 512, 512)
    rec = ui_render._load_png(os.path.join(demo, "editable_blob",
                                           "editable_blob.png"))
    raw = np.abs(out["editable_blob"].astype(int) - rec.astype(int))
    assert raw.max() > 50  # lossy hop really present in the recording
    hop = ui_render.webp_cache_roundtrip(out["editable_blob"])
    assert (hop == rec).all()
