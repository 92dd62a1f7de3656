"""Click-to-move tracking points, preview galleries, compositional add, and
remove-mode toggle — the demo UX state machine, headless
(vs /root/reference/scripts/blobctrl_app.py:1046-1461 semantics)."""

import numpy as np
import pytest

from blobctrl_tpu.apps.session import BlobCtrlSession
from blobctrl_tpu.apps.gradio_app import parse_init_ellipse, list_examples


@pytest.fixture
def sess():
    s = BlobCtrlSession(pipeline=None, size=256)
    s.original_image = np.full((256, 256, 3), 120, np.uint8)
    s.editor.init_from_ellipse(((100.0, 100.0), (60.0, 90.0), 20.0))
    return s


def test_first_click_guard_and_center_selection(sess):
    # click OUTSIDE the start ellipse -> warning, no point
    overlay, warn = sess.add_tracking_point(240, 240)
    assert warn is not None and sess.tracking_points == []
    assert overlay is not None
    # click inside -> the appended point is the start-ellipse CENTER
    overlay, warn = sess.add_tracking_point(105, 102)
    assert warn is None
    assert sess.tracking_points == [[100, 100]]
    assert sess.editor.current[0] == (100.0, 100.0)  # no move yet


def test_subsequent_clicks_move_by_delta(sess):
    sess.add_tracking_point(100, 100)
    sess.add_tracking_point(150, 120)
    assert sess.editor.current[0] == (150.0, 120.0)
    sess.add_tracking_point(160, 100)
    assert sess.editor.current[0] == (160.0, 100.0)
    assert len(sess.tracking_points) == 3
    # undo pops the point and the move
    sess.undo_tracking_point()
    assert sess.editor.current[0] == (150.0, 120.0)
    assert len(sess.tracking_points) == 2
    # reset clears everything
    sess.reset_tracking_points()
    assert sess.tracking_points == []
    assert sess.editor.current[0] == (100.0, 100.0)


def test_tracking_overlay_draws(sess):
    sess.add_tracking_point(100, 100)
    sess.add_tracking_point(170, 150)
    img = sess.tracking_overlay()
    assert img.shape == (256, 256, 3) and img.dtype == np.uint8
    base = sess.blob_visualization()
    assert np.abs(img.astype(int) - base.astype(int)).max() > 0  # overlays drawn


def test_preview_galleries(sess):
    sess.add_tracking_point(100, 100)
    sess.add_tracking_point(180, 150)
    ori = sess.ori_preview_gallery()
    assert len(ori) == 5 and all(g.shape[:2] == (256, 256) for g in ori)
    ed = sess.edited_preview_gallery()
    assert len(ed) == 2
    # edited preview = edited background (start white, target black)
    np.testing.assert_array_equal(ed[0], sess.build_edited_background())
    # start region is whited where the target does not overlap
    assert (ed[0] == 255).all(-1).sum() > 100


def test_set_init_ellipse_and_object(sess):
    target = sess.set_init_ellipse([0.5, 0.5, 0.2, 0.1, 45.0])
    assert target[0] == (128.0, 128.0)
    diag = float(np.hypot(256, 256))
    np.testing.assert_allclose(target[1], (0.2 * diag, 0.1 * diag))
    assert sess.editor.initial[1] == (1e-5, 1e-5)   # degenerate start
    assert len(sess.tracking_points) == 2           # center -> target arrow
    # object upload: non-white region recentred on a white canvas
    obj = np.full((300, 300, 3), 255, np.uint8)
    obj[100:200, 120:220] = 30
    fg = sess.set_object_image(obj)
    assert fg.shape == (256, 256, 3)
    assert (fg == 255).all(-1).mean() > 0.5         # white canvas
    assert (fg < 100).all(-1).sum() > 1000          # object present


def test_remove_mode_toggle_idempotent(sess):
    d0 = sess.editor.initial[1]
    sess.set_remove_mode(True)
    d1 = sess.editor.initial[1]
    np.testing.assert_allclose(d1, (d0[0] * 1.2, d0[1] * 1.2))
    sess.set_remove_mode(True)      # no compounding
    np.testing.assert_allclose(sess.editor.initial[1], d1)
    sess.set_remove_mode(False)     # restores
    np.testing.assert_allclose(sess.editor.initial[1], d0, rtol=1e-6)


def test_remove_mode_keeps_resize_during(sess):
    """A start-blob resize performed WHILE remove mode is on must survive
    unchecking: only the 1.2x inflation is inverted, not the user's edit."""
    d0 = sess.editor.initial[1]
    sess.set_remove_mode(True)
    sess.resize_start_blob(0.9, 0)          # user shrinks during remove mode
    # (0.9 keeps every intermediate size above MIN_BLOB_AREA, so no factor
    # clamping muddies the arithmetic below)
    d_mid = sess.editor.initial[1]
    sess.set_remove_mode(False)
    d_after = sess.editor.initial[1]
    # inflation inverted on top of the user's resize, NOT a restore of d0
    np.testing.assert_allclose(d_after, (d_mid[0] / 1.2, d_mid[1] / 1.2),
                               rtol=1e-6)
    assert not np.allclose(d_after, d0, rtol=1e-3)


def test_parse_init_ellipse():
    assert parse_init_ellipse("[0.5, 0.5, 0.2, 0.2, 180]") == [0.5, 0.5, 0.2, 0.2, 180.0]
    assert parse_init_ellipse("(0.1,0.2,0.3,0.4,5)") == [0.1, 0.2, 0.3, 0.4, 5.0]
    with pytest.raises(ValueError):
        parse_init_ellipse("[1,2,3]")
    with pytest.raises(ValueError):
        parse_init_ellipse("__import__('os')")


DEMO_ROOT = "/root/reference/assets/results/demo"


@pytest.mark.skipif(not list_examples(DEMO_ROOT), reason="no demo assets")
def test_example_states_load_with_tracking_points():
    examples = list_examples(DEMO_ROOT)
    assert len(examples) == 9
    s = BlobCtrlSession(pipeline=None, size=512)
    for name, d in examples:
        state = s.load_state(d)
        assert s.editor.entries, name
        assert s.original_image is not None, name
        overlay = s.tracking_overlay()
        assert overlay.shape == (512, 512, 3), name
        assert len(s.edited_preview_gallery()) == 2, name


def test_session_run_forwards_encoder_cache_interval():
    """The demo's 'Fast mode' checkbox: session.run must accept and forward
    encoder_cache_interval to the pipeline (regression: on_run used to raise
    TypeError because session.run had no such parameter)."""
    from blobctrl_tpu.apps.session import BlobCtrlSession

    seen = {}

    class _StubPipe:
        def __call__(self, **kw):
            seen.update(kw)

            class _Out:
                images = np.zeros((1, 64, 64, 3), np.float32)
            return _Out()

    s = BlobCtrlSession(_StubPipe(), size=64)
    s.original_image = np.zeros((64, 64, 3), np.uint8)
    s.fg_image = np.zeros((64, 64, 3), np.uint8)
    s.editor.init_from_ellipse(((32.0, 32.0), (20.0, 28.0), 0.0))
    s.run("a thing", num_inference_steps=2, encoder_cache_interval=3)
    assert seen.get("encoder_cache_interval") == 3


def test_save_load_state_roundtrip_remove_flag(tmp_path):
    """save_state writes the reference schema key (remove_blob_box) and
    load_state reads it back, marking the inflation as already applied."""
    from blobctrl_tpu.apps.session import BlobCtrlSession

    class _NoPipe:
        pass

    s = BlobCtrlSession(_NoPipe(), size=64)
    s.original_image = np.zeros((64, 64, 3), np.uint8)
    s.fg_image = np.zeros((64, 64, 3), np.uint8)
    s.editor.init_from_ellipse(((32.0, 32.0), (20.0, 28.0), 0.0))
    s.tracking_points = [[32, 32], [40, 36]]
    s.set_remove_mode(True)
    out = s.save_state(str(tmp_path / "st"), prompt="p", remove=True)

    s2 = BlobCtrlSession(_NoPipe(), size=64)
    state = s2.load_state(out)
    assert state["remove_blob_box"] is True
    assert s2._remove_inflated is True          # no re-inflation on replay
    assert state["tracking_points"] == [[32, 32], [40, 36]]
    e0 = state["ellipse_lists"][0][0]
    cx, cy = e0[0]
    # saved start ellipse reflects the remove-mode inflation (>= 1.2x; the
    # min-area constraint can raise the factor further on a tiny blob):
    # center preserved, both axes strictly inflated, aspect ratio kept
    assert (cx, cy) == (32.0, 32.0)
    assert e0[1][0] >= 20.0 * 1.2 - 1e-6
    assert e0[1][1] >= 28.0 * 1.2 - 1e-6
    assert e0[1][1] / e0[1][0] == pytest.approx(28.0 / 20.0)
