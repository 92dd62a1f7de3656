"""Blob editor state machine vs reference semantics (blobctrl_app.py ops)."""

import numpy as np
import pytest

from blobctrl_tpu.blob import editor


def test_point_in_ellipse():
    e = ((100.0, 100.0), (40.0, 80.0), 0.0)
    assert editor.is_point_in_ellipse((100, 100), e)
    assert editor.is_point_in_ellipse((118, 100), e)
    assert not editor.is_point_in_ellipse((125, 100), e)
    assert editor.is_point_in_ellipse((100, 138), e)
    assert not editor.is_point_in_ellipse((100, 145), e)


def test_move_resize_rotate_and_undo():
    ed = editor.BlobEditor(height=512, width=512)
    e0 = ((256.0, 256.0), (100.0, 150.0), 10.0)
    ed.init_from_ellipse(e0)

    e1 = ed.move((20, -10))
    assert e1[0] == (276.0, 246.0) and e1[1] == e0[1]

    e2, warn = ed.resize(1.2, resize_type=0)
    assert not warn
    np.testing.assert_allclose(e2[1], (120.0, 180.0))

    e3 = ed.rotate(30)
    assert e3[2] == 40.0

    assert len(ed.entries) == 4
    ed.undo()
    assert ed.current[2] == 10.0
    ed.reset()
    assert ed.current == e0


def test_resize_too_small_is_inflated():
    ed = editor.BlobEditor(height=512, width=512)
    ed.init_from_ellipse(((256.0, 256.0), (60.0, 60.0), 0.0))
    e, warn = ed.resize(0.1, resize_type=0)
    # pi*(d1/2)*(d2/2) >= 1600 enforced (blobctrl_app.py:552 min_blob_area)
    area = np.pi * e[1][0] / 2 * e[1][1] / 2
    assert area >= 1600.0 - 1e-6
    assert warn


def test_resize_too_big_is_shrunk():
    ed = editor.BlobEditor(height=512, width=512)
    ed.init_from_ellipse(((256.0, 256.0), (400.0, 500.0), 0.0))
    e, warn = ed.resize(3.0, resize_type=0)
    verts = editor.ellipse_vertices(e) / 512.0
    assert np.all(verts >= -editor.EXCEED_THRESHOLD - 1e-6)
    assert np.all(verts <= 1 + editor.EXCEED_THRESHOLD + 1e-6)
    assert warn


def test_ellipse_from_mask_and_canvas():
    cv2 = pytest.importorskip("cv2")
    mask = np.zeros((256, 256), np.uint8)
    cv2.ellipse(mask, ((128, 120), (60, 100), 25.0), 255, -1)
    e = editor.ellipse_from_mask(mask)
    assert abs(e[0][0] - 128) < 3 and abs(e[0][1] - 120) < 3
    assert abs(e[1][0] - 60) < 6 and abs(e[1][1] - 100) < 6

    img = np.full((256, 256, 3), 128, np.uint8)
    fg = editor.object_region_on_canvas(img, mask, canvas=512)
    assert fg.shape == (512, 512, 3)
    assert (fg == 255).all(axis=-1).mean() > 0.9  # mostly white canvas


def test_compositional_init():
    ed = editor.BlobEditor(height=512, width=512)
    target = ((300.0, 200.0), (80.0, 120.0), 45.0)
    ed.init_compositional(target)
    assert ed.initial[1] == (1e-5, 1e-5)  # degenerate start
    assert ed.current == target
    assert len(ed.entries) == 2


def test_resize_start_blob_in_place():
    """resize_start mutates entries[0] (blobctrl_app.py:1280-1337) without
    appending an edit entry; the target ellipse is untouched."""
    ed = editor.BlobEditor(height=512, width=512)
    ed.init_from_ellipse(((256.0, 256.0), (100.0, 150.0), 10.0))
    ed.move((50, 0))
    e, _, warn = ed.resize_start(1.4, resize_type=0)
    assert not warn
    np.testing.assert_allclose(ed.initial[1], (140.0, 210.0))
    assert ed.entries[0][2] == editor.EDIT_INIT
    assert ed.current[0] == (306.0, 256.0)   # target untouched
    assert len(ed.entries) == 2              # no new entry appended
    # long-axis-only variant
    ed.resize_start(1.5, resize_type=1)
    np.testing.assert_allclose(ed.initial[1], (140.0, 315.0))


def test_resize_start_blob_changes_background():
    """A larger start blob whites out MORE of the edited background."""
    from blobctrl_tpu.apps.session import BlobCtrlSession
    s = BlobCtrlSession(pipeline=None)
    s.original_image = np.zeros((512, 512, 3), np.uint8)
    s.editor.init_from_ellipse(((256.0, 256.0), (100.0, 150.0), 0.0))
    s.move(120, 0)
    white0 = (s.build_edited_background() == 255).all(-1).sum()
    rm0 = (s.build_removal_background() == 255).all(-1).sum()
    s.resize_start_blob(1.5, resize_type=0)
    white1 = (s.build_edited_background() == 255).all(-1).sum()
    rm1 = (s.build_removal_background() == 255).all(-1).sum()
    assert white1 > white0 * 1.5
    assert rm1 > rm0 * 1.5


def test_resize_start_returns_applied_factor():
    """resize_start reports the factor actually applied (bounds clamping can
    reduce it); set_remove_mode must restore with the exact inverse."""
    from blobctrl_tpu.blob.editor import BlobEditor
    ed = BlobEditor(height=512, width=512)
    # blob hugging the canvas edge: a 1.2x inflation must clamp
    ed.init_from_ellipse(((500.0, 256.0), (80.0, 120.0), 0.0))
    before = ed.initial
    _, applied, _ = ed.resize_start(1.2, 0)
    assert applied <= 1.2
    ed.resize_start(1.0 / applied, 0)
    after = ed.initial
    assert abs(after[1][0] - before[1][0]) < 1e-6
    assert abs(after[1][1] - before[1][1]) < 1e-6


def test_set_remove_mode_toggle_is_lossless_near_edge():
    from blobctrl_tpu.apps.session import BlobCtrlSession

    class _NoPipe:
        pass

    s = BlobCtrlSession(_NoPipe())
    s.original_image = np.zeros((512, 512, 3), np.uint8)
    # tiny blob below the resize min-area constraint at a canvas edge: the
    # inflation clamps UP (to min area) and an inverse resize cannot shrink
    # back below it — only the snapshot restore is exact
    s.editor.init_from_ellipse(((500.0, 256.0), (12.0, 18.0), 0.0))
    before = s.editor.initial
    for _ in range(3):
        s.set_remove_mode(True)
        s.set_remove_mode(False)
    assert s.editor.initial == before
