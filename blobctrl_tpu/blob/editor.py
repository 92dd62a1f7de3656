"""Blob edit-op state machine, decoupled from any UI.

Reimplements the reference demo's multi-round editing semantics
(/root/reference/scripts/blobctrl_app.py): the edit state is a list of
(ellipse, (resize_ar, resize_long, resize_short, rotation), edit_type)
tuples (blobctrl_app.py:931-933) with edit_type in
{0: init, 1: move, 2: resize-AR, 3: resize-long-axis, 4: resize-short-axis,
 5: rotate}. Every op appends a new entry; undo pops; reset truncates to the
initial entry.

Ellipses are cv2-style: ((xc, yc), (d1, d2), angle_deg).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Tuple

import numpy as np

Ellipse = Tuple[Tuple[float, float], Tuple[float, float], float]

EDIT_INIT = 0
EDIT_MOVE = 1
EDIT_RESIZE_AR = 2
EDIT_RESIZE_LONG = 3
EDIT_RESIZE_SHORT = 4
EDIT_ROTATE = 5

MIN_BLOB_AREA = 1600.0
EXCEED_THRESHOLD = 0.4


def is_point_in_ellipse(point: Tuple[float, float], ellipse: Ellipse) -> bool:
    """blobctrl_app.py:479-499 semantics."""
    (xc, yc), (d1, d2), angle = ellipse
    theta = math.radians(angle)
    x, y = point[0] - xc, point[1] - yc
    xr = x * math.cos(theta) - y * math.sin(theta)
    yr = x * math.sin(theta) + y * math.cos(theta)
    return (xr * xr) / ((d1 / 2) ** 2) + (yr * yr) / ((d2 / 2) ** 2) <= 1.0


def ellipse_vertices(ellipse: Ellipse) -> np.ndarray:
    """The four axis endpoints of the ellipse (blobctrl_app.py:502-532)."""
    (xc, yc), (d1, d2), angle = ellipse
    rad = math.radians(angle)
    rot = np.array([[math.cos(rad), -math.sin(rad)],
                    [math.sin(rad), math.cos(rad)]])
    v = np.array([[d1 / 2, 0], [-d1 / 2, 0], [0, d2 / 2], [0, -d2 / 2]])
    return v @ rot.T + np.array([xc, yc])


def move_ellipse(ellipse: Ellipse, delta: Tuple[float, float]) -> Ellipse:
    (xc, yc), axes, angle = ellipse
    return ((xc + delta[0], yc + delta[1]), axes, angle)


def resize_ellipse(ellipse: Ellipse, factor: float, height: int, width: int,
                   resize_type: int = 0) -> Tuple[Ellipse, float, List[str]]:
    """Area/bounds-constrained resize (blobctrl_app.py:546-592).
    resize_type: 0 = both axes (AR-preserving), 1 = long axis (d2),
    2 = short axis (d1). Returns (ellipse, adjusted_factor, warnings)."""
    (xc, yc), (d1, d2), angle = ellipse
    warnings: List[str] = []
    too_big = too_small = False
    # the bounds and min-area constraints can conflict (tiny blob at a canvas
    # corner): the reference's +/-0.1 loop then ping-pongs forever — bound it
    for _ in range(100):
        if resize_type == 0:
            rd1, rd2 = d1 * factor, d2 * factor
        elif resize_type == 1:
            rd1, rd2 = d1, d2 * factor
        else:
            rd1, rd2 = d1 * factor, d2
        resized = ((xc, yc), (rd1, rd2), angle)
        if factor == 1:
            break
        verts = ellipse_vertices(resized) / np.array([width, height])
        if np.all(verts >= -EXCEED_THRESHOLD) and np.all(verts <= 1 + EXCEED_THRESHOLD):
            area = math.pi * (rd1 / 2) * (rd2 / 2)
            if area >= MIN_BLOB_AREA:
                break
            too_small = True
            factor += 0.1
            if area < 1e-6:
                break
        else:
            too_big = True
            factor -= 0.1
    else:
        warnings.append("resize constraints conflict (blob pinned near the "
                        "canvas edge); keeping the last attempted size")
    if too_big:
        warnings.append(f"blob too big; factor reduced to {factor:.2f} "
                        f"(allowed overshoot {EXCEED_THRESHOLD})")
    if too_small:
        warnings.append(f"blob too small; factor raised to {factor:.2f} "
                        f"(min area {MIN_BLOB_AREA:.0f} px)")
    return resized, factor, warnings


def rotate_ellipse(ellipse: Ellipse, degrees: float) -> Ellipse:
    (xc, yc), axes, angle = ellipse
    return ((xc, yc), axes, (angle + degrees) % 180.0)


def ellipse_from_mask(mask: np.ndarray) -> Ellipse:
    """Binary mask -> fitted ellipse via convex hull
    (blobctrl_app.py:382-389). Requires cv2."""
    import cv2
    mask_u8 = (np.asarray(mask) > 0).astype(np.uint8)
    contours, _ = cv2.findContours(mask_u8, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        raise ValueError("mask has no foreground")
    hull = cv2.convexHull(np.concatenate(contours, axis=0))
    if len(hull) < 5:
        raise ValueError("mask region too small to fit an ellipse")
    return cv2.fitEllipse(hull)


def object_region_on_canvas(image: np.ndarray, mask: np.ndarray,
                            canvas: int = 512) -> np.ndarray:
    """Crop the masked object, re-center it on a white canvas^2 background —
    this becomes the pipeline's fg_image (blobctrl_app.py:661-688)."""
    img = np.asarray(image)
    m = np.asarray(mask) > 0
    ys, xs = np.nonzero(m)
    if len(ys) == 0:
        raise ValueError("empty mask")
    y0, y1, x0, x1 = ys.min(), ys.max() + 1, xs.min(), xs.max() + 1
    crop = np.where(m[y0:y1, x0:x1, None], img[y0:y1, x0:x1], 255)
    h, w = crop.shape[:2]
    scale = min(1.0, canvas / max(h, w))
    if scale < 1.0:
        from PIL import Image
        crop = np.asarray(Image.fromarray(crop.astype(np.uint8)).resize(
            (max(1, int(w * scale)), max(1, int(h * scale)))))
        h, w = crop.shape[:2]
    out = np.full((canvas, canvas, 3), 255, np.uint8)
    top, left = (canvas - h) // 2, (canvas - w) // 2
    out[top:top + h, left:left + w] = crop
    return out


@dataclasses.dataclass
class BlobEditor:
    """Multi-round edit session over one blob."""
    height: int
    width: int
    entries: List[Tuple[Ellipse, Tuple[float, float, float, float], int]] = \
        dataclasses.field(default_factory=list)

    @property
    def current(self) -> Ellipse:
        return self.entries[-1][0]

    @property
    def initial(self) -> Ellipse:
        return self.entries[0][0]

    def init_from_mask(self, mask: np.ndarray, inflate: float = 1.05):
        ellipse = ellipse_from_mask(mask)
        ellipse, _, _ = resize_ellipse(ellipse, inflate, self.height, self.width, 0)
        self.entries = [(ellipse, (1.0, 1.0, 1.0, 0.0), EDIT_INIT)]
        return ellipse

    def init_from_ellipse(self, ellipse: Ellipse):
        self.entries = [(ellipse, (1.0, 1.0, 1.0, 0.0), EDIT_INIT)]
        return ellipse

    def init_compositional(self, target: Ellipse):
        """Compositional add (blobctrl_app.py:1384-1437): a degenerate start
        ellipse plus the user-specified target."""
        (xc, yc), _, angle = target
        degenerate = ((xc, yc), (1e-5, 1e-5), angle)
        self.entries = [(degenerate, (1.0, 1.0, 1.0, 0.0), EDIT_INIT),
                        (target, (1.0, 1.0, 1.0, 0.0), EDIT_MOVE)]
        return target

    def _params(self) -> Tuple[float, float, float, float]:
        return self.entries[-1][1]

    def move(self, delta: Tuple[float, float]) -> Ellipse:
        e = move_ellipse(self.current, delta)
        self.entries.append((e, self._params(), EDIT_MOVE))
        return e

    def resize(self, factor: float, resize_type: int = 0) -> Tuple[Ellipse, List[str]]:
        e, f, warn = resize_ellipse(self.current, factor, self.height,
                                    self.width, resize_type)
        ar, lg, sh, rot = self._params()
        if resize_type == 0:
            ar = f
        elif resize_type == 1:
            lg = f
        else:
            sh = f
        etype = {0: EDIT_RESIZE_AR, 1: EDIT_RESIZE_LONG, 2: EDIT_RESIZE_SHORT}[resize_type]
        self.entries.append((e, (ar, lg, sh, rot), etype))
        return e, warn

    def resize_start(self, factor: float, resize_type: int = 0
                     ) -> Tuple[Ellipse, float, List[str]]:
        """Resize the START ellipse (entries[0]) in place — this changes the
        white-out source region of the edited background, not the target
        (blobctrl_app.py:1280-1337: ellipse_lists[0] = (edited, params, 0)).
        Returns (ellipse, applied_factor, warnings) — the applied factor can
        be smaller than requested when the bounds/area constraints clamp it
        (callers that need an exact inverse restore must use it)."""
        e0, params0, _ = self.entries[0]
        e, applied, warn = resize_ellipse(e0, factor, self.height, self.width,
                                          resize_type)
        self.entries[0] = (e, params0, EDIT_INIT)
        return e, applied, warn

    def rotate(self, degrees: float) -> Ellipse:
        e = rotate_ellipse(self.current, degrees)
        ar, lg, sh, _ = self._params()
        self.entries.append((e, (ar, lg, sh, degrees), EDIT_ROTATE))
        return e

    def undo(self) -> Ellipse:
        if len(self.entries) > 1:
            self.entries.pop()
        return self.current

    def reset(self) -> Ellipse:
        self.entries = self.entries[:1]
        return self.current
