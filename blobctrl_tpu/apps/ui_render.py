"""Pixel-exact re-rendering of the reference demo's recorded UI artifacts.

Every recorded demo state (assets/results/demo/*/state/state.json) carries
weight-INDEPENDENT pixel goldens produced purely from blob math + cv2/PIL
drawing — no diffusion checkpoint involved:

  * editable_blob/editable_blob.png — the blob splat visualization with the
    tracking-point marker/arrow overlay and the current-ellipse outline.
    Rendered by the reference's tracking_points_for_blob
    (/root/reference/scripts/blobctrl_app.py:1053-1129) via
    get_blob_vis_img_from_blob_dict (:637-650) and visualize_features +
    BLOB_VIS_COLORS (/root/reference/blobctrl/utils/utils.py:244-270, :22-53).
  * edited_result_gallery/edited_result_gallery_{0,1}.png — the edited
    background (start ellipse -> white, edited ellipse -> black;
    composite_mask_and_image, blobctrl_app.py:461-477 applied at :1125-1126)
    and the anti-aliased edited-ellipse mask (:1118-1121).
  * ori_result_gallery_{0,3,4}.png — the input image with the start-ellipse
    outline (vis_gt_ellipse_from_ellipse, utils.py:449-456), the start-ellipse
    mask (get_mask_from_ellipse, blobctrl_app.py:715-720), and the
    start-ellipse-blacked input (generate_blob :918-926 / resize_start_blob
    :1327-1337). Indices 1-2 depend on the SAM mask (not recorded) — except
    for compose states, where set_init_ellipse derives them from the ellipse
    too (:1398-1421).

Every edit op in the reference app funnels its final render through
tracking_points_for_blob with exactly the (tracking_points, ellipse_lists)
tuple that state.json records, so ONE renderer reproduces the recorded pixels
for all demo states. This module is that renderer (float64 host-side math,
matching the reference's numpy/torch-f64 UI path) plus the scorer that
compares against the recorded PNGs. It is the ground-truth pixel gate that
needs no checkpoint.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from blobctrl_tpu.blob import math as blob_math
from blobctrl_tpu.blob import viz as viz_lib

# Overlay constants from the reference app (blobctrl_app.py:118-119):
# rgba_colors[-1] is the blue marker/arrow/outline color, markers[1] the
# start-point marker type (cv2.MARKER_TRIANGLE_UP).
_RGBA = (0, 0, 255, 255)
_MARKER_TYPE = 5


def _ellipse(entry) -> tuple:
    (c, axes, ang) = entry
    return ((float(c[0]), float(c[1])),
            (float(axes[0]), float(axes[1])), float(ang))


# ---------------------------------------------------------------------------
# float64 blob visualization (get_blob_vis_img_from_blob_dict equivalent)
# ---------------------------------------------------------------------------

def blob_vis_exact(ellipse, height: int, width: int,
                   palette: Optional[np.ndarray] = None) -> np.ndarray:
    """Splat one blob at full resolution and color it with the reference
    palette, in float64 end-to-end like the reference UI path
    (blobctrl_app.py:637-650 -> utils.py:80-270). Returns (H, W, 3) uint8
    via the reference's float->uint8 truncation."""
    mean, cov = blob_math.gaussian_from_ellipse(ellipse)
    nmean, ncov = blob_math.normalize_gaussian(mean, cov, width, height)

    # Mahalanobis grid exactly as utils.py:123-138: integer pixel coords
    # minus (x*W, y*H), normalized per-axis, solved against the covariance.
    fx, fy = nmean[0] * width, nmean[1] * height
    gx = np.arange(width, dtype=np.float64)
    gy = np.arange(height, dtype=np.float64)
    dxg, dyg = np.meshgrid(gx - fx, gy - fy)  # (H, W) each
    delta = np.stack([dxg.ravel() / width, dyg.ravel() / height])  # (2, H*W)
    sol = np.linalg.solve(np.asarray(ncov, np.float64), delta)
    d2 = (delta * sol).sum(0).reshape(height, width)

    with np.errstate(over="ignore"):      # exp overflow -> inf -> s == 0
        s = 1.0 / (1.0 + np.exp(d2))      # sigmoid(-d2), utils.py:162
    s = np.minimum(s * 2.0, 1.0)          # utils.py:163
    # size gate (sizes==1 here -> no-op), bg row, 2-layer alpha composite
    # (utils.py:165-181): d = [bg*(1-fg), fg]
    d_bg, d_fg = 1.0 - s, s

    pal = (palette if palette is not None else viz_lib.BLOB_VIS_COLORS)
    c0 = pal[0].astype(np.float64)
    c1 = pal[1].astype(np.float64)
    img = d_bg[..., None] * c0 + d_fg[..., None] * c1
    return (img * 255.0).astype(np.uint8)  # truncation, blobctrl_app.py:648


# ---------------------------------------------------------------------------
# tracking_points_for_blob equivalent (blobctrl_app.py:1053-1129)
# ---------------------------------------------------------------------------

def render_editable_blob(tracking_points: Sequence[Sequence[int]],
                         ellipse_lists: Sequence,
                         height: int, width: int) -> np.ndarray:
    """The 'Editable Blob' view: blob splat + start marker + move polyline/
    arrow + current-ellipse outline, exactly as the reference renders it."""
    import cv2
    from PIL import Image

    current_ellipse = _ellipse(ellipse_lists[-1][0])

    sel_pix = np.zeros((height, width, 4))
    sel_ell = np.zeros((height, width, 4))

    tp = [list(map(int, p)) for p in tracking_points]
    if tp:
        cv2.drawMarker(sel_pix, tp[0], _RGBA, markerType=_MARKER_TYPE,
                       markerSize=20, thickness=5)
    if len(tp) > 1:
        real: List[List[int]] = []
        for p in tp:
            if not real or p != real[-1]:
                real.append(p)
        for i in range(len(real) - 1):
            sp, ep = real[i], real[i + 1]
            seg = np.sqrt((ep[0] - sp[0]) ** 2 + (ep[1] - sp[1]) ** 2)
            if i == len(real) - 2:
                cv2.arrowedLine(sel_pix, tuple(sp), tuple(ep), _RGBA, 2,
                                tipLength=8 / seg)
            else:
                cv2.line(sel_pix, tuple(sp), tuple(ep), _RGBA, 2)

    # current-ellipse outline: thickness 2, lineType -1 as in the reference
    # call (blobctrl_app.py:1100)
    cv2.ellipse(sel_ell, current_ellipse, _RGBA, 2, -1)

    bg = Image.fromarray(blob_vis_exact(current_ellipse, height, width))
    img = Image.alpha_composite(bg.convert("RGBA"),
                                Image.fromarray(sel_pix.astype(np.uint8)))
    img = Image.alpha_composite(img,
                                Image.fromarray(sel_ell.astype(np.uint8)))
    return np.asarray(img.convert("RGB"))


def render_tracking_ui(original_image: np.ndarray,
                       tracking_points: Sequence[Sequence[int]],
                       ellipse_lists: Sequence,
                       height: int, width: int) -> Dict[str, np.ndarray]:
    """Render the 'Editable Blob' image and the edited-background gallery
    from a recorded (tracking_points, ellipse_lists) state. Returns uint8
    RGB arrays keyed editable_blob / edited_background / edited_mask."""
    start_ellipse = _ellipse(ellipse_lists[0][0])
    current_ellipse = _ellipse(ellipse_lists[-1][0])
    editable_blob = render_editable_blob(tracking_points, ellipse_lists,
                                         height, width)

    om = viz_lib.ellipse_mask(start_ellipse, height, width)
    em = viz_lib.ellipse_mask(current_ellipse, height, width)
    step1 = viz_lib.composite_mask_and_image(om, original_image,
                                             (255, 255, 255))
    edited_background = viz_lib.composite_mask_and_image(em, step1, (0, 0, 0))
    return {"editable_blob": editable_blob,
            "edited_background": edited_background,
            "edited_mask": em}


def render_ori_gallery(original_image: np.ndarray, ellipse,
                       height: int, width: int) -> Dict[str, np.ndarray]:
    """The ellipse-derived subset of ori_result_gallery: index 0 (green
    outline over the input), 3 (filled hard mask), 4 (mask-blacked input)."""
    import cv2
    overlay = np.ascontiguousarray(original_image.copy())
    cv2.ellipse(overlay, _ellipse(ellipse), [0, 255, 0], 3)
    mask = np.zeros((height, width))
    cv2.ellipse(mask, _ellipse(ellipse), 255, -1)
    mask = mask.astype(np.uint8)
    masked = viz_lib.composite_mask_and_image(mask, original_image, (0, 0, 0))
    return {"ellipse_overlay": overlay, "ellipse_mask": mask,
            "ellipse_masked": masked}


# ---------------------------------------------------------------------------
# Scoring vs the recorded PNGs
# ---------------------------------------------------------------------------

def webp_cache_roundtrip(img: np.ndarray) -> np.ndarray:
    """The recorded demo assets were dumped from gradio component values
    (blobctrl_app.py:826-875), which round-trip through gradio's image cache
    — lossy WEBP at the PIL-default quality 80. Applying the same hop to our
    render makes the comparison exact: the renderer's output re-encoded this
    way matches the recorded PNGs bit-for-bit (verified for all states)."""
    import io
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.asarray(img)).save(buf, "WEBP", quality=80)
    buf.seek(0)
    return np.asarray(Image.open(buf).convert("RGB"))


MAX_CACHE_HOPS = 4


def _diff_stats(ours: np.ndarray, recorded: np.ndarray) -> Dict:
    """Diff our render against a recorded PNG, modeling 1..MAX_CACHE_HOPS
    gradio cache re-encodes (how often a value bounced through a component
    depends on the session's click history, which state.json doesn't record
    — observed per-artifact hop counts are 1-4). Reports the best hop count;
    `exact` means bit-for-bit equality at that hop count."""
    a0 = np.asarray(ours)
    if a0.ndim == 2:
        a0 = np.stack([a0] * 3, axis=-1)
    b = np.asarray(recorded)
    if b.ndim == 2:
        b = np.stack([b] * 3, axis=-1)
    assert a0.shape == b.shape, (a0.shape, b.shape)
    best = None
    a = a0
    for hops in range(1, MAX_CACHE_HOPS + 1):
        a = webp_cache_roundtrip(a)
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        mse = float(np.mean((d.astype(np.float64) / 255.0) ** 2))
        psnr = float("inf") if mse == 0 else 10.0 * np.log10(1.0 / mse)
        row = {"max_abs": int(d.max()),
               "frac_diff": float((d > 0).any(-1).mean()),
               "psnr_db": psnr, "hops": hops,
               "exact": bool(d.max() == 0)}
        if best is None or row["max_abs"] < best["max_abs"]:
            best = row
        if row["exact"]:
            break
    return best


def _load_png(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"))


def _is_degenerate(ellipse) -> bool:
    (_, (d1, d2), _) = ellipse
    return max(float(d1), float(d2)) < 1e-3


def score_demo_ui(demo_dir: str) -> Dict:
    """Re-render one demo state's UI artifacts and diff them against the
    recorded PNGs. Returns {artifact_name: diff stats}."""
    with open(os.path.join(demo_dir, "state", "state.json")) as f:
        state = json.load(f)
    original = _load_png(os.path.join(demo_dir, "input_image",
                                      "input_image.png"))
    height, width = original.shape[:2]
    out = render_tracking_ui(original, state["tracking_points"],
                             state["ellipse_lists"], height, width)

    rows: Dict[str, Dict] = {}
    eb = os.path.join(demo_dir, "editable_blob", "editable_blob.png")
    if os.path.isfile(eb):
        rows["editable_blob"] = _diff_stats(out["editable_blob"],
                                            _load_png(eb))
    g0 = os.path.join(demo_dir, "edited_result_gallery",
                      "edited_result_gallery_0.png")
    if os.path.isfile(g0):
        rows["edited_background"] = _diff_stats(out["edited_background"],
                                                _load_png(g0))
    g1 = os.path.join(demo_dir, "edited_result_gallery",
                      "edited_result_gallery_1.png")
    if os.path.isfile(g1):
        rows["edited_mask"] = _diff_stats(out["edited_mask"], _load_png(g1))

    # ori_result_gallery was last rendered from either the start ellipse
    # (generate_blob :918-926, resize_start_blob :1327-1337) or — for
    # compose states whose start is the degenerate placeholder — from the
    # target ellipse (set_init_ellipse, blobctrl_app.py:1425-1436), or again
    # from the degenerate start if the user later touched the init-resize
    # sliders. The session history isn't recorded, so score against the
    # candidate that matches best.
    candidates = [_ellipse(state["ellipse_lists"][0][0])]
    if _is_degenerate(candidates[0]) and len(state["ellipse_lists"]) > 1:
        candidates.append(_ellipse(state["ellipse_lists"][1][0]))
    galleries = [render_ori_gallery(original, e, height, width)
                 for e in candidates]
    indices = [(0, "ellipse_overlay"), (3, "ellipse_mask"),
               (4, "ellipse_masked")]
    if _is_degenerate(_ellipse(state["ellipse_lists"][0][0])):
        # compose states: the whole gallery came from set_init_ellipse
        # (blobctrl_app.py:1398-1436), so indices 1-2 are ALSO ellipse-derived
        # (masked_image == index 4's composite; mask_image == index 3's mask
        # through PIL "L") — for other states they depend on the unrecorded
        # SAM mask and cannot be scored.
        indices += [(1, "ellipse_masked"), (2, "ellipse_mask")]
    for idx, key in indices:
        p = os.path.join(demo_dir, "ori_result_gallery",
                         f"ori_result_gallery_{idx}.png")
        if os.path.isfile(p):
            rec = _load_png(p)
            stats = [_diff_stats(g[key], rec) for g in galleries]
            rows[f"ori_{idx}_{key}"] = min(stats,
                                           key=lambda s: s["max_abs"])
    return rows


def score_ui_all(demo_root: str,
                 names: Optional[List[str]] = None) -> Dict[str, Dict]:
    if names is None:
        names = sorted(
            n for n in os.listdir(demo_root)
            if os.path.isfile(os.path.join(demo_root, n, "state",
                                           "state.json")))
    return {n: score_demo_ui(os.path.join(demo_root, n)) for n in names}


def print_ui_score_table(results: Dict[str, Dict]) -> Dict:
    header = (f"{'state':<18} {'artifact':<22} {'exact':>5} {'hops':>4} "
              f"{'max':>4} {'diff%':>7} {'psnr':>8}")
    print(header)
    print("-" * len(header))
    n = n_exact = 0
    for name, arts in results.items():
        for art, s in arts.items():
            print(f"{name:<18} {art:<22} "
                  f"{'yes' if s['exact'] else 'NO':>5} {s['hops']:>4} "
                  f"{s['max_abs']:>4} {100 * s['frac_diff']:>6.3f} "
                  f"{s['psnr_db']:>8.2f}")
            n += 1
            n_exact += int(s["exact"])
    summary = {"metric": "ui_golden_pixels_vs_reference",
               "artifacts_scored": n, "artifacts_bit_exact": n_exact}
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser(description=(
        "Score the weight-independent recorded UI goldens (blob viz, edited "
        "backgrounds, ellipse masks) against this framework's renderer"))
    p.add_argument("--demo_root",
                   default="/root/reference/assets/results/demo")
    p.add_argument("--name", action="append", default=None)
    args = p.parse_args()
    print_ui_score_table(score_ui_all(args.demo_root, args.name))
