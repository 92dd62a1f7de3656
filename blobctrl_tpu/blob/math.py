"""Blob math: ellipse <-> Gaussian conversion, Gaussian splatting to score
maps, depth-ordered alpha compositing, and feature splatting.

Behavioral reference (numerics validated by tests, code not copied):
  /root/reference/blobctrl/utils/utils.py:57-341 and
  /root/reference/scripts/blobctrl_inference.py:23-117.

Conventions:
  * ellipses are cv2-style: ((xc, yc), (d1, d2), angle_deg) with d1<=d2 the
    full axis lengths and angle_deg the clockwise angle of the short axis.
  * normalized Gaussians: mean in [0,1]^2 (divided by (W,H)), covariance
    divided by diag(W,H) diagonal length squared.
  * score maps are channels-last (N, H, W, M); index 0 after compositing is
    the background layer.

The splat itself is closed-form (2x2 matrix inverse, sigmoid, suffix-product
compositing) and fully vectorized over batch and blobs — unlike the reference,
which only supports batch=1, M=1 for non-square score grids
(utils.py:133-134; SURVEY.md §5 quirk 5). A Pallas TPU kernel for large score
grids lives in blobctrl_tpu.ops.blob_splat; this module is the jittable
reference implementation used on all backends.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


# ---------------------------------------------------------------------------
# Ellipse <-> Gaussian (host-side numpy; runs once per edit)
# ---------------------------------------------------------------------------

def rotation_matrix(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, s], [-s, c]])


def ellipse_to_gaussian(x: float, y: float, a: float, b: float,
                        theta: float) -> Tuple[np.ndarray, np.ndarray]:
    """(center, semi-minor a, semi-major b, ccw major-axis angle theta) ->
    (mean(2,), cov(2,2)). The off-diagonal sign flip matches the reference's
    image-coordinate convention (y down)."""
    mean = np.array([x, y], dtype=np.float64)
    cov = np.array([[b * b, 0.0], [0.0, a * a]])
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s], [s, c]])
    cov = rot @ cov @ rot.T
    cov[0, 1] *= -1.0
    cov[1, 0] *= -1.0
    return mean, cov


def gaussian_to_ellipse(mean: np.ndarray, cov: np.ndarray
                        ) -> Tuple[float, float, float, float, float]:
    """Inverse of ellipse_to_gaussian: returns (x, y, a, b, angle_deg) where
    angle_deg is the clockwise angle of the SHORT axis in [0, 180)."""
    x, y = float(mean[0]), float(mean[1])
    # eigh (on the symmetrized matrix) guarantees real eigenpairs; eig can
    # return complex-typed results on near-degenerate covariances
    cov = np.asarray(cov, dtype=np.float64)
    eigenvalues, eigenvectors = np.linalg.eigh((cov + cov.T) / 2.0)
    eigenvalues = np.maximum(eigenvalues, 0.0)
    b = float(np.sqrt(np.max(eigenvalues)))
    a = float(np.sqrt(np.min(eigenvalues)))
    min_vec = eigenvectors[:, int(np.argmin(eigenvalues))]
    angle = math.degrees(math.atan2(min_vec[1], min_vec[0]))
    if angle < 0:
        angle += 180.0
    return x, y, a, b, angle


def short_axis_angle_to_major_theta(angle_clockwise_short_axis: float) -> float:
    """cv2 fitEllipse angle (clockwise short axis, degrees) -> ccw major-axis
    angle in radians (blobctrl_inference.py:71-75 semantics)."""
    anti_short = (180.0 - angle_clockwise_short_axis) % 180.0
    anti_long = (anti_short + 90.0) % 180.0
    return math.radians(anti_long)


def gaussian_from_ellipse(ellipse) -> Tuple[np.ndarray, np.ndarray]:
    """cv2-style ellipse ((xc,yc),(d1,d2),angle_deg) -> (mean, cov) in pixels."""
    (xc, yc), (d1, d2), angle = ellipse
    theta = short_axis_angle_to_major_theta(angle)
    return ellipse_to_gaussian(xc, yc, d1 / 2.0, d2 / 2.0, theta)


def normalize_gaussian(mean: np.ndarray, cov: np.ndarray, width: int,
                       height: int) -> Tuple[np.ndarray, np.ndarray]:
    nmean = np.asarray(mean, dtype=np.float64) / np.array([width, height])
    diag2 = float(width) ** 2 + float(height) ** 2
    return nmean, np.asarray(cov, dtype=np.float64) / diag2


def ellipse_from_normalized_gaussian(mean, cov, width: int, height: int):
    """Normalized (mean, cov) -> cv2-style pixel ellipse."""
    x, y, a, b, angle = gaussian_to_ellipse(np.asarray(mean), np.asarray(cov))
    diag = math.sqrt(width ** 2 + height ** 2)
    return ((x * width, y * height), (2 * a * diag, 2 * b * diag), angle)


# ---------------------------------------------------------------------------
# Splatting (jittable JAX)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames="score_hw")
def splat_scores(xs: Array, ys: Array, covs: Array, sizes: Array,
                 score_hw: Tuple[int, int]) -> Array:
    """Splat M Gaussians into depth-ordered composited score maps.

    Args:
      xs, ys: (N, M) normalized centers in [0, 1].
      covs:   (N, M, 2, 2) normalized covariance matrices.
      sizes:  (N, M) existence weights; a blob with size < 0.5 is gated off.
      score_hw: (H, W) output grid.

    Returns:
      d_scores: (N, H, W, M+1) channels-last; slot 0 is the background layer,
      slots 1..M the fg blobs, back-to-front alpha composited (higher index on
      top). Matches the reference pipeline's `return_d_score` output
      (utils.py:162-194) transposed to channels-last.
    """
    h, w = score_hw
    n, m = xs.shape
    f32 = jnp.float32

    # normalized offsets of every grid point from every blob center
    gx = jnp.arange(w, dtype=f32)
    gy = jnp.arange(h, dtype=f32)
    dx = (gx[None, None, :] - (xs.astype(f32) * w)[..., None]) / w  # (N,M,W)
    dy = (gy[None, None, :] - (ys.astype(f32) * h)[..., None]) / h  # (N,M,H)

    # closed-form 2x2 inverse (replaces the reference's torch.linalg.solve)
    cov = covs.astype(f32)
    a, b = cov[..., 0, 0], cov[..., 0, 1]
    c, d = cov[..., 1, 0], cov[..., 1, 1]
    det = a * d - b * c
    inv_a, inv_b = d / det, -b / det
    inv_c, inv_d = -c / det, a / det

    # sq_mahalanobis[n,m,y,x] = ia dx^2 + (ib+ic) dx dy + id dy^2
    dx2 = dx * dx                                     # (N,M,W)
    dy2 = dy * dy                                     # (N,M,H)
    d2 = (inv_a[..., None, None] * dx2[:, :, None, :]
          + (inv_b + inv_c)[..., None, None] * dy[..., :, None] * dx[:, :, None, :]
          + inv_d[..., None, None] * dy2[..., :, None])  # (N,M,H,W)

    scores = jax.nn.sigmoid(-d2)
    scores = jnp.minimum(scores * 2.0, 1.0)

    # existence gating
    gate = (sizes.astype(f32) < 0.5)[:, :, None, None]
    scores = jnp.where(gate, jnp.asarray(1e-6, f32), scores)

    scores = jnp.moveaxis(scores, 1, -1)  # (N,H,W,M)
    bg = jnp.ones_like(scores[..., :1])
    scores = jnp.concatenate([bg, scores], axis=-1)  # (N,H,W,M+1)
    return composite_scores(scores)


def composite_scores(scores: Array) -> Array:
    """Back-to-front alpha compositing over the last axis:
    d_k = s_k * prod_{j>k} (1 - s_j). Equivalent to the reference's
    reversed-cumprod/roll construction (utils.py:178-181) without the
    wrap-around special case."""
    one_minus = 1.0 - scores
    tail = jnp.cumprod(one_minus[..., ::-1], axis=-1)[..., ::-1]
    shifted = jnp.concatenate([tail[..., 1:], jnp.ones_like(tail[..., :1])], axis=-1)
    return scores * shifted


def splat_features_from_scores(scores: Array, features: Array,
                               size: Optional[int] = None) -> Array:
    """scores: (N, H, W, M); features: (N, M, C) -> (N, size, size, C).

    Optionally bilinearly resizes the scores first (reference
    pipeline_blobnet.py:706-721).
    """
    from blobctrl_tpu.nn import layers
    if size and scores.shape[1] != size:
        scores = layers.bilinear_resize(scores, size, size)
    return jnp.einsum("nhwm,nmc->nhwc", scores, features.astype(scores.dtype))


def pyramid_resize(img: Array, cutoff: int) -> Dict[int, Array]:
    """Bilinear half-resolution pyramid keyed by spatial size (NHWC, square),
    down to `cutoff` (utils.py:280-294)."""
    from blobctrl_tpu.nn import layers
    out = {img.shape[2]: img}
    while img.shape[2] > cutoff:
        s = img.shape[2] // 2
        img = layers.bilinear_resize(img, s, s)
        out[s] = img
    return out


# ---------------------------------------------------------------------------
# Pipeline-facing helpers (mirror blobctrl_inference.py:78-117)
# ---------------------------------------------------------------------------

def blob_score_from_ellipse(ellipse, width: int, height: int,
                            score_hw: Tuple[int, int]) -> Array:
    """cv2-style pixel ellipse -> (1, h, w, 2) [bg, fg] composited score map,
    the `gs_score` input of the pipeline."""
    mean, cov = gaussian_from_ellipse(ellipse)
    nmean, ncov = normalize_gaussian(mean, cov, width, height)
    xs = jnp.asarray([[nmean[0]]], jnp.float32)
    ys = jnp.asarray([[nmean[1]]], jnp.float32)
    covs = jnp.asarray(ncov, jnp.float32)[None, None]
    sizes = jnp.ones((1, 1), jnp.float32)
    return splat_scores(xs, ys, covs, sizes, score_hw)


def blob_scores_from_ellipses(ellipses, width: int, height: int,
                              score_hw: Tuple[int, int]) -> Array:
    """cv2-style pixel ellipses -> (1, h, w, M+1) [bg, fg_1..fg_M]
    composited score map — the multi-blob `gs_score` input of the pipeline
    (reference multi-blob composition, utils.py:162-194)."""
    means, covs = [], []
    for e in ellipses:
        mean, cov = gaussian_from_ellipse(e)
        nmean, ncov = normalize_gaussian(mean, cov, width, height)
        means.append(nmean)
        covs.append(ncov)
    m = len(means)
    xs = jnp.asarray([[mu[0] for mu in means]], jnp.float32)
    ys = jnp.asarray([[mu[1] for mu in means]], jnp.float32)
    cv = jnp.asarray(covs, jnp.float32)[None]
    sizes = jnp.ones((1, m), jnp.float32)
    return splat_scores(xs, ys, cv, sizes, score_hw)


def removal_score(score_hw: Tuple[int, int]) -> Array:
    """Score map for remove mode: bg forced to 1, fg to 0
    (blobctrl_inference.py:184-185)."""
    h, w = score_hw
    return jnp.stack([jnp.ones((1, h, w)), jnp.zeros((1, h, w))], axis=-1)
