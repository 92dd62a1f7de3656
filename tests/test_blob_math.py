"""Parity tests: blob math vs the reference torch implementation."""

import importlib.util
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from blobctrl_tpu.blob import math as blob_math
from tests.oracles import assert_close, import_diffusers, REFERENCE_ROOT

torch = pytest.importorskip("torch")

RNG = np.random.RandomState(7)


def _load_reference_utils():
    pytest.importorskip("cv2")
    pytest.importorskip("einops")
    # stub deps the oracle imports but our tests never exercise
    import importlib.machinery
    import types
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional", "matplotlib"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                stub = types.ModuleType(name)
                stub.__spec__ = importlib.machinery.ModuleSpec(name, None)
                sys.modules[name] = stub
    if not hasattr(sys.modules.get("matplotlib"), "cm"):
        sys.modules["matplotlib"].cm = types.SimpleNamespace()
        sys.modules["matplotlib.cm"] = sys.modules["matplotlib"].cm
    spec = importlib.util.spec_from_file_location(
        "ref_utils", f"{REFERENCE_ROOT}/blobctrl/utils/utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def random_blob(n=1, m=1):
    xs = RNG.uniform(0.2, 0.8, (n, m))
    ys = RNG.uniform(0.2, 0.8, (n, m))
    covs = np.zeros((n, m, 2, 2))
    for i in range(n):
        for j in range(m):
            a = RNG.uniform(0.02, 0.2)
            b = RNG.uniform(0.02, 0.2)
            th = RNG.uniform(0, np.pi)
            _, cov = blob_math.ellipse_to_gaussian(0, 0, a, b, th)
            covs[i, j] = cov
    sizes = np.ones((n, m))
    return xs, ys, covs, sizes


def test_ellipse_gaussian_roundtrip():
    for _ in range(20):
        x, y = RNG.uniform(0, 1, 2)
        a = RNG.uniform(0.01, 0.3)
        b = a + RNG.uniform(0.01, 0.3)
        th = RNG.uniform(0, np.pi)
        mean, cov = blob_math.ellipse_to_gaussian(x, y, a, b, th)
        x2, y2, a2, b2, _ = blob_math.gaussian_to_ellipse(mean, cov)
        assert abs(x - x2) < 1e-9 and abs(y - y2) < 1e-9
        assert abs(a - a2) < 1e-7 and abs(b - b2) < 1e-7


def test_ellipse_to_gaussian_matches_reference():
    ref = _load_reference_utils()
    for _ in range(10):
        x, y, a, b = RNG.uniform(0.1, 0.9, 4)
        th = RNG.uniform(0, np.pi)
        m_ref, c_ref = ref.ellipse_to_gaussian(x, y, a, b, th)
        m_got, c_got = blob_math.ellipse_to_gaussian(x, y, a, b, th)
        assert_close(m_got, m_ref, name="mean")
        assert_close(c_got, c_ref, name="cov")


def test_splat_scores_matches_reference_square():
    ref = _load_reference_utils()
    xs, ys, covs, sizes = random_blob(1, 1)
    d_ref = ref.splat_features(
        xs=torch.tensor(xs), ys=torch.tensor(ys), covs=torch.tensor(covs),
        sizes=torch.tensor(sizes), score_size=64, return_d_score=True).numpy()
    got = blob_math.splat_scores(jnp.asarray(xs), jnp.asarray(ys),
                                 jnp.asarray(covs), jnp.asarray(sizes), (64, 64))
    # ref is (N, M+1, H, W); ours channels-last
    assert_close(np.moveaxis(np.asarray(got), -1, 1), d_ref, atol=1e-5,
                 name="splat64")


def test_splat_scores_matches_reference_rect():
    ref = _load_reference_utils()
    xs, ys, covs, sizes = random_blob(1, 1)
    d_ref = ref.splat_features(
        xs=torch.tensor(xs), ys=torch.tensor(ys), covs=torch.tensor(covs),
        sizes=torch.tensor(sizes), score_size=(48, 64), return_d_score=True).numpy()
    got = blob_math.splat_scores(jnp.asarray(xs), jnp.asarray(ys),
                                 jnp.asarray(covs), jnp.asarray(sizes), (48, 64))
    assert_close(np.moveaxis(np.asarray(got), -1, 1), d_ref, atol=1e-5,
                 name="splat48x64")


def test_splat_scores_multiblob_matches_reference():
    ref = _load_reference_utils()
    xs, ys, covs, sizes = random_blob(2, 3)
    sizes[0, 1] = 0.0  # gated-off blob
    d_ref = ref.splat_features(
        xs=torch.tensor(xs), ys=torch.tensor(ys), covs=torch.tensor(covs),
        sizes=torch.tensor(sizes), score_size=32, return_d_score=True).numpy()
    got = blob_math.splat_scores(jnp.asarray(xs), jnp.asarray(ys),
                                 jnp.asarray(covs), jnp.asarray(sizes), (32, 32))
    assert_close(np.moveaxis(np.asarray(got), -1, 1), d_ref, atol=1e-5,
                 name="splat_multi")


def test_feature_splat_matches_reference():
    ref = _load_reference_utils()
    scores = RNG.rand(2, 16, 16, 3).astype(np.float32)
    feats = RNG.randn(2, 3, 8).astype(np.float32)
    ref_out = ref.splat_features_from_scores(
        torch.tensor(scores), torch.tensor(feats), size=None).numpy()  # NCHW
    got = blob_math.splat_features_from_scores(jnp.asarray(scores), jnp.asarray(feats))
    assert_close(np.moveaxis(np.asarray(got), -1, 1), ref_out, name="feat_splat")
    # with resize
    ref_out = ref.splat_features_from_scores(
        torch.tensor(scores), torch.tensor(feats), size=8).numpy()
    got = blob_math.splat_features_from_scores(jnp.asarray(scores),
                                               jnp.asarray(feats), size=8)
    assert_close(np.moveaxis(np.asarray(got), -1, 1), ref_out, atol=1e-5,
                 name="feat_splat_resize")


def test_pyramid_matches_reference():
    ref = _load_reference_utils()
    img = RNG.randn(1, 4, 64, 64).astype(np.float32)  # NCHW for ref
    ref_pyr = ref.pyramid_resize(torch.tensor(img), cutoff=16)
    got_pyr = blob_math.pyramid_resize(jnp.asarray(np.moveaxis(img, 1, -1)), cutoff=16)
    assert set(ref_pyr.keys()) == set(got_pyr.keys())
    for k in ref_pyr:
        assert_close(np.moveaxis(np.asarray(got_pyr[k]), -1, 1),
                     ref_pyr[k].numpy(), atol=1e-5, name=f"pyr{k}")


def test_blob_score_from_ellipse_matches_reference_cli_path():
    """Full CLI path: cv2 ellipse -> normalized gaussian -> (2,h,w) gs_score
    (blobctrl_inference.py:78-117)."""
    ref = _load_reference_utils()
    ellipse = ((300.0, 260.0), (120.0, 220.0), 35.0)
    W = H = 512

    # reference path, reimplemented inline from blobctrl_inference.py helpers
    angle = ellipse[2]
    anti_long = ((180 - angle) % 180 + 90) % 180
    m_ref, c_ref = ref.ellipse_to_gaussian(
        ellipse[0][0], ellipse[0][1], ellipse[1][0] / 2, ellipse[1][1] / 2,
        np.radians(anti_long))
    m_ref = m_ref / np.array([W, H])
    c_ref = c_ref / (W ** 2 + H ** 2)
    d_ref = ref.splat_features(
        xs=torch.tensor(m_ref[:1])[None], ys=torch.tensor(m_ref[1:])[None],
        covs=torch.tensor(c_ref)[None, None], sizes=torch.tensor([[1.0]]),
        score_size=(64, 64), return_d_score=True).numpy()

    got = blob_math.blob_score_from_ellipse(ellipse, W, H, (64, 64))
    assert_close(np.moveaxis(np.asarray(got), -1, 1), d_ref, atol=1e-5,
                 name="cli_gs_score")


def test_gaussian_to_ellipse_near_degenerate_cov_stays_real():
    """np.linalg.eig returns complex eigenpairs for [[1, e], [-e, 1]]; the
    symmetrized eigh path must stay real and warning-free."""
    import warnings
    from blobctrl_tpu.blob import math as blob_math
    cov = np.array([[1.0, 1e-8], [-1e-8, 1.0]])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        x, y, a, b, ang = blob_math.gaussian_to_ellipse(np.zeros(2), cov)
    for v in (x, y, a, b, ang):
        assert isinstance(v, float) and np.isfinite(v)
    assert abs(a - 1.0) < 1e-6 and abs(b - 1.0) < 1e-6
