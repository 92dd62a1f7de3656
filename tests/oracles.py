"""Test oracles: the reference's vendored diffusers (torch, CPU) is used as a
numerical oracle for parity tests. We import it read-only; no reference code
is copied into the framework.
"""

import sys

import numpy as np
import pytest

REFERENCE_DIFFUSERS = "/root/reference/diffusers/src"
REFERENCE_ROOT = "/root/reference"


def import_diffusers():
    torch = pytest.importorskip("torch")
    if REFERENCE_DIFFUSERS not in sys.path:
        sys.path.insert(0, REFERENCE_DIFFUSERS)
    try:
        import diffusers
    except Exception as e:  # pragma: no cover
        pytest.skip(f"vendored diffusers unavailable: {e}")
    return diffusers


def import_reference_blobctrl():
    torch = pytest.importorskip("torch")
    import_diffusers()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    try:
        import blobctrl
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference blobctrl unavailable: {e}")
    return blobctrl


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


def assert_close(a, b, atol=1e-4, rtol=1e-4, name=""):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    assert a.shape == b.shape, f"{name}: shape {a.shape} vs {b.shape}"
    err = np.max(np.abs(a - b))
    denom = np.maximum(np.abs(b), 1e-6)
    rel = np.max(np.abs(a - b) / denom)
    assert err <= atol or rel <= rtol, (
        f"{name}: max abs err {err:.3e}, max rel err {rel:.3e} "
        f"(atol={atol}, rtol={rtol})")
