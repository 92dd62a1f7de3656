"""Latent previews + callback_interval: the serving-side progress/preview
feature (no reference counterpart — the torch app shows nothing until the
edit finishes; see apps/server.py --preview_every)."""

import numpy as np
import pytest

from blobctrl_tpu.pipeline import preview


def test_latent_to_rgb_shapes_and_range():
    rng = np.random.RandomState(0)
    lat = rng.randn(2, 8, 8, 4).astype(np.float32)
    rgb = preview.latent_to_rgb(lat)
    assert rgb.shape == (2, 8, 8, 3) and rgb.dtype == np.uint8
    up = preview.latent_to_rgb(lat, upscale=4)
    assert up.shape == (2, 32, 32, 3)
    # nearest-neighbor: every 4x4 tile is constant
    np.testing.assert_array_equal(up[:, ::4, ::4], rgb)
    assert up.reshape(2, 8, 4, 8, 4, 3).std(axis=(2, 4)).max() == 0


def test_latent_to_rgb_is_monotone_projection():
    """The projection is linear: scaling a latent toward zero pulls the
    preview toward the mid-gray bias point."""
    zero = preview.latent_to_rgb(np.zeros((1, 4, 4, 4), np.float32))
    assert (zero == int(0.5 * 255 + 0.5)).all()


def test_latent_to_rgb_right_crop_and_3d_input():
    rng = np.random.RandomState(1)
    lat = rng.randn(1, 8, 16, 4).astype(np.float32)
    full = preview.latent_to_rgb(lat)
    right = preview.latent_to_rgb(lat, out_width=8)
    np.testing.assert_array_equal(right, full[:, :, 8:])
    np.testing.assert_array_equal(preview.latent_to_rgb(lat[0]), full)


def test_latent_to_rgb_validation():
    with pytest.raises(ValueError, match="expected"):
        preview.latent_to_rgb(np.zeros((1, 8, 8, 3), np.float32))
    with pytest.raises(ValueError, match="out_width"):
        preview.latent_to_rgb(np.zeros((1, 8, 8, 4), np.float32),
                              out_width=9)
