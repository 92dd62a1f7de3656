"""End-to-end CLI drive: argv -> apps.cli.main() -> PNGs on disk, over the
fabricated reference-layout checkpoint (the path a reference user's shell
script exercises — scripts/blobctrl_inference.py:325-378 semantics)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def fake_models_root(tmp_path_factory):
    from tests.fake_checkpoint import build_fake_models_root
    return build_fake_models_root(tmp_path_factory.mktemp("models"))


@pytest.fixture(scope="module")
def input_images(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("inputs")
    rng = np.random.RandomState(0)
    paths = {}
    for name in ("object", "background", "original"):
        arr = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        p = os.path.join(str(d), f"{name}.png")
        Image.fromarray(arr).save(p)
        paths[name] = p
    # ellipse mask for remove mode: filled ellipse, white on black
    mask = np.zeros((64, 64), np.uint8)
    yy, xx = np.mgrid[:64, :64]
    mask[((xx - 32) / 12.0) ** 2 + ((yy - 30) / 8.0) ** 2 <= 1.0] = 255
    p = os.path.join(str(d), "mask.png")
    Image.fromarray(mask).save(p)
    paths["mask"] = p
    return paths


@pytest.mark.slow
def test_cli_edit_mode(fake_models_root, input_images, tmp_path, capsys):
    from blobctrl_tpu.apps import cli
    out_dir = str(tmp_path / "out")
    args = cli.build_parser().parse_args([
        "--models_root", fake_models_root,
        "--object_image", input_images["object"],
        "--edited_background", input_images["background"],
        "--scene_prompt", "a red apple on a table",
        "--negative_prompt", "blurry",
        # two rounds: the LAST ellipse must win (reference semantics)
        "--ellipse", "20,20,10,16,0",
        "--ellipse", "32,30,14,22,35",
        "--num_samples", "2",
        "--num_inference_steps", "2",
        "--dtype", "f32",
        "--output_dir", out_dir,
        "--plot_ellipse",
    ])
    paths = cli.run(args)
    # 2 samples x (plain + ellipse overlay)
    assert len(paths) == 4 and all(os.path.exists(p) for p in paths)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["outputs"] == paths and rec["seconds"] > 0

    from PIL import Image
    img = np.asarray(Image.open(paths[0]))
    assert img.shape == (64, 64, 3) and img.std() > 0
    # the overlay variant differs from the plain one (green ellipse drawn)
    ov = np.asarray(Image.open(paths[1]))
    assert not np.array_equal(img, ov)


@pytest.mark.slow
def test_cli_remove_mode(fake_models_root, input_images, tmp_path, capsys):
    from blobctrl_tpu.apps import cli
    out_dir = str(tmp_path / "out")
    args = cli.build_parser().parse_args([
        "--models_root", fake_models_root,
        "--object_image", input_images["object"],
        "--original_image", input_images["original"],
        "--ellipse_mask", input_images["mask"],
        "--scene_prompt", "an empty table",
        "--ellipse", "32,30,14,22,35",
        "--remove",
        "--num_inference_steps", "2",
        "--dtype", "f32",
        "--scheduler", "ddim",
        "--output_dir", out_dir,
    ])
    paths = cli.run(args)
    assert len(paths) == 1 and os.path.exists(paths[0])
    json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_ellipse_parser_rejects_garbage():
    import argparse

    from blobctrl_tpu.apps import cli
    assert cli.parse_ellipse("(32, 30), (14, 22), 35") == \
        ((32.0, 30.0), (14.0, 22.0), 35.0)
    for bad in ("1,2,3", "a,b,c,d,e", "__import__('os')"):
        with pytest.raises((argparse.ArgumentTypeError, ValueError)):
            cli.parse_ellipse(bad)
