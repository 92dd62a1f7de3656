"""Launch-flag sharding surface: --mesh data=N,model=M / --hybrid_cfg_data
on the CLI and server must produce outputs equal to the unsharded run, with
no code written by the operator (checkpoint-day on a v5e-4 is a flag).

The deployment surface these flags extend mirrors the reference's entry
points (/root/reference/scripts/blobctrl_inference.py:286-320 and
blobctrl_app.py:1839), which are single-GPU only.
"""

import base64
import io
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

import jax

from blobctrl_tpu.parallel import mesh as mesh_lib


# ---------------------------------------------------------------------
# parse_mesh_spec
# ---------------------------------------------------------------------

def test_parse_mesh_spec():
    assert mesh_lib.parse_mesh_spec("data=4,model=2") == \
        {"data": 4, "model": 2}
    assert mesh_lib.parse_mesh_spec("model=2") == {"data": None, "model": 2}
    assert mesh_lib.parse_mesh_spec("data=8") == {"data": 8, "model": 1}
    assert mesh_lib.parse_mesh_spec("data=auto,model=4") == \
        {"data": None, "model": 4}
    assert mesh_lib.parse_mesh_spec(" model=2 , data=2 ") == \
        {"data": 2, "model": 2}
    for bad in ("data=0", "model=-1", "tp=2", "data:4", "data=4;model=2"):
        with pytest.raises(ValueError):
            mesh_lib.parse_mesh_spec(bad)


def test_shard_pipeline_from_flags_no_flags_is_noop():
    class FakePipe:
        def shard_to_mesh(self, **kw):  # pragma: no cover - must not run
            raise AssertionError("shard_to_mesh called without flags")

    assert mesh_lib.shard_pipeline_from_flags(FakePipe()) is None


def test_shard_pipeline_from_flags_specs():
    """Flag combinations route to the right shard_to_mesh recipe."""
    calls = []

    class FakePipe:
        def shard_to_mesh(self, **kw):
            calls.append(kw)

    m = mesh_lib.shard_pipeline_from_flags(FakePipe(),
                                           mesh_spec="data=2,model=4")
    assert dict(m.shape) == {"data": 2, "model": 4}
    assert calls[-1] == dict(mesh=m, model_parallel=True,
                             hybrid_cfg_data=False)

    # hybrid without an explicit mesh defaults to data=2 x model=<rest>
    m = mesh_lib.shard_pipeline_from_flags(FakePipe(), hybrid_cfg_data=True)
    assert dict(m.shape) == {"data": 2,
                             "model": max(1, len(jax.devices()) // 2)}
    assert calls[-1]["hybrid_cfg_data"] is True

    # hybrid needs data >= 2 (the CFG pair rides the data axis)
    with pytest.raises(ValueError, match="data >= 2"):
        mesh_lib.shard_pipeline_from_flags(FakePipe(), mesh_spec="data=1",
                                           hybrid_cfg_data=True)


# ---------------------------------------------------------------------
# CLI: --mesh / --hybrid_cfg_data end to end over the fabricated
# reference-layout checkpoint
# ---------------------------------------------------------------------

@pytest.fixture(scope="module")
def fake_models_root(tmp_path_factory):
    pytest.importorskip("torch")
    from tests.fake_checkpoint import build_fake_models_root
    return build_fake_models_root(tmp_path_factory.mktemp("models"))


def _cli_argv(models_root, inputs, out_dir, extra=()):
    return [
        "--models_root", models_root,
        "--object_image", inputs["object"],
        "--edited_background", inputs["background"],
        "--scene_prompt", "a red apple on a table",
        "--ellipse", "32,30,14,22,35",
        "--num_inference_steps", "2",
        "--dtype", "f32",
        "--output_dir", out_dir,
        *extra,
    ]


@pytest.fixture(scope="module")
def cli_inputs(tmp_path_factory):
    from PIL import Image
    d = tmp_path_factory.mktemp("inputs")
    rng = np.random.RandomState(0)
    paths = {}
    for name in ("object", "background"):
        arr = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        p = os.path.join(str(d), f"{name}.png")
        Image.fromarray(arr).save(p)
        paths[name] = p
    return paths


@pytest.mark.slow
@pytest.mark.parametrize("extra", [
    ("--mesh", "data=2,model=2"),
    ("--mesh", "data=2,model=2", "--hybrid_cfg_data"),
], ids=["tp", "hybrid"])
def test_cli_mesh_flag_matches_unsharded(fake_models_root, cli_inputs,
                                         tmp_path, capsys, extra):
    from PIL import Image

    from blobctrl_tpu.apps import cli
    ref_dir = str(tmp_path / "ref")
    got_dir = str(tmp_path / "got")
    cli.run(cli.build_parser().parse_args(
        _cli_argv(fake_models_root, cli_inputs, ref_dir)))
    cli.run(cli.build_parser().parse_args(
        _cli_argv(fake_models_root, cli_inputs, got_dir, extra)))
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    # the sharded run logs its mesh before the result line
    mesh_line = next(rec for rec in map(json.loads, lines) if "mesh" in rec)
    assert mesh_line["mesh"] == {"data": 2, "model": 2}
    ref = np.asarray(Image.open(os.path.join(ref_dir, "edit_0.png")), np.int16)
    got = np.asarray(Image.open(os.path.join(got_dir, "edit_0.png")), np.int16)
    # uint8 transport: GSPMD float reordering may flip a pixel across a
    # round() boundary — allow one quantization step
    assert np.abs(got - ref).max() <= 1


# ---------------------------------------------------------------------
# server: --mesh flag surface (serve() with a pre-sharded pipeline; main()
# wires shard_pipeline_from_flags the same way the CLI test covers)
# ---------------------------------------------------------------------

def _b64_png(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


@pytest.mark.slow
def test_server_sharded_by_flags_matches_unsharded():
    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.apps.server import serve
    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.models import vae as vae_lib
    from blobctrl_tpu.pipeline import BlobNetPipeline

    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    kwargs = dict(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))

    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    payload = {
        "fg_image": _b64_png(img), "bg_image": _b64_png(img),
        "ellipse": [32, 32, 20, 28, 15], "num_inference_steps": 2,
        "seed": 7, "size": 64,
        "prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "negative_prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "fg_dino_feats": rng.randn(1, 16).tolist(),
    }

    ref_pipe = BlobNetPipeline(**kwargs)
    out = ref_pipe(
        fg_image=img, bg_image=img,
        gs_score=np.asarray(__import__(
            "blobctrl_tpu.blob.math", fromlist=["m"]).blob_score_from_ellipse(
                ((32, 32), (20, 28), 15), 64, 64, (8, 8))),
        height=64, width=64, num_inference_steps=2, guidance_scale=7.5,
        seed=7,
        prompt_embeds=np.asarray(payload["prompt_embeds"], np.float32),
        negative_prompt_embeds=np.asarray(
            payload["negative_prompt_embeds"], np.float32),
        fg_dino_feats=np.asarray(payload["fg_dino_feats"], np.float32),
        blobnet_conditioning_scale=1.2)
    ref = np.asarray(out.images[0])

    pipe = BlobNetPipeline(**kwargs)
    mesh = mesh_lib.shard_pipeline_from_flags(
        pipe, mesh_spec="data=2,model=2", hybrid_cfg_data=True)
    assert dict(mesh.shape) == {"data": 2, "model": 2}
    service, httpd = serve(pipe, host="127.0.0.1", port=0, size=64,
                           warmup_steps=None)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{httpd.server_address[1]}"
        with urllib.request.urlopen(base + "/v1/info") as r:
            info = json.loads(r.read())
        assert info["mesh"] == {"data": 2, "model": 2}
        assert info["hybrid_cfg_data"] is True
        code, resp = _post(base + "/v1/edit", payload)
        assert code == 200
        from PIL import Image
        got = np.asarray(Image.open(io.BytesIO(
            base64.b64decode(resp["images"][0]))), np.float32) / 255.0
        np.testing.assert_allclose(got, ref, atol=1.51 / 255.0)
    finally:
        httpd.shutdown()
