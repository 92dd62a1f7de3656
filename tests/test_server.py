"""HTTP serving surface: stateless /v1/edit over a tiny pipeline."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from blobctrl_tpu.apps import flagship
from blobctrl_tpu.apps.server import serve
from blobctrl_tpu.models import blobnet as blobnet_lib
from blobctrl_tpu.models import unet as unet_lib
from blobctrl_tpu.models import vae as vae_lib
from blobctrl_tpu.pipeline import BlobNetPipeline


@pytest.fixture(scope="module")
def server():
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))
    service, httpd = serve(pipe, host="127.0.0.1", port=0, size=64,
                           warmup_steps=None)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()


def _b64_png(arr):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def _post(url, payload):
    req = urllib.request.Request(url, json.dumps(payload).encode(),
                                 {"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health_and_info(server):
    base, service = server
    with urllib.request.urlopen(base + "/healthz") as r:
        assert r.status == 200
    with urllib.request.urlopen(base + "/v1/info") as r:
        info = json.loads(r.read())
    assert "unipc" in info["schedulers"] and "dpm_sde" in info["schedulers"]


@pytest.mark.slow
def test_edit_roundtrip(server):
    base, service = server
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    payload = {
        "fg_image": _b64_png(img), "bg_image": _b64_png(img),
        "ellipse": [32, 32, 20, 28, 15], "num_inference_steps": 2,
        "seed": 7, "size": 64,
        "prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "negative_prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "fg_dino_feats": rng.randn(1, 16).tolist(),
    }
    code, resp = _post(base + "/v1/edit", payload)
    assert code == 200, resp
    from PIL import Image
    out = np.asarray(Image.open(io.BytesIO(base64.b64decode(resp["images"][0]))))
    assert out.shape == (64, 64, 3)
    assert resp["seconds"] > 0
    # same seed -> identical pixels (stateless reproducibility)
    code2, resp2 = _post(base + "/v1/edit", payload)
    assert code2 == 200 and resp2["images"][0] == resp["images"][0]
    # remove mode
    payload_rm = dict(payload, remove=True)
    payload_rm.pop("ellipse")
    code3, resp3 = _post(base + "/v1/edit", payload_rm)
    assert code3 == 200
    assert service.requests_served == 3


def test_edit_validation_errors(server):
    base, _ = server
    code, resp = _post(base + "/v1/edit", {})
    assert code == 400 and "fg_image" in resp["error"]
    rng = np.random.RandomState(0)
    img = _b64_png(rng.randint(0, 255, (64, 64, 3)).astype(np.uint8))
    code, resp = _post(base + "/v1/edit",
                       {"fg_image": img, "bg_image": img, "size": 64,
                        "ellipse": [1, 2, 3]})
    assert code == 400 and "ellipse" in resp["error"]
    code, resp = _post(base + "/v1/edit",
                       {"fg_image": img, "bg_image": img, "size": 64,
                        "ellipse": [32, 32, 20, 28, 0],
                        "prompt_embeds": np.zeros((1, 7, 16)).tolist(),
                        "negative_prompt_embeds": np.zeros((1, 7, 16)).tolist(),
                        "fg_dino_feats": np.zeros((1, 16)).tolist(),
                        "scheduler": "dpmsolver"})
    assert code == 400 and "dpm" in resp["error"]
    code, _ = _post(base + "/v1/bogus", {})
    assert code == 404


def test_request_limits(server):
    base, service = server
    rng = np.random.RandomState(0)
    img = _b64_png(rng.randint(0, 255, (64, 64, 3)).astype(np.uint8))
    # oversized body -> 413 before any JSON parsing
    req = urllib.request.Request(
        base + "/v1/edit", b"x" * 1024,
        {"Content-Type": "application/json",
         "Content-Length": str(service.max_body_bytes + 1)})
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 413")
    except urllib.error.HTTPError as e:
        assert e.code == 413
    # garbage image bytes -> 400 ValueError, not a masked OSError 500
    code, resp = _post(base + "/v1/edit",
                       {"fg_image": base64.b64encode(b"not an image").decode(),
                        "bg_image": img, "size": 64, "remove": True})
    assert code == 400 and "fg_image" in resp["error"]
    # resource caps independent of warm pinning
    code, resp = _post(base + "/v1/edit",
                       {"fg_image": img, "bg_image": img, "size": 64,
                        "remove": True, "num_samples": 99})
    assert code == 400 and "num_samples" in resp["error"]
    code, resp = _post(base + "/v1/edit",
                       {"fg_image": img, "bg_image": img, "size": 64,
                        "remove": True, "num_inference_steps": 0})
    assert code == 400 and "num_inference_steps" in resp["error"]


def test_cold_shape_rejection(server):
    """With warm pinning active, cold graphs are 400s (not silent multi-
    minute compiles under the TPU lock)."""
    base, service = server
    rng = np.random.RandomState(0)
    img = _b64_png(rng.randint(0, 255, (64, 64, 3)).astype(np.uint8))
    service.warm_steps = 2          # simulate a completed warmup at 2 steps
    try:
        code, resp = _post(base + "/v1/edit",
                           {"fg_image": img, "bg_image": img, "size": 64,
                            "remove": True, "num_inference_steps": 7})
        assert code == 400 and "warm-compiled" in resp["error"]
        code, resp = _post(base + "/v1/edit",
                           {"fg_image": img, "bg_image": img, "size": 32,
                            "remove": True, "num_inference_steps": 2})
        assert code == 400 and "size" in resp["error"]
        code, resp = _post(base + "/v1/edit",
                           {"fg_image": img, "bg_image": img, "size": 64,
                            "remove": True, "num_inference_steps": 2,
                            "scheduler": "ddim"})
        assert code == 400 and "scheduler" in resp["error"]
    finally:
        service.warm_steps = None   # restore dev-mode for other tests


@pytest.fixture(scope="module")
def batch_server():
    """Second service over the same tiny-model family with dynamic
    micro-batching on (max_batch=4, generous window for CI timing)."""
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    pipe = BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg))
    service, httpd = serve(pipe, host="127.0.0.1", port=0, size=64,
                           warmup_steps=None, max_batch=4,
                           batch_window_ms=1500.0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()


@pytest.mark.slow
def test_dynamic_micro_batching(batch_server):
    """Concurrent compatible requests coalesce into one edit_batch device
    program; each caller gets its own image and the response reports the
    batch size. Remove-mode requests bypass the batcher (solo path)."""
    base, service = batch_server
    rng = np.random.RandomState(3)
    payloads = []
    for i in range(3):
        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
        payloads.append({
            "fg_image": _b64_png(img), "bg_image": _b64_png(img),
            "ellipse": [32, 32, 20, 28, 10.0 * i],
            "num_inference_steps": 2, "seed": 40 + i, "size": 64,
            "prompt_embeds": rng.randn(1, 7, 16).tolist(),
            "negative_prompt_embeds": rng.randn(1, 7, 16).tolist(),
            "fg_dino_feats": rng.randn(1, 16).tolist(),
        })
    results = [None] * 3

    def worker(i):
        results[i] = _post(base + "/v1/edit", payloads[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    for code, resp in results:
        assert code == 200, resp
        assert resp["batch_size"] >= 1
    assert service.batched_requests == 3
    # with a 1.5 s window all three should land in one batch (padded to the
    # warm size 4 on the device side)
    assert service.batches_run == 1
    assert {r[1]["batch_size"] for r in results} == {3}
    # distinct ellipses/seeds -> distinct images
    assert len({r[1]["images"][0] for r in results}) == 3
    # a lone repeat of payload 0 (a size-1 "batch", padded on device to the
    # warm size) reproduces its batched image bit-exactly — per-row results
    # are independent of the batch composition
    code, resp = _post(base + "/v1/edit", payloads[0])
    assert code == 200
    assert resp["images"][0] == results[0][1]["images"][0]
    assert service.batched_requests == 4
    # remove mode bypasses the batcher (solo path, no batch_size field)
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    code, resp = _post(base + "/v1/edit", {
        "fg_image": _b64_png(img), "bg_image": _b64_png(img),
        "remove": True, "num_inference_steps": 2, "size": 64,
        "prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "negative_prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "fg_dino_feats": rng.randn(1, 16).tolist()})
    assert code == 200
    assert "batch_size" not in resp
    assert service.batched_requests == 4  # remove ran solo, not batched


@pytest.mark.slow
def test_batch_error_propagates_to_all_waiters(batch_server):
    """A device-level failure inside a micro-batch surfaces to every waiting
    caller as an error response (no hung requests, batcher stays alive)."""
    base, service = batch_server
    rng = np.random.RandomState(9)
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    # sneak a malformed per-request payload PAST _parse by corrupting the
    # queue item directly: simulate an unexpected pipeline failure
    payload = {
        "fg_image": _b64_png(img), "bg_image": _b64_png(img),
        "ellipse": [32, 32, 20, 28, 0], "num_inference_steps": 2,
        "seed": 1, "size": 64,
        "prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "negative_prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "fg_dino_feats": rng.randn(1, 16).tolist(),
    }
    real_edit_batch = service.pipeline.edit_batch
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("synthetic device failure")

    service.pipeline.edit_batch = boom
    try:
        code, resp = _post(base + "/v1/edit", payload)
        assert code == 500 and "synthetic device failure" in resp["error"]
        assert calls["n"] == 1
    finally:
        service.pipeline.edit_batch = real_edit_batch
    # batcher thread survived: the same request now succeeds
    code, resp = _post(base + "/v1/edit", payload)
    assert code == 200 and resp["batch_size"] == 1


@pytest.fixture(scope="module")
def preview_server(server):
    """Preview-enabled service over the SAME tiny pipeline (reuses the
    module fixture's compiled graphs; only the step-callback variant of the
    2-step graph compiles cold here)."""
    _, base_service = server
    service, httpd = serve(base_service.pipeline, host="127.0.0.1", port=0,
                           size=64, warmup_steps=None, preview_every=2)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}", service
    httpd.shutdown()


def _edit_payload(steps=4):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    return {
        "fg_image": _b64_png(img), "bg_image": _b64_png(img),
        "ellipse": [32, 32, 20, 28, 0], "num_inference_steps": steps,
        "seed": 5, "size": 64,
        "prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "negative_prompt_embeds": rng.randn(1, 7, 16).tolist(),
        "fg_dino_feats": rng.randn(1, 16).tolist(),
    }


def test_preview_rejected_when_disabled(server):
    base, _ = server
    code, resp = _post(base + "/v1/edit", dict(_edit_payload(), preview=True))
    assert code == 400 and "preview" in resp["error"]


@pytest.mark.slow
def test_preview_roundtrip_and_progress(preview_server):
    """preview:true returns approximate intermediate thumbnails on the
    configured cadence (every 2nd step + final), identical final images to
    a plain run, and /v1/progress is idle again afterwards."""
    from PIL import Image

    base, service = preview_server
    code, plain = _post(base + "/v1/edit", _edit_payload())
    assert code == 200 and "previews" not in plain
    code, resp = _post(base + "/v1/edit", dict(_edit_payload(), preview=True))
    assert code == 200
    # observing previews must not perturb the edit
    assert resp["images"] == plain["images"]
    assert resp["preview_steps"] == [0, 2, 3]
    assert len(resp["previews"]) == 3
    for b64 in resp["previews"]:
        arr = np.asarray(Image.open(io.BytesIO(base64.b64decode(b64))))
        assert arr.shape == (16, 16, 3)  # 8x8 latents, upscale 2
    with urllib.request.urlopen(base + "/v1/progress") as r:
        prog = json.loads(r.read())
    assert prog == {"active": False, "step": None, "total": None}
    with urllib.request.urlopen(base + "/v1/info") as r:
        assert json.loads(r.read())["preview_every"] == 2


@pytest.mark.slow
def test_preview_progress_visible_mid_edit(preview_server):
    """/v1/progress reports the live step count while a preview edit holds
    the chip."""
    base, service = preview_server
    mid = {}
    orig = service.pipeline.__class__.__call__

    def probing(pipe_self, *a, **kw):
        cb = kw.get("callback_on_step_end")
        if cb is not None:
            def wrapped(p, i, t, tensors):
                cb(p, i, t, tensors)
                mid.setdefault("snapshots", []).append(
                    dict(service.progress))
            kw["callback_on_step_end"] = wrapped
        return orig(pipe_self, *a, **kw)

    service.pipeline.__class__.__call__ = probing
    try:
        code, resp = _post(base + "/v1/edit",
                           dict(_edit_payload(), preview=True))
        assert code == 200
    finally:
        service.pipeline.__class__.__call__ = orig
    snaps = mid["snapshots"]
    assert all(s["active"] and s["total"] == 4 for s in snaps)
    # debug.callback delivery order is unspecified (the server sorts preview
    # frames for the same reason), so assert the published counter is
    # monotone, drawn from the preview steps, and reaches the final step —
    # not an exact arrival sequence (out-of-order delivery under the
    # monotone max() can legally publish e.g. [3, 3, 4])
    steps = [s["step"] for s in snaps]
    assert steps == sorted(steps), \
        f"published step count went backwards: {steps}"
    assert set(steps) <= {1, 3, 4}, steps
    assert steps[-1] == 4, steps
