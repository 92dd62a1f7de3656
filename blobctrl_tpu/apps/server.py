"""Stateless HTTP serving for BlobCtrl edits (production deployment surface).

The reference ships only an interactive Gradio demo
(/root/reference/scripts/blobctrl_app.py); this adds the piece a production
deployment needs: a stateless JSON-over-HTTP API that any replica set /
load balancer can front. stdlib-only (http.server) — no web framework
dependency.

Endpoints
  GET  /healthz     -> 200 "ok" once the model is warm
  GET  /v1/info     -> model geometry, schedulers, device, warmup state
  POST /v1/edit     -> run one edit; JSON body:
      {
        "prompt": str | ["p1", ...],            (or "prompt_embeds": nested list)
        "negative_prompt": str | [...],          (optional)
        "fg_image": base64 PNG/JPEG,             (object on white canvas)
        "bg_image": base64 PNG/JPEG,             (edited background)
        "ellipse": [cx, cy, d1, d2, angle_deg],  (pixel units; OR "gs_score":
                                                  nested [h][w][M+1] floats)
        "remove": bool,                          (remove mode: strength 0,
                                                  bg-only score)
        "num_inference_steps": int, "guidance_scale": float,
        "blobnet_conditioning_scale": float,
        "blobnet_control_guidance_start"/"_end": float,
        "seed": int | null, "num_samples": int, "scheduler": str,
        "encoder_cache_interval": int            (opt-in fast mode)
      }
      -> {"images": [base64 PNG, ...], "seconds": float}

Design notes
  * The TPU is a single exclusive resource: requests serialize through a
    lock (queueing happens in the threaded HTTP layer). Horizontal scale =
    more replicas, each owning a chip — the stateless API makes that a pure
    load-balancer concern.
  * Warmup pre-compiles the standard 50-step graph AND the remove-mode
    graph (a different XLA program: use_blobnet=False) at startup so first
    requests do not pay a multi-minute XLA compile under the serving lock.
  * Request limits: bodies above ``max_body_bytes`` are rejected with 413,
    and once warmup has run, ``num_inference_steps``/``size`` are pinned to
    the warm-compiled values (400 on cold shapes — a cold shape means a
    multi-minute XLA compile while holding the TPU lock, which would stall
    all traffic while /healthz still reports 200). ``num_samples`` is
    bounded by ``max_samples``. Pass ``strict_shapes=False`` to accept cold
    shapes (dev / offline use).
  * Input validation mirrors the pipeline's own errors; client mistakes are
    400s with the message, not 500s.
  * Deployment: http.server performs only basic security checks. Run this
    behind a reverse proxy / load balancer that terminates TLS, enforces
    auth and rate limits, and bound to a private interface (--host) unless
    the network is trusted.
"""

from __future__ import annotations

import argparse
import base64
import binascii
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def _decode_image(b64: str, field: str = "image") -> np.ndarray:
    from PIL import Image
    try:
        raw = base64.b64decode(b64)
        return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"), np.uint8)
    except (binascii.Error, OSError) as e:
        # PIL raises UnidentifiedImageError (an OSError subclass) on garbage
        # bytes; keep genuine server-side OSErrors out of this 400 path by
        # scoping the except to the decode only.
        raise ValueError(f"{field} is not decodable base64 image data: {e}")


def _encode_image(arr: np.ndarray) -> str:
    from PIL import Image
    img = Image.fromarray(np.clip(arr * 255.0 + 0.5, 0, 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


class EditService:
    """Pipeline wrapper with the serving policy: one edit at a time on the
    chip, request validation, optional startup warmup."""

    MAX_BODY_BYTES = 16 * 1024 * 1024   # base64 images + embeds fit in ~4 MB
    MAX_SAMPLES = 4
    MAX_STEPS = 200

    def __init__(self, pipeline, size: int = 512, strict_shapes: bool = True,
                 max_body_bytes: Optional[int] = None):
        self.pipeline = pipeline
        self.size = size
        self.lock = threading.Lock()
        self.warm = False
        self.requests_served = 0
        self.strict_shapes = strict_shapes
        self.max_body_bytes = max_body_bytes or self.MAX_BODY_BYTES
        # populated by warmup(); None = no warm-shape pinning yet
        self.warm_steps: Optional[int] = None

    def warmup(self, steps: int = 50):
        """Compile the standard edit graph AND the remove-mode graph (a
        different XLA program: the BlobNet branch is statically absent)
        before accepting traffic, then pin the warm shapes."""
        from blobctrl_tpu.blob import math as blob_math
        size = self.size
        blank = np.full((size, size, 3), 255, np.uint8)
        gs = np.asarray(blob_math.blob_score_from_ellipse(
            ((size * 0.5, size * 0.5), (size * 0.3, size * 0.4), 0.0),
            size, size, (size // 8, size // 8)))
        kw = dict(fg_image=blank, bg_image=blank, gs_score=gs, height=size,
                  width=size, num_inference_steps=steps, guidance_scale=7.5,
                  seed=0, blobnet_conditioning_scale=1.2)
        if getattr(self.pipeline, "clip_params", None) is not None:
            kw["prompt"] = ""          # tokenizes fine; exercises CLIP too
        else:
            rng = np.random.RandomState(0)
            ctx = self.pipeline.unet_cfg.cross_attention_dim
            kw["prompt_embeds"] = rng.randn(1, 77, ctx).astype(np.float32)
            kw["negative_prompt_embeds"] = kw["prompt_embeds"]
        if getattr(self.pipeline, "dino_params", None) is None:
            dc = self.pipeline.blobnet_cfg.conditioning_channels - 1
            kw["fg_dino_feats"] = np.zeros((1, dc), np.float32)
        with self.lock:
            self.pipeline(**kw)
            # remove mode: strength 0 + bg-only score (see edit())
            kw_rm = dict(kw, blobnet_conditioning_scale=0.0,
                         gs_score=np.asarray(
                             blob_math.removal_score((size // 8, size // 8))))
            self.pipeline(**kw_rm)
        self.warm_steps = steps
        self.warm = True

    def _validate_limits(self, req: dict, size: int, steps: int,
                         num_samples: int):
        """400 on requests that would compile a cold XLA graph under the
        serving lock (minutes of stalled traffic) or exceed resource caps."""
        if not 1 <= num_samples <= self.MAX_SAMPLES:
            raise ValueError(
                f"num_samples must be in [1, {self.MAX_SAMPLES}]")
        if not 1 <= steps <= self.MAX_STEPS:
            raise ValueError(
                f"num_inference_steps must be in [1, {self.MAX_STEPS}]")
        if self.strict_shapes and self.warm_steps is not None:
            if size != self.size:
                raise ValueError(
                    f"size={size} is not warm-compiled (serving size "
                    f"{self.size}); cold shapes are rejected to avoid a "
                    "multi-minute compile under the TPU lock")
            if steps != self.warm_steps:
                raise ValueError(
                    f"num_inference_steps={steps} is not warm-compiled "
                    f"(serving steps {self.warm_steps})")

    def _validate_cold_graph(self, req: dict):
        """Scheduler / batch / encoder-cache choices each select a different
        XLA program than the two warmed at startup; reject them under
        strict_shapes rather than compiling under the lock."""
        if not (self.strict_shapes and self.warm_steps is not None):
            return
        cold = []
        if str(req.get("scheduler", "unipc")) != "unipc":
            cold.append("scheduler")
        if int(req.get("num_samples", 1)) != 1:
            cold.append("num_samples")
        if int(req.get("encoder_cache_interval", 0)) != 0:
            cold.append("encoder_cache_interval")
        if cold:
            raise ValueError(
                f"non-default {'/'.join(cold)} selects a graph that was not "
                "warm-compiled; start the server with strict_shapes=False "
                "or extend warmup to cover it")

    def edit(self, req: dict) -> dict:
        from blobctrl_tpu.blob import math as blob_math
        size = int(req.get("size", self.size))
        self._validate_limits(req, size,
                              int(req.get("num_inference_steps", 50)),
                              int(req.get("num_samples", 1)))
        self._validate_cold_graph(req)
        if "fg_image" not in req or "bg_image" not in req:
            raise ValueError("fg_image and bg_image (base64) are required")
        fg = _decode_image(req["fg_image"], "fg_image")
        bg = _decode_image(req["bg_image"], "bg_image")

        lh, lw = size // 8, size // 8
        if req.get("remove"):
            gs = np.asarray(blob_math.removal_score((lh, lw)))
            strength = 0.0
        elif "gs_score" in req:
            gs = np.asarray(req["gs_score"], np.float32)
            strength = float(req.get("blobnet_conditioning_scale", 1.2))
        elif "ellipse" in req:
            e = [float(v) for v in req["ellipse"]]
            if len(e) != 5:
                raise ValueError("ellipse must be [cx, cy, d1, d2, angle]")
            gs = np.asarray(blob_math.blob_score_from_ellipse(
                ((e[0], e[1]), (e[2], e[3]), e[4]), size, size, (lh, lw)))
            strength = float(req.get("blobnet_conditioning_scale", 1.2))
        else:
            raise ValueError("one of ellipse / gs_score / remove is required")

        kw = dict(
            fg_image=fg, bg_image=bg, gs_score=gs, height=size, width=size,
            num_inference_steps=int(req.get("num_inference_steps", 50)),
            guidance_scale=float(req.get("guidance_scale", 7.5)),
            num_images_per_prompt=int(req.get("num_samples", 1)),
            seed=req.get("seed"),
            blobnet_conditioning_scale=strength,
            blobnet_control_guidance_start=float(
                req.get("blobnet_control_guidance_start", 0.0)),
            blobnet_control_guidance_end=float(
                req.get("blobnet_control_guidance_end", 1.0)),
            scheduler=str(req.get("scheduler", "unipc")),
            encoder_cache_interval=int(req.get("encoder_cache_interval", 0)),
        )
        if "prompt_embeds" in req:
            kw["prompt_embeds"] = np.asarray(req["prompt_embeds"], np.float32)
            if "negative_prompt_embeds" in req:
                kw["negative_prompt_embeds"] = np.asarray(
                    req["negative_prompt_embeds"], np.float32)
        else:
            kw["prompt"] = req.get("prompt", "")
            if req.get("negative_prompt") is not None:
                kw["negative_prompt"] = req["negative_prompt"]
        if "fg_dino_feats" in req:
            kw["fg_dino_feats"] = np.asarray(req["fg_dino_feats"], np.float32)

        t0 = time.perf_counter()
        with self.lock:
            out = self.pipeline(**kw)
            self.requests_served += 1
        sec = time.perf_counter() - t0
        resp = {"images": [_encode_image(im) for im in out.images],
                "seconds": round(sec, 4)}
        if out.nsfw_content_detected is not None:
            resp["nsfw_content_detected"] = [
                bool(v) for v in np.asarray(out.nsfw_content_detected).ravel()]
        return resp

    def info(self) -> dict:
        import jax
        from blobctrl_tpu.pipeline.blobnet_pipeline import SCHEDULER_NAMES
        return {
            "model": "blobctrl-tpu (SD-1.5 + BlobNet)",
            "size": self.size,
            "schedulers": list(SCHEDULER_NAMES),
            "device": str(jax.devices()[0]),
            "warm": self.warm,
            "warm_steps": self.warm_steps,
            "strict_shapes": self.strict_shapes,
            "max_body_bytes": self.max_body_bytes,
            "max_samples": self.MAX_SAMPLES,
            "requests_served": self.requests_served,
        }


def make_handler(service: EditService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload, content_type="application/json"):
            body = (payload if isinstance(payload, bytes)
                    else json.dumps(payload).encode())
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200 if service.warm else 503,
                           b"ok" if service.warm else b"warming up",
                           content_type="text/plain")
            elif self.path == "/v1/info":
                self._send(200, service.info())
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/v1/edit":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                if n > service.max_body_bytes:
                    self._send(413, {"error": (
                        f"body of {n} bytes exceeds the "
                        f"{service.max_body_bytes}-byte limit")})
                    return
                req = json.loads(self.rfile.read(n) or b"{}")
                self._send(200, service.edit(req))
            except (ValueError, KeyError, AssertionError, TypeError) as e:
                # wrong/missing fields, undecodable images (_decode_image
                # converts those to ValueError), wrong JSON types: client
                # mistakes. Server-side OSErrors fall through to 500.
                self._send(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — survive bad requests
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # structured logging instead
            from blobctrl_tpu.utils import observability
            observability.log_event("http", path=self.path,
                                    msg=fmt % args)
    return Handler


def serve(pipeline, host: str = "0.0.0.0", port: int = 8000,
          size: int = 512, warmup_steps: Optional[int] = 50,
          strict_shapes: bool = True,
          max_body_bytes: Optional[int] = None):
    service = EditService(pipeline, size=size, strict_shapes=strict_shapes,
                          max_body_bytes=max_body_bytes)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    if warmup_steps:
        threading.Thread(target=service.warmup, args=(warmup_steps,),
                         daemon=True).start()
    else:
        service.warm = True
    return service, httpd


def main():
    from blobctrl_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()
    p = argparse.ArgumentParser(description="BlobCtrl-TPU serving")
    p.add_argument("--models_root", default="models")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--no_warmup", action="store_true")
    p.add_argument("--allow_cold_shapes", action="store_true",
                   help="accept requests whose shape/scheduler was not "
                        "warm-compiled (each pays an XLA compile under the "
                        "TPU lock)")
    args = p.parse_args()

    from blobctrl_tpu.params import io as io_lib
    pipeline = io_lib.load_pipeline(args.models_root)
    service, httpd = serve(pipeline, args.host, args.port,
                           warmup_steps=None if args.no_warmup else 50,
                           strict_shapes=not args.allow_cold_shapes)
    print(f"serving on {args.host}:{args.port} (warming up in background)")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
