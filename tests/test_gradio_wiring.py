"""Execute the Gradio event graph (apps/gradio_app.build_demo) once per
handler against the stub gradio in tests/gradio_stub.py — gradio itself is
not installed here. Catches wiring bugs the session-level tests cannot:
wrong output arity/ordering, handlers reading stale state keys, guards that
crash instead of warning. Reference surface:
/root/reference/scripts/blobctrl_app.py:1464-1839."""

import os

import numpy as np
import pytest

import jax

from tests import gradio_stub

DEMO_ROOT = "/root/reference/assets/results/demo"


class FakeSam:
    """Predictor double: any click segments a centered square."""

    def set_image(self, img):
        self.hw = img.shape[:2]

    def predict(self, point_coords, point_labels, multimask_output=False):
        h, w = self.hw
        yy, xx = np.mgrid[0:h, 0:w]
        # disc (not a square): its convex hull has >= 5 points, which
        # cv2.fitEllipse requires
        m = (((yy - h / 2) ** 2 + (xx - w / 2) ** 2)
             < (min(h, w) / 4) ** 2)[None]
        return m, np.ones((1,), np.float32), m.astype(np.float32)


@pytest.fixture(scope="module")
def demo_and_session():
    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.apps.session import BlobCtrlSession
    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import dinov2 as dino_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.models import vae as vae_lib
    from blobctrl_tpu.pipeline import BlobNetPipeline
    from tests.test_session_replay import fake_prompt_encoder

    gradio_stub.install()
    key = jax.random.PRNGKey(0)
    unet_cfg, blobnet_cfg = flagship.tiny_configs(dino_c=16, ctx=16)
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    dino_cfg = dino_lib.DINOv2Config(hidden_size=16, num_layers=2,
                                     num_heads=2, intermediate_size=32,
                                     patch_size=14, image_size=28)
    pipe = fake_prompt_encoder(BlobNetPipeline(
        unet_cfg=unet_cfg, unet_params=unet_lib.init_unet(key, unet_cfg),
        blobnet_cfg=blobnet_cfg,
        blobnet_params=blobnet_lib.init_blobnet(key, blobnet_cfg),
        vae_cfg=vae_cfg, vae_params=vae_lib.init_vae(key, vae_cfg),
        dino_cfg=dino_cfg, dino_params=dino_lib.init(key, dino_cfg),
        dino_image_size=28))
    session = BlobCtrlSession(pipe, sam_predictor=FakeSam(), size=64)

    from blobctrl_tpu.apps.gradio_app import build_demo
    demo = build_demo(session, DEMO_ROOT)
    yield demo, session
    gradio_stub.uninstall()


def invoke(ev, *args):
    """Call a handler and check its return arity matches the declared
    outputs (the class of bug this test exists for)."""
    ret = ev.fn(*args)
    n = len(ret) if isinstance(ret, tuple) else 1
    assert n == len(ev.outputs), (
        f"{ev.component.label!r}.{ev.name}: handler returned {n} values "
        f"for {len(ev.outputs)} declared outputs")
    return ret


def test_demo_constructs_with_all_events(demo_and_session):
    demo, _ = demo_and_session
    names = {(e.name, e.component.label) for e in demo.events}
    # the full reference surface is wired (blobctrl_app.py:1464-1839)
    assert len(demo.events) >= 16
    assert any(n == "select" for n, _ in names)          # click-to-move
    assert any(n == "release" for n, _ in names)         # slider edits
    assert any("Run Generation" in (l or "") for _, l in names)
    assert any("Load Example" in (l or "") for _, l in names)
    # every event's outputs reference real components of this Blocks
    comp_ids = {id(c) for c in demo.components}
    for e in demo.events:
        for out in e.outputs:
            assert id(out) in comp_ids, (
                f"{e.component.label}.{e.name} outputs a foreign component")


@pytest.mark.slow
def test_event_graph_full_flow(demo_and_session):
    demo, session = demo_and_session
    import gradio as gr  # the stub

    img = np.full((80, 90, 3), 200, np.uint8)
    img[20:60, 25:65] = 60

    invoke(demo.find_event("upload", "Input"), img)
    assert session.original_image.shape == (64, 64, 3)

    sel_input = demo.find_event("select", "Input")
    invoke(sel_input, gr.SelectData((32, 32)))
    assert session.mask is not None
    invoke(demo.find_event("click", "Undo Seg"))
    invoke(sel_input, gr.SelectData((32, 30)))

    invoke(demo.find_event("click", "Generate Blob"))
    assert session.editor.entries

    sel_blob = demo.find_event("select", "Editable Blob")
    cx, cy = session.editor.current[0]
    invoke(sel_blob, gr.SelectData((int(cx), int(cy))))       # select center
    invoke(sel_blob, gr.SelectData((int(cx) + 5, int(cy))))   # move
    assert len(session.tracking_points) == 2
    invoke(demo.find_event("click", "Undo Point"))
    invoke(demo.find_event("click", "Reset Points"))

    invoke(demo.find_event("release", "Resize (aspect"), 1.1)
    invoke(demo.find_event("release", "long axis"), 1.05)
    invoke(demo.find_event("release", "short axis"), 1.05)
    invoke(demo.find_event("release", "START"), 1.05)
    invoke(demo.find_event("release", "Rotate"), 10.0)

    invoke(demo.find_event("change", "Remove mode"), True)
    invoke(demo.find_event("change", "Remove mode"), False)

    out = invoke(demo.find_event("click", "Run Generation"),
                 "a prompt", 1.2, 0.0, 1.0, 7, 1, 7.5, 2, False, False)
    # one gallery output: list of result images + ellipse overlays
    assert isinstance(out, list) and len(out) == 2
    assert out[0].dtype == np.uint8 and out[0].shape == (64, 64, 3)

    # compositional add
    invoke(demo.find_event("click", "Set Init Ellipse"),
           "[0.5, 0.5, 0.3, 0.25, 0]")
    obj = np.full((80, 80, 3), 255, np.uint8)
    obj[20:60, 20:60] = 30
    invoke(demo.find_event("upload", "Object image"), obj)

    # guards warn (not crash) on empty state
    session.editor.entries = []
    gradio_stub.WARNINGS.clear()
    invoke(demo.find_event("release", "Rotate"), 10.0)
    assert gradio_stub.WARNINGS, "empty-state guard should warn"


@pytest.mark.skipif(not os.path.isdir(DEMO_ROOT), reason="no demo assets")
def test_example_replay_event(demo_and_session):
    demo, session = demo_and_session
    ret = invoke(demo.find_event("click", "Load Example"), "move_hat")
    # 12 outputs: image, 5 galleries/views, prompt, 4 sliders, remove box
    assert len(ret) == 12
    assert session.editor.entries, "example state restored into the session"
    assert isinstance(ret[6], str)            # scene prompt
    assert isinstance(ret[11], bool)          # remove checkbox
