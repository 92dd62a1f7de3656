"""Interactive Gradio demo — a thin UI over BlobCtrlSession (all edit logic
lives in apps/session.py; this file only wires widgets).

Mirrors the reference demo's flow (/root/reference/scripts/blobctrl_app.py):
upload -> click to segment -> generate blob -> drag/resize/rotate -> run.
Launch: python -m blobctrl_tpu.apps.gradio_app --models_root models
Requires `gradio` (not bundled in all environments).
"""

from __future__ import annotations

import argparse

import numpy as np


def build_demo(session):
    import gradio as gr

    with gr.Blocks(title="BlobCtrl-TPU") as demo:
        gr.Markdown("## BlobCtrl-TPU — element-level image editing")
        state_points = gr.State([])

        with gr.Row():
            with gr.Column():
                input_image = gr.Image(label="Input image (click object)")
                prompt = gr.Textbox(label="Scene prompt")
                with gr.Row():
                    gen_blob_btn = gr.Button("Generate blob")
                    undo_btn = gr.Button("Undo")
                    reset_btn = gr.Button("Reset")
                with gr.Row():
                    dx = gr.Slider(-256, 256, 0, label="Move X")
                    dy = gr.Slider(-256, 256, 0, label="Move Y")
                with gr.Row():
                    resize_s = gr.Slider(0.3, 3.0, 1.0, label="Resize")
                    rotate_s = gr.Slider(-180, 180, 0, label="Rotate")
                with gr.Row():
                    strength = gr.Slider(0.0, 2.0, 1.2, label="Control strength")
                    steps = gr.Slider(1, 100, 50, step=1, label="Steps")
                    seed = gr.Number(1248464818, label="Seed")
                remove_box = gr.Checkbox(label="Remove mode")
                run_btn = gr.Button("Run Generation", variant="primary")
            with gr.Column():
                blob_view = gr.Image(label="Editable blob")
                mask_view = gr.Image(label="Segmentation")
                results = gr.Gallery(label="Results")

        def reset_move_state():
            last_move["x"] = last_move["y"] = 0.0

        def on_upload(img):
            session.set_image(np.asarray(img))
            reset_move_state()
            return session.original_image

        def on_click(img, evt: gr.SelectData):
            mask = session.click(evt.index[0], evt.index[1])
            return mask

        def on_gen_blob():
            session.generate_blob()
            reset_move_state()
            return session.blob_visualization()

        # the sliders hold absolute offsets; apply only the delta since the
        # last release so repeated releases don't compound moves
        last_move = {"x": 0.0, "y": 0.0}

        def on_move(x, y):
            session.move(x - last_move["x"], y - last_move["y"])
            last_move["x"], last_move["y"] = x, y
            return session.blob_visualization()

        def on_resize(f):
            session.resize(f)
            return session.blob_visualization()

        def on_rotate(d):
            session.rotate(d)
            return session.blob_visualization()

        def on_undo():
            session.undo()
            reset_move_state()
            return session.blob_visualization()

        def on_reset():
            session.reset()
            reset_move_state()
            return session.blob_visualization()

        def on_run(p, st, n_steps, sd, remove):
            res = session.run(p, num_inference_steps=int(n_steps),
                              blobnet_control_strength=float(st),
                              seed=int(sd), remove=bool(remove))
            imgs = [(im * 255).astype(np.uint8) for im in res.images]
            return imgs + res.images_with_ellipse

        input_image.upload(on_upload, [input_image], [input_image])
        input_image.select(on_click, [input_image], [mask_view])
        gen_blob_btn.click(on_gen_blob, [], [blob_view])
        dx.release(on_move, [dx, dy], [blob_view])
        dy.release(on_move, [dx, dy], [blob_view])
        resize_s.release(on_resize, [resize_s], [blob_view])
        rotate_s.release(on_rotate, [rotate_s], [blob_view])
        undo_btn.click(on_undo, [], [blob_view])
        reset_btn.click(on_reset, [], [blob_view])
        run_btn.click(on_run, [prompt, strength, steps, seed, remove_box],
                      [results])
    return demo


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--models_root", default="models")
    p.add_argument("--port", type=int, default=7860)
    args = p.parse_args()

    from blobctrl_tpu.apps.session import BlobCtrlSession
    from blobctrl_tpu.params import io as params_io

    pipe = params_io.load_pipeline(args.models_root)
    sam_pred = None
    try:
        import torch
        import os
        sam_path = f"{args.models_root}/sam/sam_vit_h_4b8939.pth"
        if os.path.exists(sam_path):
            from blobctrl_tpu.models import sam as sam_lib
            from blobctrl_tpu.params import convert_sam
            sd = torch.load(sam_path, map_location="cpu", weights_only=True)
            sam_pred = sam_lib.SamPredictor(convert_sam.convert_sam(sd))
    except Exception as e:  # pragma: no cover
        print(f"SAM unavailable: {e}")

    session = BlobCtrlSession(pipe, sam_predictor=sam_pred)
    build_demo(session).launch(server_port=args.port)


if __name__ == "__main__":
    main()
