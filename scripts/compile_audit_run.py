"""Run the production-geometry sharded-compile audit on the virtual CPU
mesh and write the per-recipe reports (VERDICT r4 Next #1: replace the
tp_projection spreadsheet inputs with compiler output).

    python scripts/compile_audit_run.py --recipes tp,hybrid --devices 8 \
        --json_out compile_audit.json

Must own the process: the axon TPU plugin overrides JAX_PLATFORMS, so the
platform is pinned via jax.config BEFORE any backend initialization (same
dance as tests/conftest.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--recipes", default="tp,hybrid")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--json_out", default=None)
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == args.devices, jax.devices()

    from blobctrl_tpu.parallel import compile_audit

    reports = {}
    for recipe in args.recipes.split(","):
        t0 = time.time()
        rep, _compiled = compile_audit.compile_production_edit(
            recipe, size=args.size, num_steps=args.num_steps)
        rep["compile_seconds"] = round(time.time() - t0, 1)
        reports[recipe] = rep
        body = rep["while_body"]
        print(f"== {recipe} mesh={rep['mesh']} "
              f"compile={rep['compile_seconds']}s")
        print(f"   total collectives: {rep['collectives_total']['count']} "
              f"({rep['collectives_total']['bytes'] / 1e6:.1f} MB)")
        print(f"   denoise while-body [{body['computation']}]: "
              f"{body['count']} collectives, "
              f"{body['bytes'] / 1e6:.1f} MB/step")
        for op, st in sorted(body.get("ops", {}).items()):
            print(f"     {op:<20} x{st['count']:<4} "
                  f"{st['bytes'] / 1e6:.1f} MB")
        print(f"   memory: {json.dumps(rep['memory_analysis'])}")
        print(f"   cost:   {json.dumps(rep['cost_analysis'])}")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(reports, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
