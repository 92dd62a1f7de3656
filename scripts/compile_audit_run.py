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
    p.add_argument("--topology", default=None, metavar="v5e:2x2",
                   help="AOT-compile against a REAL TPU topology via the "
                        "PJRT compile-only client instead of the virtual "
                        "CPU mesh: real collective lowering, real HBM/VMEM "
                        "memory analysis, real cost model — no chips "
                        "needed. tp uses a 1x4 mesh, hybrid 2x2 (a v5e-4).")
    p.add_argument("--naive", action="store_true",
                   help="use the pre-audit (round-4) param specs — "
                        "all-output-channel convs, no conv row-parallel "
                        "pairing — to quantify what the audit-driven spec "
                        "changes buy")
    args = p.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if not args.topology and "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}")
    import jax

    mesh_for = lambda recipe: None  # noqa: E731 — default: device mesh
    if args.topology:
        # host-side constants (scheduler tables) need SOME live backend at
        # trace time, but the compile target is the abstract topology — CPU
        # is always available and never blocks on the TPU tunnel
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from jax.experimental import topologies
        from jax.sharding import Mesh
        topo = topologies.get_topology_desc(args.topology, platform="tpu")
        devs = np.asarray(topo.devices)
        n = devs.size

        def mesh_for(recipe):  # noqa: F811
            if recipe == "hybrid":
                return Mesh(devs.reshape(2, n // 2), ("data", "model"))
            return Mesh(devs.reshape(1, n), ("data", "model"))
    else:
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu", jax.default_backend()
        assert len(jax.devices()) == args.devices, jax.devices()

    from blobctrl_tpu.parallel import compile_audit

    if args.naive:
        from jax.sharding import PartitionSpec as P
        from blobctrl_tpu.parallel import mesh as mesh_lib

        def naive_spec(path, arr, axes=("model",)):
            ax = axes[0] if len(axes) == 1 else tuple(axes)
            is_kernel = path.endswith(".kernel")
            row = ".to_out." in path or ".proj_out." in path
            if is_kernel and arr.ndim == 2:
                return P(ax, None) if row else P(None, ax)
            if is_kernel and arr.ndim == 4:
                return P(None, None, None, ax)
            if path.endswith(".bias") and arr.ndim == 1 and not row:
                return P(ax)
            return P()

        mesh_lib._model_spec_for = naive_spec

    reports = {}
    for recipe in args.recipes.split(","):
        t0 = time.time()
        rep, _compiled = compile_audit.compile_production_edit(
            recipe, mesh=mesh_for(recipe), size=args.size,
            num_steps=args.num_steps)
        if args.topology:
            rep["topology"] = args.topology
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
