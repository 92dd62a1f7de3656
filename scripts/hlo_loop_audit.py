"""HLO-level audit of the denoise while-body (VERDICT r4 Next #3, levers
"hoist loop-invariant width-concat halves" and "donation/aliasing audit of
the ring buffers").

The pipeline already hoists the loop-invariant conditioning concats at the
SOURCE level (blobnet_pipeline.denoise: blob_cond_left /
blob_cond_right_extras / unet_cond_left are built once, outside
lax.fori_loop). This script verifies the property where it actually matters
— in the OPTIMIZED HLO:

  * inventory of `concatenate` ops inside the while-body (shape, dim,
    operand count, bytes): the per-step sample concats are expected; a
    leaked invariant (e.g. the 1029-channel BlobNet left half rebuilt every
    step) shows up as extra concat bytes;
  * `copy` ops inside the body: a copy of a scheduler ring-buffer shape
    means the dynamic-update-slice is NOT updating in place (aliasing
    regression);
  * `dynamic-update-slice` inventory: the UniPC history ring writes.

Runs on the CPU backend at tiny geometry (the property is shape-independent;
fast enough for CI — tests/test_hlo_loop_audit.py).

    python scripts/hlo_loop_audit.py [--steps 8] [--scheduler unipc]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_SHAPED_OP_RE = re.compile(
    r"=\s*(?P<dtype>\w+)\[(?P<shape>[\d,]*)\](?:\{[^}]*\})?\s*"
    r"(?P<op>concatenate|copy|dynamic-update-slice)\(")
_DIM_RE = re.compile(r"dimensions=\{(\d+)\}")

_DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "bf16": 2, "f16": 2, "s32": 4,
                "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8}


def _nbytes(dtype: str, shape: str) -> int:
    n = 1
    for d in shape.split(","):
        if d.strip():
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def body_op_inventory(hlo_text: str, body_name: str):
    """{op: [{shape, dim, operands, bytes}...]} for ops inside `body_name`
    and any computation called (fused) from it. Fusions keep their callees as
    separate computations; we attribute a computation to the body if its name
    contains the body's region id OR it is a fusion computation referenced
    from the body. Conservative: we scan the body region itself plus every
    `fused_computation` whose caller line sits in the body."""
    # split into computations
    comps = {}
    cur = None
    for line in hlo_text.splitlines():
        if line and not line[0].isspace() and line.rstrip().endswith("{"):
            tok = line.split(None, 1)[0]
            name = (line.split()[1].lstrip("%").split("(")[0]
                    if tok == "ENTRY" else tok.lstrip("%"))
            cur = name
            comps[cur] = []
        elif cur is not None:
            comps[cur].append(line)

    if body_name not in comps:
        raise SystemExit(f"while body {body_name!r} not found")

    # fusions called from the body: lines like  %fusion.N = ... fusion(...),
    # calls=%fused_computation.M
    called = set()
    frontier = [body_name]
    seen = set()
    while frontier:
        c = frontier.pop()
        if c in seen or c not in comps:
            continue
        seen.add(c)
        for line in comps[c]:
            for m in re.finditer(r"calls=%?([\w.\-]+)", line):
                called.add(m.group(1))
                frontier.append(m.group(1))
            for m in re.finditer(r"(?:body|condition)=%?([\w.\-]+)", line):
                # nested control flow inside the body (lax.cond branches)
                called.add(m.group(1))
                frontier.append(m.group(1))
            for m in re.finditer(
                    r"(?:true_computation|false_computation|branch_computations=\{)"
                    r"%?([\w.\-, %]+)", line):
                for name in re.split(r"[,\s%]+", m.group(1)):
                    if name:
                        called.add(name)
                        frontier.append(name)

    inv = collections.defaultdict(list)
    for comp in {body_name} | called:
        for line in comps.get(comp, []):
            m = _SHAPED_OP_RE.search(line)
            if not m:
                continue
            dim = _DIM_RE.search(line)
            n_operands = line.count("%") - 1 if "%" in line else 0
            inv[m.group("op")].append({
                "computation": comp,
                "dtype": m.group("dtype"),
                "shape": m.group("shape"),
                "dim": int(dim.group(1)) if dim else None,
                "bytes": _nbytes(m.group("dtype"), m.group("shape")),
            })
    return {k: sorted(v, key=lambda e: -e["bytes"]) for k, v in inv.items()}


def audit(steps: int = 8, scheduler: str = "unipc", size: int = 64):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.models import vae as vae_lib
    from blobctrl_tpu.parallel import compile_audit, mesh as mesh_lib
    from blobctrl_tpu.pipeline import BlobNetPipeline

    unet_cfg, blobnet_cfg = flagship.tiny_configs()
    vae_cfg = vae_lib.VAEConfig(block_out_channels=(8, 16, 16, 16),
                                layers_per_block=1, norm_num_groups=4)
    mesh = mesh_lib.make_mesh(data=1, model=1)
    pipe = BlobNetPipeline(unet_cfg=unet_cfg, blobnet_cfg=blobnet_cfg,
                           vae_cfg=vae_cfg, unet_params=None,
                           blobnet_params=None, vae_params=None,
                           dtype=jnp.bfloat16, mesh=mesh)
    edit_fn, _ = pipe._get_edit_fn(scheduler, steps, do_cfg=True,
                                   use_blobnet=True)
    avals = compile_audit.production_edit_avals(pipe, mesh, False, size=size,
                                                num_steps=steps)
    with mesh:
        compiled = edit_fn.lower(*avals).compile()
    hlo = compiled.as_text()

    bodies = compile_audit.while_body_names(hlo)
    if not bodies:
        raise SystemExit("no while loop found in the compiled module")
    # the denoise loop is the while body containing the most ops
    sizes = {}
    cur = None
    for line in hlo.splitlines():
        if line and not line[0].isspace() and line.rstrip().endswith("{"):
            tok = line.split(None, 1)[0]
            cur = (line.split()[1].lstrip("%").split("(")[0]
                   if tok == "ENTRY" else tok.lstrip("%"))
            sizes[cur] = 0
        elif cur is not None:
            sizes[cur] += 1
    body = max((b for b in bodies if b in sizes), key=lambda b: sizes[b])

    inv = body_op_inventory(hlo, body)
    report = {"body": body, "inventory": {}, "latent_bytes": None}

    h = w = size // 8
    latent_bytes = 2 * h * (2 * w) * 5 * 2  # CFG-2 double-width UNet input
    report["latent_bytes"] = latent_bytes

    for op, entries in sorted(inv.items()):
        total = sum(e["bytes"] for e in entries)
        hist = {}
        for e in entries:
            key = f"{e['dtype']}[{e['shape']}]@{e['dim']}"
            h = hist.setdefault(key, {"count": 0, "bytes": 0})
            h["count"] += 1
            h["bytes"] += e["bytes"]
        report["inventory"][op] = {
            "count": len(entries), "bytes": total,
            "shapes": dict(sorted(hist.items(),
                                  key=lambda kv: -kv[1]["bytes"]))}
    return report, hlo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--scheduler", default="unipc")
    ap.add_argument("--dump_hlo", default=None)
    args = ap.parse_args()
    report, hlo = audit(args.steps, args.scheduler)
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
    import json
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
