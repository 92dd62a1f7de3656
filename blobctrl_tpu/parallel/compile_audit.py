"""Production-geometry sharded-compile audit.

Compiles the REAL 512^2 SD-1.5+BlobNet edit graph (the same jitted ``edit``
program ``BlobNetPipeline.__call__`` dispatches — the hot loop the reference
runs eagerly, /root/reference/blobctrl/pipelines/pipeline_blobnet.py:1024-1123)
through ``shard_to_mesh`` recipes on a virtual device mesh, WITHOUT
materializing the ~3 GB of weights: params lower as ShapeDtypeStructs carrying
the exact NamedShardings ``parallel.mesh.shard_params`` would apply
(``param_shardings``). The compiled program is then audited:

  * every collective in the optimized HLO (kind, dtype/shape, payload bytes,
    which computation it lives in — the denoise while-body vs the fixed path),
  * XLA's cost model (``compiled.cost_analysis()``) and per-device memory
    (``compiled.memory_analysis()``),
  * SPMD partitioner health (involuntary rematerializations / warnings on
    stderr during compile).

This replaces the spreadsheet inputs of scripts/tp_projection.py with
compiler output: the per-step all-reduce payload is read off the compiled
while-body instead of derived from the Megatron spec by hand.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

_COLLECTIVE_RE = re.compile(
    r"=\s*(?:\([^)]*\)|(?P<dtype>\w+)\[(?P<shape>[\d,]*)\][^ ]*)\s*"
    r"(?P<op>all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)(?:-start)?\(")

_TUPLE_ELT_RE = re.compile(r"(\w+)\[([\d,]*)\]")


@dataclasses.dataclass
class Collective:
    op: str
    computation: str
    bytes: int
    shape: str


def _shape_bytes(dtype: str, shape: str) -> int:
    n = 1
    for d in shape.split(","):
        if d.strip():
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def parse_collectives(hlo_text: str) -> List[Collective]:
    """All collective ops in an optimized HLO module, attributed to the
    top-level computation they live in. Collectives are never fused, so they
    appear directly in control-flow region computations (the denoise
    while-body) or in ENTRY."""
    out: List[Collective] = []
    comp = "?"
    for line in hlo_text.splitlines():
        # computation headers are non-indented lines ending in "{":
        #   %region_2.1234 (arg_tuple: (...)) -> (...) {
        #   ENTRY %main.5678 (...) -> (...) {
        if line and not line[0].isspace() and line.rstrip().endswith("{"):
            tok = line.split(None, 1)[0]
            comp = (line.split()[1].lstrip("%").rstrip("(").split("(")[0]
                    if tok == "ENTRY" else tok.lstrip("%"))
            continue
        cm = _COLLECTIVE_RE.search(line)
        if not cm:
            continue
        if cm.group("dtype"):
            nbytes = _shape_bytes(cm.group("dtype"), cm.group("shape"))
            shape = f"{cm.group('dtype')}[{cm.group('shape')}]"
        else:
            # tuple-shaped collective: sum the element payloads
            tup = line.split("= (", 1)[1].split(") ", 1)[0]
            nbytes = sum(_shape_bytes(d, s)
                         for d, s in _TUPLE_ELT_RE.findall(tup))
            shape = "(" + tup + ")"
        out.append(Collective(cm.group("op"), comp, nbytes, shape))
    return out


def while_body_names(hlo_text: str) -> List[str]:
    """Names of all while-loop body computations in the module (the 50-step
    denoise loop is one of them; scan-free modules may have none)."""
    return re.findall(r"\bwhile\([^)]*\)[^\n]*?body=%?([\w.\-]+)", hlo_text)


def summarize_collectives(colls: List[Collective]) -> Dict[str, dict]:
    """Group collectives by computation: count + total payload per op kind.
    The computation with the largest payload is the denoise while-body."""
    by_comp: Dict[str, dict] = {}
    for c in colls:
        ent = by_comp.setdefault(c.computation, {"count": 0, "bytes": 0,
                                                 "ops": {}})
        ent["count"] += 1
        ent["bytes"] += c.bytes
        op = ent["ops"].setdefault(c.op, {"count": 0, "bytes": 0})
        op["count"] += 1
        op["bytes"] += c.bytes
    return by_comp


def production_edit_avals(pipe, mesh, hybrid_cfg_data: bool,
                          size: int = 512, num_steps: int = 50,
                          num_blobs: int = 1,
                          dtype=jnp.bfloat16) -> tuple:
    """Abstract arguments for the jitted ``edit`` fn at production geometry,
    with the exact shardings __call__/shard_to_mesh would produce: params via
    param_shardings (BlobNet over BOTH axes under the hybrid recipe,
    blobnet_pipeline.shard_to_mesh), the CFG prompt-embed pair over ``data``,
    everything else replicated (batch 1 is not divisible by the data axis —
    __call__'s put() replicates it)."""
    from blobctrl_tpu.parallel import mesh as mesh_lib
    from jax.sharding import NamedSharding, PartitionSpec as P

    h = w = size // 8
    rep = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    def abstract(tree, axes):
        shardings = mesh_lib.param_shardings(mesh, tree, model_parallel=True,
                                             axes=axes)
        return jax.tree_util.tree_map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            tree, shardings)

    def shapes(init_fn, cfg):
        sd = jax.eval_shape(lambda k: init_fn(k, cfg), jax.random.PRNGKey(0))
        return jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(
                s.shape, dtype if jnp.issubdtype(s.dtype, jnp.floating)
                else s.dtype), sd)

    from blobctrl_tpu.models import blobnet as blobnet_lib
    from blobctrl_tpu.models import unet as unet_lib
    from blobctrl_tpu.models import vae as vae_lib

    unet_avals = abstract(shapes(unet_lib.init_unet, pipe.unet_cfg),
                          ("model",))
    blob_axes = ("data", "model") if hybrid_cfg_data else ("model",)
    blob_avals = abstract(shapes(blobnet_lib.init_blobnet, pipe.blobnet_cfg),
                          blob_axes)
    vae_avals = abstract(shapes(vae_lib.init_vae, pipe.vae_cfg), ("model",))

    A = jax.ShapeDtypeStruct
    ctx = pipe.unet_cfg.cross_attention_dim
    dino_c = pipe.blobnet_cfg.conditioning_channels - 1
    return (
        unet_avals, blob_avals, vae_avals,
        A((1, size, size, 3), jnp.uint8, sharding=rep),       # fg_img
        A((1, size, size, 3), jnp.uint8, sharding=rep),       # bg_img
        A((2, h, w, 4), jnp.float32, sharding=rep),           # lat2_in
        A((), jnp.bool_, sharding=rep),                       # use_lat2
        A((1, h, w, 1 + num_blobs), jnp.float32, sharding=rep),  # gs
        A((1, num_blobs, dino_c), jnp.float32, sharding=rep),    # pooled
        A((2, 77, ctx), dtype, sharding=data),                # prompt_embeds
        A((1, h, w, 4), jnp.float32, sharding=rep),           # latents
        A((num_steps,), jnp.float32, sharding=rep),           # cond_scales
        A((), jnp.float32, sharding=rep),                     # guidance
        A((num_steps,), jnp.bool_, sharding=rep),             # key_mask
        A((num_steps,), jnp.bool_, sharding=rep),             # cfg_mask
        A((2,), jnp.uint32, sharding=rep),                    # noise_key
    )


def compile_production_edit(recipe: str, mesh=None, size: int = 512,
                            num_steps: int = 50, scheduler: str = "unipc"):
    """AOT-compile the production 512^2 edit graph under a sharding recipe
    ('tp' = pure tensor parallel; 'hybrid' = CFG-data x model) and return
    (report dict, compiled). No weights are materialized; nothing executes."""
    from blobctrl_tpu.apps import flagship
    from blobctrl_tpu.parallel import mesh as mesh_lib
    from blobctrl_tpu.pipeline import BlobNetPipeline

    assert recipe in ("tp", "hybrid"), recipe
    if mesh is None:
        n = len(jax.devices())
        need = 4 if recipe == "hybrid" else 2
        if n < need:
            raise RuntimeError(
                f"{recipe} audit needs >= {need} devices, have {n}; run on "
                f"the virtual CPU mesh (scripts/compile_audit_run.py sets "
                f"it up — the axon plugin overrides JAX_PLATFORMS, so "
                f"jax.config must set the platform before backend init)")
        mesh = (mesh_lib.make_mesh(data=2, model=n // 2) if recipe == "hybrid"
                else mesh_lib.make_mesh(data=1, model=min(4, n)))
    hybrid = recipe == "hybrid"

    pipe = BlobNetPipeline(
        unet_cfg=flagship.sd15_unet_config(),
        blobnet_cfg=flagship.blobctrl_blobnet_config(),
        vae_cfg=flagship.sd15_vae_config(),
        unet_params=None, blobnet_params=None, vae_params=None,
        dtype=jnp.bfloat16, mesh=mesh)
    pipe.shard_to_mesh(mesh=mesh, model_parallel=True,
                       hybrid_cfg_data=hybrid)

    edit_fn, _sched = pipe._get_edit_fn(scheduler, num_steps, do_cfg=True,
                                        use_blobnet=True)
    avals = production_edit_avals(pipe, mesh, hybrid, size=size,
                                  num_steps=num_steps)
    with mesh:
        lowered = edit_fn.lower(*avals)
        compiled = lowered.compile()

    hlo = compiled.as_text()
    colls = parse_collectives(hlo)
    by_comp = summarize_collectives(colls)
    # the denoise loop = the while-body computation with the largest payload
    bodies = [n for n in while_body_names(hlo) if n in by_comp]
    body_name = (max(bodies, key=lambda n: by_comp[n]["bytes"]) if bodies
                 else "")
    body = by_comp.get(body_name, {"count": 0, "bytes": 0, "ops": {}})
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax: one dict per device program
            cost = cost[0]
    except Exception:  # noqa: BLE001 — backend may not implement it
        cost = {}
    try:
        mem = compiled.memory_analysis()
    except Exception:  # noqa: BLE001
        mem = None
    # per-(op, shape) histogram inside the denoise body: the provenance map
    # for resharding traffic (which activation shape is being gathered)
    hist: Dict[Tuple[str, str], Dict[str, int]] = {}
    for c in colls:
        if c.computation == body_name:
            h = hist.setdefault((c.op, c.shape), {"count": 0, "bytes": 0})
            h["count"] += 1
            h["bytes"] += c.bytes
    top_shapes = [
        {"op": op, "shape": shape, **st}
        for (op, shape), st in sorted(hist.items(),
                                      key=lambda kv: -kv[1]["bytes"])][:25]

    report = {
        "recipe": recipe,
        "mesh": dict(mesh.shape),
        "size": size,
        "num_steps": num_steps,
        "collectives_total": {"count": len(colls),
                              "bytes": sum(c.bytes for c in colls)},
        "while_body": {"computation": body_name, **body},
        "while_body_top_shapes": top_shapes,
        "by_computation": by_comp,
        # the CPU backend dumps thousands of per-op utilization rows; keep
        # the module-level scalars only (TPU's cost model uses these names)
        "cost_analysis": {k: float(v) for k, v in (cost or {}).items()
                          if np.isscalar(v) and k in (
                              "flops", "transcendentals", "bytes accessed",
                              "optimal_seconds")},
        "memory_analysis": {
            k: int(getattr(mem, k))
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes")
            if hasattr(mem, k)},
    }
    return report, compiled
