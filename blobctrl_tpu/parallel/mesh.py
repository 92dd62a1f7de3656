"""Device mesh + sharding helpers.

The reference is single-GPU (SURVEY.md §2.5); here scaling is first-class:
  * ``data`` axis — batch sharding (pure DP, the honest strategy at SD-1.5
    scale: ~1B params fit comfortably in one chip's HBM).
  * optional ``model`` axis — weight sharding for the large kernels
    (attention/FF/conv output channels). XLA GSPMD inserts the collectives;
    correctness is layout-independent.

Everything works identically on 1 real chip, a v5e-4 slice, or an
xla_force_host_platform_device_count virtual CPU mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def parse_mesh_spec(spec: str) -> dict:
    """Parse the launch-flag mesh spec ``"data=N,model=M"`` (axis order
    free; either axis may be omitted — ``model`` defaults to 1 and ``data``
    to "fill with the remaining devices"; ``data=auto`` is the explicit
    spelling of that default). Returns kwargs for :func:`make_mesh`."""
    out = {"data": None, "model": 1}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(
                f"bad mesh spec segment {part!r}: expected 'data=N,model=M'")
        k, v = (s.strip() for s in part.split("=", 1))
        if k not in out:
            raise ValueError(
                f"unknown mesh axis {k!r}: expected 'data' and/or 'model'")
        out[k] = None if v in ("auto", "") else int(v)
    if out["model"] is None:
        out["model"] = 1
    if out["model"] < 1 or (out["data"] is not None and out["data"] < 1):
        raise ValueError(f"mesh axis sizes must be >= 1: {spec!r}")
    return out


def shard_pipeline_from_flags(pipe, mesh_spec: Optional[str] = None,
                              hybrid_cfg_data: bool = False):
    """One-stop launch-flag surface for the sharded inference recipes: build
    the mesh from ``--mesh data=N,model=M`` and apply the right
    ``shard_to_mesh`` recipe. With ``--hybrid_cfg_data`` and no explicit
    mesh, defaults to the projected-fastest v5e-4 single-edit recipe
    (data=2 over the CFG pair x model over the rest, PERF_NOTES "TP latency
    projection" path 2). Returns the mesh (or None when no sharding was
    requested). The pipeline enters the mesh context itself per call, so
    callers need no ``with mesh:`` block."""
    if not mesh_spec and not hybrid_cfg_data:
        return None
    if mesh_spec:
        kw = parse_mesh_spec(mesh_spec)
    else:
        kw = {"data": 2, "model": max(1, len(jax.devices()) // 2)}
    mesh = make_mesh(**kw)
    if hybrid_cfg_data and mesh.shape["data"] < 2:
        raise ValueError(
            "--hybrid_cfg_data shards the CFG pair over the data axis: "
            f"need data >= 2, got mesh {dict(mesh.shape)}")
    pipe.shard_to_mesh(mesh=mesh,
                       model_parallel=mesh.shape["model"] > 1,
                       hybrid_cfg_data=hybrid_cfg_data)
    return mesh


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model <= len(devices), (data, model, len(devices))
    dev_array = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, tree):
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def _model_spec_for(path: str, arr, axes=("model",)) -> P:
    """Partition spec for one param leaf under model (tensor) sharding.

    Megatron-style pairing so consecutive contractions ride the sharded
    dimension instead of resharding (the production-geometry compile audit,
    parallel/compile_audit.py, showed naive all-output-channel conv sharding
    costs ~3x the step payload in activation all-gathers):
      * column-parallel (output dim sharded): to_q/k/v, ff.proj_in,
        resnet conv1 (+ time_emb_proj, whose output adds to conv1's)
      * row-parallel (input dim sharded, psum after): attn to_out,
        ff.proj_out, resnet conv2 — their biases stay replicated (added
        post-reduce)
      * conv_shortcut and BlobNet zero-taps: replicated — their outputs add
        to full (post-all-reduce) activations, so sharding them would buy a
        per-use activation all-gather to save a trivial 1x1 conv
      * remaining convs (conv_in/out, up/down-samplers): output-channel
        sharded; the consumer gathers the (smaller, level-boundary)
        activation
    GSPMD inserts the all-reduce/all-gather collectives; any spec is
    numerically identical — these only set the communication pattern.

    axes: mesh axis name(s) the sharded dim spreads over — ("model",) for
    plain TP, ("data", "model") for networks whose batch dim cannot use the
    data axis (e.g. BlobNet at batch 1 in the hybrid CFG-data recipe).
    """
    ax = axes[0] if len(axes) == 1 else tuple(axes)
    is_kernel = path.endswith(".kernel")
    row_parallel = (".to_out." in path or ".proj_out." in path
                    or ".conv2." in path)
    # Transformer2D's spatial proj_in/proj_out are 1x1 convs (4D; the ff's
    # are 2D linears): replicate them so transformer-block inputs stay full
    # — sharding them makes every block-level LayerNorm gather its input.
    replicate = (".conv_shortcut." in path or ".zero_down." in path
                 or ".zero_mid." in path or ".zero_up." in path
                 or ((".proj_in." in path or ".proj_out." in path)
                     and (arr.ndim == 4
                          or (arr.ndim == 1 and ".ff." not in path))))
    if replicate:
        return P()
    if is_kernel and arr.ndim == 2:
        return P(ax, None) if row_parallel else P(None, ax)
    if is_kernel and arr.ndim == 4:
        return (P(None, None, ax, None) if row_parallel
                else P(None, None, None, ax))
    if path.endswith(".bias") and arr.ndim == 1 and not row_parallel:
        return P(ax)
    return P()


def param_shardings(mesh: Mesh, params, model_parallel: bool = False,
                    axes=("model",)):
    """NamedSharding tree for a param tree (or a matching tree of
    jax.ShapeDtypeStruct — anything with .shape): the placement
    :func:`shard_params` would apply, without touching device memory.
    Lets AOT compiles of production-size graphs lower against abstract
    params instead of materializing gigabytes of weights."""
    msize = 1
    for a in axes:
        msize *= mesh.shape[a]
    if not model_parallel or msize == 1:
        s = replicated(mesh)
        return jax.tree_util.tree_map(lambda x: s, params)

    def spec_of(path, arr):
        keys = [p.key if hasattr(p, "key") else str(getattr(p, "idx", p))
                for p in path]
        spec = _model_spec_for("." + ".".join(str(k) for k in keys), arr,
                               axes)
        # only shard when divisible; replicate otherwise
        for ax_i, name in enumerate(spec):
            if name is not None and arr.shape[ax_i] % msize != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_of, params)


def shard_params(mesh: Mesh, params, model_parallel: bool = False,
                 axes=("model",)):
    """Place a param tree on the mesh: replicated, or with large kernels
    sharded over the given mesh axes (GSPMD handles the rest)."""
    shardings = param_shardings(mesh, params, model_parallel, axes)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
