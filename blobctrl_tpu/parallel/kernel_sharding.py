"""Trace-time kernel-sharding profiles: shard_map wrappers that keep the
Pallas kernels in the graph under SPMD sharding.

GSPMD cannot auto-partition Mosaic kernels — a ``pallas_call`` whose operands
carry non-trivial shardings fails to lower with ``NotImplementedError: Mosaic
kernels cannot be automatically partitioned. Please wrap the call in a
shard_map.`` The CPU virtual-mesh dryruns never see this (Pallas only engages
on the TPU backend), so without this module every sharded recipe —
``shard_to_mesh(model_parallel=...)``, ``--mesh data=N,model=M`` — would
crash the first time it ran on a real multi-chip slice. Discovered by the
AOT v5e:2x2 topology compile (scripts/compile_audit_run.py --topology).

The design: the pipeline knows the sharding recipe (which mesh axes shard
activation batch dims and which shard channels/heads — the Megatron pairing
in ``parallel.mesh._model_spec_for``), so it publishes a per-model
:class:`KernelProfile` for the duration of a trace. The kernel call sites
(``nn.attention``, ``nn.resnet``) read the active profile and wrap each
Pallas call in ``jax.shard_map`` with the matching specs:

  * flash attention — head-sharded over the model axes (to_q/k/v are
    column-parallel, so heads arrive already local; zero collectives),
    batch-sharded over the data axes.
  * conv3x3, column-parallel (resnet conv1, samplers, conv_in/out) — the
    kernel's output channels are sharded; each device convolves the full
    input into its channel shard. Zero collectives.
  * conv3x3, row-parallel (resnet conv2) — input channels sharded; each
    device computes a partial sum over its channel shard, combined with ONE
    ``psum`` over the model axes (the same all-reduce GSPMD inserts for the
    row-parallel XLA conv), bias added post-reduce.

Dims that do not divide the mesh axes fall back to replicated specs — the
same rule ``parallel.mesh.param_shardings`` applies to the weights, so specs
and placements agree and GSPMD inserts no surprise reshards.

Reference counterpart: none — the reference is single-GPU (SURVEY.md §2.5);
this is what makes the TPU recipes real on hardware.
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class KernelProfile:
    """How one model's activations are sharded inside the current graph.

    batch: mesh axes sharding activation batch dims (CFG/data parallelism).
    model: mesh axes sharding channel/head dims (tensor parallelism) — the
    axes ``parallel.mesh.shard_params`` sharded this model's weights over.
    """
    mesh: Mesh
    batch: Tuple[str, ...] = ()
    model: Tuple[str, ...] = ()

    @property
    def multi_device(self) -> bool:
        return self.mesh.size > 1


_PROFILES: contextvars.ContextVar[Optional[Dict[str, KernelProfile]]] = \
    contextvars.ContextVar("kernel_sharding_profiles", default=None)
_SCOPE: contextvars.ContextVar[Optional[str]] = \
    contextvars.ContextVar("kernel_sharding_scope", default=None)


@contextlib.contextmanager
def activate(profiles: Optional[Dict[str, KernelProfile]]):
    """Publish the per-model profile map for the duration of a trace. The
    pipeline wraps the body of each jitted entry point with this, so the
    context is active exactly when JAX traces the model code — per-trace
    state, not process-global (two pipelines on different meshes coexist)."""
    tok = _PROFILES.set(profiles)
    try:
        yield
    finally:
        _PROFILES.reset(tok)


@contextlib.contextmanager
def scope(name: str):
    """Entered by a model's apply fn (unet/blobnet/vae): selects which
    profile the kernel call sites below it see."""
    tok = _SCOPE.set(name)
    try:
        yield
    finally:
        _SCOPE.reset(tok)


def scoped(name: str):
    """Decorator form of :func:`scope` for model apply fns."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with scope(name):
                return fn(*args, **kwargs)
        return wrapper
    return deco


def current() -> Optional[KernelProfile]:
    """Profile for the active model scope, or None (single-device trace,
    un-sharded pipeline, or a model the recipe leaves replicated)."""
    profiles = _PROFILES.get()
    if not profiles:
        return None
    name = _SCOPE.get()
    if name is None:
        return None
    prof = profiles.get(name)
    if prof is not None and not prof.multi_device:
        return None
    return prof


def axes_size(mesh: Mesh, axes: Tuple[str, ...]) -> int:
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    return n


def _entry(axes: Tuple[str, ...]):
    """PartitionSpec entry for one dim: None / a name / a tuple of names."""
    if not axes:
        return None
    return axes[0] if len(axes) == 1 else tuple(axes)


def _resolve(prof: KernelProfile, batch_dim: int, model_dim: int):
    """-> (batch_axes, model_axes) actually usable for this call: drop axes
    the dims do not divide (mirroring param_shardings' divisibility rule)
    and never let one axis appear in both specs."""
    model = tuple(a for a in prof.model if prof.mesh.shape[a] > 1)
    if model and model_dim % axes_size(prof.mesh, model) != 0:
        model = ()
    batch = tuple(a for a in prof.batch
                  if a not in model and prof.mesh.shape[a] > 1)
    if batch and batch_dim % axes_size(prof.mesh, batch) != 0:
        batch = ()
    return batch, model


def local_channels(x: Array, role: str) -> int:
    """Per-device channel count the conv kernel will see under the active
    profile — what the pallas-vs-XLA routing heuristics should look at.
    role: 'row' shards x's channels; 'column' leaves them whole."""
    c = x.shape[-1]
    prof = current()
    if prof is None or role != "row":
        return c
    _, model = _resolve(prof, x.shape[0], c)
    return c // axes_size(prof.mesh, model) if model else c


def shard_flash_attention(flash_fn, q: Array, k: Array, v: Array,
                          prof: KernelProfile) -> Array:
    """Wrap a (q, k, v) -> out flash-attention call (all (B, H, S, D), same
    layout out) in shard_map: batch over the data axes, heads over the model
    axes. Self-attention only (Sq == Sk), which is the only shape the flash
    router accepts. No collectives: every (batch, head) pair is independent."""
    heads = q.shape[1]
    batch, model = _resolve(prof, q.shape[0], heads)
    spec = P(_entry(batch), _entry(model), None, None)
    fn = jax.shard_map(flash_fn, mesh=prof.mesh, in_specs=(spec, spec, spec),
                       out_specs=spec, check_vma=False)
    return fn(q, k, v)


def shard_attn_out_proj(out_h: Array, kernel: Array, bias: Optional[Array],
                        prof: KernelProfile,
                        x_scale: Optional[Array] = None,
                        w_scale: Optional[Array] = None,
                        out_dtype=None) -> Array:
    """Row-parallel attention output projection under SPMD: the
    (head, d)-contraction einsum ``bhsd,hdc->bsc`` with out_h head-sharded
    and the to_out kernel consumed in its NATIVE row-parallel (C, C)
    P(model, None) layout — the (heads, d, c) reshape happens inside the
    shard_map body on the local shard. Reshaping the sharded kernel outside
    splits the row sharding across the new (heads, d) dims, a transition
    GSPMD can only do by involuntary full rematerialization (observed on
    the virtual mesh, one per attention layer); here the boundary consumes
    the kernel exactly as shard_params placed it, and ONE psum combines the
    head partial sums — the same all-reduce the un-folded row-parallel
    matmul would cost.

    x_scale/w_scale: the int8 fold's dequant scales (out_h is then the
    pre-quantized int8 tensor and ``out_dtype`` names the result dtype)."""
    b, heads, sq, d = out_h.shape
    batch, model = _resolve(prof, b, heads)
    be, me = _entry(batch), _entry(model)
    in_specs = (P(be, me, None, None), P(me, None), P(), P(), P())
    out_spec = P(be, None, None)

    def body(out_h, kernel, bias, x_scale, w_scale):
        h_local = out_h.shape[1]
        if x_scale is not None:
            w_o = kernel.reshape(h_local, d, heads * d)
            y = jnp.einsum("bhsd,hdc->bsc", out_h, w_o,
                           preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (w_scale.astype(jnp.float32)
                                         * x_scale)
        else:
            w_o = kernel.astype(out_h.dtype).reshape(h_local, d, heads * d)
            y = jnp.einsum("bhsd,hdc->bsc", out_h, w_o,
                           preferred_element_type=jnp.float32
                           ).astype(out_h.dtype)
        if model:
            y = jax.lax.psum(y, model if len(model) > 1 else model[0])
        if bias is not None:
            y = y.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(out_dtype if out_dtype is not None else out_h.dtype)

    fn = jax.shard_map(body, mesh=prof.mesh, in_specs=in_specs,
                       out_specs=out_spec, check_vma=False)
    return fn(out_h, kernel, bias, x_scale, w_scale)


def shard_conv3x3(conv_fn, role: str, x: Array, conv_params,
                  prof: KernelProfile, norm=None,
                  norm_groups: Optional[int] = None,
                  eps: float = 1e-5) -> Array:
    """Wrap a conv3x3 call in shard_map under the Megatron role its weight
    was sharded with ('column': out channels sharded; 'row': in channels
    sharded + psum). conv_fn(x, kernel, bias, scale, shift, kernel_q,
    w_scale) computes the fused GroupNorm+SiLU+conv locally.

    norm: optional GroupNorm params — the fold to per-(B, C) scale/shift
    happens INSIDE the shard_map body. Two reasons: (a) per-group statistics
    are shard-local whenever the groups divide the model axes (contiguous
    channel blocks never straddle shards), so the stats never hit the wire;
    (b) folding outside produced a GSPMD pathology — the tiny
    (B, 1, g, c/g) broadcast chain feeding a channel-sharded shard_map
    operand triggers 'Involuntary full rematerialization' per conv
    (observed on the virtual mesh; tests/test_kernel_sharding.py pipeline
    tests gate it)."""
    assert role in ("column", "row"), role
    kernel = conv_params["kernel"]
    bias = conv_params.get("bias")
    kernel_q = conv_params.get("kernel_q")
    w_scale = conv_params.get("w_scale")
    cdim = kernel.shape[3] if role == "column" else kernel.shape[2]
    batch, model = _resolve(prof, x.shape[0], cdim)
    msz = axes_size(prof.mesh, model) if model else 1
    if role == "row" and norm is not None and msz > 1 \
            and norm_groups % msz != 0:
        # a GN group would straddle shards — stats could not stay local;
        # replicate instead (weights at such widths are replicated too)
        model, msz = (), 1
    be, me = _entry(batch), _entry(model)
    n_scale = norm["scale"] if norm is not None else None
    n_bias = norm["bias"] if norm is not None else None

    if role == "column":
        in_specs = (P(be, None, None, None),        # x: full channels
                    P(None, None, None, me),        # kernel: out-ch sharded
                    P(me),                          # bias
                    P(), P(),                       # GN scale/bias: (C_in,)
                    P(None, None, None, me),        # kernel_q
                    P(me))                          # w_scale: per-out-ch
        out_spec = P(be, None, None, me)
        groups_local = norm_groups
    else:
        in_specs = (P(be, None, None, me),          # x: in-ch sharded
                    P(None, None, me, None),        # kernel: in-ch sharded
                    P(),                            # bias: added post-psum
                    P(me), P(me),                   # GN scale/bias: (C_in,)
                    P(None, None, me, None),        # kernel_q
                    P())                            # w_scale: per-out-ch
        out_spec = P(be, None, None, None)
        groups_local = norm_groups // msz if norm is not None else None

    def body(x, kernel, bias, n_scale, n_bias, kernel_q, w_scale):
        from blobctrl_tpu.nn import layers
        scale = shift = None
        if n_scale is not None:
            scale, shift = layers.group_norm_scale_shift(
                {"scale": n_scale, "bias": n_bias}, x, groups_local, eps)
        if role == "column":
            return conv_fn(x, kernel, bias, scale, shift, kernel_q, w_scale)
        y = conv_fn(x, kernel, None, scale, shift, kernel_q, w_scale)
        if model:
            # the row-parallel combine — the same all-reduce GSPMD
            # inserts for the sharded XLA conv, at the same dtype
            y = jax.lax.psum(y, model if len(model) > 1 else model[0])
        if bias is not None:
            y = (y.astype(jnp.float32)
                 + bias.astype(jnp.float32)).astype(y.dtype)
        return y

    fn = jax.shard_map(body, mesh=prof.mesh, in_specs=in_specs,
                       out_specs=out_spec, check_vma=False)
    return fn(x, kernel, bias, n_scale, n_bias, kernel_q, w_scale)
