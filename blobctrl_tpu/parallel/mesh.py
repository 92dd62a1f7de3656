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


def _model_spec_for(path_leaf: str, arr) -> P:
    """Partition spec for one param leaf under model sharding."""
    if path_leaf == "kernel" and arr.ndim == 2:
        return P(None, "model")
    if path_leaf == "kernel" and arr.ndim == 4:
        return P(None, None, None, "model")
    if path_leaf == "bias" and arr.ndim == 1:
        return P("model")
    return P()


def shard_params(mesh: Mesh, params, model_parallel: bool = False):
    """Place a param tree on the mesh: replicated, or with large kernels
    sharded over the model axis (GSPMD handles the rest)."""
    if not model_parallel or mesh.shape["model"] == 1:
        s = replicated(mesh)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), params)

    msize = mesh.shape["model"]

    def place(path, arr):
        leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        spec = _model_spec_for(leaf, arr)
        # only shard when divisible; replicate otherwise
        for ax, name in enumerate(spec):
            if name == "model" and arr.shape[ax] % msize != 0:
                spec = P()
                break
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)
