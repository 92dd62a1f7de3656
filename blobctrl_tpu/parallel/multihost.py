"""Multi-host SPMD: process-spanning meshes for pod-scale training.

The reference is single-GPU, single-process (SURVEY.md §2.5 — no
distributed backend anywhere in /root/reference). Production TPU training
spans hosts (a v5e pod slice has 4 chips per host; v5e-256 = 64 processes),
and JAX's runtime keeps that the *same* SPMD program: after
``jax.distributed.initialize`` every process runs identical code,
``jax.devices()`` is the GLOBAL device list, and the GSPMD collectives the
single-host path already uses ride ICI/DCN underneath. The only genuinely
multi-host concerns are (a) runtime bring-up, (b) feeding each process its
local slice of the global batch, and (c) reading back replicated results —
this module owns exactly those three.

  * :func:`initialize` — distributed bring-up. On TPU pods everything
    auto-detects from the environment; for CPU testing (and this repo's
    cross-process CI) pass coordinator/num_processes/process_id explicitly
    and gloo collectives are enabled.
  * :func:`host_local_batch` — per-process rows -> one global data-sharded
    ``jax.Array``. The multi-host data-loading contract: each process loads
    ONLY the rows :func:`local_rows` names, so the input pipeline scales
    with host count instead of replicating IO.
  * :func:`fetch` — replicated global outputs (loss, metrics) -> host numpy
    via the process-local copy.

``parallel.mesh.make_mesh`` / ``shard_params`` / ``shard_batch`` work
unchanged on the global device list, and orbax checkpointing
(train/checkpoint.py) is multihost-aware given global arrays — every
process calls save/restore collectively.

Validated cross-process by tests/test_multihost.py: 2 OS processes x 4
virtual CPU devices form one 8-device mesh and the DP train step produces
the same loss as the single-process run of the same global batch.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               cpu: bool = False) -> bool:
    """Bring up the cross-process runtime. Call ONCE, before any other jax
    API touches the backend.

    TPU pods: call with no arguments — coordinator, process count, and
    process id auto-detect from the TPU environment. Single process (or
    args all absent outside a pod): returns False and the session stays
    single-host; every other helper here degrades to the identity.

    ``cpu=True`` forces the CPU backend (through the config API, which the
    TPU plugin in this image cannot override) and selects gloo CPU
    collectives — the cross-process testing configuration.
    """
    if cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    explicit = coordinator_address is not None
    # TPU_WORKER_HOSTNAMES is set even on single-host deployments (this
    # image's tunnel sets it to one hostname) — only a multi-entry list
    # means a pod
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    auto_pod = not explicit and ("," in hostnames
                                 or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
                                 or "JAX_COORDINATOR_ADDRESS" in os.environ)
    if not explicit and not auto_pod:
        return False
    if explicit:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        try:
            jax.distributed.initialize()
        except ValueError:
            # pod-looking environment without a resolvable coordinator:
            # stay single-host rather than crash the training entry point
            return False
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def local_rows(global_batch: int) -> range:
    """Global-batch row range THIS process is responsible for loading.

    Rows are contiguous per process (matching make_mesh's row-major device
    order: a process's local devices hold adjacent positions of the data
    axis). global_batch must divide evenly over processes — ragged batches
    would silently desync the SPMD program.
    """
    n, i = jax.process_count(), jax.process_index()
    assert global_batch % n == 0, (global_batch, n)
    per = global_batch // n
    return range(i * per, (i + 1) * per)


def host_local_batch(mesh: Mesh, tree, axis: str = "data"):
    """Per-process local rows -> global batch-sharded jax.Arrays.

    Each leaf of ``tree`` holds only this process's rows (len(local_rows)
    leading dim); the result is the global array of the full batch, sharded
    over ``axis``, with no cross-host data movement (every shard comes from
    the process that owns it).
    """
    sharding = NamedSharding(mesh, P(axis))

    def one(x):
        return jax.make_array_from_process_local_data(sharding,
                                                      np.asarray(x))
    return jax.tree_util.tree_map(one, tree)


def replicate(mesh: Mesh, tree):
    """Identical-on-every-process host arrays -> replicated global arrays.

    The multi-host analogue of ``mesh.shard_params(...)`` for the common
    replicated-weights case: every process holds the full value (e.g. all
    initialized from the same PRNGKey, or all read the same checkpoint) and
    contributes its local devices' copies.
    """
    s = NamedSharding(mesh, P())

    def one(x):
        return jax.make_array_from_process_local_data(s, np.asarray(x))
    return jax.tree_util.tree_map(one, tree)


def fetch(tree):
    """Replicated global outputs -> host numpy (scalars: loss/metrics).

    Reads the process-local copy of fully-replicated arrays; raises if an
    array is not fully addressable here (i.e. actually sharded — fetching
    those would need an explicit all-gather, which a metrics path should
    not be doing silently).
    """
    def one(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            assert x.is_fully_replicated, (
                "fetch() is for replicated outputs; got a cross-host "
                f"sharded array {x.shape} {x.sharding}")
            return np.asarray(x.addressable_shards[0].data)
        return np.asarray(x)
    return jax.tree_util.tree_map(one, tree)


def sync(tag: str = "sync"):
    """Barrier across all processes (e.g. around checkpoint writes)."""
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(tag)


def barrier(tag: str, timeout_s: float = 600.0) -> None:
    """Coordination-service barrier: blocks until EVERY process reaches it.

    Unlike :func:`sync` (a device collective: on the CPU backend a gloo op
    whose context bring-up has a short hard-coded rendezvous window), this
    rides the coordinator's gRPC coordination service with an explicit,
    generous timeout — so it is safe to use BEFORE the first collective,
    e.g. to line processes up after their (arbitrarily skewed) compiles.
    The canonical multi-host step sequence is therefore:

        compiled = step_fn.lower(...).compile()   # per-process, any skew
        multihost.barrier("compiled")             # absorb the skew here
        compiled(...)                             # first gloo/ICI collective
                                                  # now starts ~simultaneously

    No-op when the distributed runtime is not active.
    """
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None or jax.process_count() <= 1:
        return
    client.wait_at_barrier(tag, int(timeout_s * 1000))
