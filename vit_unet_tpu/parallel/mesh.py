"""Device mesh + distributed init — the TPU-native replacement for the
reference's ``TPUClusterResolver -> initialize_tpu_system -> TPUStrategy``
glue (``TPUs_in_Colab.ipynb`` cell 5, benatools ``get_device_strategy``,
SURVEY.md §2.3).

JAX/PJRT discovers local devices itself; multi-host jobs call
``initialize_distributed`` (coordinator via env or args) and collectives are
compiled by XLA onto ICI within a slice / DCN across slices.  The default
mesh is 1-D ``('data',)`` (the reference's only strategy); a 2-D
``('data', 'model')`` mesh enables tensor-parallel param sharding via
``partition.py`` rules.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize_distributed", "create_mesh", "create_hybrid_mesh",
           "data_sharding", "replicated", "local_device_count",
           "replica_count"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (no-op on single host).  Mirrors the role of TPU
    cluster resolution in the reference, via ``jax.distributed``."""
    if num_processes is None:
        num_processes = int(os.environ.get("VIT_UNET_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def create_mesh(model_parallel: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    ``model_parallel=1`` degenerates to pure DP — the reference's strategy
    (8-way replica on a v2-8, SURVEY.md §2.2).  Device order is kept so the
    'model' axis lands on ICI-adjacent chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def create_hybrid_mesh(model_parallel: int = 1,
                       devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """('data', 'model') mesh that is DCN-topology-aware for multi-slice
    TPU pods: data parallelism spans slices (gradient all-reduce rides DCN
    between slices, ICI within), model parallelism stays inside a slice
    (its collectives are per-layer and must ride ICI).  Falls back to
    ``create_mesh`` on a single slice / non-TPU backends.

    Honesty note: this path has NEVER run on real multi-slice hardware —
    this environment has one chip.  It is validated only against a mock
    topology (tests fabricate ``slice_index`` on CPU devices,
    tests/test_parallel.py), which checks the placement logic but not real
    DCN behavior.
    """
    devices = list(devices if devices is not None else jax.devices())
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    num_slices = len(slice_ids)
    if num_slices <= 1:
        return create_mesh(model_parallel, devices)
    from jax.experimental import mesh_utils

    per_slice = len(devices) // num_slices
    if per_slice % model_parallel:
        raise ValueError(
            f"{per_slice} devices/slice not divisible by "
            f"model_parallel={model_parallel}")
    grid = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(per_slice // model_parallel, model_parallel),
        dcn_mesh_shape=(num_slices, 1),
        devices=devices)
    return Mesh(grid, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-axis sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_device_count() -> int:
    return jax.local_device_count()


def replica_count(mesh: Mesh) -> int:
    """Number of data-parallel replicas (the reference's REPLICAS — used for
    its ``lr * REPLICAS`` and ``batch * REPLICAS`` conventions)."""
    return mesh.shape["data"]
