"""Device mesh construction + multi-host bootstrap.

The reference has no distributed layer (SURVEY §2.2: single device, NCCL
installed-but-unused). This is the TPU-native equivalent designed from the
north star: a (data, model) mesh over the pod slice, ICI-major axis order so
model-parallel collectives ride the fastest links, and
``jax.distributed.initialize`` for multi-host runs.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import MeshConfig


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, model) mesh. model axis is innermost (ICI-contiguous
    on TPU slices, where adjacent device ids share the fastest links)."""
    devices = list(devices if devices is not None else jax.devices())
    need = cfg.data * cfg.model
    if need > len(devices):
        raise ValueError(f"mesh {cfg.data}x{cfg.model} needs {need} devices, "
                         f"have {len(devices)}")
    grid = np.array(devices[:need]).reshape(cfg.data, cfg.model)
    return Mesh(grid, cfg.axis_names)


def auto_mesh(model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """All available devices: data axis = n/model_parallel."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n % model_parallel == 0
    cfg = MeshConfig(data=n // model_parallel, model=model_parallel)
    return make_mesh(cfg, devices)


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Bootstrap multi-host JAX (no-op on single host / already-initialized).

    On TPU pods the env provides the coordination info; args are for
    CPU-based integration tests.
    """
    if jax.process_count() > 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError):
        pass  # single-process run


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))
