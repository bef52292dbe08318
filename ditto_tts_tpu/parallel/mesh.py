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
    """Bootstrap multi-host JAX (idempotent).

    With explicit arguments (CPU integration tests, manual pod bringup)
    failures PROPAGATE — a half-initialized distributed run must fail fast,
    not limp along single-process. Only the zero-arg auto-detect form
    (TPU pod env metadata) is allowed to fall back to single-process when
    no coordination env exists. Exercised for real by
    tests/test_multihost.py (2 CPU processes over a coordinator).
    """
    # NOTE: jax.process_count() would initialize the XLA backend, after
    # which distributed init is rejected — probe the coordination client.
    if jax.distributed.is_initialized():
        return
    explicit = coordinator_address is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    except (ValueError, RuntimeError):
        if explicit:
            raise
        # zero-arg form on a single host: no coordinator env -> single proc


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))
