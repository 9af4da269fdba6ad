"""Device mesh ownership.

The single module that owns the `jax.sharding.Mesh` and its axis names —
the TPU-native replacement for a NCCL/MPI communication backend (the
reference has none; see SURVEY.md §2.10). Axes:

- ``data``  — batch (DP). Contrastive losses all_gather embeddings over it.
- ``model`` — tensor parallel (TP) for attention heads / MLP hidden dims.

Collectives are never called directly by user code: shardings are attached
via `jax.sharding.NamedSharding` / `with_sharding_constraint` and XLA
inserts all_gather / psum / reduce_scatter over ICI.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1


def create_mesh(cfg: MeshConfig = MeshConfig(),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a 2-D ('data','model') mesh over the given (or all) devices.

    On a v5e-8 slice the default is an 8×1 mesh (pure DP); pass
    ``MeshConfig(model=4)`` etc. to carve out a TP axis for the large towers
    (ViT-L, Qwen-VLM).
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    model = cfg.model if cfg.model > 0 else 1
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    return Mesh(devs.reshape(data, model), (DATA_AXIS, MODEL_AXIS))


_ACTIVE_MESH: Optional[Mesh] = None


@contextlib.contextmanager
def with_mesh(mesh: Mesh):
    """Set the ambient mesh used by sharding helpers."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        with jax.sharding.set_mesh(mesh):
            yield mesh
    finally:
        _ACTIVE_MESH = prev


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE_MESH


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Batch-dim-sharded, otherwise replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
