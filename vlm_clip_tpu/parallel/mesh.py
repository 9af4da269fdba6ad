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
SEQ_AXIS = "seq"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = -1   # -1: all remaining devices
    model: int = 1
    # Sequence-parallel axis. The reference's sequences are tiny (77
    # text tokens / <=577 patches — SURVEY.md §5.7), so SP is plumbing,
    # not a perf lever here; the axis exists so video (frames x patches)
    # and future long-context paths can shard activations.
    seq: int = 1


def create_mesh(cfg: MeshConfig = MeshConfig(),
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data','model'[,'seq']) mesh over the given devices.

    On a v5e-8 slice the default is an 8x1 mesh (pure DP); pass
    ``MeshConfig(model=4)`` etc. to carve out a TP axis for the large
    towers (ViT-L, Qwen-VLM), and ``seq=k`` for a sequence axis.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    n = devs.size
    model = cfg.model if cfg.model > 0 else 1
    seq = cfg.seq if cfg.seq > 0 else 1
    data = cfg.data if cfg.data > 0 else n // (model * seq)
    if data * model * seq != n:
        raise ValueError(f"mesh {data}x{model}x{seq} != {n} devices")
    if seq == 1:
        return Mesh(devs.reshape(data, model), (DATA_AXIS, MODEL_AXIS))
    return Mesh(devs.reshape(data, model, seq),
                (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


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
