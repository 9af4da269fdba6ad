"""Checkpointing: orbax full-state resume + reference-format adapter export.

Two tiers (SURVEY.md §5.4):

1. **Full resume** (:func:`save_train_state` / :func:`restore_train_state`)
   — orbax checkpoint of adapter params + optimizer state + step. The
   reference never saves optimizer state ("no true resume anywhere");
   this adds it.

2. **Adapter-only export** (:func:`save_adapter_weights` /
   :func:`load_adapter_weights`) — the reference's checkpoint file
   contract (model_m.py:178-248): a dict of per-adapter state dicts keyed
   ``text_adapter`` / ``vision_adapter`` / ``shared_adapters`` with torch
   tensor layouts, including the strict enabled/present validation matrix
   on load. Files written with torch when available (bit-compatible with
   the reference; its checked-in ``test_checkpoints/test_adapter.pt``
   loads directly), else pickled numpy with identical keys.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from vlm_clip_tpu.core.config import AdapterConfig
from vlm_clip_tpu.convert import adapters as CA

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# tier 1: orbax full-state resume
# ---------------------------------------------------------------------------

def save_train_state(path: str, state) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state._asdict()), force=True)
    ckptr.wait_until_finished()


class AsyncTrainStateSaver:
    """Async orbax saves: overlap checkpoint writes with training.

    ``save`` hands the LIVE jax.Arrays to orbax and returns as soon as
    the save is scheduled — the device-to-host transfer and file writes
    run in orbax's background threads while the step loop keeps the
    chip busy (the synchronous :func:`save_train_state` blocks for the
    whole D2H + serialize: seconds for the ViT-L/14 full-fine-tune
    state). At most one save is in flight: a new ``save`` first waits
    for the previous one. Call ``wait`` before reading the files or
    exiting. The on-disk format is identical to
    :func:`save_train_state` (restore with :func:`restore_train_state`).
    """

    def __init__(self):
        import orbax.checkpoint as ocp

        self._ckptr = ocp.StandardCheckpointer()  # async under the hood

    def save(self, path: str, state) -> None:
        self._ckptr.wait_until_finished()  # at most one in flight
        self._ckptr.save(os.path.abspath(path), state._asdict(),
                         force=True)

    def wait(self) -> None:
        self._ckptr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._ckptr.close()


def restore_train_state(path: str, abstract_state):
    import orbax.checkpoint as ocp

    from vlm_clip_tpu.train.steps import TrainState

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(np.asarray, abstract_state._asdict())
    restored = ckptr.restore(path, target)
    return TrainState(**restored)


# ---------------------------------------------------------------------------
# tier 2: reference-format adapter-only export
# ---------------------------------------------------------------------------

def _m_adapters_to_torch_dicts(adapter_params: Params) -> Dict[str, Dict]:
    """Our M pytree -> {name: torch-layout state dict} (model_m.py:181-196)."""
    out: Dict[str, Dict] = {}
    if "text_adapter" in adapter_params:
        out["text_adapter"] = CA.seq_adapter_to_torch(
            adapter_params["text_adapter"])
    if "vision_adapter" in adapter_params:
        out["vision_adapter"] = CA.seq_adapter_to_torch(
            adapter_params["vision_adapter"])
    if "shared_adapters" in adapter_params:
        stacked = adapter_params["shared_adapters"]
        n_layers = int(jax.tree.leaves(stacked)[0].shape[0])
        sd: Dict[str, np.ndarray] = {}
        for i in range(n_layers):
            layer = jax.tree.map(lambda a: a[i], stacked)
            for k, v in CA.cross_modal_adapter_to_torch(layer).items():
                sd[f"{i}.{k}"] = v
        out["shared_adapters"] = sd
    return out


def _m_adapters_from_torch_dicts(sd: Mapping[str, Mapping]) -> Params:
    out: Params = {}
    if "text_adapter" in sd:
        out["text_adapter"] = CA.seq_adapter_from_torch(sd["text_adapter"])
    if "vision_adapter" in sd:
        out["vision_adapter"] = CA.seq_adapter_from_torch(
            sd["vision_adapter"])
    if "shared_adapters" in sd:
        flat = sd["shared_adapters"]
        n_layers = 1 + max(int(k.split(".", 1)[0]) for k in flat)
        layers = []
        for i in range(n_layers):
            prefix = f"{i}."
            sub = {k[len(prefix):]: v for k, v in flat.items()
                   if k.startswith(prefix)}
            layers.append(CA.cross_modal_adapter_from_torch(sub))
        out["shared_adapters"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *layers)
    return out


def save_adapter_weights(save_path: str, adapter_params: Params) -> None:
    """Adapter-only export in the reference's file format
    (model_m.py:178-203). Raises if no adapters present."""
    dicts = _m_adapters_to_torch_dicts(adapter_params)
    if not dicts:
        raise ValueError("No adapters enabled to save")
    d = os.path.dirname(save_path)
    if d:
        os.makedirs(d, exist_ok=True)
    try:
        import torch

        torch_dicts = {name: {k: torch.from_numpy(np.array(v))
                              for k, v in sd.items()}
                       for name, sd in dicts.items()}
        torch.save(torch_dicts, save_path)
    except ImportError:
        with open(save_path, "wb") as f:
            pickle.dump(dicts, f)


def load_adapter_weights(load_path: str, acfg: AdapterConfig) -> Params:
    """Load + strictly validate an adapter checkpoint (model_m.py:205-248).

    Validation matrix: every adapter kind enabled in ``acfg`` must be in
    the file, and every kind in the file must be enabled.
    """
    if not os.path.exists(load_path):
        raise FileNotFoundError(f"No adapter weights found at {load_path}")
    sd = None
    try:
        import torch

        sd = torch.load(load_path, map_location="cpu",
                        weights_only=False)
    except ImportError:
        pass
    if sd is None:
        with open(load_path, "rb") as f:
            sd = pickle.load(f)

    checks = (
        ("text_adapter", acfg.use_text_adapter, "Text adapter"),
        ("vision_adapter", acfg.use_vision_adapter, "Vision adapter"),
        ("shared_adapters", acfg.use_shared_adapters, "Shared adapters"),
    )
    for key, enabled, label in checks:
        if key in sd and not enabled:
            raise ValueError(
                f"{label} weights found but {label.lower()} "
                f"{'are' if key.endswith('s') else 'is'} not enabled")
        if enabled and key not in sd:
            raise ValueError(
                f"{label} {'are' if key.endswith('s') else 'is'} enabled "
                f"but no weights found in checkpoint")
    return _m_adapters_from_torch_dicts(sd)


def save_v_adapters(save_path: str, adapter_params: Params) -> None:
    """Pipeline-V one-shot export: visual/text/context adapter state dicts
    (main.py:186-193)."""
    dicts = {f"{name}_adapter_state_dict":
             CA.feature_adapter_to_torch(adapter_params[name])
             for name in ("visual", "text", "context")
             if name in adapter_params}
    d = os.path.dirname(save_path)
    if d:
        os.makedirs(d, exist_ok=True)
    try:
        import torch

        torch.save({k: {kk: torch.from_numpy(np.array(vv))
                        for kk, vv in v.items()} for k, v in dicts.items()},
                   save_path)
    except ImportError:
        with open(save_path, "wb") as f:
            pickle.dump(dicts, f)


def load_v_adapters(load_path: str) -> Params:
    try:
        import torch

        sd = torch.load(load_path, map_location="cpu", weights_only=False)
    except ImportError:
        with open(load_path, "rb") as f:
            sd = pickle.load(f)
    out: Params = {}
    for name in ("visual", "text", "context"):
        key = f"{name}_adapter_state_dict"
        if key in sd:
            out[name] = CA.feature_adapter_from_torch(sd[key])
    return out


def save_t_adapters(save_path: str, adapter_params: Params) -> None:
    """Pipeline-T adapter export (visual + text feature adapters).

    The reference's CLIPAdapter never gained a save path (its train loop
    keeps everything in memory, model_t.py:131-211); serving needs one.
    Same torch-dict format as the V export minus the context adapter, so
    the files interoperate where keys overlap.
    """
    for name in ("visual", "text"):
        if name not in adapter_params:
            raise ValueError(f"T adapters must contain '{name}'")
    save_v_adapters(save_path, adapter_params)


def load_t_adapters(load_path: str) -> Params:
    """Strict T-adapter load: both adapters must be present (a V export
    also qualifies; its context adapter is ignored)."""
    out = load_v_adapters(load_path)
    missing = [n for n in ("visual", "text") if n not in out]
    if missing:
        raise ValueError(
            f"{load_path} is not a T/V adapter checkpoint: missing "
            f"{missing} (found {sorted(out)})")
    return {"visual": out["visual"], "text": out["text"]}
