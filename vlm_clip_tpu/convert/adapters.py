"""Adapter state-dict conversion: reference .pt checkpoints <-> our pytrees.

The reference saves adapter-only checkpoints as torch state dicts
(model_m.py:178-214, main.py:186-193; fixture: the checked-in
``test_checkpoints/test_adapter.pt``). These mappers let our models load
those files (via ``torch.load`` when torch is present, or any mapping of
the same key names) and export back.

Key layouts handled:
- feature adapter (T/V):   fc1/fc2 Linear            (model_v.py:18-27)
- sequence adapter (M):    down_project/up_project/layer_norm
                           (clip_adapter.py:11-15)
- cross-modal adapter (M): text_proj/image_proj/cross_attn(packed
  in_proj)/norm1-3/mlp.{0,2}                          (clip_adapter.py:79-96)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _lin(sd: Mapping, prefix: str) -> Dict[str, jnp.ndarray]:
    return {"kernel": jnp.asarray(_np(sd[f"{prefix}.weight"]).T),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def _ln(sd: Mapping, prefix: str) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.asarray(_np(sd[f"{prefix}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{prefix}.bias"]))}


def feature_adapter_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {"fc1": _lin(sd, "fc1"), "fc2": _lin(sd, "fc2")}


def feature_adapter_to_torch(p: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return {
        "fc1.weight": np.asarray(p["fc1"]["kernel"]).T,
        "fc1.bias": np.asarray(p["fc1"]["bias"]),
        "fc2.weight": np.asarray(p["fc2"]["kernel"]).T,
        "fc2.bias": np.asarray(p["fc2"]["bias"]),
    }


def seq_adapter_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    return {"down": _lin(sd, "down_project"), "up": _lin(sd, "up_project"),
            "ln": _ln(sd, "layer_norm")}


def seq_adapter_to_torch(p: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return {
        "down_project.weight": np.asarray(p["down"]["kernel"]).T,
        "down_project.bias": np.asarray(p["down"]["bias"]),
        "up_project.weight": np.asarray(p["up"]["kernel"]).T,
        "up_project.bias": np.asarray(p["up"]["bias"]),
        "layer_norm.weight": np.asarray(p["ln"]["scale"]),
        "layer_norm.bias": np.asarray(p["ln"]["bias"]),
    }


def cross_modal_adapter_from_torch(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """torch nn.MultiheadAttention packs qkv as in_proj_{weight,bias}."""
    in_w = _np(sd["cross_attn.in_proj_weight"])  # [3H, H]
    in_b = _np(sd["cross_attn.in_proj_bias"])    # [3H]
    H = in_w.shape[1]
    qw, kw, vw = in_w[:H], in_w[H:2 * H], in_w[2 * H:]
    qb, kb, vb = in_b[:H], in_b[H:2 * H], in_b[2 * H:]
    return {
        "text_proj": _lin(sd, "text_proj"),
        "image_proj": _lin(sd, "image_proj"),
        "attn": {
            "q": {"kernel": jnp.asarray(qw.T), "bias": jnp.asarray(qb)},
            "k": {"kernel": jnp.asarray(kw.T), "bias": jnp.asarray(kb)},
            "v": {"kernel": jnp.asarray(vw.T), "bias": jnp.asarray(vb)},
            "out": _lin(sd, "cross_attn.out_proj"),
        },
        "norm1": _ln(sd, "norm1"),
        "norm2": _ln(sd, "norm2"),
        "norm3": _ln(sd, "norm3"),
        "mlp": {"fc1": _lin(sd, "mlp.0"), "fc2": _lin(sd, "mlp.2")},
    }


def cross_modal_adapter_to_torch(p: Dict[str, Any]) -> Dict[str, np.ndarray]:
    qw = np.asarray(p["attn"]["q"]["kernel"]).T
    kw = np.asarray(p["attn"]["k"]["kernel"]).T
    vw = np.asarray(p["attn"]["v"]["kernel"]).T
    return {
        "text_proj.weight": np.asarray(p["text_proj"]["kernel"]).T,
        "text_proj.bias": np.asarray(p["text_proj"]["bias"]),
        "image_proj.weight": np.asarray(p["image_proj"]["kernel"]).T,
        "image_proj.bias": np.asarray(p["image_proj"]["bias"]),
        "cross_attn.in_proj_weight": np.concatenate([qw, kw, vw], axis=0),
        "cross_attn.in_proj_bias": np.concatenate([
            np.asarray(p["attn"]["q"]["bias"]),
            np.asarray(p["attn"]["k"]["bias"]),
            np.asarray(p["attn"]["v"]["bias"])]),
        "cross_attn.out_proj.weight":
            np.asarray(p["attn"]["out"]["kernel"]).T,
        "cross_attn.out_proj.bias": np.asarray(p["attn"]["out"]["bias"]),
        "norm1.weight": np.asarray(p["norm1"]["scale"]),
        "norm1.bias": np.asarray(p["norm1"]["bias"]),
        "norm2.weight": np.asarray(p["norm2"]["scale"]),
        "norm2.bias": np.asarray(p["norm2"]["bias"]),
        "norm3.weight": np.asarray(p["norm3"]["scale"]),
        "norm3.bias": np.asarray(p["norm3"]["bias"]),
        "mlp.0.weight": np.asarray(p["mlp"]["fc1"]["kernel"]).T,
        "mlp.0.bias": np.asarray(p["mlp"]["fc1"]["bias"]),
        "mlp.2.weight": np.asarray(p["mlp"]["fc2"]["kernel"]).T,
        "mlp.2.bias": np.asarray(p["mlp"]["fc2"]["bias"]),
    }
