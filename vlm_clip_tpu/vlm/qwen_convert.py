"""HF Qwen2.5-VL checkpoint -> vlm_clip_tpu pytrees (+ optional
weight-only quantization, the bitsandbytes-NF4 replacement).

Accepts any mapping of HF state-dict names to arrays: a live torch
``state_dict()`` (hermetic tiny models in tests) or safetensors shards
loaded without torch. HF name roots handled: ``model.language_model.*`` /
``model.visual.*`` (transformers >= 4.52) and the legacy ``model.*`` /
``visual.*``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlm_clip_tpu.ops.quant import quantize_weight
from vlm_clip_tpu.vlm.qwen_model import (QwenTextConfig, QwenVisionConfig,
                                         QwenVLConfig)


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().float().numpy()
    return np.asarray(x)


def _lin(sd, prefix, bias=True):
    p = {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T)}
    if bias and prefix + ".bias" in sd:
        p["bias"] = jnp.asarray(_np(sd[prefix + ".bias"]))
    return p


def _norm(sd, prefix):
    return {"scale": jnp.asarray(_np(sd[prefix + ".weight"]))}


def _root(sd: Mapping[str, Any]) -> Dict[str, str]:
    if any(k.startswith("model.language_model.") for k in sd):
        return {"text": "model.language_model", "vision": "model.visual"}
    return {"text": "model", "vision": "visual"}


def convert_qwen_text(sd: Mapping[str, Any], cfg: QwenTextConfig,
                      root: Optional[str] = None) -> Dict[str, Any]:
    root = root or _root(sd)["text"]
    layers = []
    for i in range(cfg.num_layers):
        b = f"{root}.layers.{i}"
        layers.append({
            "attn": {
                "q": _lin(sd, b + ".self_attn.q_proj"),
                "k": _lin(sd, b + ".self_attn.k_proj"),
                "v": _lin(sd, b + ".self_attn.v_proj"),
                "o": _lin(sd, b + ".self_attn.o_proj", bias=False),
            },
            "mlp": {
                "gate": _lin(sd, b + ".mlp.gate_proj", bias=False),
                "up": _lin(sd, b + ".mlp.up_proj", bias=False),
                "down": _lin(sd, b + ".mlp.down_proj", bias=False),
            },
            "ln1": _norm(sd, b + ".input_layernorm"),
            "ln2": _norm(sd, b + ".post_attention_layernorm"),
        })
    params = {
        "embed_tokens": jnp.asarray(
            _np(sd[f"{root}.embed_tokens.weight"])),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": _norm(sd, f"{root}.norm"),
    }
    if not cfg.tie_word_embeddings and "lm_head.weight" in sd:
        params["lm_head"] = {"kernel": jnp.asarray(
            _np(sd["lm_head.weight"]).T)}
    return params


def convert_qwen_vision(sd: Mapping[str, Any], cfg: QwenVisionConfig,
                        root: Optional[str] = None) -> Dict[str, Any]:
    root = root or _root(sd)["vision"]
    # Conv3d weight [H, C, t, P, P] -> flatten matching the
    # (C, t, ph, pw) patch layout of qwen_process.image_to_patches
    conv = _np(sd[f"{root}.patch_embed.proj.weight"])
    kernel = conv.reshape(conv.shape[0], -1).T  # [C*t*P*P, H]
    blocks = []
    for i in range(cfg.depth):
        b = f"{root}.blocks.{i}"
        blocks.append({
            "attn": {"qkv": _lin(sd, b + ".attn.qkv"),
                     "proj": _lin(sd, b + ".attn.proj")},
            "mlp": {"gate": _lin(sd, b + ".mlp.gate_proj"),
                    "up": _lin(sd, b + ".mlp.up_proj"),
                    "down": _lin(sd, b + ".mlp.down_proj")},
            "ln1": _norm(sd, b + ".norm1"),
            "ln2": _norm(sd, b + ".norm2"),
        })
    return {
        "patch_embed": {"kernel": jnp.asarray(kernel)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln_q": _norm(sd, f"{root}.merger.ln_q"),
            "fc1": _lin(sd, f"{root}.merger.mlp.0"),
            "fc2": _lin(sd, f"{root}.merger.mlp.2"),
        },
    }


def convert_qwen_vl(sd: Mapping[str, Any], cfg: QwenVLConfig
                    ) -> Dict[str, Any]:
    return {"text": convert_qwen_text(sd, cfg.text),
            "vision": convert_qwen_vision(sd, cfg.vision)}


def fold_qwen_patch_normalization(vision_params: Dict[str, Any],
                                  cfg: QwenVisionConfig,
                                  mean=None, std=None) -> Dict[str, Any]:
    """Fold ``(x/255 - mean)/std`` into the vision patch embed so the
    host ships RAW uint8 patches (4× smaller transfers; same design as
    clip.fold_image_normalization, the reference's CLIPProcessor
    normalize — processor config of the Qwen2.5-VL checkpoint).

    Patch rows are flattened (C, t, P, P) — channel slowest in blocks
    of t*P*P (convert_qwen_vision kernel layout) — so the per-channel
    affine folds to a row-block rescale plus one bias vector:
    ``norm(x) @ W = u8 @ (W * a[:, None]) + (-shift) @ W``.
    Use with ``prepare_vision_inputs(raw_uint8=True)``.
    """
    from vlm_clip_tpu.core.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    mean = np.asarray(mean if mean is not None else CLIP_IMAGE_MEAN,
                      np.float32)
    std = np.asarray(std if std is not None else CLIP_IMAGE_STD,
                     np.float32)
    kernel = np.asarray(vision_params["patch_embed"]["kernel"], np.float32)
    tpp = kernel.shape[0] // 3  # t * P * P entries per channel block
    a = np.repeat(1.0 / (255.0 * std), tpp)            # [C*t*P*P]
    shift = np.repeat(mean / std, tpp)                 # [C*t*P*P]
    out = dict(vision_params)
    out["patch_embed"] = {"kernel": jnp.asarray(kernel * a[:, None]),
                          "bias": jnp.asarray(-shift @ kernel)}
    return out


# Mixed-precision decode preset (measured on v5e, BENCH.md round 2):
# int4 only where the wide-N Pallas GEMV makes it speed-NEUTRAL vs int8
# (TEXT gate/up: N=11008), int8 where narrow N leaves int4 unpack-
# throughput-bound (q/k/v/o/down). Combined with head_bits=4 this sits
# near int8 speed at ~2/3 of its weight memory. Keys are text-scoped on
# purpose: the vision tower runs prefill-shaped (M=1024) matmuls where
# int4 is a pure accuracy loss with no bandwidth win.
MIXED_DECODE_BITS: Dict[str, int] = {"text/layers/mlp/gate": 4,
                                     "text/layers/mlp/up": 4,
                                     "text/layers/mlp/gateup": 4,
                                     "default": 8}


def _fuse_decode_layers(layers: Dict[str, Any]) -> Dict[str, Any]:
    """Concat q/k/v -> qkv and gate/up -> gateup on the stacked fp
    kernels (axis -1). Per-output-channel quantization scales are
    unchanged by concatenation, so fused-then-quantized equals
    quantized-then-concatenated."""
    def cat(nodes):
        out = {"kernel": jnp.concatenate([n["kernel"] for n in nodes],
                                         axis=-1)}
        if all(n.get("bias") is not None for n in nodes):
            out["bias"] = jnp.concatenate([n["bias"] for n in nodes],
                                          axis=-1)
        return out

    attn, mlp = layers["attn"], layers["mlp"]
    return {**layers,
            "attn": {"qkv": cat([attn["q"], attn["k"], attn["v"]]),
                     "o": attn["o"]},
            "mlp": {"gateup": cat([mlp["gate"], mlp["up"]]),
                    "down": mlp["down"]}}


def quantize_qwen_params(params: Dict[str, Any], bits=8,
                         head_bits: int = 0,
                         fuse_decode: bool = False) -> Dict[str, Any]:
    """Quantize every linear kernel (weight-only); embeddings/norms stay
    fp. Mirrors the reference's 4-bit-everything bitsandbytes policy
    (model_v.py:46-51) with int8/int4.

    ``bits``: an int, the string ``"nf4"`` (blockwise NF4 + double
    quantization — the faithful bitsandbytes-semantics preset,
    ops/nf4.py), or a {path-substring: bits} mapping with a "default"
    key (e.g. :data:`MIXED_DECODE_BITS`) matched against slash-joined
    pytree paths like ``text/layers/mlp/gate``.
    ``head_bits``: if nonzero, additionally quantize the (tied) LM head
    from ``embed_tokens.T`` into an untied ``lm_head`` — the bf16 tied
    head streams 0.62 GB/token, the single largest decode tensor. The
    caller must then run the model with ``tie_word_embeddings=False``.
    ``fuse_decode``: concat text q/k/v -> qkv and gate/up -> gateup
    before quantizing (text_decoder_layer detects the fused keys).
    Decode GEMVs are per-call-overhead-bound (~9-15 us each, BENCH.md
    round 2), so 3 fewer launches/layer is a direct win. Single-chip
    layout: the TP partition rules match q/k/v names and do NOT cover
    fused trees.
    """

    from vlm_clip_tpu.ops.quant import QuantizedLinear

    if fuse_decode and "text" in params:
        params = dict(params)
        params["text"] = dict(params["text"])
        params["text"]["layers"] = _fuse_decode_layers(
            params["text"]["layers"])

    def bits_for(path: str):
        if isinstance(bits, (int, str)):
            return bits
        for key, b in bits.items():
            if key != "default" and key in path:
                return b
        return bits["default"]

    def quantize_node(node, path):
        b = bits_for(path)
        kernel = node["kernel"]
        bias = node.get("bias")
        if b == "nf4":
            from vlm_clip_tpu.ops.nf4 import quantize_nf4

            if kernel.ndim == 2:
                return quantize_nf4(kernel, bias)
            q = jax.vmap(quantize_nf4)(kernel)
            return dataclasses.replace(q, bias=bias)
        if kernel.ndim == 2:
            return quantize_weight(kernel, b, bias)
        # stacked per-layer kernels [L, in, out]: vmap the quantizer
        q = jax.vmap(lambda w: quantize_weight(w, b))(kernel)
        return QuantizedLinear(qweight=q.qweight, scale=q.scale, bits=b,
                               bias=bias, in_features=q.in_features,
                               out_features=q.out_features)

    def walk(node, path):
        if isinstance(node, dict):
            if "kernel" in node and node["kernel"].ndim in (2, 3):
                return quantize_node(node, path)
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        return node

    out = {}
    for tower, sub in params.items():
        tower_out = {}
        for name, val in sub.items():
            if name in ("embed_tokens", "final_norm", "patch_embed"):
                tower_out[name] = val  # keep fp
            else:
                tower_out[name] = walk(val, f"{tower}/{name}")
        out[tower] = tower_out
    if head_bits and "text" in out and "lm_head" not in out["text"]:
        head_w = jnp.transpose(params["text"]["embed_tokens"]
                               ).astype(jnp.float32)
        if head_bits == "nf4":
            from vlm_clip_tpu.ops.nf4 import quantize_nf4

            out["text"]["lm_head"] = quantize_nf4(head_w)
        else:
            out["text"]["lm_head"] = quantize_weight(head_w, head_bits)
    return out
