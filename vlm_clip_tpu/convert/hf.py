"""HF CLIP checkpoint -> vlm_clip_tpu parameter pytree.

Works from any mapping of HF ``CLIPModel`` state-dict names to numpy-like
arrays (a live torch ``state_dict()``, or safetensors loaded without torch).
Replaces the reference's reliance on ``CLIPModel.from_pretrained`` for its
frozen backbone (reference model_m.py:63, model_t.py:44, model_v.py:159).

Layout transforms:
- torch linear weights ``[out, in]`` -> ``[in, out]`` transpose;
- patch-embedding conv weight ``[H, 3, P, P]`` -> ``[P, P, 3, H]``
  (matches the (ph, pw, c) patch-flattening order in models/clip.py);
- per-layer tensors stacked on a leading layer axis for lax.scan.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from vlm_clip_tpu.core.config import CLIPConfig


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _linear(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"kernel": jnp.asarray(_np(sd[prefix + ".weight"]).T),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _layernorm(sd: Mapping[str, Any], prefix: str) -> Dict[str, jnp.ndarray]:
    return {"scale": jnp.asarray(_np(sd[prefix + ".weight"])),
            "bias": jnp.asarray(_np(sd[prefix + ".bias"]))}


def _stack_layers(sd: Mapping[str, Any], tower: str, num_layers: int):
    """Stack per-layer params into [L, ...] arrays."""
    qs, ks_, vs, outs = [], [], [], []
    fc1s, fc2s, ln1s, ln2s = [], [], [], []
    for i in range(num_layers):
        base = f"{tower}.encoder.layers.{i}"
        qs.append(_linear(sd, base + ".self_attn.q_proj"))
        ks_.append(_linear(sd, base + ".self_attn.k_proj"))
        vs.append(_linear(sd, base + ".self_attn.v_proj"))
        outs.append(_linear(sd, base + ".self_attn.out_proj"))
        fc1s.append(_linear(sd, base + ".mlp.fc1"))
        fc2s.append(_linear(sd, base + ".mlp.fc2"))
        ln1s.append(_layernorm(sd, base + ".layer_norm1"))
        ln2s.append(_layernorm(sd, base + ".layer_norm2"))

    def stack(dicts):
        return {k: jnp.stack([d[k] for d in dicts]) for k in dicts[0]}

    return {
        "attn": {"q": stack(qs), "k": stack(ks_), "v": stack(vs),
                 "out": stack(outs)},
        "mlp": {"fc1": stack(fc1s), "fc2": stack(fc2s)},
        "ln1": stack(ln1s),
        "ln2": stack(ln2s),
    }


def convert_hf_clip(sd: Mapping[str, Any], cfg: CLIPConfig) -> Dict[str, Any]:
    """Convert an HF CLIPModel state dict to our parameter pytree."""
    patch_w = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    params = {
        "vision": {
            "class_embedding": jnp.asarray(
                _np(sd["vision_model.embeddings.class_embedding"])),
            "patch_embedding": {
                "kernel": jnp.asarray(patch_w.transpose(2, 3, 1, 0))},
            "position_embedding": jnp.asarray(
                _np(sd["vision_model.embeddings.position_embedding.weight"])),
            # sic: HF's param really is named "pre_layrnorm"
            "pre_layernorm": _layernorm(sd, "vision_model.pre_layrnorm"),
            "post_layernorm": _layernorm(sd, "vision_model.post_layernorm"),
            "layers": _stack_layers(sd, "vision_model",
                                    cfg.vision.num_layers),
        },
        "text": {
            "token_embedding": jnp.asarray(
                _np(sd["text_model.embeddings.token_embedding.weight"])),
            "position_embedding": jnp.asarray(
                _np(sd["text_model.embeddings.position_embedding.weight"])),
            "final_layernorm": _layernorm(sd, "text_model.final_layer_norm"),
            "layers": _stack_layers(sd, "text_model", cfg.text.num_layers),
        },
        "visual_projection": {
            "kernel": jnp.asarray(_np(sd["visual_projection.weight"]).T)},
        "text_projection": {
            "kernel": jnp.asarray(_np(sd["text_projection.weight"]).T)},
        "logit_scale": jnp.asarray(_np(sd["logit_scale"])),
    }
    return params


def clip_config_from_hf(hf_config) -> CLIPConfig:
    """CLIPConfig from a transformers CLIPConfig (any dims, not just the
    presets) — used by cli/validate_parity.py for arbitrary checkpoints."""
    from vlm_clip_tpu.core.config import TextConfig, VisionConfig

    tc, vc = hf_config.text_config, hf_config.vision_config
    return CLIPConfig(
        vision=VisionConfig(
            hidden_size=vc.hidden_size,
            intermediate_size=vc.intermediate_size,
            num_layers=vc.num_hidden_layers,
            num_heads=vc.num_attention_heads,
            image_size=vc.image_size, patch_size=vc.patch_size,
            layer_norm_eps=vc.layer_norm_eps, hidden_act=vc.hidden_act),
        text=TextConfig(
            hidden_size=tc.hidden_size,
            intermediate_size=tc.intermediate_size,
            num_layers=tc.num_hidden_layers,
            num_heads=tc.num_attention_heads,
            vocab_size=tc.vocab_size,
            max_positions=tc.max_position_embeddings,
            layer_norm_eps=tc.layer_norm_eps, hidden_act=tc.hidden_act,
            eos_token_id=tc.eos_token_id),
        projection_dim=hf_config.projection_dim,
        logit_scale_init=float(hf_config.logit_scale_init_value),
        name=getattr(hf_config, "name_or_path", "hf-clip") or "hf-clip")


def load_hf_clip(model_name_or_path: str, cfg: CLIPConfig = None):
    """Load + convert an HF CLIP checkpoint (requires transformers/torch).

    Returns (params, cfg). Offline-safe if the checkpoint is local/cached.
    """
    from transformers import CLIPModel  # local import: torch optional

    from vlm_clip_tpu.core.config import clip_preset

    model = CLIPModel.from_pretrained(model_name_or_path)
    if cfg is None:
        cfg = clip_preset(model_name_or_path)
    return convert_hf_clip(model.state_dict(), cfg), cfg
