"""From-scratch CLIP dual towers in functional JAX.

Numerically matches HF ``CLIPModel`` (reference backbone, model_m.py:6,
model_t.py:44-46, model_v.py:159) to fp32 tolerance when run with the fp32
dtype policy and HF-converted weights (see convert/hf.py; validated by
tests/test_parity_torch.py):

- vision tower: patchify->embed, class token, learned positions,
  pre-LN, N pre-norm encoder layers, pooled = post_LN(x[:, 0]);
  ``last_hidden_state`` is returned **un**-post-layernormed (HF semantics,
  needed by the sequence adapters of pipeline M, model_m.py:85-101);
- text tower: token+position embeddings, causal+padding mask, final LN,
  pooled at argmax(input_ids) (the EOT token has the highest CLIP vocab id —
  HF's eos_token_id==2 compatibility path);
- projections are bias-free linears; ``logit_scale`` is a learned scalar.

TPU-first choices: patch embedding is extract-patches + one MXU matmul
(not a conv); encoder layers are stacked and scanned (single-trace compile,
optional per-layer remat); softmax/LN in fp32, matmuls bf16 with fp32
accumulation under the mixed policy.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vlm_clip_tpu.core.config import CLIPConfig, TextConfig, VisionConfig
from vlm_clip_tpu.core.dtypes import DTypePolicy, FP32
from vlm_clip_tpu.models import layers as L

Params = Dict[str, Any]


class TowerOutput(NamedTuple):
    last_hidden_state: jnp.ndarray  # [B, T, H]
    pooled: jnp.ndarray             # [B, H]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_vision(rng, cfg: VisionConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 4)
    scale = cfg.hidden_size ** -0.5
    return {
        "class_embedding": (jax.random.normal(ks[0], (cfg.hidden_size,))
                            * scale).astype(dtype),
        # patch kernel kept in [P, P, 3, H]; flattened to one matmul at apply
        "patch_embedding": {
            "kernel": (jax.random.normal(
                ks[1], (cfg.patch_size, cfg.patch_size, 3, cfg.hidden_size))
                * scale).astype(dtype)},
        "position_embedding": (jax.random.normal(
            ks[2], (cfg.seq_len, cfg.hidden_size)) * scale).astype(dtype),
        "pre_layernorm": L.init_layernorm(cfg.hidden_size, dtype),
        "post_layernorm": L.init_layernorm(cfg.hidden_size, dtype),
        "layers": L.init_encoder_stack(
            ks[3], cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
            cfg.num_heads, dtype),
    }


def init_text(rng, cfg: TextConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 3)
    return {
        "token_embedding": (jax.random.normal(
            ks[0], (cfg.vocab_size, cfg.hidden_size)) * 0.02).astype(dtype),
        "position_embedding": (jax.random.normal(
            ks[1], (cfg.max_positions, cfg.hidden_size)) * 0.01).astype(dtype),
        "final_layernorm": L.init_layernorm(cfg.hidden_size, dtype),
        "layers": L.init_encoder_stack(
            ks[2], cfg.num_layers, cfg.hidden_size, cfg.intermediate_size,
            cfg.num_heads, dtype),
    }


def init_clip(rng, cfg: CLIPConfig, dtype=jnp.float32) -> Params:
    kv, kt, kvp, ktp = jax.random.split(rng, 4)
    return {
        "vision": init_vision(kv, cfg.vision, dtype),
        "text": init_text(kt, cfg.text, dtype),
        "visual_projection": {
            "kernel": (jax.random.normal(
                kvp, (cfg.vision.hidden_size, cfg.projection_dim))
                * cfg.vision.hidden_size ** -0.5).astype(dtype)},
        "text_projection": {
            "kernel": (jax.random.normal(
                ktp, (cfg.text.hidden_size, cfg.projection_dim))
                * cfg.text.hidden_size ** -0.5).astype(dtype)},
        "logit_scale": jnp.asarray(cfg.logit_scale_init, dtype),
    }


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------

def patchify(pixel_values: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, 3, S, S] (NCHW, HF layout) -> [B, N, patch*patch*3].

    Flattening order is (ph, pw, c) to match the [P, P, 3, H] kernel layout
    (torch Conv2d weights are converted with permute(2, 3, 1, 0)).
    """
    B, C, H, W = pixel_values.shape
    gh, gw = H // patch, W // patch
    x = pixel_values.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 3, 5, 1)  # [B, gh, gw, ph, pw, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def fold_image_normalization(vision_params: Params,
                             mean=None, std=None) -> Params:
    """Fold ``(x/255 - mean)/std`` into the patch-embed weights.

    Normalization is a per-channel affine map, and the patch embedding is
    linear — so preprocessing folds into one weight rescale + bias:
    ``norm(x) @ W = x @ W' + b'`` with ``W'[(c)] = W[(c)]/(255*std_c)`` and
    ``b' = -sum_c (mean_c/std_c) * W[(c)]``. The image path then feeds
    **uint8 HWC batches straight to the MXU**: 4x less host->device
    traffic and no fp32 image ever materialized (the BASELINE.json
    "on-TPU decode-to-patch-embed" north star). Use with
    :func:`vision_tower_u8` / :func:`get_image_features_u8`.
    """
    from vlm_clip_tpu.core.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    mean = jnp.asarray(mean if mean is not None else CLIP_IMAGE_MEAN,
                       jnp.float32)
    std = jnp.asarray(std if std is not None else CLIP_IMAGE_STD,
                      jnp.float32)
    kernel = vision_params["patch_embedding"]["kernel"].astype(jnp.float32)
    # kernel layout [P, P, 3, H]
    scaled = kernel / (255.0 * std)[None, None, :, None]
    bias = -jnp.einsum("c,pqch->h", mean / std, kernel)
    out = dict(vision_params)
    out["patch_embedding"] = {"kernel": scaled, "bias": bias}
    return out


def patchify_hwc(u8: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, S, S, 3] (HWC, uint8 or float) -> [B, N, patch*patch*3] with the
    same (ph, pw, c) flattening order as :func:`patchify`."""
    B, H, W, C = u8.shape
    gh, gw = H // patch, W // patch
    x = u8.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, ph, pw, C]
    return x.reshape(B, gh * gw, patch * patch * C)


def vision_tower_u8(p_folded: Params, u8_hwc: jnp.ndarray,
                    cfg: VisionConfig, policy: DTypePolicy = FP32,
                    remat: bool = False) -> TowerOutput:
    """Vision tower on raw uint8 HWC batches; requires params through
    :func:`fold_image_normalization`."""
    B = u8_hwc.shape[0]
    x = patchify_hwc(u8_hwc, cfg.patch_size).astype(policy.compute_dtype)
    kernel = p_folded["patch_embedding"]["kernel"].reshape(
        -1, cfg.hidden_size)
    x = jnp.dot(x, kernel.astype(x.dtype),
                preferred_element_type=jnp.float32)
    x = (x + p_folded["patch_embedding"]["bias"].astype(jnp.float32)
         ).astype(policy.compute_dtype)
    return _vision_tower_tail(p_folded, x, B, cfg, policy, remat)


def vision_tower(p: Params, pixel_values: jnp.ndarray, cfg: VisionConfig,
                 policy: DTypePolicy = FP32, remat: bool = False) -> TowerOutput:
    B = pixel_values.shape[0]
    if pixel_values.shape[-2:] != (cfg.image_size, cfg.image_size):
        raise ValueError(
            f"pixel_values spatial shape {pixel_values.shape[-2:]} does not "
            f"match the model's image_size {cfg.image_size}; resize inputs "
            f"to {cfg.image_size} (data/preprocess.load_and_resize) or pick "
            "a matching VisionConfig")
    x = patchify(pixel_values.astype(policy.compute_dtype), cfg.patch_size)
    kernel = p["patch_embedding"]["kernel"].reshape(-1, cfg.hidden_size)
    x = jnp.dot(x, kernel.astype(x.dtype),
                preferred_element_type=jnp.float32).astype(policy.compute_dtype)
    return _vision_tower_tail(p, x, B, cfg, policy, remat)


def _vision_tower_tail(p: Params, x: jnp.ndarray, B: int,
                       cfg: VisionConfig, policy: DTypePolicy,
                       remat: bool) -> TowerOutput:
    x = x.astype(policy.compute_dtype)
    cls = jnp.broadcast_to(
        p["class_embedding"].astype(policy.compute_dtype),
        (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["position_embedding"].astype(policy.compute_dtype)[None]
    x = L.layer_norm(p["pre_layernorm"], x, cfg.layer_norm_eps,
                     policy.stable_dtype)
    x = L.encoder_stack(p["layers"], x, cfg.num_heads, cfg.layer_norm_eps,
                        cfg.hidden_act, mask=None, remat=remat,
                        stable_dtype=policy.stable_dtype)
    pooled = L.layer_norm(p["post_layernorm"], x[:, 0, :],
                          cfg.layer_norm_eps, policy.stable_dtype)
    return TowerOutput(last_hidden_state=x, pooled=pooled)


# ---------------------------------------------------------------------------
# text tower
# ---------------------------------------------------------------------------

def _text_mask(attention_mask: Optional[jnp.ndarray], T: int) -> jnp.ndarray:
    """Additive [B|1, 1, T, T] mask: causal plus optional key padding."""
    causal = jnp.triu(jnp.full((T, T), L.NEG_INF, jnp.float32), k=1)
    mask = causal[None, None]
    if attention_mask is not None:
        pad = (1.0 - attention_mask.astype(jnp.float32))[:, None, None, :]
        mask = mask + pad * L.NEG_INF
    return mask


def text_tower(p: Params, input_ids: jnp.ndarray,
               attention_mask: Optional[jnp.ndarray], cfg: TextConfig,
               policy: DTypePolicy = FP32, remat: bool = False) -> TowerOutput:
    B, T = input_ids.shape
    x = p["token_embedding"][input_ids].astype(policy.compute_dtype)
    x = x + p["position_embedding"][:T].astype(policy.compute_dtype)[None]
    mask = _text_mask(attention_mask, T)
    x = L.encoder_stack(p["layers"], x, cfg.num_heads, cfg.layer_norm_eps,
                        cfg.hidden_act, mask=mask, remat=remat,
                        stable_dtype=policy.stable_dtype)
    x = L.layer_norm(p["final_layernorm"], x, cfg.layer_norm_eps,
                     policy.stable_dtype)
    if cfg.pool_by_argmax_ids:
        eos_pos = jnp.argmax(input_ids, axis=-1)
    else:
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32),
                             axis=-1)
    pooled = x[jnp.arange(B), eos_pos]
    return TowerOutput(last_hidden_state=x, pooled=pooled)


# ---------------------------------------------------------------------------
# projected features (HF get_image_features / get_text_features equivalents)
# ---------------------------------------------------------------------------

def project(kernel_holder: Params, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.dot(x, kernel_holder["kernel"].astype(x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)


def get_image_features(params: Params, pixel_values: jnp.ndarray,
                       cfg: CLIPConfig, policy: DTypePolicy = FP32,
                       remat: bool = False) -> jnp.ndarray:
    out = vision_tower(params["vision"], pixel_values, cfg.vision, policy,
                       remat)
    return project(params["visual_projection"], out.pooled)


def get_image_features_u8(params: Params, u8_hwc: jnp.ndarray,
                          cfg: CLIPConfig, policy: DTypePolicy = FP32,
                          remat: bool = False) -> jnp.ndarray:
    """Projected image features from raw uint8 HWC batches; ``params``
    must hold a vision subtree through fold_image_normalization."""
    out = vision_tower_u8(params["vision"], u8_hwc, cfg.vision, policy,
                          remat)
    return project(params["visual_projection"], out.pooled)


def get_text_features(params: Params, input_ids: jnp.ndarray,
                      attention_mask: Optional[jnp.ndarray],
                      cfg: CLIPConfig, policy: DTypePolicy = FP32,
                      remat: bool = False) -> jnp.ndarray:
    out = text_tower(params["text"], input_ids, attention_mask, cfg.text,
                     policy, remat)
    return project(params["text_projection"], out.pooled)


@functools.lru_cache(maxsize=32)
def jitted_text_features(cfg: CLIPConfig, policy: DTypePolicy):
    """Cached jit of get_text_features for a (config, policy) pair.

    Eager per-op dispatch is pathologically slow through remote-TPU
    tunnels; every repeated text encode should go through this.
    """
    return jax.jit(functools.partial(get_text_features, cfg=cfg,
                                     policy=policy))


@functools.lru_cache(maxsize=32)
def jitted_image_features(cfg: CLIPConfig, policy: DTypePolicy):
    return jax.jit(functools.partial(get_image_features, cfg=cfg,
                                     policy=policy))


def clip_logits(params: Params, image_features: jnp.ndarray,
                text_features: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(logits_per_text, logits_per_image) from unnormalized features."""
    img = L.l2_normalize(image_features).astype(jnp.float32)
    txt = L.l2_normalize(text_features).astype(jnp.float32)
    scale = jnp.exp(params["logit_scale"].astype(jnp.float32))
    logits_per_text = scale * txt @ img.T
    return logits_per_text, logits_per_text.T
