"""Pipeline M — CLIPWithAdapters: contrastive adapter fine-tuning.

TPU-native rebuild of the reference ``CLIPWithAdapters`` (model_m.py:10-248).
Behavior contracts preserved (with their quirks, flag-gated where noted):

- text path (model_m.py:77-103): text tower ``last_hidden_state`` (which HF
  final-layernorms) -> sequence adapter -> N cross-modal adapters whose
  "image" side is the **vision position-embedding table** broadcast as a
  pseudo sequence (model_m.py:95-100 — quirk reproduced) -> ``[:, 0, :]``
  CLS-slice pooling (model_m.py:102; NOT the EOS pooling HF itself uses) ->
  text projection;
- image path (model_m.py:107-123): vision tower ``last_hidden_state``
  (WITHOUT post-layernorm — the reference bypasses HF pooling) ->
  sequence adapter -> ``[:, 0, :]`` -> visual projection;
- loss (model_m.py:146-171): L2-normalize, ``logits_per_text =
  txt @ img.T * exp(logit_scale)``, symmetric CE against ``arange(B)``;
- adapter-only checkpoints with strict enabled/present validation
  (model_m.py:178-248) — see train/checkpoint.py;
- ``freeze_clip=False`` enables full fine-tuning (model_m.py:21, 72-75):
  here that's a param-partition choice (trainable mask over the CLIP
  subtree), not a mutation.

TPU-first: shared adapters are stacked + scanned; towers run in bf16 with
fp32 logits; under DP the per-shard features are sharded batch-wise and
XLA inserts the all_gather for the global BxB logit matrix
(train/steps.py).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vlm_clip_tpu.core.config import AdapterConfig, CLIPConfig
from vlm_clip_tpu.core.dtypes import BF16, DTypePolicy
from vlm_clip_tpu.models import adapters as A
from vlm_clip_tpu.models import clip as C
from vlm_clip_tpu.models import layers as L

Params = Dict[str, Any]


def init_m_adapters(rng, clip_cfg: CLIPConfig, acfg: AdapterConfig,
                    dtype=jnp.float32) -> Params:
    """Init the M adapter set; only enabled kinds get entries."""
    ks = jax.random.split(rng, 3)
    params: Params = {}
    if acfg.use_text_adapter:
        params["text_adapter"] = A.init_seq_adapter(
            ks[0], clip_cfg.text.hidden_size, acfg.text_adapter_size, dtype)
    if acfg.use_vision_adapter:
        params["vision_adapter"] = A.init_seq_adapter(
            ks[1], clip_cfg.vision.hidden_size, acfg.vision_adapter_size,
            dtype)
    if acfg.use_shared_adapters:
        layer_keys = jax.random.split(ks[2], acfg.shared_adapter_layers)
        per_layer = [A.init_cross_modal_adapter(
            k, text_dim=clip_cfg.text.hidden_size,
            image_dim=clip_cfg.vision.hidden_size,
            hidden=clip_cfg.text.hidden_size,
            num_heads=acfg.shared_num_heads, dtype=dtype)
            for k in layer_keys]
        params["shared_adapters"] = jax.tree.map(
            lambda *xs: jnp.stack(xs), *per_layer)
    return params


def m_get_text_features(clip_params: Params, adapter_params: Params,
                        input_ids: jnp.ndarray,
                        attention_mask: Optional[jnp.ndarray],
                        cfg: CLIPConfig, acfg: AdapterConfig,
                        policy: DTypePolicy = BF16,
                        remat: bool = False) -> jnp.ndarray:
    out = C.text_tower(clip_params["text"], input_ids, attention_mask,
                       cfg.text, policy, remat)
    x = out.last_hidden_state
    if acfg.use_text_adapter:
        x = A.seq_adapter(adapter_params["text_adapter"], x,
                          cfg.text.layer_norm_eps)
    if acfg.use_shared_adapters:
        # pseudo image sequence = vision position-embedding table
        # (model_m.py:95-100 quirk); batch dim stays 1 — the adapter
        # projects it once and broadcasts post-projection
        img = clip_params["vision"]["position_embedding"][None].astype(
            x.dtype)

        def body(h, lp):
            return A.cross_modal_adapter(lp, h, img,
                                         acfg.shared_num_heads), None

        x, _ = jax.lax.scan(body, x, adapter_params["shared_adapters"])
    pooled = x[:, 0, :]  # CLS-slice quirk (model_m.py:102)
    return C.project(clip_params["text_projection"], pooled)


def m_get_image_features(clip_params: Params, adapter_params: Params,
                         pixel_values: jnp.ndarray, cfg: CLIPConfig,
                         acfg: AdapterConfig,
                         policy: DTypePolicy = BF16,
                         remat: bool = False) -> jnp.ndarray:
    out = C.vision_tower(clip_params["vision"], pixel_values, cfg.vision,
                         policy, remat)
    x = out.last_hidden_state  # un-post-layernormed (quirk)
    if acfg.use_vision_adapter:
        x = A.seq_adapter(adapter_params["vision_adapter"], x,
                          cfg.vision.layer_norm_eps)
    pooled = x[:, 0, :]
    return C.project(clip_params["visual_projection"], pooled)


class MForwardOutput(NamedTuple):
    loss: Optional[jnp.ndarray]
    text_features: Optional[jnp.ndarray]
    image_features: Optional[jnp.ndarray]
    logits_per_text: Optional[jnp.ndarray]
    logits_per_image: Optional[jnp.ndarray]


def contrastive_loss(text_features: jnp.ndarray,
                     image_features: jnp.ndarray,
                     logit_scale: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                jnp.ndarray, jnp.ndarray]:
    """Symmetric InfoNCE (model_m.py:146-163). Returns (loss, txt_n, img_n,
    logits_per_text, logits_per_image). fp32 throughout."""
    txt = L.l2_normalize(text_features).astype(jnp.float32)
    img = L.l2_normalize(image_features).astype(jnp.float32)
    scale = jnp.exp(logit_scale.astype(jnp.float32))
    logits_per_text = jnp.dot(txt, img.T,
                              preferred_element_type=jnp.float32) * scale
    logits_per_image = logits_per_text.T
    B = txt.shape[0]
    labels = jnp.arange(B)
    lp_t = jax.nn.log_softmax(logits_per_text, axis=-1)
    lp_i = jax.nn.log_softmax(logits_per_image, axis=-1)
    loss_t = -jnp.mean(lp_t[labels, labels])
    loss_i = -jnp.mean(lp_i[labels, labels])
    return (loss_t + loss_i) / 2.0, txt, img, logits_per_text, \
        logits_per_image


class CLIPWithAdapters:
    """Reference-API class wrapper (model_m.py:10-248) over the
    functional pipeline: get_text_features / get_image_features /
    forward(return_loss) / save_adapter_weights / load_adapter_weights,
    with jitted compute paths."""

    def __init__(self, clip_params: Params, cfg: CLIPConfig,
                 text_adapter_size: int = 256,
                 vision_adapter_size: int = 256,
                 shared_adapter_layers: int = 2, freeze_clip: bool = True,
                 use_text_adapter: bool = True,
                 use_vision_adapter: bool = True,
                 use_shared_adapters: bool = True,
                 policy: DTypePolicy = BF16, seed: int = 0):
        import functools

        self.clip_params = clip_params
        self.cfg = cfg
        self.acfg = AdapterConfig(
            text_adapter_size=text_adapter_size,
            vision_adapter_size=vision_adapter_size,
            shared_adapter_layers=shared_adapter_layers,
            use_text_adapter=use_text_adapter,
            use_vision_adapter=use_vision_adapter,
            use_shared_adapters=use_shared_adapters)
        self.freeze_clip = freeze_clip
        self.policy = policy
        self.adapter_params = init_m_adapters(
            jax.random.PRNGKey(seed), cfg, self.acfg)
        self._text = jax.jit(functools.partial(
            m_get_text_features, cfg=cfg, acfg=self.acfg, policy=policy))
        self._image = jax.jit(functools.partial(
            m_get_image_features, cfg=cfg, acfg=self.acfg, policy=policy))
        self._fwd = jax.jit(functools.partial(
            m_forward, cfg=cfg, acfg=self.acfg, policy=policy,
            return_loss=True))

    def get_text_features(self, input_ids, attention_mask) -> jnp.ndarray:
        return self._text(self.clip_params, self.adapter_params,
                          jnp.asarray(input_ids),
                          jnp.asarray(attention_mask))

    def get_image_features(self, pixel_values) -> jnp.ndarray:
        return self._image(self.clip_params, self.adapter_params,
                           jnp.asarray(pixel_values))

    def forward(self, input_ids=None, attention_mask=None,
                pixel_values=None, return_loss: bool = True):
        """Dict result mirroring model_m.py:127-176."""
        if return_loss and input_ids is not None \
                and pixel_values is not None:
            out = self._fwd(self.clip_params, self.adapter_params,
                            jnp.asarray(input_ids),
                            jnp.asarray(attention_mask),
                            jnp.asarray(pixel_values))
            return {"loss": out.loss, "text_features": out.text_features,
                    "image_features": out.image_features,
                    "logits_per_text": out.logits_per_text,
                    "logits_per_image": out.logits_per_image}
        out = m_forward(
            self.clip_params, self.adapter_params,
            None if input_ids is None else jnp.asarray(input_ids),
            None if attention_mask is None else jnp.asarray(attention_mask),
            None if pixel_values is None else jnp.asarray(pixel_values),
            self.cfg, self.acfg, self.policy, return_loss=False)
        return {"text_features": out.text_features,
                "image_features": out.image_features}

    __call__ = forward

    def save_adapter_weights(self, save_path: str) -> None:
        from vlm_clip_tpu.train.checkpoint import save_adapter_weights

        save_adapter_weights(save_path, self.adapter_params)

    def load_adapter_weights(self, load_path: str) -> None:
        from vlm_clip_tpu.train.checkpoint import load_adapter_weights

        self.adapter_params = load_adapter_weights(load_path, self.acfg)


def m_forward(clip_params: Params, adapter_params: Params,
              input_ids: Optional[jnp.ndarray],
              attention_mask: Optional[jnp.ndarray],
              pixel_values: Optional[jnp.ndarray], cfg: CLIPConfig,
              acfg: AdapterConfig, policy: DTypePolicy = BF16,
              return_loss: bool = True,
              remat: bool = False) -> MForwardOutput:
    """forward(input_ids, attention_mask, pixel_values, return_loss)
    (model_m.py:127-176). ``remat=True`` checkpoints each tower layer —
    for full fine-tuning of the large towers (L/14@336) where saved
    activations dominate HBM."""
    text_features = None
    image_features = None
    if input_ids is not None:
        text_features = m_get_text_features(
            clip_params, adapter_params, input_ids, attention_mask, cfg,
            acfg, policy, remat)
    if pixel_values is not None:
        image_features = m_get_image_features(
            clip_params, adapter_params, pixel_values, cfg, acfg, policy,
            remat)
    if return_loss and text_features is not None \
            and image_features is not None:
        loss, txt, img, lpt, lpi = contrastive_loss(
            text_features, image_features, clip_params["logit_scale"])
        return MForwardOutput(loss, txt, img, lpt, lpi)
    return MForwardOutput(None, text_features, image_features, None, None)
