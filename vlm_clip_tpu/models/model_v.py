"""Pipeline V — EnhancedCLIPAdapter: VLM-context-fused classification.

TPU-native rebuild of the reference ``EnhancedCLIPAdapter``
(model_v.py:146-413). Behavior contracts:

- adapters: three feature bottleneck MLPs with Dropout(0.1) between relu
  and fc2 (model_v.py:18-39) — visual (alpha), text (beta), context
  (gamma);
- class embeddings: ONE prompt per class, "A person expressing {e}"
  (model_v.py:200-238), normalized; adapted tensor refreshed via
  update_emotion_embeddings (model_v.py:240-258);
- forward (model_v.py:260-343): normalize tower image features
  (stop-gradient) -> visual alpha-blend+renorm -> context gamma-blend+
  renorm -> average fusion + renorm (model_v.py:308-313) -> text branch
  beta-blend (dynamic in training, cached for eval) ->
  ``exp(logit_scale) * combined @ txt.T``;
- dim-mismatch guard: context whose last dim differs from the feature dim
  is dropped with a warning (model_v.py:292-297) — here a static shape
  check at trace time;
- zero-vector contexts (VLM failure fallback, enhance.py:73-78) still flow
  through the context adapter — reproduced;
- ``predict_probs`` = softmax(forward logits) in eval mode
  (model_v.py:345-353);
- ``get_trainable_parameters`` / ``print_model_structure``
  (model_v.py:355-413) map to the adapter pytree + a param-count report.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlm_clip_tpu.core.config import CLIPConfig, EMOTIONS
from vlm_clip_tpu.core.dtypes import BF16, DTypePolicy
from vlm_clip_tpu.data.captions import single_prompt
from vlm_clip_tpu.models import adapters as A
from vlm_clip_tpu.models import clip as C
from vlm_clip_tpu.models import layers as L
from vlm_clip_tpu.models.model_t import _encode_images_norm

Params = Dict[str, Any]


def init_v_adapters(rng, feature_dim: int, bottleneck: int) -> Params:
    kv, kt, kc = jax.random.split(rng, 3)
    return {"visual": A.init_feature_adapter(kv, feature_dim, bottleneck),
            "text": A.init_feature_adapter(kt, feature_dim, bottleneck),
            "context": A.init_feature_adapter(kc, feature_dim, bottleneck)}


def encode_single_prompt_embeddings(clip_params: Params, cfg: CLIPConfig,
                                    tokenizer, policy: DTypePolicy = BF16,
                                    emotions=EMOTIONS) -> jnp.ndarray:
    """[C, P] normalized single-prompt class embeddings (model_v.py:200-238),
    one batched text forward."""
    texts = [single_prompt(e) for e in emotions]
    ids, mask = tokenizer(texts)
    feats = C.jitted_text_features(cfg, policy)(
        clip_params, jnp.asarray(ids), jnp.asarray(mask))
    return L.l2_normalize(feats).astype(jnp.float32)


def v_forward(adapter_params: Params, image_features_norm: jnp.ndarray,
              emotion_emb: jnp.ndarray, logit_scale: jnp.ndarray,
              context_features: Optional[jnp.ndarray] = None,
              alpha: float = 0.2, beta: float = 0.2, gamma: float = 0.3,
              dropout: float = 0.1, deterministic: bool = True,
              rng: Optional[jax.Array] = None,
              cached_text_emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Logits for a batch (model_v.py:260-343).

    ``image_features_norm``: [B, P] normalized frozen-tower features.
    ``context_features``: [B, P] (zeros on VLM failure) or None to skip
    the context branch entirely. ``cached_text_emb`` short-circuits the
    dynamic text branch (eval path).
    """
    rngs = jax.random.split(rng, 3) if rng is not None else (None,) * 3
    img = A.adapt_features(adapter_params["visual"], image_features_norm,
                           alpha, dropout=dropout, rng=rngs[0],
                           deterministic=deterministic)
    combined = img
    if context_features is not None:
        if context_features.shape[-1] != image_features_norm.shape[-1]:
            # dim-mismatch guard (model_v.py:292-297): drop context
            print("Warning: Context feature dimension mismatch. Expected "
                  f"{image_features_norm.shape[-1]}, got "
                  f"{context_features.shape[-1]}. Skipping context.")
        else:
            ctx = A.adapt_features(adapter_params["context"],
                                   context_features, gamma, dropout=dropout,
                                   rng=rngs[1], deterministic=deterministic)
            combined = L.l2_normalize((img + ctx) / 2.0)  # average fusion

    if cached_text_emb is not None:
        txt = cached_text_emb
    else:
        txt = A.adapt_features(adapter_params["text"],
                               jax.lax.stop_gradient(emotion_emb), beta,
                               dropout=dropout, rng=rngs[2],
                               deterministic=deterministic)
    scale = jnp.exp(logit_scale.astype(jnp.float32))
    return scale * jnp.dot(combined.astype(jnp.float32),
                           txt.T.astype(jnp.float32),
                           preferred_element_type=jnp.float32)


def v_loss_fn(adapter_params: Params, image_features_norm: jnp.ndarray,
              context_features: Optional[jnp.ndarray],
              labels: jnp.ndarray, emotion_emb: jnp.ndarray,
              logit_scale: jnp.ndarray, rng: Optional[jax.Array],
              alpha: float, beta: float, gamma: float,
              dropout: float) -> jnp.ndarray:
    logits = v_forward(adapter_params, image_features_norm, emotion_emb,
                       logit_scale, context_features, alpha, beta, gamma,
                       dropout=dropout, deterministic=rng is None, rng=rng)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


class EnhancedCLIPAdapterV:
    """Reference-API wrapper (model_v.py:146-413)."""

    def __init__(self, clip_params: Params, cfg: CLIPConfig, tokenizer,
                 alpha: float = 0.2, beta: float = 0.2, gamma: float = 0.3,
                 bottleneck_dim: int = 192, dropout: float = 0.1,
                 vlm_context_extractor=None, policy: DTypePolicy = BF16,
                 seed: int = 0):
        self.clip_params = clip_params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.alpha, self.beta, self.gamma = alpha, beta, gamma
        self.dropout = dropout
        self.policy = policy
        self.feature_dim = cfg.projection_dim
        self.text_feature_dim = cfg.projection_dim
        self.vlm_context_extractor = vlm_context_extractor
        self.adapter_params = init_v_adapters(
            jax.random.PRNGKey(seed), self.feature_dim, bottleneck_dim)
        self.emotion_embedding_tensor: Optional[jnp.ndarray] = None
        self.adapted_emotion_embedding_tensor: Optional[jnp.ndarray] = None
        self._encode_images = jax.jit(functools.partial(
            _encode_images_norm, cfg=cfg, policy=policy))
        self._forward_eval = jax.jit(functools.partial(
            v_forward, alpha=alpha, beta=beta, gamma=gamma, dropout=0.0,
            deterministic=True))

    def encode_emotion_descriptions(self, emotions=EMOTIONS) -> None:
        self.emotion_embedding_tensor = encode_single_prompt_embeddings(
            self.clip_params, self.cfg, self.tokenizer, self.policy,
            emotions)
        self.update_emotion_embeddings()

    def update_emotion_embeddings(self) -> None:
        if self.emotion_embedding_tensor is None:
            print("Warning: Original emotion embeddings not encoded. "
                  "Call encode_emotion_descriptions first.")
            return
        self.adapted_emotion_embedding_tensor = A.adapt_features(
            self.adapter_params["text"], self.emotion_embedding_tensor,
            self.beta)

    def encode_images(self, pixel_values) -> jnp.ndarray:
        return self._encode_images(self.clip_params,
                                   jnp.asarray(pixel_values))

    def forward(self, pixel_values, context_features=None,
                use_adapters_for_training: bool = True) -> jnp.ndarray:
        del use_adapters_for_training  # eval-mode dropout is always off
        feats = self.encode_images(pixel_values)
        ctx = None if context_features is None \
            else jnp.asarray(context_features)
        return self._forward_eval(
            self.adapter_params, feats, self.emotion_embedding_tensor,
            self.clip_params["logit_scale"], ctx,
            cached_text_emb=self.adapted_emotion_embedding_tensor)

    def predict_probs(self, pixel_values, context_features=None
                      ) -> jnp.ndarray:
        return jax.nn.softmax(self.forward(pixel_values, context_features),
                              axis=-1)

    # eval-harness adapters (evaluate_model protocol)
    def predict(self, pixel_values) -> jnp.ndarray:
        return self.predict_probs(pixel_values)

    def get_trainable_parameters(self) -> Params:
        return self.adapter_params

    def count_trainable_params(self) -> int:
        return sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(self.adapter_params))

    def print_model_structure(self) -> None:
        """Param-count report (model_v.py:362-413)."""
        clip_total = sum(int(np.prod(x.shape))
                         for x in jax.tree.leaves(self.clip_params))
        print("Model structure:")
        print(f"  frozen CLIP params: {clip_total:,}")
        for name, sub in self.adapter_params.items():
            n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(sub))
            print(f"  {name}_adapter (trainable): {n:,}")
        print(f"  total trainable: {self.count_trainable_params():,}")
