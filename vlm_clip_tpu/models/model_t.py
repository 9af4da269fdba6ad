"""Pipeline T — CLIP-Adapter with class-text-embedding CE training.

TPU-native rebuild of the reference's ``CLIPAdapter`` and
``ZeroShotEmotionRecognition`` (model_t.py:35-403). Behavior contracts:

- prompt bank: 5 descriptions/class; each description's text features are
  L2-normalized, the per-class embedding is the **unrenormalized mean** of
  the normalized features (model_t.py:71-109);
- adapter math: ``f = r*MLP(x) + (1-r)*x`` then renorm, visual ratio alpha,
  text ratio beta (model_t.py:163-181);
- training: frozen towers, CE over
  ``exp(logit_scale) * img_final @ txt_final.T`` vs class labels, the
  logit scale is read once as a python float (model_t.py:145,184);
- predict: ``softmax(100 * img_final @ adapted_class_emb.T)`` — note the
  hardcoded 100, not the learned scale (model_t.py:213-242);
- predict_with_all_descriptions: per-class max over the 5 per-description
  similarities, then softmax over the 7 maxima (model_t.py:244-298). The
  reference's python double loop over 7x5 tiny matmuls is replaced by one
  [B,P]x[P,35] matmul + reshape + max — same numbers, one MXU pass;
- update_emotion_embeddings: adapted class embeddings refreshed after each
  epoch for eval (model_t.py:111-129, 204).

TPU-first: the image tower runs under stop_gradient and its pooled
features are **cached per epoch** (encode-once, adapt-many — the trainable
compute is O(bottleneck), so after epoch 1 training never touches the
tower; observable behavior is identical because the tower is frozen).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vlm_clip_tpu.core.config import CLIPConfig, EMOTIONS
from vlm_clip_tpu.core.dtypes import BF16, DTypePolicy
from vlm_clip_tpu.data.captions import (NUM_DESCRIPTIONS_PER_CLASS,
                                        get_emotion_descriptions)
from vlm_clip_tpu.models import adapters as A
from vlm_clip_tpu.models import clip as C
from vlm_clip_tpu.models import layers as L

Params = Dict[str, Any]


@dataclasses.dataclass
class EmotionBank:
    """Pre-encoded class-text embeddings (device arrays)."""
    per_description: jnp.ndarray  # [C, K, P], L2-normalized
    mean: jnp.ndarray             # [C, P], mean of normalized (NOT renormed)


def encode_emotion_bank(clip_params: Params, cfg: CLIPConfig, tokenizer,
                        policy: DTypePolicy = BF16,
                        emotions=EMOTIONS) -> EmotionBank:
    """Encode the 7x5 prompt bank in ONE batched text forward.

    (The reference runs 35 separate forwards, model_t.py:85-101.)
    """
    bank = get_emotion_descriptions()
    texts = [d for e in emotions for d in bank[e]]
    ids, mask = tokenizer(texts)
    feats = C.jitted_text_features(cfg, policy)(
        clip_params, jnp.asarray(ids), jnp.asarray(mask))
    feats = L.l2_normalize(feats).astype(jnp.float32)
    K = NUM_DESCRIPTIONS_PER_CLASS
    per_desc = feats.reshape(len(emotions), K, -1)
    return EmotionBank(per_description=per_desc, mean=per_desc.mean(axis=1))


def init_t_adapters(rng, feature_dim: int, bottleneck: int) -> Params:
    kv, kt = jax.random.split(rng)
    return {"visual": A.init_feature_adapter(kv, feature_dim, bottleneck),
            "text": A.init_feature_adapter(kt, feature_dim, bottleneck)}


# ---------------------------------------------------------------------------
# functional forward / loss (jit-able)
# ---------------------------------------------------------------------------

def adapted_class_embeddings(adapter_params: Params, mean_emb: jnp.ndarray,
                             beta: float) -> jnp.ndarray:
    """beta-blend + renorm of the class means (model_t.py:111-129)."""
    return A.adapt_features(adapter_params["text"], mean_emb, beta)


def t_logits(adapter_params: Params, image_features_norm: jnp.ndarray,
             mean_emb: jnp.ndarray, alpha: float, beta: float,
             scale: jnp.ndarray) -> jnp.ndarray:
    """Training-path logits from precomputed normalized image features."""
    img = A.adapt_features(adapter_params["visual"], image_features_norm,
                           alpha)
    txt = adapted_class_embeddings(adapter_params, mean_emb, beta)
    return scale * jnp.dot(img.astype(jnp.float32), txt.T.astype(jnp.float32),
                           preferred_element_type=jnp.float32)


def t_loss_fn(adapter_params: Params, image_features_norm: jnp.ndarray,
              labels: jnp.ndarray, mean_emb: jnp.ndarray, alpha: float,
              beta: float, scale: jnp.ndarray) -> jnp.ndarray:
    logits = t_logits(adapter_params, image_features_norm, mean_emb,
                      alpha, beta, scale)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=1))


def predict_probs(adapter_params: Optional[Params],
                  image_features_norm: jnp.ndarray,
                  class_emb: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """softmax(100 * img_final @ class_emb.T) (model_t.py:213-242).

    With ``adapter_params=None`` this is the zero-shot path
    (model_t.py:354-369) — class_emb should then be the raw means.
    """
    img = image_features_norm
    if adapter_params is not None:
        img = A.adapt_features(adapter_params["visual"], img, alpha)
    sims = 100.0 * jnp.dot(img.astype(jnp.float32),
                           class_emb.T.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
    return jax.nn.softmax(sims, axis=-1)


def predict_probs_all_descriptions(adapter_params: Optional[Params],
                                   image_features_norm: jnp.ndarray,
                                   per_desc_emb: jnp.ndarray, alpha: float,
                                   beta: float) -> jnp.ndarray:
    """Vectorized all-descriptions mode (model_t.py:244-298).

    per_desc_emb: [C, K, P] normalized description embeddings. Adapter
    (when present) beta-blends each description embedding; score per class
    is the max over its K descriptions of 100*cosine; softmax over classes.
    """
    Ccls, K, P = per_desc_emb.shape
    txt = per_desc_emb.reshape(Ccls * K, P)
    img = image_features_norm
    if adapter_params is not None:
        img = A.adapt_features(adapter_params["visual"], img, alpha)
        txt = A.adapt_features(adapter_params["text"], txt, beta)
    sims = 100.0 * jnp.dot(img.astype(jnp.float32),
                           txt.T.astype(jnp.float32),
                           preferred_element_type=jnp.float32)
    sims = sims.reshape(-1, Ccls, K).max(axis=-1)
    return jax.nn.softmax(sims, axis=-1)


# ---------------------------------------------------------------------------
# stateful wrapper mirroring the reference class API
# ---------------------------------------------------------------------------

class CLIPAdapterT:
    """Reference-API wrapper: CLIPAdapter(model_name, alpha, beta, ...).

    Holds converted CLIP params + adapter params + cached emotion
    embeddings; all compute paths are jitted functional code above.
    """

    def __init__(self, clip_params: Params, cfg: CLIPConfig, tokenizer,
                 alpha: float = 0.2, beta: float = 0.2,
                 bottleneck_dim: int = 64, policy: DTypePolicy = BF16,
                 seed: int = 0):
        self.clip_params = clip_params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.alpha = alpha
        self.beta = beta
        self.policy = policy
        self.feature_dim = cfg.projection_dim
        self.adapter_params = init_t_adapters(
            jax.random.PRNGKey(seed), self.feature_dim, bottleneck_dim)
        # frozen scalar temperature, as the reference reads it once
        self.temperature = float(np.exp(np.asarray(
            clip_params["logit_scale"], np.float32)))
        self.bank = encode_emotion_bank(clip_params, cfg, tokenizer, policy)
        self.adapted_class_emb: Optional[jnp.ndarray] = None

        self._encode_images = jax.jit(functools.partial(
            _encode_images_norm, cfg=cfg, policy=policy))
        self._predict = jax.jit(predict_probs, static_argnames=("alpha",))
        self._predict_all = jax.jit(predict_probs_all_descriptions,
                                    static_argnames=("alpha", "beta"))

    # -- features ---------------------------------------------------------
    def encode_images(self, pixel_values) -> jnp.ndarray:
        """Normalized pooled image features (frozen tower, no grad)."""
        return self._encode_images(self.clip_params,
                                   jnp.asarray(pixel_values))

    # -- embeddings -------------------------------------------------------
    def update_emotion_embeddings(self) -> None:
        self.adapted_class_emb = adapted_class_embeddings(
            self.adapter_params, self.bank.mean, self.beta)

    # -- inference --------------------------------------------------------
    def predict(self, pixel_values) -> jnp.ndarray:
        feats = self.encode_images(pixel_values)
        emb = self.adapted_class_emb if self.adapted_class_emb is not None \
            else self.bank.mean
        return self._predict(self.adapter_params, feats, emb, self.alpha)

    def predict_with_all_descriptions(self, pixel_values) -> jnp.ndarray:
        feats = self.encode_images(pixel_values)
        return self._predict_all(self.adapter_params, feats,
                                 self.bank.per_description, self.alpha,
                                 self.beta)

    def train(self, train_loader, num_epochs: int = 5,
              learning_rate: float = 3e-4,
              cache_image_features: bool = True) -> list:
        """Adapter-only training (reference model_t.py:131-211).

        Returns per-epoch mean losses. See train/trainer_t.py for the
        implementation (kept importable without this wrapper).
        """
        from vlm_clip_tpu.train.trainer_t import train_t_adapters

        self.adapter_params, losses = train_t_adapters(
            self, train_loader, num_epochs=num_epochs,
            learning_rate=learning_rate,
            cache_image_features=cache_image_features)
        self.update_emotion_embeddings()
        return losses

    # -- checkpoint API (beyond-reference: the reference never persists
    # T adapters; serving needs a tested format — train/checkpoint.py) --
    def save_adapters(self, path: str) -> None:
        from vlm_clip_tpu.train.checkpoint import save_t_adapters

        save_t_adapters(path, self.adapter_params)

    def load_adapters(self, path: str) -> None:
        from vlm_clip_tpu.train.checkpoint import load_t_adapters

        self.adapter_params = load_t_adapters(path)
        self.update_emotion_embeddings()


class ZeroShotEmotionRecognition:
    """No-adapter baseline (model_t.py:300-403)."""

    def __init__(self, clip_params: Params, cfg: CLIPConfig, tokenizer,
                 policy: DTypePolicy = BF16):
        self.clip_params = clip_params
        self.cfg = cfg
        self.policy = policy
        self.bank = encode_emotion_bank(clip_params, cfg, tokenizer, policy)
        self._encode_images = jax.jit(functools.partial(
            _encode_images_norm, cfg=cfg, policy=policy))
        self._predict = jax.jit(predict_probs, static_argnames=("alpha",))
        self._predict_all = jax.jit(predict_probs_all_descriptions,
                                    static_argnames=("alpha", "beta"))

    def predict(self, pixel_values) -> jnp.ndarray:
        feats = self._encode_images(self.clip_params,
                                    jnp.asarray(pixel_values))
        return self._predict(None, feats, self.bank.mean, 0.0)

    def predict_with_all_descriptions(self, pixel_values) -> jnp.ndarray:
        feats = self._encode_images(self.clip_params,
                                    jnp.asarray(pixel_values))
        return self._predict_all(None, feats, self.bank.per_description,
                                 0.0, 0.0)


def _encode_images_norm(clip_params: Params, pixel_values: jnp.ndarray,
                        cfg: CLIPConfig, policy: DTypePolicy) -> jnp.ndarray:
    feats = C.get_image_features(clip_params, pixel_values, cfg, policy)
    return jax.lax.stop_gradient(L.l2_normalize(feats).astype(jnp.float32))
