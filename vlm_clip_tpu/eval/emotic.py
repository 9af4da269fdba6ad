"""EMOTIC evaluation: CLIP zero-shot / adapter scoring + mAP.

The reference ships EMOTIC loaders but no in-repo EMOTIC trainer/eval
(SURVEY.md §3.5: "the EMOTIC training harness is external"); the driver's
parity gate is "EMOTIC eval mAP" (BASELINE.json). This module defines the
harness: score the 26 EMOTIC categories with CLIP class-text embeddings
(zero-shot, or through a T-style visual adapter) and compute multi-label
mAP with sklearn average precision.

Scoring uses CLIP's own normalization stats on the context image (the
EMOTIC context/body stats in data/emotic.py exist for parity with the
reference's external CNN pipeline).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

from vlm_clip_tpu.data.emotic import EMOTIC_CATEGORIES

CATEGORY_PROMPT = "a photo of a person feeling {}"


def encode_category_embeddings(clip_params, cfg, tokenizer, policy=None,
                               categories: Sequence[str] =
                               EMOTIC_CATEGORIES):
    """[26, P] normalized category-text embeddings, one batched forward."""
    import jax.numpy as jnp

    from vlm_clip_tpu.core.dtypes import BF16
    from vlm_clip_tpu.models import clip as C
    from vlm_clip_tpu.models import layers as L

    policy = policy or BF16
    texts = [CATEGORY_PROMPT.format(c.lower()) for c in categories]
    ids, mask = tokenizer(texts)
    feats = C.jitted_text_features(cfg, policy)(
        clip_params, jnp.asarray(ids), jnp.asarray(mask))
    return L.l2_normalize(feats).astype(jnp.float32)


def emotic_scores(clip_params, cfg, category_emb, context_u8,
                  adapter_params=None, alpha: float = 0.2, policy=None):
    """[B, 26] cosine scores for a uint8 context batch.

    ``adapter_params``: optional T-style {'visual': ...} feature adapter
    (alpha-blended) on top of the frozen features.
    """
    import jax.numpy as jnp

    from vlm_clip_tpu.core.dtypes import BF16
    from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
    from vlm_clip_tpu.models import adapters as A
    from vlm_clip_tpu.models import clip as C
    from vlm_clip_tpu.models import layers as L

    policy = policy or BF16
    px = normalize_batch_tpu(jnp.asarray(context_u8))
    feats = C.jitted_image_features(cfg, policy)(clip_params, px)
    feats = L.l2_normalize(feats).astype(jnp.float32)
    if adapter_params is not None:
        feats = A.adapt_features(adapter_params["visual"], feats, alpha)
    return jnp.dot(feats, category_emb.T,
                   preferred_element_type=jnp.float32)


def mean_average_precision(scores: np.ndarray, labels: np.ndarray
                           ) -> Tuple[float, np.ndarray]:
    """(mAP, per-class AP) over multi-label scores; classes with no
    positive ground truth get AP = nan and are excluded from the mean."""
    from sklearn.metrics import average_precision_score

    scores = np.asarray(scores)
    labels = np.asarray(labels)
    C = labels.shape[1]
    aps = np.full((C,), np.nan)
    for c in range(C):
        if labels[:, c].sum() > 0:
            aps[c] = average_precision_score(labels[:, c], scores[:, c])
    return float(np.nanmean(aps)), aps


def evaluate_emotic(clip_params, cfg, tokenizer, loader,
                    adapter_params=None, alpha: float = 0.2,
                    policy=None) -> dict:
    """Full loop: batched scoring over an EmoticBatch loader -> mAP dict."""
    category_emb = encode_category_embeddings(clip_params, cfg, tokenizer,
                                              policy)
    all_scores, all_labels = [], []
    for batch in loader:
        s = np.asarray(emotic_scores(clip_params, cfg, category_emb,
                                     batch.context, adapter_params, alpha,
                                     policy))
        valid = batch.valid
        all_scores.append(s[valid])
        all_labels.append(batch.cat[valid])
    scores = np.concatenate(all_scores)
    labels = np.concatenate(all_labels)
    m, aps = mean_average_precision(scores, labels)
    return {
        "mAP": m,
        "per_class_ap": {EMOTIC_CATEGORIES[i]: float(aps[i])
                         for i in range(len(EMOTIC_CATEGORIES))},
        "num_samples": int(labels.shape[0]),
    }
