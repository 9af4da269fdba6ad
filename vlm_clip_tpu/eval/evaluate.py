"""Batched evaluation core (reference evaluation.py:17-68, utils.py:24-68).

``evaluate_model`` mirrors the reference's 8-tuple return (accuracy,
confusion matrix, classification report, predictions, labels, image paths,
confidences, per-class probability matrix) packed in a named dataclass,
with the tuple available via ``astuple()`` for drop-in callers.
``contexts`` is the 9th element for the enhanced (V) path.

TPU notes: the predict loop runs fixed-shape batches (loader pads the tail
and marks padding in ``Batch.valid``; padded rows are dropped before
metrics) — no recompiles across a ragged dataset.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import numpy as np

from vlm_clip_tpu.core.config import EMOTIONS
from vlm_clip_tpu.data.preprocess import normalize_batch_tpu


@dataclasses.dataclass
class EvalResult:
    accuracy: float
    conf_matrix: np.ndarray
    class_report: str
    predictions: np.ndarray
    labels: np.ndarray
    image_paths: List[str]
    confidences: np.ndarray
    similarity_scores: np.ndarray  # [N, C] probability matrix
    contexts: Optional[List[str]] = None  # V pipeline (utils.py:36-55)

    def astuple(self):
        t = (self.accuracy, self.conf_matrix, self.class_report,
             self.predictions, self.labels, self.image_paths,
             self.confidences, self.similarity_scores)
        return t if self.contexts is None else t + (self.contexts,)


def evaluate_model(model, test_loader, use_all_descriptions: bool = False,
                   class_names: Sequence[str] = EMOTIONS) -> EvalResult:
    """Run the batched no-grad predict loop and compute sklearn metrics."""
    from sklearn.metrics import (accuracy_score, classification_report,
                                 confusion_matrix)

    import jax.numpy as jnp

    all_probs, all_labels, all_paths = [], [], []
    for batch in test_loader:
        px = normalize_batch_tpu(jnp.asarray(batch.images))
        if use_all_descriptions:
            probs = model.predict_with_all_descriptions(px)
        else:
            probs = model.predict(px)
        probs = np.asarray(probs)
        valid = batch.valid if batch.valid is not None \
            else np.ones((batch.size,), bool)
        all_probs.append(probs[valid])
        all_labels.append(np.asarray(batch.labels)[valid])
        if batch.paths is not None:
            all_paths.extend(p for p, v in zip(batch.paths, valid) if v)

    probs = np.concatenate(all_probs)
    labels = np.concatenate(all_labels)
    preds = probs.argmax(axis=1)
    confidences = probs.max(axis=1)

    acc = accuracy_score(labels, preds)
    cm = confusion_matrix(labels, preds,
                          labels=list(range(len(class_names))))
    report = classification_report(
        labels, preds, labels=list(range(len(class_names))),
        target_names=list(class_names), zero_division=0)
    return EvalResult(accuracy=float(acc), conf_matrix=cm,
                      class_report=report, predictions=preds, labels=labels,
                      image_paths=all_paths, confidences=confidences,
                      similarity_scores=probs)
