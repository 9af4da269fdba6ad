"""Enhanced (pipeline-V) evaluation + rich text reporting + VLM analytics.

Reference contracts: ``evaluate_enhanced_model`` 9-tuple (utils.py:24-68),
``display_results_with_contexts`` per-class top-confidence sample report
with contexts (utils.py:71-157), ``analyze_context_quality`` success rate
/ mean word length / top-5 stopword-filtered keywords per class
(utils.py:160-219).
"""

from __future__ import annotations

import os
from collections import Counter
from typing import List, Sequence

import numpy as np

from vlm_clip_tpu.core.config import EMOTIONS
from vlm_clip_tpu.data.enhanced import ERROR_DESCRIPTION, NO_DESCRIPTION
from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
from vlm_clip_tpu.eval.evaluate import EvalResult

_STOPWORDS = frozenset([
    "the", "a", "is", "in", "it", "of", "and", "to", "this", "person",
    "image", "facial", "expression", "face", "shows", "appears", "seems",
    "like", "with", "their",
])


def evaluate_enhanced_model(model, test_loader,
                            emotions: Sequence[str] = EMOTIONS
                            ) -> EvalResult:
    """Batched predict loop over (image, label, path, context, text) items.

    Returns an EvalResult whose ``astuple()`` matches the reference's
    9-tuple (accuracy, cm, report, preds, labels, paths, confidences,
    probs, contexts_text).
    """
    from sklearn.metrics import (accuracy_score, classification_report,
                                 confusion_matrix)

    import jax.numpy as jnp

    probs_l, labels_l, paths, contexts = [], [], [], []
    for batch in test_loader:
        px = normalize_batch_tpu(jnp.asarray(batch.images))
        probs = np.asarray(model.predict_probs(px, batch.context_features))
        valid = batch.valid if batch.valid is not None \
            else np.ones((batch.size,), bool)
        probs_l.append(probs[valid])
        labels_l.append(np.asarray(batch.labels)[valid])
        if batch.paths is not None:
            paths.extend(p for p, v in zip(batch.paths, valid) if v)
        if batch.contexts is not None:
            contexts.extend(c for c, v in zip(batch.contexts, valid) if v)

    probs = np.concatenate(probs_l)
    labels = np.concatenate(labels_l)
    preds = probs.argmax(axis=1)
    acc = accuracy_score(labels, preds)
    cm = confusion_matrix(labels, preds, labels=list(range(len(emotions))))
    report = classification_report(labels, preds,
                                   labels=list(range(len(emotions))),
                                   target_names=list(emotions), digits=4,
                                   zero_division=0)
    return EvalResult(accuracy=float(acc), conf_matrix=cm,
                      class_report=report, predictions=preds, labels=labels,
                      image_paths=paths, confidences=probs.max(axis=1),
                      similarity_scores=probs, contexts=contexts)


def display_results_with_contexts(results: EvalResult,
                                  emotions: Sequence[str] = EMOTIONS,
                                  num_samples_per_class: int = 3,
                                  out_dir: str = ".") -> None:
    """Rich console report incl. per-class top-confidence correct/incorrect
    samples with their VLM contexts (utils.py:71-157)."""
    import pandas as pd

    from vlm_clip_tpu.eval.plots import plot_confusion_matrix

    print(f"\n{'=' * 60}")
    print("ENHANCED CLIP-ADAPTER EVALUATION RESULTS")
    print(f"{'=' * 60}")
    print(f"Overall Accuracy: {results.accuracy:.4f}")

    print(f"\n{'=' * 40}\nCONFUSION MATRIX\n{'=' * 40}")
    print(pd.DataFrame(results.conf_matrix, index=list(emotions),
                       columns=list(emotions)))
    path = plot_confusion_matrix(results.conf_matrix, "Confusion Matrix",
                                 emotions, out_dir)
    print(f"\nConfusion matrix plot saved as {os.path.basename(path)}")

    print(f"\n{'=' * 40}\nCLASSIFICATION REPORT\n{'=' * 40}")
    print(results.class_report)

    print(f"\n{'=' * 60}")
    print("SAMPLE CONTEXT DESCRIPTIONS BY TRUE EMOTION CLASS")
    print(f"{'=' * 60}")
    contexts = results.contexts or [""] * len(results.labels)
    paths = results.image_paths or [""] * len(results.labels)
    for idx, name in enumerate(emotions):
        print(f"\n{'-' * 50}\nEMOTION (TRUE): {name.upper()}\n{'-' * 50}")
        rows = [i for i, l in enumerate(results.labels) if l == idx]
        if not rows:
            print("No samples found for this emotion.")
            continue
        rows.sort(key=lambda i: results.confidences[i], reverse=True)
        correct = [i for i in rows if results.predictions[i] == idx]
        wrong = [i for i in rows if results.predictions[i] != idx]
        print(f"Total samples for {name}: {len(rows)}")
        print(f"Correct predictions: {len(correct)}")
        print(f"Incorrect predictions: {len(wrong)}")

        def show(tag, idxs, cap):
            if not idxs:
                return
            print(f"\n  {tag} (True: {name}):")
            for j, i in enumerate(idxs[:cap]):
                print(f"\n    Sample {j + 1}:")
                print(f"      Image: {os.path.basename(paths[i])}")
                print(f"      Predicted: "
                      f"{emotions[results.predictions[i]]} "
                      f"(Confidence: {results.confidences[i]:.4f})")
                print(f"      Context: {contexts[i]}")

        show("TOP CORRECT PREDICTIONS", correct, num_samples_per_class)
        show("TOP INCORRECT PREDICTIONS", wrong,
             min(2, num_samples_per_class))
    print(f"\n{'=' * 60}")


def analyze_context_quality(all_contexts_text: List[str],
                            all_labels,
                            emotions: Sequence[str] = EMOTIONS) -> dict:
    """VLM description analytics (utils.py:160-219). Returns the stats it
    prints, for programmatic use."""
    print(f"\n{'=' * 60}\nCONTEXT DESCRIPTION ANALYSIS\n{'=' * 60}")
    stats = {"total": 0, "valid": 0, "success_rate": None,
             "avg_length": None, "keywords": {}}
    if not all_contexts_text:
        print("No context descriptions provided for analysis.")
        return stats

    def is_valid(c):
        return bool(c) and c.strip() not in (NO_DESCRIPTION,
                                             ERROR_DESCRIPTION)

    valid = [c for c in all_contexts_text if is_valid(c)]
    stats["total"] = len(all_contexts_text)
    stats["valid"] = len(valid)
    print(f"Total contexts processed: {stats['total']}")
    print(f"Valid contexts generated: {stats['valid']}")
    if stats["total"]:
        stats["success_rate"] = 100.0 * stats["valid"] / stats["total"]
        print(f"VLM Context Generation Success Rate: "
              f"{stats['success_rate']:.2f}%")

    if valid:
        stats["avg_length"] = sum(len(c.split()) for c in valid) / len(valid)
        print(f"Average valid context length: {stats['avg_length']:.1f} "
              "words")
        print("\nCOMMON KEYWORDS IN VALID CONTEXTS BY TRUE EMOTION:")
        labels = np.asarray(all_labels)
        for idx, name in enumerate(emotions):
            cls_ctx = [all_contexts_text[i] for i in range(len(labels))
                       if labels[i] == idx and is_valid(all_contexts_text[i])]
            if not cls_ctx:
                print(f"  {name.capitalize()}: No valid contexts found for "
                      "this emotion.")
                continue
            words = []
            for c in cls_ctx:
                for w in c.split():
                    w = w.lower().strip('.,!?";:')
                    if len(w) > 3 and w not in _STOPWORDS:
                        words.append(w)
            if words:
                top = [w for w, _ in Counter(words).most_common(5)]
                stats["keywords"][name] = top
                print(f"  {name.capitalize()}: {top}")
            else:
                print(f"  {name.capitalize()}: No significant keywords "
                      "found after filtering.")
    print(f"\n{'=' * 60}")
    return stats
