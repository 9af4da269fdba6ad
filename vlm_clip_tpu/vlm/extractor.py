"""VLM context extraction: protocol, CLIP-encoding base, stub and cache.

The reference's ``VLMContextExtractor`` (model_v.py:43-142) wraps a 4-bit
Qwen2.5-VL that generates a facial-expression description per image, plus
a frozen CLIP that embeds the description text. Its contract:

- ``extract_context_from_image(image) -> str | None`` (None on any error);
- ``encode_context_descriptions(text) -> [1, P] L2-normalized | None``.

TPU-native architecture: generation is moved OFF the training hot path
entirely — the reference re-generates every description per image per
epoch inside the dataloader (enhance.py:70-71, the dominant cost in
SURVEY.md §3.1). Here a **context cache** is built once (offline CLI:
``python -m vlm_clip_tpu.cli.build_context_cache``) and training reads
cached text + features. Backends:

- :class:`QwenVLContextExtractor` (vlm/qwen.py) — the JAX Qwen2.5-VL port;
- :class:`StubContextExtractor` — deterministic, dependency-free template
  descriptions (for tests and VLM-less environments);
- :class:`CachedContextExtractor` — replays a prebuilt cache.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional, Protocol

import numpy as np

from vlm_clip_tpu.core.config import EMOTIONS

VLM_PROMPT = ("Describe the emotion and facial expression of the person in "
              "this image in detail. Focus on specific facial features like "
              "eyes, eyebrows, mouth, and overall expression.")


class ContextExtractor(Protocol):
    def extract_context_from_image(self, image) -> Optional[str]: ...

    def encode_context_descriptions(self, description: Optional[str]
                                    ) -> Optional[np.ndarray]: ...


class ClipTextEncoderMixin:
    """Shared CLIP text-encoding half of the extractor contract
    (model_v.py:128-142): encode -> L2-normalize -> [1, P]; None on
    failure/empty."""

    def __init__(self, clip_params, clip_cfg, tokenizer, policy=None):
        from vlm_clip_tpu.core.dtypes import BF16

        self._clip_params = clip_params
        self._clip_cfg = clip_cfg
        self._tokenizer = tokenizer
        self._policy = policy or BF16

    @property
    def text_feature_dim(self) -> int:
        return self._clip_cfg.projection_dim

    def encode_context_descriptions(self, description: Optional[str]
                                    ) -> Optional[np.ndarray]:
        if not description:
            return None
        try:
            import jax.numpy as jnp

            from vlm_clip_tpu.models import clip as C
            from vlm_clip_tpu.models import layers as L

            ids, mask = self._tokenizer([description])
            feats = C.jitted_text_features(self._clip_cfg, self._policy)(
                self._clip_params, jnp.asarray(ids), jnp.asarray(mask))
            return np.asarray(L.l2_normalize(feats).astype(jnp.float32))
        except Exception as e:  # None-on-error contract (model_v.py:140-142)
            print(f"Error encoding context with CLIP: {e}")
            return None


class StubContextExtractor(ClipTextEncoderMixin):
    """Deterministic VLM stand-in: hashes image bytes to a stable template
    description. Exercises every downstream code path (caching, encoding,
    fusion, context-quality analytics) without a 3B decode."""

    _TEMPLATES = tuple(
        f"The person shows a {e} expression with distinctive eyes, "
        f"eyebrows and mouth details." for e in EMOTIONS)

    def __init__(self, clip_params, clip_cfg, tokenizer, policy=None,
                 fail_rate: float = 0.0):
        super().__init__(clip_params, clip_cfg, tokenizer, policy)
        self.fail_rate = fail_rate

    def extract_context_from_image(self, image) -> Optional[str]:
        try:
            arr = np.asarray(image, dtype=np.uint8)
            h = int(hashlib.sha1(arr.tobytes()).hexdigest()[:8], 16)
            if self.fail_rate > 0.0 and (h % 1000) / 1000.0 < self.fail_rate:
                return None  # simulated VLM failure
            return self._TEMPLATES[h % len(self._TEMPLATES)]
        except Exception as e:
            print(f"Error processing image for VLM context: {e}")
            return None

    def extract_contexts_batch(self, images):
        """Batched contract mirror of QwenVLContextExtractor — row i
        equals extract_context_from_image(images[i])."""
        return [self.extract_context_from_image(im) for im in images]


class CachedContextExtractor:
    """Replays a context cache keyed by image path (or content hash).

    Cache layout (built by cli/build_context_cache.py):
      <dir>/contexts.json   {key: description | null}
      <dir>/features.npz    {key: [P] float32 normalized features}
    """

    def __init__(self, cache_dir: str, fallback: Optional[ContextExtractor]
                 = None):
        self.cache_dir = cache_dir
        with open(os.path.join(cache_dir, "contexts.json")) as f:
            self._texts: Dict[str, Optional[str]] = json.load(f)
        npz = np.load(os.path.join(cache_dir, "features.npz"))
        self._feats = {k: npz[k] for k in npz.files}
        self.fallback = fallback
        self._last_key: Optional[str] = None

    @staticmethod
    def key_for(path_or_image) -> str:
        if isinstance(path_or_image, str):
            return hashlib.sha1(path_or_image.encode()).hexdigest()[:16]
        arr = np.asarray(path_or_image, dtype=np.uint8)
        return hashlib.sha1(arr.tobytes()).hexdigest()[:16]

    def extract_context_from_image(self, image, key: Optional[str] = None
                                   ) -> Optional[str]:
        key = key or self.key_for(image)
        self._last_key = key
        if key in self._texts:
            return self._texts[key]
        if self.fallback is not None:
            return self.fallback.extract_context_from_image(image)
        return None

    def encode_context_descriptions(self, description: Optional[str]
                                    ) -> Optional[np.ndarray]:
        if not description:
            return None
        key = self._last_key
        if key is not None and key in self._feats:
            return self._feats[key][None]
        if self.fallback is not None:
            return self.fallback.encode_context_descriptions(description)
        return None
