"""Image preprocessing: host decode -> device-ready fixed-shape batches.

The reference preprocesses through ``CLIPProcessor`` on the host per item
(dataset.py:152-159, enhance.py:66). TPU-first split:

- host side (:func:`load_and_resize`): decode + bicubic shortest-edge
  resize + center crop to the model's input size, emitting **uint8 HWC**
  (4 bytes/px saved vs fp32 on the host->device transfer);
- device side (:func:`normalize_batch_tpu`): rescale + CLIP mean/std
  normalize + NCHW, jit-able; normalization also folds directly into the
  patch-embed matmul (models/clip.py uint8 path), and raw frames can be
  resized on device too (ops/image.py).

Numerics match CLIPProcessor: PIL bicubic resize, center crop, 1/255
rescale, per-channel normalize (CLIP mean/std; the reference's video path
uses ImageNet stats instead — see data/video.py).
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from vlm_clip_tpu.core.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def _to_pil(img) -> "Image.Image":
    if Image is not None and isinstance(img, Image.Image):
        return img.convert("RGB")
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    return Image.fromarray(arr).convert("RGB")


def load_and_resize(img: Union[str, "Image.Image", np.ndarray],
                    image_size: int = 224) -> np.ndarray:
    """Decode + shortest-edge bicubic resize + center crop -> uint8 [S,S,3]."""
    if isinstance(img, str):
        img = Image.open(img)
    pil = _to_pil(img)
    w, h = pil.size
    short = min(w, h)
    scale = image_size / short
    nw, nh = round(w * scale), round(h * scale)
    pil = pil.resize((nw, nh), Image.BICUBIC)
    left = (nw - image_size) // 2
    top = (nh - image_size) // 2
    pil = pil.crop((left, top, left + image_size, top + image_size))
    return np.asarray(pil, dtype=np.uint8)


def normalize_batch_tpu(uint8_hwc, mean: Sequence[float] = CLIP_IMAGE_MEAN,
                        std: Sequence[float] = CLIP_IMAGE_STD,
                        dtype=None):
    """[B,S,S,3] uint8 -> [B,3,S,S] normalized float (jit-able, on device)."""
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    x = uint8_hwc.astype(dtype) / 255.0
    m = jnp.asarray(mean, dtype)
    s = jnp.asarray(std, dtype)
    x = (x - m) / s
    return x.transpose(0, 3, 1, 2)


def preprocess_host(img, image_size: int = 224,
                    mean: Sequence[float] = CLIP_IMAGE_MEAN,
                    std: Sequence[float] = CLIP_IMAGE_STD) -> np.ndarray:
    """Full host-side CLIPProcessor-equivalent -> float32 [3,S,S].

    Use for parity tests / small evals; the train path keeps normalization
    on device via normalize_batch_tpu.
    """
    arr = load_and_resize(img, image_size).astype(np.float32) / 255.0
    arr = (arr - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return arr.transpose(2, 0, 1)
