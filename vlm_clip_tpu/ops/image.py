"""On-device image resize / preprocessing (jit-able, fixed shapes).

Closes the SURVEY §2.9 OpenCV row: the reference resizes every image on
the host (cv2/PIL inside Dataset __getitem__, dataset.py:152-159,
process_video.py:21-26). Here raw decoded frames can ship to the device
as uint8 and be resized + normalized on the TPU, so host cores only
decode (and with data/pixel_cache.py not even that).

Numerics: ``jax.image.resize(..., antialias=True)`` is the TF2-style
antialiased kernel — very close to PIL's convolution resampler but not
bit-exact (tests pin the tolerance). For bit-exact CLIPProcessor parity
use the host path (data/preprocess.py); use this for throughput.

All functions take static output sizes -> one compile per shape.
"""

from __future__ import annotations

from typing import Sequence, Tuple, Union

from vlm_clip_tpu.core.config import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD


def resize_batch_tpu(images, out_hw: Union[int, Tuple[int, int]],
                     method: str = "bicubic", antialias: bool = True):
    """[B, H, W, C] (uint8 or float) -> resized float32 [B, h, w, C]."""
    import jax
    import jax.numpy as jnp

    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    x = images.astype(jnp.float32)
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, out_hw[0], out_hw[1], C),
                            method=method, antialias=antialias)


def resize_center_crop_tpu(images, image_size: int,
                           method: str = "bicubic"):
    """Shortest-edge resize + center crop on device — the jit twin of
    data/preprocess.py:load_and_resize (CLIPProcessor semantics).

    Input [B, H, W, C] uint8/float with static H, W; output float32
    [B, image_size, image_size, C].
    """
    h, w = int(images.shape[1]), int(images.shape[2])
    short = min(h, w)
    scale = image_size / short
    nh, nw = round(h * scale), round(w * scale)
    x = resize_batch_tpu(images, (nh, nw), method=method)
    top = (nh - image_size) // 2
    left = (nw - image_size) // 2
    return x[:, top:top + image_size, left:left + image_size, :]


def resize_normalize_tpu(images, image_size: int,
                         mean: Sequence[float] = CLIP_IMAGE_MEAN,
                         std: Sequence[float] = CLIP_IMAGE_STD,
                         method: str = "bicubic", dtype=None):
    """Full on-device pipeline for raw decoded frames: shortest-edge
    resize + center crop + 1/255 rescale + normalize + NCHW.

    Replaces the reference's host-side CLIPProcessor image path and the
    video frame transform (process_video.py:21-26 — pass ImageNet
    mean/std there) with one fused XLA program.
    """
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    x = resize_center_crop_tpu(images, image_size, method=method)
    x = x.astype(dtype) / 255.0
    m = jnp.asarray(mean, dtype)
    s = jnp.asarray(std, dtype)
    return ((x - m) / s).transpose(0, 3, 1, 2)
