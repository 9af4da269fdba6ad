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


def _resize_kernel(method: str):
    import numpy as np

    if method == "bilinear":  # triangle, support 1
        return (lambda x: np.maximum(0.0, 1.0 - np.abs(x))), 1.0
    if method == "bicubic":   # Keys cubic, a = -0.5, support 2
        a = -0.5

        def k(x):
            x = np.abs(x)
            return np.where(
                x <= 1, (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1,
                np.where(x < 2,
                         a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a,
                         0.0))
        return k, 2.0
    raise ValueError(f"unsupported resize method {method!r}")


def _resize_weights(in_size: int, out_size: int, method: str,
                    antialias: bool):
    """Dense separable resample matrix [in, out] (numpy float32).

    Same sampling convention as ``jax.image.resize``/TF2's
    ``scale_and_translate``: output pixel j samples input coordinate
    ``(j + 0.5) / scale - 0.5``; for antialiased downscale the kernel is
    stretched by ``1/scale``; columns renormalize to sum 1 (edge
    handling). Parity vs jax.image.resize pinned in
    tests/test_pixel_cache.py.
    """
    import numpy as np

    kernel, _ = _resize_kernel(method)
    scale = out_size / in_size
    kscale = min(scale, 1.0) if antialias else 1.0
    x = (np.arange(out_size) + 0.5) / scale - 0.5        # [out]
    w = kernel((np.arange(in_size)[:, None] - x[None, :]) * kscale)
    return (w / w.sum(axis=0, keepdims=True)).astype(np.float32)


def resize_batch_tpu(images, out_hw: Union[int, Tuple[int, int]],
                     method: str = "bicubic", antialias: bool = True):
    """[B, H, W, C] (uint8 or float) -> resized float32 [B, h, w, C].

    MXU-native separable resize: two dense [in, out] resample matmuls
    (H then W) instead of ``jax.image.resize`` — whose gather-based
    codegen was measured to effectively never finish compiling on the
    TPU backend at video shapes ([64, 480, 640, 3]; round-5 negative
    result, BENCH.md). The weight matrices use the same kernel and
    sampling convention, so results match jax.image.resize to float
    tolerance (tests/test_pixel_cache.py) — and the FLOPs land on the
    systolic array.
    """
    import jax.numpy as jnp

    if isinstance(out_hw, int):
        out_hw = (out_hw, out_hw)
    H, W = int(images.shape[1]), int(images.shape[2])
    wh = jnp.asarray(_resize_weights(H, out_hw[0], method, antialias))
    ww = jnp.asarray(_resize_weights(W, out_hw[1], method, antialias))
    x = images.astype(jnp.float32)
    x = jnp.tensordot(x, wh, axes=[[1], [0]])   # [B, W, C, h]
    x = jnp.tensordot(x, ww, axes=[[1], [0]])   # [B, C, h, w]
    return x.transpose(0, 2, 3, 1)


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
