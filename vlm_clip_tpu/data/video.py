"""Video frame pipeline (reference process_video.py:6-33) + per-frame
CLIP scoring (BASELINE.json config 4).

Behavior contracts:
- first ``frame_limit=16`` frames via cv2, BGR->RGB, resize to 224^2;
- normalization uses **ImageNet** stats, not CLIP stats — a reference
  inconsistency (process_video.py:21-26) reproduced by default and
  flag-gated via ``stats="clip"``;
- output layout [C, T, H, W] (tensor stack then permute,
  process_video.py:28-29).

NOT reproduced: the reference executes an example call at module import
(process_video.py:33) — an import-time side effect; here everything is a
function. The TPU path keeps decode on host (cv2) and hands uint8 frames
to the device for normalize + per-frame CLIP scoring in one jit.
"""

from __future__ import annotations

from typing import Tuple
import functools

import numpy as np

from vlm_clip_tpu.core.config import (CLIP_IMAGE_MEAN, CLIP_IMAGE_STD,
                                      IMAGENET_MEAN, IMAGENET_STD)


def extract_frames(video_path: str, frame_limit: int = 16,
                   size: int = 224) -> np.ndarray:
    """First ``frame_limit`` frames -> uint8 [T, size, size, 3] (RGB)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    frames = []
    try:
        while len(frames) < frame_limit:
            ok, frame = cap.read()
            if not ok:
                break
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frames.append(cv2.resize(frame, (size, size)))
    finally:
        cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {video_path}")
    return np.stack(frames).astype(np.uint8)


def process_video(video_path: str, frame_limit: int = 16,
                  size: int = 224, stats: str = "imagenet") -> np.ndarray:
    """Reference-shaped output: normalized float32 [C, T, H, W].

    ``stats='imagenet'`` reproduces the reference's (inconsistent) choice
    of ImageNet normalization; ``stats='clip'`` uses CLIP stats.
    """
    frames = extract_frames(video_path, frame_limit, size)
    mean, std = (IMAGENET_MEAN, IMAGENET_STD) if stats == "imagenet" \
        else (CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)
    x = frames.astype(np.float32) / 255.0
    x = (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return x.transpose(3, 0, 1, 2)  # [C, T, H, W]


def score_video_frames(clip_params, cfg, frames_u8: np.ndarray,
                       class_emb, policy=None, stats: str = "clip"
                       ) -> np.ndarray:
    """Per-frame emotion probabilities [T, C_classes].

    Frames are treated as an image batch through the frozen tower (the
    reference scores frames independently; SURVEY.md §5.7) — one jitted
    forward on TPU, normalization on device.
    """
    import jax
    import jax.numpy as jnp

    from vlm_clip_tpu.core.dtypes import BF16
    from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
    from vlm_clip_tpu.models import clip as C
    from vlm_clip_tpu.models import layers as L

    policy = policy or BF16
    mean, std = (IMAGENET_MEAN, IMAGENET_STD) if stats == "imagenet" \
        else (CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)
    px = normalize_batch_tpu(jnp.asarray(frames_u8), mean, std)
    feats = C.jitted_image_features(cfg, policy)(clip_params, px)
    feats = L.l2_normalize(feats).astype(jnp.float32)
    sims = 100.0 * jnp.dot(feats, jnp.asarray(class_emb).T,
                           preferred_element_type=jnp.float32)
    return np.asarray(jax.nn.softmax(sims, axis=-1))


@functools.lru_cache(maxsize=8)
def _raw_frame_scorer(cfg, policy, stats: str, size: int):
    """Cached jitted config-4 chip program: NATIVE-resolution uint8
    frames -> per-frame class probabilities, with shortest-edge resize +
    center crop + normalize + tower + softmax fused into ONE XLA program
    (ops/image.resize_normalize_tpu). The host's only job is demux."""
    import jax
    import jax.numpy as jnp

    from vlm_clip_tpu.models import clip as C
    from vlm_clip_tpu.models import layers as L
    from vlm_clip_tpu.ops.image import resize_normalize_tpu

    mean, std = (IMAGENET_MEAN, IMAGENET_STD) if stats == "imagenet" \
        else (CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)

    @jax.jit
    def run(params, u8, emb):
        px = resize_normalize_tpu(u8, size, mean, std,
                                  dtype=policy.compute_dtype)
        feats = C.get_image_features(params, px, cfg, policy)
        feats = L.l2_normalize(feats).astype(jnp.float32)
        sims = 100.0 * jnp.dot(feats, emb.T,
                               preferred_element_type=jnp.float32)
        return jax.nn.softmax(sims, axis=-1)

    return run


def score_video_frames_raw(clip_params, cfg, frames_u8: np.ndarray,
                           class_emb, policy=None,
                           stats: str = "imagenet",
                           size: int = 224) -> np.ndarray:
    """Config-4 TPU-first path: demuxed frames at NATIVE resolution
    (uint8 [T, H, W, 3]) -> per-frame probabilities [T, C_classes].

    The reference resizes + normalizes every frame on the host
    (process_video.py:21-26, cv2 resize + ImageNet stats — the stats
    quirk is reproduced by the ``stats='imagenet'`` default) before a
    per-frame eager forward. Here the raw frames ship to the device
    once and resize/normalize/score run as one fused jit
    (:func:`_raw_frame_scorer`); measured end-to-end in
    cli/bench_video.py (BENCH.md round 5, BASELINE config 4).
    """
    import jax.numpy as jnp

    from vlm_clip_tpu.core.dtypes import BF16

    run = _raw_frame_scorer(cfg, policy or BF16, stats, size)
    return np.asarray(run(clip_params, jnp.asarray(frames_u8),
                          jnp.asarray(class_emb)))


@functools.lru_cache(maxsize=8)
def _sharded_frame_scorer(cfg, policy, stats: str):
    """Cached jitted scorer: a fresh @jax.jit closure per call would
    retrace (and recompile the whole tower) on EVERY invocation — jit
    caches are keyed by function identity. The ambient mesh is part of
    jit's own compile key, so one cache entry serves any mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
    from vlm_clip_tpu.models import clip as C
    from vlm_clip_tpu.models import layers as L
    from vlm_clip_tpu.parallel.mesh import SEQ_AXIS

    mean, std = (IMAGENET_MEAN, IMAGENET_STD) if stats == "imagenet" \
        else (CLIP_IMAGE_MEAN, CLIP_IMAGE_STD)

    @jax.jit
    def run(params, u8, emb):
        px = normalize_batch_tpu(u8, mean, std, dtype=policy.compute_dtype)
        px = jax.lax.with_sharding_constraint(
            px, P(SEQ_AXIS, None, None, None))
        feats = C.get_image_features(params, px, cfg, policy)
        feats = L.l2_normalize(feats).astype(jnp.float32)
        sims = 100.0 * jnp.dot(feats, emb.T,
                               preferred_element_type=jnp.float32)
        return jax.nn.softmax(sims, axis=-1)

    return run


def score_video_frames_sharded(clip_params, cfg, frames_u8: np.ndarray,
                               class_emb, mesh, policy=None,
                               stats: str = "clip") -> np.ndarray:
    """Per-frame scores with the FRAME axis sharded over the mesh's
    ``seq`` axis — the "frames x patches shardable axis" of SURVEY §5.7:
    raising ``frame_limit`` scales across chips instead of batch memory.
    ``mesh`` must carry a ``seq`` axis (parallel/mesh.py MeshConfig(seq=k));
    equivalence vs :func:`score_video_frames` is tested on the virtual
    8-device mesh (tests/test_emotic_video.py).
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vlm_clip_tpu.core.dtypes import BF16
    from vlm_clip_tpu.parallel.mesh import SEQ_AXIS, with_mesh

    policy = policy or BF16
    run = _sharded_frame_scorer(cfg, policy, stats)

    with with_mesh(mesh):
        u8 = jax.device_put(
            jnp.asarray(frames_u8),
            NamedSharding(mesh, P(SEQ_AXIS, None, None, None)))
        out = run(clip_params, u8, jnp.asarray(class_emb))
    return np.asarray(out)
