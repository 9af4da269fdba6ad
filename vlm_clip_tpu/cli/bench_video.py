"""BASELINE config 4: video emotion pipeline, end-to-end on the chip.

The reference's video path (process_video.py:6-33) is: cv2 demux ->
cv2 resize to 224 on host -> ImageNet-stats normalize on host -> per
-frame eager CLIP forward. The TPU-first rebuild keeps host cores on
demux ONLY and ships native-resolution uint8 frames to the device,
where resize + center-crop + normalize + ViT-B/16 forward + class
softmax run as one fused jit (data/video.py score_video_frames_raw).

Measures, in frames/s:
- demux only (cv2.VideoCapture read + BGR->RGB, native resolution);
- chip only (uint8 upload + fused resize/normalize/score, demux
  amortized away);
- end-to-end serial (demux then score per chunk);
- end-to-end overlapped (demux producer thread || score consumer — the
  deployment shape);
- the reference-pattern baseline on the same chip (host cv2 resize +
  host normalize + fp32 frame upload + tower-only jit), so the table
  isolates what moving preprocessing onto the TPU buys.

No video file is needed: a synthetic MJPG AVI (moving blocks over a
gradient — realistic decode work, not noise) is written to --tmpdir.

    python -m vlm_clip_tpu.cli.bench_video --frames 512
"""

from __future__ import annotations

import argparse
import os
import queue
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/vlm_clip_tpu_jaxcache")


def synth_video(path: str, frames: int, w: int, h: int, fps: int) -> None:
    """Moving-blocks clip: cheap to draw, honest MJPEG decode work."""
    import cv2
    import numpy as np

    base = np.linspace(0, 255, w, dtype=np.uint8)[None, :, None]
    base = np.broadcast_to(base, (h, w, 3)).copy()
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps,
                         (w, h))
    if not wr.isOpened():
        raise RuntimeError("cv2.VideoWriter failed to open (MJPG/AVI)")
    rng = np.random.default_rng(0)
    boxes = rng.integers(0, 200, (8, 2))
    vels = rng.integers(-7, 8, (8, 2))
    colors = rng.integers(0, 255, (8, 3))
    try:
        for t in range(frames):
            f = base.copy()
            for i in range(len(boxes)):
                y, x = boxes[i] + vels[i] * t
                y, x = int(y) % (h - 60), int(x) % (w - 60)
                f[y:y + 60, x:x + 60] = colors[i]
            wr.write(f)
    finally:
        wr.release()


def demux(path: str, limit: int):
    """cv2 read + BGR->RGB at native resolution -> uint8 [T, H, W, 3]."""
    import cv2
    import numpy as np

    cap = cv2.VideoCapture(path)
    out = []
    try:
        while len(out) < limit:
            ok, f = cap.read()
            if not ok:
                break
            out.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    finally:
        cap.release()
    return np.stack(out)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=512)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--model", default="vit-base-patch16")
    p.add_argument("--size", type=int, default=224)
    p.add_argument("--stats", default="imagenet",
                   choices=("imagenet", "clip"),
                   help="imagenet reproduces the reference quirk "
                        "(process_video.py:21-26)")
    p.add_argument("--video", default=None,
                   help="existing video file (else a synthetic MJPG AVI "
                        "is written)")
    p.add_argument("--tmpdir", default="/tmp")
    p.add_argument("--skip-host-path", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_clip_tpu.core.config import clip_preset
    from vlm_clip_tpu.core.dtypes import BF16
    from vlm_clip_tpu.data.video import _raw_frame_scorer, extract_frames
    from vlm_clip_tpu.models.clip import init_clip

    path = args.video
    if path is None:
        path = os.path.join(args.tmpdir, "bench_video.avi")
        t0 = time.perf_counter()
        synth_video(path, args.frames, args.width, args.height, args.fps)
        print(f"synth video: {args.frames}f {args.width}x{args.height} "
              f"MJPG -> {path} "
              f"({os.path.getsize(path) / 1e6:.0f} MB, "
              f"{time.perf_counter() - t0:.1f}s)", flush=True)

    cfg = clip_preset(args.model)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(7, cfg.projection_dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    B = args.batch

    # --- demux only --------------------------------------------------------
    t0 = time.perf_counter()
    frames = demux(path, args.frames)
    dt_demux = time.perf_counter() - t0
    T = len(frames)
    print(f"demux only: {T} frames in {dt_demux:.2f}s -> "
          f"{T / dt_demux:.0f} f/s (native {frames.shape[1]}x"
          f"{frames.shape[2]})", flush=True)
    n_chunks = T // B
    T_used = n_chunks * B

    # --- chip only (frames already demuxed) --------------------------------
    run = _raw_frame_scorer(cfg, BF16, args.stats, args.size)
    emb_j = jnp.asarray(emb)
    out = run(params, jnp.asarray(frames[:B]), emb_j)  # compile
    float(out[0, 0])
    t0 = time.perf_counter()
    for c in range(n_chunks):
        out = run(params, jnp.asarray(frames[c * B:(c + 1) * B]), emb_j)
    float(out[0, 0])  # sync (block_until_ready is a no-op via axon)
    dt_chip = time.perf_counter() - t0
    print(f"chip only:  {T_used} frames in {dt_chip:.2f}s -> "
          f"{T_used / dt_chip:.0f} f/s (uint8 upload + fused "
          f"resize/normalize/ViT-{args.model.split('-')[-1]}/softmax)",
          flush=True)

    # --- device-resident (compute only, upload amortized away) ------------
    # In this dev environment H2D rides the axon tunnel (~33 MB/s
    # measured), which saturates long before the chip does; on-host TPU
    # DMA is GB/s and never the bottleneck. This pass scores a resident
    # batch repeatedly to pin the chip's own rate.
    dev_chunk = jnp.asarray(frames[:B])
    passes = max(1, 512 // B)
    out = run(params, dev_chunk, emb_j)
    float(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(passes):
        out = run(params, dev_chunk, emb_j)
    float(out[0, 0])
    dt_res = time.perf_counter() - t0
    print(f"device-resident: {passes * B} frames in {dt_res:.2f}s -> "
          f"{passes * B / dt_res:.0f} f/s (chip compute incl. on-device "
          f"resize; upload excluded)", flush=True)

    # --- end-to-end serial -------------------------------------------------
    t0 = time.perf_counter()
    frames = demux(path, args.frames)
    for c in range(n_chunks):
        out = run(params, jnp.asarray(frames[c * B:(c + 1) * B]), emb_j)
    float(out[0, 0])
    dt_serial = time.perf_counter() - t0
    print(f"e2e serial: {T_used} frames in {dt_serial:.2f}s -> "
          f"{T_used / dt_serial:.0f} f/s", flush=True)

    # --- end-to-end overlapped (demux thread || device) --------------------
    def producer(q):
        import cv2

        cap = cv2.VideoCapture(path)
        buf = []
        try:
            while True:
                ok, f = cap.read()
                if not ok:
                    break
                buf.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
                if len(buf) == B:
                    q.put(np.stack(buf))
                    buf = []
        finally:
            cap.release()
            q.put(None)

    t0 = time.perf_counter()
    q: "queue.Queue" = queue.Queue(maxsize=4)
    threading.Thread(target=producer, args=(q,), daemon=True).start()
    got = 0
    while True:
        chunk = q.get()
        if chunk is None:
            break
        out = run(params, jnp.asarray(chunk), emb_j)
        got += len(chunk)
    float(out[0, 0])
    dt_olap = time.perf_counter() - t0
    print(f"e2e overlapped: {got} frames in {dt_olap:.2f}s -> "
          f"{got / dt_olap:.0f} f/s  <- headline (demux || chip)",
          flush=True)

    if args.skip_host_path:
        return

    # --- reference-pattern baseline on the same chip -----------------------
    # host cv2 resize to 224 + host normalize (process_video.py:21-26),
    # fp32 [B,3,224,224] upload, tower-only jit.
    from vlm_clip_tpu.core.config import (CLIP_IMAGE_MEAN, CLIP_IMAGE_STD,
                                          IMAGENET_MEAN, IMAGENET_STD)
    from vlm_clip_tpu.models import clip as C
    from vlm_clip_tpu.models import layers as L

    mean, std = ((IMAGENET_MEAN, IMAGENET_STD)
                 if args.stats == "imagenet"
                 else (CLIP_IMAGE_MEAN, CLIP_IMAGE_STD))

    @jax.jit
    def score_px(params, px, emb):
        feats = C.get_image_features(params, px, cfg, BF16)
        feats = L.l2_normalize(feats).astype(jnp.float32)
        sims = 100.0 * jnp.dot(feats, emb.T,
                               preferred_element_type=jnp.float32)
        return jax.nn.softmax(sims, axis=-1)

    f224 = extract_frames(path, B, args.size)  # warmup shapes
    x = ((f224.astype(np.float32) / 255.0 - mean) / std).transpose(
        0, 3, 1, 2)
    out = score_px(params, jnp.asarray(x), emb_j)
    float(out[0, 0])
    t0 = time.perf_counter()
    f224 = extract_frames(path, args.frames, args.size)  # host resize
    for c in range(n_chunks):
        chunk = f224[c * B:(c + 1) * B]
        x = ((chunk.astype(np.float32) / 255.0 - mean) / std).transpose(
            0, 3, 1, 2)
        out = score_px(params, jnp.asarray(x), emb_j)
    float(out[0, 0])
    dt_host = time.perf_counter() - t0
    print(f"reference-pattern (host resize+normalize, fp32 upload): "
          f"{T_used} frames in {dt_host:.2f}s -> {T_used / dt_host:.0f} "
          f"f/s ({dt_host / dt_olap:.2f}x slower than overlapped)",
          flush=True)

    # sanity: both paths produce normalized finite probability rows.
    # (Geometry intentionally differs: the reference squashes to 224x224
    # — extract_frames/process_video.py:21 — while the TPU path does
    # shortest-edge + center crop; resize numerics themselves are
    # parity-tested hermetically in tests/test_pixel_cache.py.)
    a = np.asarray(run(params, jnp.asarray(frames[:B]), emb_j))
    assert np.isfinite(a).all() and np.allclose(a.sum(-1), 1.0, atol=1e-3)
    print("sanity: TPU-path probability rows finite and normalized",
          flush=True)


if __name__ == "__main__":
    main()
