"""Minimal production serving endpoint: HTTP image -> emotion probs.

A ThreadingHTTPServer front-end feeding a micro-batching worker —
requests are coalesced for up to ``--batch-window-ms`` into one
fixed-size padded device batch (single compiled shape, pad+mask like
everywhere else), scored with the jitted predict path, and fanned back
out. Three model modes (``healthz`` reports which is live):

- zero-shot (default): ``ZeroShotEmotionRecognition``;
- T adapters: ``--adapter-ckpt`` (strict load, see
  train/checkpoint.py:load_t_adapters);
- V context: ``--v-adapter-ckpt`` + optional ``--context-cache DIR``
  — per-request VLM context features come from the cache (keyed by
  decoded-image content hash); unseen images fall back to the
  zero-context path, the reference's own fallback contract
  (enhance.py:73-78).

Endpoints:
- ``POST /classify``  raw image bytes (jpeg/png) -> JSON {probs, label}
- ``POST /embed``     (with ``--embed``) image bytes -> unit-norm
  projected CLIP features; ``--m-adapter-ckpt`` applies the pipeline-M
  adapters (reference retrieval demo, example.py:80-109)
- ``POST /embed_text`` text (raw utf-8 or {"text": ...}) -> features
- ``GET  /healthz``   liveness + model info

Drive: ``python -m vlm_clip_tpu.cli.serve --port 8899 &`` then
``curl -s --data-binary @face.jpg localhost:8899/classify``.
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional


class _Pending:
    __slots__ = ("image", "event", "result", "error")

    def __init__(self, image):
        self.image = image
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None


class BatchingClassifier:
    """Micro-batching inference worker over a jitted predict path.

    ``predict_fn(images_u8 [max_batch, S, S, 3]) -> probs [max_batch, 7]``
    owns normalization/context lookup, so one worker serves every model
    mode.
    """

    def __init__(self, predict_fn, image_size: int, max_batch: int = 8,
                 window_ms: float = 10.0):
        self.predict_fn = predict_fn
        self.image_size = image_size
        self.max_batch = max_batch
        self.window_s = window_ms / 1000.0
        self.q: "queue.Queue[_Pending]" = queue.Queue()
        self.total_requests = 0
        self.total_batches = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, image_bytes: bytes, timeout: float = 30.0):
        p = _Pending(image_bytes)
        self.q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("inference timed out")
        if p.error:
            raise ValueError(p.error)
        return p.result

    def _loop(self) -> None:
        import numpy as np

        from PIL import Image

        from vlm_clip_tpu.core.config import EMOTIONS
        from vlm_clip_tpu.data.preprocess import load_and_resize

        while True:
            first = self.q.get()
            batch: List[_Pending] = [first]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    batch.append(self.q.get(timeout=remaining))
                except queue.Empty:
                    break

            images = np.zeros((self.max_batch, self.image_size,
                               self.image_size, 3), np.uint8)
            ok = []
            for i, p in enumerate(batch):
                try:
                    img = Image.open(io.BytesIO(p.image))
                    images[i] = load_and_resize(img, self.image_size)
                    ok.append(True)
                except Exception as e:
                    p.error = f"bad image: {e}"
                    ok.append(False)
            try:
                probs = np.asarray(self.predict_fn(images))
            except Exception as e:
                for p in batch:
                    p.error = p.error or f"inference failed: {e}"
                    p.event.set()
                continue
            self.total_requests += len(batch)
            self.total_batches += 1
            for i, p in enumerate(batch):
                if ok[i]:
                    row = probs[i]
                    p.result = {
                        "probs": {e: float(row[j])
                                  for j, e in enumerate(EMOTIONS)},
                        "label": EMOTIONS[int(row.argmax())],
                        "confidence": float(row.max()),
                    }
                p.event.set()


class Embedder:
    """Pipeline-M serving surface: projected, L2-normalized CLIP
    features for an image or a text string, with the M sequence/
    cross-modal adapters applied when ``--m-adapter-ckpt`` is given.

    Behavior contract: the reference's retrieval demo
    (example.py:80-109, encode_text/encode_image → cosine similarity) —
    features from both endpoints are unit-norm so a dot product IS the
    retrieval score.
    """

    def __init__(self, clip_params, cfg, tokenizer, m_adapter_ckpt=None,
                 policy=None):
        import threading as _t

        import numpy as np

        import jax.numpy as jnp

        from vlm_clip_tpu.models import clip as C
        from vlm_clip_tpu.models.layers import l2_normalize

        self.cfg = cfg
        self.tokenizer = tokenizer
        self._lock = _t.Lock()  # one compiled shape, serialized compute
        kw = {} if policy is None else {"policy": policy}
        if m_adapter_ckpt:
            from vlm_clip_tpu.models.model_m import CLIPWithAdapters

            model = CLIPWithAdapters(clip_params, cfg, **kw)
            model.load_adapter_weights(m_adapter_ckpt)
            self._image = model.get_image_features
            self._text = model.get_text_features
            self.mode = "m-adapter"
        else:
            from vlm_clip_tpu.core.dtypes import BF16

            pol = policy or BF16
            img_fn = C.jitted_image_features(cfg, pol)
            txt_fn = C.jitted_text_features(cfg, pol)
            self._image = lambda px: img_fn(clip_params, px)
            self._text = lambda ids, mask: txt_fn(clip_params, ids, mask)
            self.mode = "clip"
        self._norm = lambda x: np.asarray(
            l2_normalize(x).astype(jnp.float32))
        # warm up both compiled shapes before taking traffic
        self.embed_image_bytes(_png_1x1())
        self.embed_text("warmup")

    def embed_image_bytes(self, data: bytes):
        import io as _io

        from PIL import Image

        import jax.numpy as jnp

        from vlm_clip_tpu.data.preprocess import (load_and_resize,
                                                  normalize_batch_tpu)

        img = load_and_resize(Image.open(_io.BytesIO(data)),
                              self.cfg.vision.image_size)
        px = normalize_batch_tpu(jnp.asarray(img[None]))
        with self._lock:
            feats = self._image(px)
        return self._norm(feats)[0]

    def embed_text(self, text: str):
        import jax.numpy as jnp

        ids, mask = self.tokenizer([text])
        with self._lock:
            feats = self._text(jnp.asarray(ids), jnp.asarray(mask))
        return self._norm(feats)[0]


def _png_1x1() -> bytes:
    """Tiny in-memory PNG for the Embedder warmup compile."""
    import io as _io

    import numpy as np
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(buf, "PNG")
    return buf.getvalue()


def make_handler(classifier: BatchingClassifier, model_name: str,
                 embedder: Optional[Embedder] = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet
            pass

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "status": "ok", "model": model_name,
                    "requests": classifier.total_requests,
                    "batches": classifier.total_batches,
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            known = ("/classify", "/embed", "/embed_text")
            if self.path not in known:
                self._json(404, {"error": "unknown path"})
                return
            if self.path in ("/embed", "/embed_text") and embedder is None:
                self._json(404, {"error": "embedding endpoints disabled "
                                          "(serve --embed to enable)"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0 or length > 32 << 20:
                self._json(400, {"error": "missing or oversized body"})
                return
            data = self.rfile.read(length)
            try:
                if self.path == "/classify":
                    self._json(200, classifier.submit(data))
                elif self.path == "/embed":
                    vec = embedder.embed_image_bytes(data)
                    self._json(200, {"features": vec.tolist(),
                                     "dim": len(vec),
                                     "model": embedder.mode})
                else:  # /embed_text: raw utf-8 or {"text": ...}
                    text = data.decode("utf-8", errors="replace")
                    try:
                        obj = json.loads(text)
                        if isinstance(obj, dict) and "text" in obj:
                            text = str(obj["text"])
                    except json.JSONDecodeError:
                        pass
                    vec = embedder.embed_text(text)
                    self._json(200, {"features": vec.tolist(),
                                     "dim": len(vec),
                                     "model": embedder.mode})
            except ValueError as e:
                self._json(400, {"error": str(e)})
            except TimeoutError as e:
                self._json(503, {"error": str(e)})
            except Exception as e:  # bad image bytes etc.
                self._json(400, {"error": f"bad request: {e}"})

    return Handler


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Emotion classification "
                                            "serving endpoint")
    p.add_argument("--port", type=int, default=8899)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--clip-model-name", default="vit-base-patch32")
    p.add_argument("--adapter-ckpt", default=None,
                   help="T-adapter checkpoint (strict load)")
    p.add_argument("--v-adapter-ckpt", default=None,
                   help="V 3-adapter checkpoint (context pipeline)")
    p.add_argument("--context-cache", default=None,
                   help="context cache dir for the V pipeline "
                        "(cli/build_context_cache.py output)")
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--batch-window-ms", type=float, default=10.0)
    p.add_argument("--embed", action="store_true",
                   help="also serve /embed (image) and /embed_text — "
                        "unit-norm projected CLIP features (pipeline-M "
                        "retrieval surface, reference example.py:80-109)")
    p.add_argument("--m-adapter-ckpt", default=None,
                   help="M adapter checkpoint for the /embed endpoints "
                        "(reference adapter format; implies --embed)")
    p.add_argument("--hf-checkpoint", default=None,
                   help="local HF CLIP checkpoint dir (weights + vocab)")
    p.add_argument("--allow-random-weights", action="store_true",
                   help="come up with random-init weights when no HF "
                        "checkpoint loads (hermetic drives only — a "
                        "long-lived endpoint must not serve garbage)")
    p.add_argument("--allow-hash-tokenizer", action="store_true",
                   help="allow the non-CLIP hash tokenizer fallback "
                        "(hermetic drives only)")
    args = p.parse_args(argv)

    from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer

    clip_params, cfg = load_backbone(
        args.clip_model_name, hf_checkpoint=args.hf_checkpoint,
        require_real=not args.allow_random_weights)
    # auto mode (None): raise exactly when REAL weights would pair with
    # the hash tokenizer; random-init drives keep the hermetic fallback
    tokenizer = make_tokenizer(
        cfg, require_real=False if args.allow_hash_tokenizer else None)
    backbone = (clip_params, cfg, tokenizer)

    predict_fn, mode, cfg = build_predict_fn(
        args.clip_model_name, adapter_ckpt=args.adapter_ckpt,
        v_adapter_ckpt=args.v_adapter_ckpt,
        context_cache=args.context_cache,
        max_batch=args.max_batch, backbone=backbone)

    embedder = None
    if args.embed or args.m_adapter_ckpt:
        embedder = Embedder(clip_params, cfg, tokenizer,
                            m_adapter_ckpt=args.m_adapter_ckpt)
        mode += f"+embed[{embedder.mode}]"

    classifier = BatchingClassifier(predict_fn, cfg.vision.image_size,
                                    args.max_batch, args.batch_window_ms)
    server = ThreadingHTTPServer(
        (args.host, args.port),
        make_handler(classifier, f"{cfg.name} [{mode}]",
                     embedder=embedder))
    print(f"serving {cfg.name} [{mode}] on "
          f"http://{args.host}:{args.port} "
          f"(max_batch={args.max_batch}, "
          f"window={args.batch_window_ms}ms)", flush=True)
    server.serve_forever()


def build_predict_fn(clip_model_name: str, adapter_ckpt=None,
                     v_adapter_ckpt=None, context_cache=None,
                     max_batch: int = 8, backbone=None, policy=None):
    """(predict_fn, mode, cfg) for the requested serving mode; compiles
    the fixed-shape predict path before returning (warmup).

    ``backbone=(clip_params, cfg, tokenizer)`` injects a preloaded
    tower (tests use tiny random ones); default loads from
    ``clip_model_name``.
    """
    import numpy as np

    import jax.numpy as jnp

    from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
    from vlm_clip_tpu.models.model_t import (CLIPAdapterT,
                                             ZeroShotEmotionRecognition)

    if adapter_ckpt and v_adapter_ckpt:
        raise ValueError("pass --adapter-ckpt OR --v-adapter-ckpt")

    if backbone is not None:
        clip_params, cfg, tokenizer = backbone
    else:
        from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer

        clip_params, cfg = load_backbone(clip_model_name)
        tokenizer = make_tokenizer(cfg)
    model_kw = {} if policy is None else {"policy": policy}

    if v_adapter_ckpt:
        from vlm_clip_tpu.models.model_v import EnhancedCLIPAdapterV
        from vlm_clip_tpu.train.checkpoint import load_v_adapters
        from vlm_clip_tpu.vlm.extractor import CachedContextExtractor

        model = EnhancedCLIPAdapterV(clip_params, cfg, tokenizer,
                                      **model_kw)
        loaded = load_v_adapters(v_adapter_ckpt)
        missing = [n for n in ("visual", "text", "context")
                   if n not in loaded]
        if missing:
            raise ValueError(f"{v_adapter_ckpt} is not a V checkpoint: "
                             f"missing {missing}")
        model.adapter_params = loaded
        model.encode_emotion_descriptions()
        cache = CachedContextExtractor(context_cache) \
            if context_cache else None
        P = cfg.projection_dim

        def predict(images_u8: np.ndarray) -> np.ndarray:
            # context features per image from the cache (content-hash
            # key); zero-vector for unseen images (enhance.py:73-78)
            ctx = np.zeros((images_u8.shape[0], P), np.float32)
            if cache is not None:
                for i in range(images_u8.shape[0]):
                    text = cache.extract_context_from_image(images_u8[i])
                    feats = cache.encode_context_descriptions(text)
                    if feats is not None:
                        ctx[i] = feats[0]
            px = normalize_batch_tpu(jnp.asarray(images_u8))
            return np.asarray(model.predict_probs(px, jnp.asarray(ctx)))

        mode = "v-context" + ("+cache" if cache else "")
    else:
        if adapter_ckpt:
            model = CLIPAdapterT(clip_params, cfg, tokenizer,
                                 **model_kw)
            model.load_adapters(adapter_ckpt)  # strict (checkpoint.py)
            mode = "t-adapter"
        else:
            model = ZeroShotEmotionRecognition(clip_params, cfg,
                                               tokenizer, **model_kw)
            mode = "zero-shot"

        def predict(images_u8: np.ndarray) -> np.ndarray:
            px = normalize_batch_tpu(jnp.asarray(images_u8))
            return np.asarray(model.predict(px))

    # warm up: compile the fixed-shape predict path before taking traffic
    t0 = time.time()
    predict(np.zeros((max_batch, cfg.vision.image_size,
                      cfg.vision.image_size, 3), np.uint8))
    print(f"warmup compile done in {time.time() - t0:.1f}s", flush=True)
    return predict, mode, cfg


if __name__ == "__main__":
    main()
