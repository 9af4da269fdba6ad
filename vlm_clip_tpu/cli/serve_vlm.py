"""VLM generation endpoint with continuous batching (production serving).

Front-end: ThreadingHTTPServer. Back-end: ONE worker thread owning a
ContinuousBatchingEngine (vlm/engine.py) — requests stream into the
engine's slot pool as they arrive and finished generations stream back
per request, so a slow (long) generation never blocks a fast one — the
serving-side fix for the reference's fixed-batch ``generate()`` pattern
(model_v.py:108-118) where the whole batch waits for its last row.

Endpoints:
- ``POST /generate``  raw image bytes -> JSON {tokens, text, ms}.
  Query params: ``max_new`` (default from --max-new), ``prompt``
  (default: the reference's VLM context prompt, extractor.VLM_PROMPT),
  ``stream=1`` -> Server-Sent Events: one ``data: {"tokens": [...]}``
  event per harvested decode chunk (tokens are append-only and final
  once harvested — engine.partial_tokens), then a terminal
  ``data: {"done": true, tokens, text, ms}``. The reference cannot
  stream at all (its ``generate()`` returns only at completion,
  model_v.py:108-118). A client that disconnects mid-stream has its
  request CANCELLED (engine slot freed for the next refill) — detected
  by write failure or a FIN on the read side.
- ``GET  /healthz``   {status, slots, queued, mode, totals incl.
  cancelled}

Weights: ``--weights DIR`` (safetensors + tokenizer.json, the
QwenVLContextExtractor contract). Without weights the server REFUSES to
start unless ``--allow-synth-weights`` is given (hermetic drives get 3B
random weights and token-id-only responses) — same refuse-to-degrade
contract as cli/serve.py.

Drive (hermetic):
    python -m vlm_clip_tpu.cli.serve_vlm --port 8898 --allow-synth-weights &
    curl -s --data-binary @face.jpg 'localhost:8898/generate?max_new=32'
"""

from __future__ import annotations

import argparse
import io
import json
import os
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/vlm_clip_tpu_jaxcache")


class _Job:
    __slots__ = ("ids", "vision", "max_new", "event", "tokens", "error",
                 "t_submit", "stream_q", "sent")

    def __init__(self, ids, vision, max_new, stream: bool = False):
        self.ids = ids
        self.vision = vision
        self.max_new = max_new
        self.event = threading.Event()
        self.tokens = None
        self.error: Optional[str] = None
        self.t_submit = time.perf_counter()
        # streaming (SSE): the worker pushes token-delta lists here as
        # decode chunks harvest, then a None sentinel at completion
        self.stream_q: "Optional[queue.Queue]" = \
            queue.Queue() if stream else None
        self.sent = 0  # tokens already pushed to stream_q


class EngineWorker:
    """Single thread owning the engine; HTTP threads submit _Jobs.

    The engine is not thread-safe (device state + host shadows), so all
    submit/poll calls happen on this thread. Scheduling cost is one
    queue drain per poll round; the device does sync_steps of decode per
    round, so the worker loop runs at a few Hz — nowhere near a Python
    bottleneck.
    """

    def __init__(self, engine):
        self.engine = engine
        self.q: "queue.Queue[_Job]" = queue.Queue()
        self.cancel_q: "queue.Queue[_Job]" = queue.Queue()
        self._by_rid = {}
        self.total_requests = 0
        self.total_tokens = 0
        self.total_cancelled = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def cancel(self, job: _Job) -> None:
        """Thread-safe cancellation request (client disconnected): the
        engine thread performs the actual engine.cancel at its next
        round (the engine is single-threaded by contract)."""
        self.cancel_q.put(job)

    def _drain_cancels(self):
        while True:
            try:
                job = self.cancel_q.get_nowait()
            except queue.Empty:
                return
            for rid, j in list(self._by_rid.items()):
                if j is job:
                    if self.engine.cancel(rid):
                        self._by_rid.pop(rid, None)
                        self.total_cancelled += 1
                    break

    def submit(self, job: _Job, timeout: float = 300.0):
        self.q.put(job)
        if not job.event.wait(timeout):
            raise TimeoutError("generation timed out")
        if job.error:
            raise ValueError(job.error)
        return job.tokens

    def _drain_queue(self):
        while True:
            try:
                job = self.q.get_nowait()
            except queue.Empty:
                return
            try:
                rid = self.engine.submit(
                    job.ids, job.vision, max_new_tokens=job.max_new,
                    stream=job.stream_q is not None)
            except Exception as e:  # noqa: BLE001 — surface to client
                job.error = str(e)
                if job.stream_q is not None:
                    job.stream_q.put(None)
                job.event.set()
                continue
            self._by_rid[rid] = job
            self.total_requests += 1

    def _loop(self):
        while True:
            self._drain_queue()
            self._drain_cancels()
            if not self.engine.pending:
                try:
                    job = self.q.get(timeout=0.05)
                except queue.Empty:
                    continue
                self.q.put(job)
                continue
            fin = self.engine.poll()
            # stream deltas for still-live streaming jobs: harvested
            # tokens are append-only and final (engine.partial_tokens)
            for rid, job in self._by_rid.items():
                if job.stream_q is None or rid in fin:
                    continue
                toks = self.engine.partial_tokens(rid)
                if toks is not None and len(toks) > job.sent:
                    job.stream_q.put(toks[job.sent:])
                    job.sent = len(toks)
            for rid, toks in fin.items():
                job = self._by_rid.pop(rid, None)
                if job is None:
                    continue
                job.tokens = toks
                self.total_tokens += len(toks)
                if job.stream_q is not None:
                    if len(toks) > job.sent:
                        job.stream_q.put(toks[job.sent:])
                        job.sent = len(toks)
                    job.stream_q.put(None)
                job.event.set()


def make_vlm_handler(worker: EngineWorker, prep_fn, tokenizer,
                     default_max_new: int, mode: str):
    """``prep_fn(pil_image, prompt_text) -> (ids, vision)``."""

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
            if urlparse(self.path).path != "/healthz":
                return self._json(404, {"error": "not found"})
            eng = worker.engine
            return self._json(200, {
                "status": "ok", "mode": mode,
                "slots": eng.n_slots, "pending": eng.pending,
                "total_requests": worker.total_requests,
                "total_tokens": worker.total_tokens,
                "total_cancelled": worker.total_cancelled})

        def do_POST(self):
            from PIL import Image

            u = urlparse(self.path)
            if u.path != "/generate":
                return self._json(404, {"error": "not found"})
            qs = parse_qs(u.query)
            try:
                n = int(self.headers.get("Content-Length", 0))
                img = Image.open(io.BytesIO(self.rfile.read(n)))
                img.load()
            except Exception as e:  # noqa: BLE001
                return self._json(400, {"error": f"bad image: {e}"})
            max_new = int(qs.get("max_new", [default_max_new])[0])
            prompt = qs.get("prompt", [None])[0]
            stream = qs.get("stream", ["0"])[0] not in ("0", "", "false")
            t0 = time.perf_counter()
            try:
                ids, vision = prep_fn(img, prompt)
            except Exception as e:  # noqa: BLE001
                return self._json(500, {"error": str(e)})
            if stream:
                return self._stream(ids, vision, max_new, t0)
            try:
                toks = worker.submit(_Job(ids, vision, max_new))
            except Exception as e:  # noqa: BLE001
                return self._json(500, {"error": str(e)})
            text = (tokenizer.decode(toks).strip()
                    if tokenizer is not None else None)
            return self._json(200, {
                "tokens": toks, "text": text,
                "ms": round((time.perf_counter() - t0) * 1e3, 1)})

        def _stream(self, ids, vision, max_new, t0) -> None:
            """SSE: token deltas per harvested chunk, then a terminal
            done event. ``Connection: close`` framing (client reads to
            EOF) — no chunked encoding needed."""
            job = _Job(ids, vision, max_new, stream=True)
            worker.q.put(job)
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()

            def emit(payload: dict) -> None:
                self.wfile.write(
                    b"data: " + json.dumps(payload).encode() + b"\n\n")
                self.wfile.flush()

            def client_gone() -> bool:
                """A closed client sends FIN; writes into a half-closed
                socket succeed silently (kernel-buffered), so poll the
                read side: readable + empty peek == disconnect. The
                request body is already fully read, so any readability
                here is EOF/RST."""
                import select
                import socket as _s

                try:
                    r_, _, _ = select.select([self.connection], [], [], 0)
                    if r_:
                        return self.connection.recv(
                            1, _s.MSG_PEEK) == b""
                except OSError:
                    return True
                return False

            try:
                while True:
                    try:
                        delta = job.stream_q.get(timeout=300)
                    except queue.Empty:
                        emit({"done": True,
                              "error": "generation timed out"})
                        return
                    if delta is None:
                        break
                    if client_gone():
                        worker.cancel(job)
                        return
                    emit({"tokens": delta})
                if job.error:
                    emit({"done": True, "error": job.error})
                    return
                text = (tokenizer.decode(job.tokens).strip()
                        if tokenizer is not None else None)
                emit({"done": True, "tokens": job.tokens, "text": text,
                      "ms": round((time.perf_counter() - t0) * 1e3, 1)})
            except (BrokenPipeError, ConnectionResetError):
                # client went away mid-stream: free the slot instead of
                # decoding tokens nobody will read
                worker.cancel(job)

    return Handler


def build_engine(weights: Optional[str], allow_synth: bool,
                 quant_bits="8h4", kv_bits: int = 16, max_len: int = 768,
                 slots: int = 32, sync_steps: int = 16,
                 resolution: int = 448, sampling=None,
                 refill_chunks=(8, 1), spec_k: int = 0, tp: int = 1,
                 dp: int = 1):
    """Returns (engine, prep_fn, tokenizer, mode).

    Real weights: the QwenVLContextExtractor loading contract
    (safetensors dir + tokenizer.json + generation_config.json
    sampling defaults). Synth: 3B-shape random weights, a fixed
    pseudo-prompt (no tokenizer), greedy.
    """
    import numpy as np

    from vlm_clip_tpu.vlm.engine import ContinuousBatchingEngine
    from vlm_clip_tpu.vlm.extractor import VLM_PROMPT
    from vlm_clip_tpu.vlm.qwen import QwenVLGenerator
    from vlm_clip_tpu.vlm.qwen_process import (build_prompt_ids,
                                               prepare_vision_inputs)

    if weights:
        from vlm_clip_tpu.vlm.qwen import QwenBPETokenizer, \
            load_safetensors_dir
        from vlm_clip_tpu.vlm.qwen_convert import (
            MIXED_DECODE_BITS, convert_qwen_vl,
            fold_qwen_patch_normalization, quantize_qwen_params)
        from vlm_clip_tpu.vlm.qwen_model import qwen25vl_3b
        from vlm_clip_tpu.vlm.sampling import load_generation_config
        import dataclasses as _dc

        cfg = qwen25vl_3b()
        params = convert_qwen_vl(load_safetensors_dir(weights), cfg)
        params["vision"] = fold_qwen_patch_normalization(
            params["vision"], cfg.vision)
        layer_bits = MIXED_DECODE_BITS if quant_bits == "mixed" else \
            (8 if quant_bits == "8h4" else quant_bits)
        if quant_bits in ("mixed", "8h4"):
            params = quantize_qwen_params(params, layer_bits, head_bits=4,
                                          fuse_decode=True)
            cfg = _dc.replace(cfg, text=_dc.replace(
                cfg.text, tie_word_embeddings=False))
        elif quant_bits:
            params = quantize_qwen_params(params, layer_bits,
                                          fuse_decode=True)
        tokenizer = QwenBPETokenizer(
            os.path.join(weights, "tokenizer.json"))
        if sampling is None:
            sampling = load_generation_config(weights, cfg.eos_token_id)
        mode = f"qwen2.5-vl ({quant_bits})"
    elif allow_synth:
        import dataclasses as _dc

        from vlm_clip_tpu.cli.bench_decode import \
            synth_quantized_text_params
        from vlm_clip_tpu.cli.bench_vision import synth_vision_params
        from vlm_clip_tpu.vlm.qwen_convert import (
            fold_qwen_patch_normalization, quantize_qwen_params)
        from vlm_clip_tpu.vlm.qwen_model import qwen25vl_3b

        cfg = qwen25vl_3b()
        cfg = _dc.replace(cfg, text=_dc.replace(
            cfg.text, tie_word_embeddings=False))
        params = {"text": synth_quantized_text_params(cfg.text, 8, 4,
                                                      fused=True),
                  "vision": quantize_qwen_params(
                      {"vision": fold_qwen_patch_normalization(
                          synth_vision_params(cfg.vision), cfg.vision)},
                      8)["vision"]}
        tokenizer = None
        mode = "SYNTH-WEIGHTS (hermetic drive)"
    else:
        raise SystemExit(
            "refusing to serve without weights: pass --weights DIR "
            "(safetensors + tokenizer.json) or --allow-synth-weights "
            "for a hermetic drive")

    gen = QwenVLGenerator(params, cfg, max_len=max_len, kv_bits=kv_bits)
    gen.u8_patches = True
    mesh = None
    if tp > 1 or dp > 1:
        import jax

        from vlm_clip_tpu.parallel.mesh import MeshConfig, create_mesh
        devs = jax.devices()
        need = tp * dp
        if len(devs) < need:
            raise SystemExit(
                f"--tp {tp} --dp {dp} needs {need} devices, found "
                f"{len(devs)} ({devs}); for a virtual mesh set XLA_FLAGS="
                f"--xla_force_host_platform_device_count={need}")
        mesh = create_mesh(MeshConfig(data=dp, model=tp), devs[:need])
        if dp > 1 and slots % dp:
            raise SystemExit(
                f"--slots {slots} is not divisible by --dp {dp}; each "
                f"data replica owns an equal slot shard — adjust --slots "
                f"(e.g. {slots - slots % dp or dp}) or --dp")
    engine = ContinuousBatchingEngine(gen, n_slots=slots,
                                      sync_steps=sync_steps,
                                      sampling=sampling,
                                      refill_chunks=refill_chunks,
                                      spec_k=spec_k, mesh=mesh)

    rng = np.random.default_rng(0)
    synth_tail = rng.integers(1, 10000, 24).tolist()

    def prep_fn(img, prompt_text):
        vin = prepare_vision_inputs(np.asarray(img.convert("RGB")),
                                    cfg.vision,
                                    fixed_resolution=resolution,
                                    raw_uint8=True)
        if tokenizer is not None:
            ids = build_prompt_ids(tokenizer, prompt_text or VLM_PROMPT,
                                   vin.num_vision_tokens, cfg)
        else:  # synth mode: fixed pseudo-prompt (deterministic layout)
            ids = np.asarray(
                [11, 22, cfg.vision_start_token_id]
                + [cfg.image_token_id] * vin.num_vision_tokens
                + synth_tail, np.int64)
        return ids, vin

    return engine, prep_fn, tokenizer, mode


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=8898)
    p.add_argument("--weights", default=None,
                   help="Qwen2.5-VL dir (safetensors + tokenizer.json)")
    p.add_argument("--allow-synth-weights", action="store_true",
                   help="hermetic drive: 3B random weights, token-id "
                        "responses (the server refuses otherwise)")
    p.add_argument("--slots", type=int, default=32)
    p.add_argument("--sync-steps", type=int, default=16)
    p.add_argument("--max-len", type=int, default=768)
    p.add_argument("--max-new", type=int, default=200)
    p.add_argument("--kv-bits", type=int, default=16, choices=(8, 16))
    p.add_argument("--bits", default="8h4",
                   choices=("4", "8", "8h4", "mixed"))
    p.add_argument("--size", type=int, default=448)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree: shard the VLM weights "
                        "over a ('model',) mesh of this many devices "
                        "(Megatron-style rules, XLA collectives; the "
                        "rebuild of the reference's device_map='auto' "
                        "multi-GPU placement)")
    p.add_argument("--dp", type=int, default=1,
                   help="slot-shard degree: shard the engine's slot "
                        "state and KV cache over a 'data' mesh axis "
                        "(per-chip KV = slots/dp — the scaling lever "
                        "for 72B-class serving where replicated KV "
                        "outgrows one chip's HBM); composes with --tp "
                        "on a (data, model) mesh")
    p.add_argument("--spec-k", type=int, default=0,
                   help="n-gram speculative decoding over the prompt+"
                        "history window (lossless: token-identical "
                        "under greedy, distribution-identical under "
                        "sampled configs incl. the checkpoint "
                        "default). Turn ON for re-description/"
                        "refinement loads — 3.35 accepted/round "
                        "measured, 2-4x decode tok/s (BENCH.md r5); "
                        "leave off for instruction-only loads")
    args = p.parse_args(argv)

    bits = args.bits if args.bits in ("mixed", "8h4") else int(args.bits)
    engine, prep_fn, tokenizer, mode = build_engine(
        args.weights, args.allow_synth_weights, quant_bits=bits,
        kv_bits=args.kv_bits, max_len=args.max_len, slots=args.slots,
        sync_steps=args.sync_steps, resolution=args.size,
        spec_k=args.spec_k, tp=args.tp, dp=args.dp)
    worker = EngineWorker(engine)
    srv = ThreadingHTTPServer(("0.0.0.0", args.port),
                              make_vlm_handler(worker, prep_fn, tokenizer,
                                               args.max_new, mode))
    print(f"serving VLM generation on :{args.port} — mode: {mode}, "
          f"{args.slots} slots, kv{args.kv_bits}"
          + (f", tp={args.tp}" if args.tp > 1 else "")
          + (f", dp={args.dp}" if args.dp > 1 else "")
          + (f", spec_k={args.spec_k}" if args.spec_k else ""),
          flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
