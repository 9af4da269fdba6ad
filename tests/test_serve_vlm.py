"""Engine-backed VLM serving endpoint (hermetic, tiny model)."""

import http.client
import io
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_clip_tpu.cli.serve_vlm import (EngineWorker, build_engine,
                                        make_vlm_handler)
from vlm_clip_tpu.vlm import qwen_model as QM
from vlm_clip_tpu.vlm import qwen_process as QP
from vlm_clip_tpu.vlm.engine import ContinuousBatchingEngine
from vlm_clip_tpu.vlm.qwen import QwenVLGenerator

VOCAB = 256
IMG_TOK = 250
VIS_START = 249
EOS = 251


def tiny_cfgs():
    text = QM.QwenTextConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, vocab_size=VOCAB,
        mrope_section=(2, 3, 3), tie_word_embeddings=True)
    vision = QM.QwenVisionConfig(
        hidden_size=32, intermediate_size=64, out_hidden_size=64, depth=3,
        num_heads=4, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=16, fullatt_block_indexes=(1,))
    return QM.QwenVLConfig(text=text, vision=vision,
                           image_token_id=IMG_TOK,
                           vision_start_token_id=VIS_START,
                           eos_token_id=EOS)


@pytest.fixture(scope="module")
def server():
    cfg = tiny_cfgs()
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {"text": QM.init_text(k1, cfg.text),
              "vision": QM.init_vision(k2, cfg.vision)}
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    engine = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=3,
                                      refill_chunks=(2, 1))

    def prep_fn(img, prompt_text):
        vin = QP.prepare_vision_inputs(np.asarray(img.convert("RGB")),
                                       cfg.vision, fixed_resolution=32)
        ids = np.asarray([1, 2, VIS_START]
                         + [IMG_TOK] * vin.num_vision_tokens + [3, 4, 5],
                         np.int64)
        return ids, vin

    worker = EngineWorker(engine)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_vlm_handler(worker, prep_fn, None, 5, "tiny-synth"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, gen, prep_fn
    srv.shutdown()


def _jpeg(seed):
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (32, 32, 3), np.uint8)
                    ).save(buf, format="PNG")
    return buf.getvalue()


def _post(srv, path, body):
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_port,
                                      timeout=300)
    conn.request("POST", path, body=body)
    r = conn.getresponse()
    out = json.loads(r.read())
    conn.close()
    return r.status, out


def test_healthz(server):
    srv, _, _ = server
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_port,
                                      timeout=30)
    conn.request("GET", "/healthz")
    r = conn.getresponse()
    out = json.loads(r.read())
    assert r.status == 200 and out["status"] == "ok"
    assert out["slots"] == 2


def test_generate_matches_oneshot(server):
    """Server response tokens == the one-shot generate for that image."""
    from PIL import Image

    srv, gen, prep_fn = server
    body = _jpeg(0)
    status, out = _post(srv, "/generate?max_new=5", body)
    assert status == 200, out
    ids, vin = prep_fn(Image.open(io.BytesIO(body)), None)
    want = gen.generate_from_ids(ids, vin, max_new_tokens=5)
    assert out["tokens"] == want
    assert out["text"] is None  # no tokenizer in synth mode


def test_concurrent_generate(server):
    """8 concurrent clients over 2 slots: all served, each matching its
    own one-shot output (continuous batching keeps them isolated)."""
    from PIL import Image

    srv, gen, prep_fn = server
    bodies = [_jpeg(s) for s in range(8)]
    results = [None] * 8

    def hit(i):
        results[i] = _post(srv, "/generate?max_new=4", bodies[i])

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, (status, out) in enumerate(results):
        assert status == 200, out
        ids, vin = prep_fn(Image.open(io.BytesIO(bodies[i])), None)
        want = gen.generate_from_ids(ids, vin, max_new_tokens=4)
        assert out["tokens"] == want, (i, out["tokens"], want)


def test_bad_image_400(server):
    srv, _, _ = server
    status, out = _post(srv, "/generate", b"not an image")
    assert status == 400 and "bad image" in out["error"]


def test_build_engine_refuses_without_weights():
    with pytest.raises(SystemExit, match="refusing"):
        build_engine(None, allow_synth=False)


def test_streaming_generate(server):
    """``stream=1`` SSE: token-delta events per harvested decode chunk,
    then a terminal done event; concatenated deltas == the done event's
    tokens == the one-shot generate (streaming changes framing, never
    content). The sync_steps=3 engine must emit the 7-token budget in
    >= 2 delta events (mid-flight visibility, not one blob at the end)."""
    from PIL import Image

    srv, gen, prep_fn = server
    body = _jpeg(3)
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_port,
                                      timeout=300)
    conn.request("POST", "/generate?max_new=7&stream=1", body=body)
    r = conn.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "text/event-stream"
    raw = r.read().decode()  # Connection: close framing -> read to EOF
    conn.close()
    events = [json.loads(line[len("data: "):])
              for line in raw.splitlines() if line.startswith("data: ")]
    assert events and events[-1].get("done") is True
    deltas = [e["tokens"] for e in events[:-1]]
    assert len(deltas) >= 2, deltas
    got = [t for d in deltas for t in d]
    assert got == events[-1]["tokens"]
    ids, vin = prep_fn(Image.open(io.BytesIO(body)), None)
    want = gen.generate_from_ids(ids, vin, max_new_tokens=7)
    assert got == want


def test_stream_client_disconnect_cancels(server):
    """A streaming client that drops mid-generation frees its slot:
    the worker cancels the engine request (healthz total_cancelled
    increments) and a subsequent request is served with exact parity."""
    import time

    from PIL import Image

    srv, gen, prep_fn = server
    body = _jpeg(9)
    conn = http.client.HTTPConnection("127.0.0.1", srv.server_port,
                                      timeout=300)
    # long budget so the generation is mid-flight when we vanish
    conn.request("POST", "/generate?max_new=60&stream=1", body=body)
    r = conn.getresponse()
    assert r.status == 200
    r.read(16)     # receive a little, then drop the connection
    # r.close() is what actually closes the socket: HTTPConnection.close
    # alone leaves the response's buffered fp (and thus the fd) open, so
    # the server would never see the FIN
    r.close()
    conn.close()

    deadline = time.time() + 120
    cancelled = 0
    while time.time() < deadline:
        c = http.client.HTTPConnection("127.0.0.1", srv.server_port,
                                       timeout=30)
        c.request("GET", "/healthz")
        out = json.loads(c.getresponse().read())
        c.close()
        cancelled = out["total_cancelled"]
        if cancelled:
            break
        time.sleep(0.5)
    assert cancelled >= 1

    # the engine still serves exactly after the cancel
    body2 = _jpeg(10)
    status, out = _post(srv, "/generate?max_new=4", body2)
    assert status == 200, out
    ids, vin = prep_fn(Image.open(io.BytesIO(body2)), None)
    assert out["tokens"] == gen.generate_from_ids(ids, vin,
                                                  max_new_tokens=4)
