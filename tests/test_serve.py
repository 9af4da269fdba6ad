"""Serving endpoint: micro-batching worker + HTTP handlers (hermetic)."""

import http.client
import io
import json
import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax

from vlm_clip_tpu.cli.serve import BatchingClassifier, make_handler
from vlm_clip_tpu.core.dtypes import FP32
from vlm_clip_tpu.data.tokenizer import HashTokenizer
from vlm_clip_tpu.models.clip import init_clip
from vlm_clip_tpu.models.model_t import ZeroShotEmotionRecognition

from helpers import tiny_clip_config


@pytest.fixture(scope="module")
def server():
    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    model = ZeroShotEmotionRecognition(params, cfg, tok, policy=FP32)
    classifier = BatchingClassifier(model, cfg.vision.image_size,
                                    max_batch=4, window_ms=5.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(classifier, cfg.name))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, classifier
    srv.shutdown()


def _jpeg_bytes(seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
                    ).save(buf, format="JPEG")
    return buf.getvalue()


def _request(port, method, path, body=None, timeout=120):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request(method, path, body=body)
    resp = conn.getresponse()
    out = (resp.status, json.loads(resp.read().decode()))
    conn.close()
    return out


def test_healthz_and_classify(server):
    srv, _ = server
    port = srv.server_address[1]
    status, health = _request(port, "GET", "/healthz")
    assert status == 200 and health["status"] == "ok"

    status, result = _request(port, "POST", "/classify", _jpeg_bytes())
    assert status == 200
    assert set(result) == {"probs", "label", "confidence"}
    assert len(result["probs"]) == 7
    np.testing.assert_allclose(sum(result["probs"].values()), 1.0,
                               atol=1e-3)


def test_concurrent_requests_micro_batch(server):
    srv, classifier = server
    port = srv.server_address[1]
    before = classifier.total_batches
    results = [None] * 6

    def go(i):
        results[i] = _request(port, "POST", "/classify", _jpeg_bytes(i))

    threads = [threading.Thread(target=go, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(r[0] == 200 for r in results)
    # 6 requests coalesced into fewer than 6 device batches
    assert classifier.total_batches - before <= 5


def test_error_paths(server):
    srv, _ = server
    port = srv.server_address[1]
    status, err = _request(port, "POST", "/classify", b"notanimage")
    assert status == 400 and "bad image" in err["error"]
    status, err = _request(port, "POST", "/classify", b"")
    assert status == 400
    status, err = _request(port, "GET", "/nope")
    assert status == 404
