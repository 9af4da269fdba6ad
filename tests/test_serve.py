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


def _backbone():
    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    return params, cfg, tok


def _spawn(predict_fn, cfg, name="tiny"):
    classifier = BatchingClassifier(predict_fn, cfg.vision.image_size,
                                    max_batch=4, window_ms=5.0)
    srv = ThreadingHTTPServer(("127.0.0.1", 0),
                              make_handler(classifier, name))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, classifier


@pytest.fixture(scope="module")
def server():
    from vlm_clip_tpu.cli.serve import build_predict_fn

    backbone = _backbone()
    predict_fn, mode, cfg = build_predict_fn(
        "tiny", backbone=backbone, policy=FP32, max_batch=4)
    assert mode == "zero-shot"
    srv, classifier = _spawn(predict_fn, cfg)
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


def test_t_adapter_roundtrip_and_serve(tmp_path):
    """CLIPAdapterT save -> serve --adapter-ckpt load: predictions from
    the served model equal the saving model's (VERDICT r01 item 9)."""
    from vlm_clip_tpu.cli.serve import build_predict_fn
    from vlm_clip_tpu.models.model_t import CLIPAdapterT
    from vlm_clip_tpu.train.checkpoint import load_t_adapters

    params, cfg, tok = _backbone()
    src = CLIPAdapterT(params, cfg, tok, policy=FP32, seed=7)
    src.update_emotion_embeddings()
    ckpt = str(tmp_path / "t_adapter.pt")
    src.save_adapters(ckpt)

    # strict load validates both adapters present
    loaded = load_t_adapters(ckpt)
    assert set(loaded) == {"visual", "text"}

    predict_fn, mode, _ = build_predict_fn(
        "tiny", adapter_ckpt=ckpt, backbone=(params, cfg, tok),
        policy=FP32, max_batch=4)
    assert mode == "t-adapter"
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 255, (4, cfg.vision.image_size,
                               cfg.vision.image_size, 3), dtype=np.uint8)
    got = predict_fn(u8)
    from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
    import jax.numpy as jnp
    want = np.asarray(src.predict(normalize_batch_tpu(jnp.asarray(u8))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_t_adapter_strict_load_rejects_junk(tmp_path):
    from vlm_clip_tpu.train.checkpoint import (load_t_adapters,
                                               save_v_adapters)

    # a file with only a context adapter is NOT a T checkpoint
    from vlm_clip_tpu.models.model_v import init_v_adapters
    vp = init_v_adapters(jax.random.PRNGKey(0), 32, 16)
    bad = str(tmp_path / "ctx_only.pt")
    save_v_adapters(bad, {"context": vp["context"]})
    with pytest.raises(ValueError, match="missing"):
        load_t_adapters(bad)


def test_v_context_serving(tmp_path):
    """V endpoint: 3-adapter model + context-cache lookup by image
    content hash; unseen images take the zero-context fallback."""
    import jax.numpy as jnp

    from vlm_clip_tpu.cli.serve import build_predict_fn
    from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
    from vlm_clip_tpu.models.model_v import EnhancedCLIPAdapterV
    from vlm_clip_tpu.train.checkpoint import save_v_adapters
    from vlm_clip_tpu.vlm.extractor import CachedContextExtractor

    params, cfg, tok = _backbone()
    src = EnhancedCLIPAdapterV(params, cfg, tok, policy=FP32, seed=3)
    src.encode_emotion_descriptions()
    ckpt = str(tmp_path / "v_adapter.pt")
    save_v_adapters(ckpt, src.adapter_params)

    # context cache holding features for ONE known image
    rng = np.random.default_rng(1)
    S = cfg.vision.image_size
    known = rng.integers(0, 255, (S, S, 3), dtype=np.uint8)
    unknown = rng.integers(0, 255, (S, S, 3), dtype=np.uint8)
    key = CachedContextExtractor.key_for(known)
    feats = rng.normal(size=(cfg.projection_dim,)).astype(np.float32)
    feats /= np.linalg.norm(feats)
    import json as _json
    cache_dir = tmp_path / "ctxcache"
    cache_dir.mkdir()
    (cache_dir / "contexts.json").write_text(
        _json.dumps({key: "a happy face"}))
    np.savez(cache_dir / "features.npz", **{key: feats})

    predict_fn, mode, _ = build_predict_fn(
        "tiny", v_adapter_ckpt=ckpt, context_cache=str(cache_dir),
        backbone=(params, cfg, tok), policy=FP32, max_batch=2)
    assert mode == "v-context+cache"

    batch = np.stack([known, unknown])
    got = predict_fn(batch)
    px = normalize_batch_tpu(jnp.asarray(batch))
    ctx = np.zeros((2, cfg.projection_dim), np.float32)
    ctx[0] = feats  # known image gets its cached context
    want = np.asarray(src.predict_probs(px, jnp.asarray(ctx)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # context actually changes the known row vs zero-context
    zero = np.asarray(src.predict_probs(px, jnp.zeros_like(ctx)))
    assert not np.allclose(got[0], zero[0])
    np.testing.assert_allclose(got[1], zero[1], atol=1e-6)


def test_v_ckpt_missing_adapters_rejected(tmp_path):
    from vlm_clip_tpu.cli.serve import build_predict_fn
    from vlm_clip_tpu.models.model_v import init_v_adapters
    from vlm_clip_tpu.train.checkpoint import save_v_adapters

    params, cfg, tok = _backbone()
    vp = init_v_adapters(jax.random.PRNGKey(0), cfg.projection_dim, 16)
    bad = str(tmp_path / "partial.pt")
    save_v_adapters(bad, {"visual": vp["visual"]})
    with pytest.raises(ValueError, match="missing"):
        build_predict_fn("tiny", v_adapter_ckpt=bad,
                         backbone=(params, cfg, tok), policy=FP32)


def test_embed_endpoints(tmp_path):
    """/embed and /embed_text: unit-norm projected features that match
    the direct model computation (pipeline-M retrieval surface,
    reference example.py:80-109)."""
    from vlm_clip_tpu.cli.serve import Embedder, build_predict_fn
    from vlm_clip_tpu.data.preprocess import (load_and_resize,
                                              normalize_batch_tpu)
    from vlm_clip_tpu.models.clip import jitted_image_features
    from vlm_clip_tpu.models.layers import l2_normalize
    from PIL import Image

    import jax.numpy as jnp

    params, cfg, tok = _backbone()
    predict_fn, _, _ = build_predict_fn("tiny", backbone=(params, cfg, tok),
                                        policy=FP32, max_batch=4)
    embedder = Embedder(params, cfg, tok, policy=FP32)
    classifier = BatchingClassifier(predict_fn, cfg.vision.image_size,
                                    max_batch=4, window_ms=5.0)
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(classifier, "tiny",
                                       embedder=embedder))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        body = _jpeg_bytes(3)
        status, out = _request(port, "POST", "/embed", body)
        assert status == 200 and out["dim"] == cfg.projection_dim
        vec = np.asarray(out["features"], np.float32)
        np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-5)
        # matches the direct computation on the same decode+resize path
        img = load_and_resize(Image.open(io.BytesIO(body)),
                              cfg.vision.image_size)
        px = normalize_batch_tpu(jnp.asarray(img[None]))
        ref = l2_normalize(jitted_image_features(cfg, FP32)(params, px))
        np.testing.assert_allclose(vec, np.asarray(ref)[0], atol=1e-5)

        # text: raw body and JSON body give the same features
        status, o1 = _request(port, "POST", "/embed_text", b"a happy face")
        status2, o2 = _request(port, "POST", "/embed_text",
                               json.dumps({"text": "a happy face"}
                                          ).encode())
        assert status == 200 and status2 == 200
        np.testing.assert_allclose(np.asarray(o1["features"]),
                                   np.asarray(o2["features"]), atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(o1["features"])), 1.0, atol=1e-5)
    finally:
        srv.shutdown()


def test_embed_disabled_404(server):
    srv, _ = server
    status, out = _request(srv.server_address[1], "POST", "/embed",
                           _jpeg_bytes())
    assert status == 404 and "disabled" in out["error"]


def test_embed_with_m_adapters(tmp_path):
    """--m-adapter-ckpt route: the saved reference-format M adapter
    checkpoint round-trips into the embedder and changes the features
    (adapters applied), still unit-norm."""
    from vlm_clip_tpu.cli.serve import Embedder
    from vlm_clip_tpu.models.model_m import CLIPWithAdapters
    from vlm_clip_tpu.models.layers import l2_normalize

    params, cfg, tok = _backbone()
    model = CLIPWithAdapters(params, cfg, policy=FP32,
                             text_adapter_size=8, vision_adapter_size=8,
                             shared_adapter_layers=1, seed=3)
    ckpt = str(tmp_path / "m_adapters.pt")
    model.save_adapter_weights(ckpt)

    emb = Embedder(params, cfg, tok, m_adapter_ckpt=ckpt, policy=FP32)
    assert emb.mode == "m-adapter"
    vec = emb.embed_image_bytes(_jpeg_bytes(5))
    np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-5)
    plain = Embedder(params, cfg, tok, policy=FP32)
    assert not np.allclose(vec, plain.embed_image_bytes(_jpeg_bytes(5)),
                           atol=1e-3)


def test_serve_refuses_degraded_by_default(tmp_path, monkeypatch):
    """serve must NOT come up with random-init weights unless
    --allow-random-weights is passed (VERDICT r2 weak #2)."""
    from vlm_clip_tpu.cli import serve as S

    monkeypatch.setenv("HF_HOME", str(tmp_path / "no_hub"))
    with pytest.raises(RuntimeError, match="random"):
        S.main(["--port", "0", "--hf-checkpoint", str(tmp_path)])
