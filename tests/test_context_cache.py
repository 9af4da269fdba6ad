"""Context cache: build CLI -> CachedContextExtractor -> enhanced dataset.

The pipeline that removes the VLM from the train hot path end-to-end:
build the cache offline, replay it during dataset construction, verify
texts/features match the live extractor.
"""

import numpy as np
import pytest

import jax

from vlm_clip_tpu.cli.build_context_cache import main as build_cache
from vlm_clip_tpu.core.config import EMOTIONS
from vlm_clip_tpu.core.dtypes import FP32
from vlm_clip_tpu.data.enhanced import EnhancedFolderDatasetWithContext
from vlm_clip_tpu.data.preprocess import load_and_resize
from vlm_clip_tpu.data.tokenizer import HashTokenizer
from vlm_clip_tpu.models.clip import init_clip
from vlm_clip_tpu.vlm.extractor import (CachedContextExtractor,
                                        StubContextExtractor)

from helpers import tiny_clip_config


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("cache_imgs")
    rng = np.random.default_rng(0)
    for e in EMOTIONS:
        d = root / e
        d.mkdir()
        for i in range(2):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                         dtype=np.uint8)
                            ).save(d / f"{i}.jpg")
    return root


def test_cache_build_and_replay(tree, tmp_path, monkeypatch):
    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    # the CLI builds the cache under the default BF16 policy — compare
    # against a live extractor with the SAME policy
    live = StubContextExtractor(params, cfg, tok)

    # build the cache via the CLI (patch its backbone to the tiny model)
    import vlm_clip_tpu.cli.common as common

    monkeypatch.setattr(common, "load_backbone",
                        lambda *a, **k: (params, cfg))
    monkeypatch.setattr(common, "make_tokenizer", lambda *a, **k: tok)
    cache_dir = str(tmp_path / "ctx_cache")
    build_cache(["--data-dir", str(tree), "--out-dir", cache_dir,
                 "--image-size", "32"])

    cached = CachedContextExtractor(cache_dir)
    # replay matches the live extractor for every image
    from vlm_clip_tpu.data.rafdb import scan_class_folders
    from pathlib import Path

    for path, _ in scan_class_folders(Path(tree)):
        img = load_and_resize(path, 32)
        key = CachedContextExtractor.key_for(path)
        text = cached.extract_context_from_image(img, key=key)
        assert text == live.extract_context_from_image(img)
        feats = cached.encode_context_descriptions(text)
        live_feats = live.encode_context_descriptions(text)
        np.testing.assert_allclose(np.asarray(feats).reshape(-1),
                                   np.asarray(live_feats).reshape(-1),
                                   atol=1e-6)  # identical path, bit-equal
        # serving key: the same entry is ALSO recorded under the decoded
        # content hash — cli/serve.py only ever sees uploaded bytes, so
        # a path-only cache could never hit there
        assert cached.extract_context_from_image(img) == text
        np.testing.assert_array_equal(
            np.asarray(cached.encode_context_descriptions(text)),
            np.asarray(feats))

    # unknown image with no fallback -> None contract
    unknown = np.full((32, 32, 3), 7, np.uint8)
    assert cached.extract_context_from_image(unknown) is None
    # with fallback -> delegated
    cached_fb = CachedContextExtractor(cache_dir, fallback=live)
    assert cached_fb.extract_context_from_image(unknown) \
        == live.extract_context_from_image(unknown)


def test_enhanced_dataset_with_cache(tree, tmp_path, monkeypatch):
    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    live = StubContextExtractor(params, cfg, tok)

    import vlm_clip_tpu.cli.common as common

    monkeypatch.setattr(common, "load_backbone",
                        lambda *a, **k: (params, cfg))
    monkeypatch.setattr(common, "make_tokenizer", lambda *a, **k: tok)
    cache_dir = str(tmp_path / "ctx_cache2")
    from vlm_clip_tpu.cli.build_context_cache import main as build_cache

    build_cache(["--data-dir", str(tree), "--out-dir", cache_dir,
                 "--image-size", "32"])

    # the cached dataset never calls the live VLM; cached images hit by
    # content key, unseen ones fall back when a fallback is given
    cached = CachedContextExtractor(cache_dir, fallback=live)
    ds = EnhancedFolderDatasetWithContext(
        str(tree), cached, image_size=32,
        feature_dim=cfg.projection_dim)
    img, label, path, feats, desc = ds[0]
    assert desc and "expression" in desc
    assert np.abs(feats).sum() > 0
