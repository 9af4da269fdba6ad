"""Pipeline-V end-to-end: stub VLM -> enhanced datasets -> train -> eval
-> reporting/analytics -> adapter export (reference main.py workflow)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_clip_tpu.core.config import EMOTIONS
from vlm_clip_tpu.core.dtypes import FP32
from vlm_clip_tpu.data.enhanced import (EnhancedFolderDataset,
                                        EnhancedFolderDatasetWithContext,
                                        NO_DESCRIPTION)
from vlm_clip_tpu.data.rafdb import BatchLoader
from vlm_clip_tpu.data.tokenizer import HashTokenizer
from vlm_clip_tpu.eval.reporting import (analyze_context_quality,
                                         display_results_with_contexts,
                                         evaluate_enhanced_model)
from vlm_clip_tpu.models.clip import init_clip
from vlm_clip_tpu.models.model_v import EnhancedCLIPAdapterV, v_forward
from vlm_clip_tpu.train import checkpoint as ckpt
from vlm_clip_tpu.train.trainer_v import train_model
from vlm_clip_tpu.vlm.extractor import StubContextExtractor

from helpers import tiny_clip_config


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("rafdb_v")
    rng = np.random.default_rng(1)
    for e in EMOTIONS:
        d = root / e
        d.mkdir()
        for i in range(3):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{e}_{i}.jpg")
    return root


@pytest.fixture(scope="module")
def setup(synth_root):
    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    extractor = StubContextExtractor(params, cfg, tok, policy=FP32)
    model = EnhancedCLIPAdapterV(params, cfg, tok, bottleneck_dim=16,
                                 vlm_context_extractor=extractor,
                                 policy=FP32)
    model.encode_emotion_descriptions()
    return cfg, params, tok, extractor, model


def test_stub_extractor_contract(setup):
    _, _, _, extractor, _ = setup
    img = np.zeros((32, 32, 3), np.uint8)
    desc = extractor.extract_context_from_image(img)
    assert isinstance(desc, str) and "expression" in desc
    # deterministic
    assert desc == extractor.extract_context_from_image(img)
    feats = extractor.encode_context_descriptions(desc)
    assert feats.shape == (1, extractor.text_feature_dim)
    np.testing.assert_allclose(np.linalg.norm(feats), 1.0, atol=1e-4)
    # None-on-empty contract
    assert extractor.encode_context_descriptions(None) is None
    assert extractor.encode_context_descriptions("") is None


def test_enhanced_datasets(setup, synth_root):
    _, _, _, extractor, _ = setup
    ds = EnhancedFolderDatasetWithContext(
        str(synth_root), extractor, mode="eval", image_size=32,
        max_images=14)
    assert len(ds) == 14  # max(1, 14//7)=2 per class
    img, label, path, feats, desc = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert feats.shape == (extractor.text_feature_dim,)
    assert desc and desc != NO_DESCRIPTION
    train_ds = EnhancedFolderDataset(str(synth_root), extractor,
                                     mode="train", image_size=32)
    assert len(train_ds[0]) == 4


def test_v_forward_semantics(setup):
    cfg, params, _, _, model = setup
    feats = jnp.asarray(np.random.default_rng(0).normal(
        size=(4, cfg.projection_dim)), jnp.float32)
    feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    scale = params["logit_scale"]
    emb = model.emotion_embedding_tensor
    # no-context path == context-path with context None
    l1 = v_forward(model.adapter_params, feats, emb, scale, None)
    assert l1.shape == (4, 7)
    # zero contexts flow through the adapter (not equal to no-context)
    zeros = jnp.zeros_like(feats)
    l2 = v_forward(model.adapter_params, feats, emb, scale, zeros)
    assert not np.allclose(np.asarray(l1), np.asarray(l2))
    # dim mismatch -> context dropped -> equals no-context path
    bad = jnp.zeros((4, cfg.projection_dim + 3), jnp.float32)
    l3 = v_forward(model.adapter_params, feats, emb, scale, bad)
    np.testing.assert_allclose(np.asarray(l3), np.asarray(l1))
    # cached text embedding short-circuit
    l4 = v_forward(model.adapter_params, feats, emb, scale, None,
                   cached_text_emb=model.adapted_emotion_embedding_tensor)
    np.testing.assert_allclose(np.asarray(l4), np.asarray(l1), atol=1e-5)


def test_v_train_and_eval(setup, synth_root, tmp_path, capsys):
    cfg, _, _, extractor, model = setup
    train_ds = EnhancedFolderDataset(str(synth_root), extractor,
                                     mode="train", image_size=32)
    eval_ds = EnhancedFolderDatasetWithContext(
        str(synth_root), extractor, mode="eval", image_size=32)
    train_loader = BatchLoader(train_ds, batch_size=7, shuffle=True,
                               drop_last=True)
    losses = train_model(model, train_loader, num_epochs=3,
                         learning_rate=3e-3)
    assert len(losses) == 3 and losses[-1] < losses[0]

    results = evaluate_enhanced_model(
        model, BatchLoader(eval_ds, batch_size=8))
    assert len(results.astuple()) == 9  # enhanced 9-tuple contract
    assert len(results.contexts) == len(eval_ds)
    assert 0.0 <= results.accuracy <= 1.0

    display_results_with_contexts(results, out_dir=str(tmp_path))
    out = capsys.readouterr().out
    assert "ENHANCED CLIP-ADAPTER EVALUATION RESULTS" in out
    assert "TOP CORRECT PREDICTIONS" in out \
        or "TOP INCORRECT PREDICTIONS" in out
    assert os.path.exists(tmp_path / "confusion_matrix.png")

    stats = analyze_context_quality(results.contexts, results.labels)
    assert stats["total"] == len(eval_ds)
    assert stats["success_rate"] == 100.0
    assert stats["avg_length"] > 3
    printed = capsys.readouterr().out
    assert "CONTEXT DESCRIPTION ANALYSIS" in printed

    # adapter export round-trip (main.py:186-193 contract)
    path = str(tmp_path / "enhanced.pt")
    ckpt.save_v_adapters(path, model.adapter_params)
    loaded = ckpt.load_v_adapters(path)
    np.testing.assert_allclose(
        np.asarray(loaded["visual"]["fc1"]["kernel"]),
        np.asarray(model.adapter_params["visual"]["fc1"]["kernel"]),
        atol=1e-6)


def test_param_report(setup, capsys):
    *_, model = setup
    model.print_model_structure()
    out = capsys.readouterr().out
    assert "trainable" in out
    assert model.count_trainable_params() > 0
