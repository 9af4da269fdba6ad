"""End-to-end pipeline-T test: synthetic RAF-DB folder -> train -> eval.

Hermetic equivalent of the reference's `trung.py main()` flow
(trung.py:806-860): build zero-shot + adapter models on a tiny random
CLIP, train adapters a few steps on a generated dataset, evaluate both,
and exercise the 2x2 comparison harness.
"""

import numpy as np
import pytest

import jax

from vlm_clip_tpu.core.dtypes import FP32
from vlm_clip_tpu.data.rafdb import BatchLoader, FolderDataset
from vlm_clip_tpu.data.tokenizer import HashTokenizer
from vlm_clip_tpu.eval.evaluate import evaluate_model
from vlm_clip_tpu.models.clip import init_clip
from vlm_clip_tpu.models.model_t import (CLIPAdapterT,
                                         ZeroShotEmotionRecognition)

from helpers import tiny_clip_config


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    """root/{emotion}/*.jpg synthetic folder tree, 4 imgs/class."""
    from PIL import Image

    from vlm_clip_tpu.core.config import EMOTIONS

    root = tmp_path_factory.mktemp("rafdb_flat")
    rng = np.random.default_rng(0)
    for e in EMOTIONS:
        d = root / e
        d.mkdir()
        for i in range(4):
            arr = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{e}_{i}.jpg")
    return root


@pytest.fixture(scope="module")
def models(synth_root):
    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    adapter = CLIPAdapterT(params, cfg, tok, bottleneck_dim=16, policy=FP32)
    zs = ZeroShotEmotionRecognition(params, cfg, tok, policy=FP32)
    return adapter, zs, cfg


def test_emotion_bank_shapes(models):
    adapter, _, cfg = models
    assert adapter.bank.per_description.shape == (7, 5, cfg.projection_dim)
    assert adapter.bank.mean.shape == (7, cfg.projection_dim)
    # per-description embeddings are unit-norm; the mean is NOT renormed
    norms = np.linalg.norm(np.asarray(adapter.bank.per_description), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)
    mean_norms = np.linalg.norm(np.asarray(adapter.bank.mean), axis=-1)
    assert (mean_norms < 0.999).any()  # means of distinct unit vectors


def test_train_decreases_loss(models, synth_root):
    adapter, _, _ = models
    ds = FolderDataset(str(synth_root), image_size=32)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, drop_last=True,
                         seed=0)
    losses = adapter.train(loader, num_epochs=4, learning_rate=3e-3)
    assert len(losses) == 4
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert adapter.adapted_class_emb is not None
    norms = np.linalg.norm(np.asarray(adapter.adapted_class_emb), axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)  # renormed


def test_eval_and_predict_modes(models, synth_root):
    adapter, zs, _ = models
    ds = FolderDataset(str(synth_root), image_size=32)
    loader = BatchLoader(ds, batch_size=10, shuffle=False, pad_final=True)
    for model in (adapter, zs):
        for all_desc in (False, True):
            res = evaluate_model(model, loader,
                                 use_all_descriptions=all_desc)
            assert 0.0 <= res.accuracy <= 1.0
            assert res.similarity_scores.shape == (len(ds), 7)
            np.testing.assert_allclose(res.similarity_scores.sum(axis=1),
                                       1.0, atol=1e-3)
            assert res.conf_matrix.sum() == len(ds)
            assert len(res.image_paths) == len(ds)


def test_compare_models_harness(models, synth_root, tmp_path, capsys):
    adapter, zs, _ = models
    ds = FolderDataset(str(synth_root), image_size=32)
    loader = BatchLoader(ds, batch_size=10)
    from vlm_clip_tpu.eval.compare import compare_models
    results = compare_models(adapter, zs, loader, use_all_descriptions=True,
                             plots=False)
    assert set(results) == {"zero_shot_accuracy_avg", "adapter_accuracy_avg",
                            "zero_shot_accuracy_all",
                            "adapter_accuracy_all"}
    out = capsys.readouterr().out
    assert "Performance Comparison" in out
    assert "Improvements" in out


def test_loader_padding_and_drop_last(synth_root):
    ds = FolderDataset(str(synth_root), image_size=32)  # 28 samples
    lp = BatchLoader(ds, batch_size=8, pad_final=True)
    batches = list(lp)
    assert all(b.images.shape[0] == 8 for b in batches)
    assert batches[-1].valid.sum() == len(ds) - 8 * (len(batches) - 1)
    ld = BatchLoader(ds, batch_size=8, drop_last=True)
    assert all(b.valid.all() for b in ld)
    assert len(ld) == len(ds) // 8


def test_feature_cache_equivalence(models, synth_root):
    """Epoch-2+ training from cached features == recomputing the frozen
    tower every epoch (the reference's behavior)."""
    import jax

    from vlm_clip_tpu.models.model_t import CLIPAdapterT
    from vlm_clip_tpu.data.tokenizer import HashTokenizer
    from vlm_clip_tpu.models.clip import init_clip

    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    ds = FolderDataset(str(synth_root), image_size=32)

    def run(cache):
        m = CLIPAdapterT(params, cfg, tok, bottleneck_dim=8, policy=FP32,
                         seed=3)
        loader = BatchLoader(ds, batch_size=14, shuffle=True,
                             drop_last=True, seed=5)
        return m.train(loader, num_epochs=3, learning_rate=1e-3,
                       cache_image_features=cache)

    np.testing.assert_allclose(run(True), run(False), atol=1e-5)
