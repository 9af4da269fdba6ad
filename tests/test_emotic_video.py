"""EMOTIC loaders/converter/mAP harness + video pipeline tests."""

import os

import numpy as np
import pytest

import jax

from vlm_clip_tpu.core.dtypes import FP32
from vlm_clip_tpu.data import emotic as E
from vlm_clip_tpu.data.emotic_mat import PersonAnnotation, prepare_data
from vlm_clip_tpu.data.rafdb import BatchLoader
from vlm_clip_tpu.data.tokenizer import HashTokenizer
from vlm_clip_tpu.eval.emotic import (evaluate_emotic,
                                      mean_average_precision)
from vlm_clip_tpu.models.clip import init_clip

from helpers import tiny_clip_config


def test_cat_one_hot_and_categories():
    assert len(E.EMOTIC_CATEGORIES) == 26
    y = E.cat_to_one_hot(["Anger", "Peace"])
    assert y.shape == (26,)
    assert y[E.CAT2IND["Anger"]] == 1.0 and y[E.CAT2IND["Peace"]] == 1.0
    assert y.sum() == 2.0


def test_pre_dataset_and_collate():
    rng = np.random.default_rng(0)
    n = 10
    ds = E.EmoticPreDataset(
        rng.integers(0, 255, (n, 224, 224, 3), dtype=np.uint8),
        rng.integers(0, 255, (n, 128, 128, 3), dtype=np.uint8),
        (rng.random((n, 26)) > 0.8).astype(np.float32),
        rng.random((n, 3)).astype(np.float32) * 10,
    )
    ctx, body, cat, cont = ds[0]
    assert ctx.shape == (224, 224, 3) and body.shape == (128, 128, 3)
    assert cont.max() <= 1.0  # /10 contract (emotic.py:31)
    loader = BatchLoader(ds, batch_size=4, collate_fn=E.emotic_collate)
    batches = list(loader)
    assert batches[0].context.shape == (4, 224, 224, 3)
    assert batches[-1].valid.sum() == n - 4 * (len(batches) - 1)


def test_csv_dataset(tmp_path):
    import pandas as pd
    from PIL import Image

    img_dir = tmp_path / "mscoco"
    img_dir.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (96, 80, 3), dtype=np.uint8)
                    ).save(img_dir / "a.jpg")
    df = pd.DataFrame([{
        "Index": 0, "Folder": "mscoco", "Filename": "a.jpg",
        "Image Size": "[96, 80]", "BBox": "[10, 10, 60, 90]",
        "Categorical_Labels": "['Anger', 'Fatigue']",
        "Continuous_Labels": "[5.0, 6.0, 7.0]",
        "Gender": "Male", "Age": "Adult"}])
    ds = E.EmoticCSVDataset(df, data_src=str(tmp_path))
    ctx, body, cat, cont = ds[0]
    assert ctx.shape == (224, 224, 3) and body.shape == (128, 128, 3)
    assert cat[E.CAT2IND["Anger"]] == 1.0 and cat.sum() == 2.0
    np.testing.assert_allclose(cont, [0.5, 0.6, 0.7])


def _obj(x):
    a = np.empty((1,), object)
    a[0] = x
    return a


def test_mat_converter_train_split(tmp_path):
    """prepare_data over a hand-built nested structure + real jpgs."""
    from PIL import Image

    img_root = tmp_path / "emotic"
    (img_root / "mscoco").mkdir(parents=True)
    rng = np.random.default_rng(2)
    for name in ("x.jpg", "y.jpg"):
        Image.fromarray(rng.integers(0, 255, (50, 40, 3), dtype=np.uint8)
                        ).save(img_root / "mscoco" / name)

    def person(bbox, cats, cont):
        return [np.asarray(bbox, np.float64)[None],
                _obj(np.array([_obj(c) for c in cats], object)),
                _obj(np.array([np.float64(v) for v in cont], object)),
                np.asarray(["Male"]), np.asarray(["Adult"])]

    def _objrow(items):
        a = np.empty((1, len(items)), object)
        for i, it in enumerate(items):
            a[0, i] = it
        return a

    def example(fname, persons):
        im_size = _obj(np.array([[np.asarray([[50]]),
                                  np.asarray([[40]])]], object))
        return [np.asarray([fname]), np.asarray(["mscoco"]), im_size,
                None, _objrow(persons)]

    examples = [
        example("x.jpg", [person([5, 5, 30, 45], ["Anger"], [5, 5, 5])]),
        example("y.jpg", [person([0, 0, 40, 50], ["Peace", "Happiness"],
                                 [7, 3, 2]),
                          person([0, 0, 10, 10], [], [1, 1, 1])]),
        example("missing.jpg", [person([0, 0, 10, 10], ["Fear"],
                                       [2, 2, 2])]),
    ]
    data_mat = np.empty((1, len(examples)), object)
    for i, ex in enumerate(examples):
        data_mat[0, i] = ex

    out = tmp_path / "pre"
    csv_path = prepare_data(data_mat, str(img_root), str(out),
                            dataset_type="train", generate_npy=True)
    import pandas as pd

    df = pd.read_csv(csv_path)
    # x kept, y person1 kept, y person2 dropped (no cats), missing dropped
    assert len(df) == 2
    assert list(df.columns) == ["Index", "Folder", "Filename",
                                "Image Size", "BBox",
                                "Categorical_Labels", "Continuous_Labels",
                                "Gender", "Age"]
    ctx = np.load(out / "train_context_arr.npy")
    body = np.load(out / "train_body_arr.npy")
    cat = np.load(out / "train_cat_arr.npy")
    assert ctx.shape == (2, 224, 224, 3)
    assert body.shape == (2, 128, 128, 3)
    assert cat.shape == (2, 26) and cat[0][E.CAT2IND["Anger"]] == 1.0
    # csv round-trips into the runtime dataset
    ds = E.EmoticCSVDataset(df, data_src=str(img_root.parent / "emotic"))
    c, b, y, v = ds[0]
    assert y[E.CAT2IND["Anger"]] == 1.0


def test_map_and_zero_shot_eval():
    labels = np.zeros((6, 26), np.float32)
    labels[:3, 0] = 1.0
    labels[3:, 1] = 1.0
    scores = np.zeros((6, 26), np.float32)
    scores[:3, 0] = 1.0
    scores[3:, 1] = 1.0
    m, aps = mean_average_precision(scores, labels)
    assert m == 1.0
    assert np.isnan(aps[2])  # class without positives excluded

    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    rng = np.random.default_rng(3)
    n = 9
    ds = E.EmoticPreDataset(
        rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8),
        rng.integers(0, 255, (n, 16, 16, 3), dtype=np.uint8),
        (rng.random((n, 26)) > 0.7).astype(np.float32),
        rng.random((n, 3)).astype(np.float32))
    loader = BatchLoader(ds, batch_size=4, collate_fn=E.emotic_collate)
    res = evaluate_emotic(params, cfg, tok, loader, policy=FP32)
    assert 0.0 <= res["mAP"] <= 1.0
    assert res["num_samples"] == n
    assert len(res["per_class_ap"]) == 26


def test_video_pipeline(tmp_path):
    import cv2

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (64, 48))
    rng = np.random.default_rng(4)
    for _ in range(20):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()

    from vlm_clip_tpu.data.video import (extract_frames, process_video,
                                         score_video_frames)

    frames = extract_frames(path, frame_limit=16, size=32)
    assert frames.shape == (16, 32, 32, 3) and frames.dtype == np.uint8
    out = process_video(path, frame_limit=8, size=32)
    assert out.shape == (3, 8, 32, 32)  # [C,T,H,W] (process_video.py:29)
    # imagenet vs clip stats differ
    out2 = process_video(path, frame_limit=8, size=32, stats="clip")
    assert not np.allclose(out, out2)

    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    class_emb = np.random.default_rng(5).normal(size=(7, cfg.projection_dim))
    class_emb /= np.linalg.norm(class_emb, axis=-1, keepdims=True)
    probs = score_video_frames(params, cfg, frames, class_emb, policy=FP32)
    assert probs.shape == (16, 7)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)


def test_video_frames_shard_over_seq_axis():
    """The mesh's ``seq`` axis carries the video frame dimension
    (SURVEY §5.7 "frames x patches"): sharded scores == unsharded."""
    from vlm_clip_tpu.data.video import (score_video_frames,
                                         score_video_frames_sharded)
    from vlm_clip_tpu.parallel.mesh import MeshConfig, create_mesh

    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(1), cfg)
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)
    class_emb = rng.normal(size=(7, cfg.projection_dim))
    class_emb /= np.linalg.norm(class_emb, axis=-1, keepdims=True)

    ref = score_video_frames(params, cfg, frames, class_emb, policy=FP32)
    mesh = create_mesh(MeshConfig(data=2, model=2, seq=2),
                       jax.devices()[:8])
    assert "seq" in mesh.shape
    got = score_video_frames_sharded(params, cfg, frames, class_emb,
                                     mesh, policy=FP32)
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_emotic_training_learns_and_feeds_eval():
    """train_emotic (encode-once + BCE/VAD adapter head): loss decreases,
    the trained adapter beats zero-shot mAP on learnable labels, and the
    params plug straight into evaluate_emotic."""
    import jax.numpy as jnp

    from vlm_clip_tpu.eval.emotic import encode_category_embeddings
    from vlm_clip_tpu.train.trainer_emotic import (emotic_forward,
                                                   encode_all_contexts,
                                                   train_emotic)

    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    rng = np.random.default_rng(3)
    n = 30  # not divisible by batch_size: exercises the masked tail
    sz = cfg.vision.image_size
    ctx = rng.integers(0, 255, (n, sz, sz, 3), dtype=np.uint8)
    body = rng.integers(0, 255, (n, 128, 128, 3), dtype=np.uint8)

    # labels the adapter CAN learn: top-3 categories of a random linear
    # map of the frozen features themselves
    class _Probe:
        def __init__(self):  # minimal dataset: context only matters
            self.items = [(ctx[i], body[i], np.zeros(26, np.float32),
                           np.zeros(3, np.float32)) for i in range(n)]

        def __len__(self):
            return n

        def __getitem__(self, i):
            return self.items[i]

    feats = np.asarray(encode_all_contexts(params, cfg, _Probe(),
                                           policy=FP32))
    w_true = rng.normal(size=(feats.shape[1], 26)).astype(np.float32)
    scores_true = feats @ w_true
    cat = np.zeros((n, 26), np.float32)
    for i in range(n):
        cat[i, np.argsort(scores_true[i])[-3:]] = 1.0
    vad = rng.random((n, 3)).astype(np.float32)

    class _DS(_Probe):
        def __init__(self):
            self.items = [(ctx[i], body[i], cat[i], vad[i])
                          for i in range(n)]

    ds = _DS()
    head, losses = train_emotic(params, cfg, tok, ds, num_epochs=8,
                                batch_size=8, learning_rate=3e-3,
                                bottleneck=16, policy=FP32, seed=1)
    assert losses[-1] < losses[0], losses

    cat_emb = encode_category_embeddings(params, cfg, tok, FP32)
    jf = jnp.asarray(feats)
    zs_scores = np.asarray(jnp.dot(jf, cat_emb.T))
    ad_scores = np.asarray(emotic_forward(head, jf, cat_emb, 0.2, 100.0)[0])
    zs_map, _ = mean_average_precision(zs_scores, cat)
    ad_map, _ = mean_average_precision(ad_scores, cat)
    assert ad_map > zs_map, (ad_map, zs_map)

    # end-to-end eval integration (adapter_params contract)
    loader = BatchLoader(ds, batch_size=8, collate_fn=E.emotic_collate)
    res = evaluate_emotic(params, cfg, tok, loader, adapter_params=head,
                          alpha=0.2, policy=FP32)
    assert 0.0 <= res["mAP"] <= 1.0 and res["num_samples"] == n


def test_train_emotic_cli_end_to_end(tmp_path, monkeypatch):
    """cli/train_emotic on a synthetic npy dir: trains, saves a
    round-trippable head, evaluates the test split."""
    import vlm_clip_tpu.cli.common as common
    from vlm_clip_tpu.cli.train_emotic import main as train_cli
    from vlm_clip_tpu.train.trainer_emotic import load_emotic_head

    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    tok = HashTokenizer(cfg.text.vocab_size)
    monkeypatch.setattr(common, "load_backbone",
                        lambda *a, **k: (params, cfg))
    monkeypatch.setattr(common, "make_tokenizer", lambda *a, **k: tok)

    rng = np.random.default_rng(0)
    sz = cfg.vision.image_size
    for split, n in (("train", 12), ("test", 6)):
        np.save(tmp_path / f"{split}_context_arr.npy",
                rng.integers(0, 255, (n, sz, sz, 3), dtype=np.uint8))
        np.save(tmp_path / f"{split}_body_arr.npy",
                rng.integers(0, 255, (n, 64, 64, 3), dtype=np.uint8))
        np.save(tmp_path / f"{split}_cat_arr.npy",
                (rng.random((n, 26)) > 0.8).astype(np.float32))
        np.save(tmp_path / f"{split}_cont_arr.npy",
                rng.random((n, 3)).astype(np.float32) * 10)

    out = tmp_path / "head.npz"
    train_cli(["--data-dir", str(tmp_path), "--num-epochs", "2",
               "--batch-size", "8", "--bottleneck", "16",
               "--output", str(out)])
    assert out.exists()
    head = load_emotic_head(str(out))
    assert set(head) == {"visual", "vad"}
    assert head["vad"]["kernel"].shape == (cfg.projection_dim, 3)


def test_video_raw_frame_scorer_matches_host_resize_path():
    """score_video_frames_raw (config-4 chip path: native-res uint8 in,
    fused on-device resize/normalize/score) — shape + probability
    contract on non-square native frames, and equality with
    score_video_frames when the input is already at target size (the
    shortest-edge resize is then an identity)."""
    from vlm_clip_tpu.data.video import (score_video_frames,
                                         score_video_frames_raw)

    cfg = tiny_clip_config()
    size = cfg.vision.image_size
    params = init_clip(jax.random.PRNGKey(2), cfg)
    rng = np.random.default_rng(7)
    class_emb = rng.normal(size=(7, cfg.projection_dim))
    class_emb /= np.linalg.norm(class_emb, axis=-1, keepdims=True)

    native = rng.integers(0, 255, (6, 48, 64, 3), dtype=np.uint8)
    probs = score_video_frames_raw(params, cfg, native, class_emb,
                                   policy=FP32, stats="imagenet",
                                   size=size)
    assert probs.shape == (6, 7)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)

    exact = rng.integers(0, 255, (6, size, size, 3), dtype=np.uint8)
    got = score_video_frames_raw(params, cfg, exact, class_emb,
                                 policy=FP32, stats="clip", size=size)
    ref = score_video_frames(params, cfg, exact, class_emb, policy=FP32,
                             stats="clip")
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
