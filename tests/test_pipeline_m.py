"""Pipeline-M tests: forward contract, trainer policies, checkpoints."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_clip_tpu.core.config import AdapterConfig
from vlm_clip_tpu.core.dtypes import FP32
from vlm_clip_tpu.models import model_m as M
from vlm_clip_tpu.models.clip import init_clip
from vlm_clip_tpu.train import checkpoint as ckpt
from vlm_clip_tpu.train.trainer_m import CLIPAdapterTrainer

from helpers import tiny_clip_config

REF_CKPT = "/root/reference/test_checkpoints/test_adapter.pt"


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_clip_config()
    acfg = AdapterConfig(text_adapter_size=16, vision_adapter_size=16,
                         shared_adapter_layers=2, shared_num_heads=4)
    k = jax.random.PRNGKey(0)
    clip_params = init_clip(k, cfg)
    adapter_params = M.init_m_adapters(jax.random.PRNGKey(1), cfg, acfg)
    return cfg, acfg, clip_params, adapter_params


def _batch(cfg, B=6, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.integers(3, cfg.text.vocab_size, (B, 12))),
        jnp.ones((B, 12), jnp.int32),
        jnp.asarray(rng.normal(size=(B, 3, 32, 32)), jnp.float32),
    )


def test_m_forward_contract(setup):
    cfg, acfg, clip_params, adapter_params = setup
    ids, mask, px = _batch(cfg)
    out = M.m_forward(clip_params, adapter_params, ids, mask, px, cfg, acfg,
                      FP32, return_loss=True)
    assert out.loss.shape == ()
    assert np.isfinite(float(out.loss))
    B = ids.shape[0]
    assert out.logits_per_text.shape == (B, B)
    np.testing.assert_allclose(np.asarray(out.logits_per_image),
                               np.asarray(out.logits_per_text).T)
    # features are normalized in the loss path (model_m.py:148-150)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out.text_features), axis=-1), 1.0,
        atol=1e-5)
    # no-loss mode returns raw features only
    out2 = M.m_forward(clip_params, adapter_params, ids, mask, px, cfg,
                       acfg, FP32, return_loss=False)
    assert out2.loss is None and out2.logits_per_text is None


def test_m_adapter_toggles(setup):
    cfg, _, clip_params, _ = setup
    acfg_off = AdapterConfig(use_text_adapter=False,
                             use_vision_adapter=False,
                             use_shared_adapters=False)
    empty = M.init_m_adapters(jax.random.PRNGKey(0), cfg, acfg_off)
    assert empty == {}
    ids, mask, px = _batch(cfg)
    out = M.m_forward(clip_params, empty, ids, mask, px, cfg, acfg_off,
                      FP32)
    assert np.isfinite(float(out.loss))


def test_adapter_checkpoint_roundtrip(tmp_path, setup):
    cfg, acfg, _, adapter_params = setup
    path = str(tmp_path / "ck" / "adapters.pt")
    ckpt.save_adapter_weights(path, adapter_params)
    loaded = ckpt.load_adapter_weights(path, acfg)
    flat1 = jax.tree_util.tree_leaves_with_path(adapter_params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(loaded))
    for kp, v in flat1:
        np.testing.assert_allclose(np.asarray(v), np.asarray(flat2[kp]),
                                   atol=1e-6, err_msg=str(kp))


def test_adapter_checkpoint_validation_matrix(tmp_path, setup):
    cfg, acfg, _, adapter_params = setup
    # save only text adapter -> loading with vision enabled must raise
    path = str(tmp_path / "text_only.pt")
    ckpt.save_adapter_weights(path,
                              {"text_adapter": adapter_params["text_adapter"]})
    with pytest.raises(ValueError, match="enabled but no weights"):
        ckpt.load_adapter_weights(path, acfg)
    # loading full file with adapters disabled must raise
    full = str(tmp_path / "full.pt")
    ckpt.save_adapter_weights(full, adapter_params)
    with pytest.raises(ValueError, match="not enabled"):
        ckpt.load_adapter_weights(
            full, AdapterConfig(use_text_adapter=False))
    with pytest.raises(FileNotFoundError):
        ckpt.load_adapter_weights(str(tmp_path / "nope.pt"), acfg)
    with pytest.raises(ValueError, match="No adapters"):
        ckpt.save_adapter_weights(str(tmp_path / "x.pt"), {})


@pytest.mark.skipif(not os.path.exists(REF_CKPT),
                    reason="reference artifact not mounted")
def test_load_reference_checkpoint_artifact():
    """The reference's checked-in test_adapter.pt loads as-is."""
    pytest.importorskip("torch")
    acfg = AdapterConfig(use_shared_adapters=False)  # file has text+vision
    params = ckpt.load_adapter_weights(REF_CKPT, acfg)
    assert params["text_adapter"]["down"]["kernel"].shape == (512, 256)
    assert params["vision_adapter"]["up"]["kernel"].shape == (256, 768)
    # strict matrix: shared enabled but absent in file -> raise
    with pytest.raises(ValueError, match="Shared adapters are enabled"):
        ckpt.load_adapter_weights(REF_CKPT, AdapterConfig())


def test_trainer_m_end_to_end(tmp_path, setup):
    cfg, acfg, clip_params, _ = setup
    from vlm_clip_tpu.data.rafdb import Batch

    class SyntheticLoader:
        """Yields fixed random captioned batches (trainer.py DummyDataset)."""

        def __init__(self, n_batches=3, B=6, seed=0):
            self.n, self.B, self.seed = n_batches, B, seed

        def __len__(self):
            return self.n

        def __iter__(self):
            rng = np.random.default_rng(self.seed)
            for _ in range(self.n):
                yield Batch(
                    images=rng.integers(0, 255, (self.B, 32, 32, 3),
                                        dtype=np.uint8),
                    labels=np.zeros((self.B,), np.int32),
                    input_ids=rng.integers(3, 999, (self.B, 12)).astype(
                        np.int32),
                    attention_mask=np.ones((self.B, 12), np.int32),
                )

    trainer = CLIPAdapterTrainer(
        clip_params, cfg, acfg, SyntheticLoader(),
        val_dataloader=SyntheticLoader(n_batches=1, seed=7),
        learning_rate=1e-3, warmup_steps=2,
        output_dir=str(tmp_path / "out"), num_epochs_hint=2, policy=FP32)
    history = trainer.train(num_epochs=2)
    assert len(history) == 2
    assert history[1]["train_loss"] < history[0]["train_loss"] + 1.0
    assert "val_loss" in history[0]
    for name in ("best_adapter", "adapter_epoch_1", "adapter_epoch_2",
                 "final_adapter"):
        assert os.path.exists(tmp_path / "out" / name), name
    # load_model round-trips
    trainer.load_model(str(tmp_path / "out" / "final_adapter"))


def test_full_finetune_step(setup):
    """freeze_clip=False: clip params actually move."""
    import optax

    from vlm_clip_tpu.train.steps import init_train_state, make_m_train_step

    cfg, acfg, clip_params, _ = setup
    tx = optax.adam(1e-3)
    # copy: FT mode rightly donates the (trainable) clip params
    clip_copy = jax.tree.map(jnp.array, clip_params)
    state = init_train_state(jax.random.PRNGKey(0), cfg, acfg, tx,
                             clip_params=clip_copy, freeze_clip=False)
    step = make_m_train_step(cfg, acfg, tx, FP32, freeze_clip=False)
    ids, mask, px = _batch(cfg)
    before = np.asarray(state.clip_params["logit_scale"])
    state2, metrics = step(state, {"input_ids": ids,
                                   "attention_mask": mask,
                                   "pixel_values": px})
    assert np.isfinite(float(metrics.loss))
    after = np.asarray(state2.clip_params["logit_scale"])
    assert not np.array_equal(before, after), "clip params frozen in FT mode"


def test_clip_with_adapters_class_api(tmp_path, setup):
    """Reference class surface: forward dict, feature getters,
    save/load_adapter_weights methods (model_m.py:10-248)."""
    cfg, _, clip_params, _ = setup
    model = M.CLIPWithAdapters(clip_params, cfg, text_adapter_size=16,
                               vision_adapter_size=16,
                               shared_adapter_layers=2, policy=FP32)
    model.acfg = model.acfg  # noqa: B018
    ids, mask, px = _batch(cfg)
    out = model(input_ids=ids, attention_mask=mask, pixel_values=px)
    assert set(out) == {"loss", "text_features", "image_features",
                        "logits_per_text", "logits_per_image"}
    assert np.isfinite(float(out["loss"]))
    feats = model.get_image_features(px)
    assert feats.shape == (ids.shape[0], cfg.projection_dim)
    out2 = model(pixel_values=px, return_loss=False)
    assert out2["text_features"] is None
    path = str(tmp_path / "cls_adapters.pt")
    model.save_adapter_weights(path)
    before = np.asarray(
        model.adapter_params["text_adapter"]["down"]["kernel"])
    model.adapter_params = M.init_m_adapters(jax.random.PRNGKey(7), cfg,
                                             model.acfg)
    model.load_adapter_weights(path)
    np.testing.assert_allclose(
        np.asarray(model.adapter_params["text_adapter"]["down"]["kernel"]),
        before, atol=1e-6)


def test_trainer_m_device_prefetch(tmp_path, setup):
    """device_prefetch path trains identically to the direct path."""
    cfg, acfg, clip_params, _ = setup
    from vlm_clip_tpu.data.rafdb import Batch

    class Loader:
        def __len__(self):
            return 2

        def __iter__(self):
            rng = np.random.default_rng(3)
            for _ in range(2):
                yield Batch(
                    images=rng.integers(0, 255, (4, 32, 32, 3),
                                        dtype=np.uint8),
                    labels=np.zeros((4,), np.int32),
                    input_ids=rng.integers(3, 999, (4, 12)).astype(np.int32),
                    attention_mask=np.ones((4, 12), np.int32))

    def run(prefetch):
        tr = CLIPAdapterTrainer(
            clip_params, cfg, acfg, Loader(), learning_rate=1e-3,
            output_dir=str(tmp_path / f"pf{prefetch}"), num_epochs_hint=1,
            device_prefetch=prefetch, policy=FP32)
        return tr.train(num_epochs=1)[0]["train_loss"]

    np.testing.assert_allclose(run(0), run(2), atol=1e-6)


def test_rafdb_captions_jsonl_routing(tmp_path):
    """RAFDBDataset(captions_jsonl=...) (BASELINE config 5 data path):
    images listed in a cli/gen_label.py jsonl train against their
    LLM-generated caption; null-caption records and unlisted images
    fall back to the prompt-bank draw; create_dataloaders threads the
    file through."""
    import json

    from PIL import Image

    from vlm_clip_tpu.core.config import EMOTIONS
    from vlm_clip_tpu.data.captions import get_emotion_descriptions
    from vlm_clip_tpu.data.rafdb import RAFDBDataset, create_dataloaders
    from vlm_clip_tpu.data.tokenizer import HashTokenizer

    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        for emo in EMOTIONS[:2]:
            d = tmp_path / split / emo
            d.mkdir(parents=True)
            for i in range(2):
                Image.fromarray(rng.integers(
                    0, 255, (40, 40, 3), dtype=np.uint8)).save(
                        d / f"{i}.jpg")

    ds0 = RAFDBDataset(str(tmp_path), "train", HashTokenizer(1000),
                       image_size=32)
    jsonl = tmp_path / "labels.jsonl"
    recs = []
    for j, (path, emo) in enumerate(ds0.samples):
        cap = f"a generated description {j}" if j % 2 == 0 else None
        recs.append({"path": path, "emotion": emo, "caption": cap})
    jsonl.write_text("\n".join(json.dumps(r) for r in recs) + "\n")

    ds = RAFDBDataset(str(tmp_path), "train", HashTokenizer(1000),
                      image_size=32, captions_jsonl=str(jsonl))
    bank = {c for caps in get_emotion_descriptions().values()
            for c in caps}
    for j in range(len(ds)):
        item = ds[j]
        if j % 2 == 0:
            assert item["caption"] == f"a generated description {j}"
        else:
            assert item["caption"] in bank  # fallback draw
        assert item["input_ids"].shape == (77,)

    loaders = create_dataloaders(str(tmp_path), HashTokenizer(1000),
                                 batch_size=4, image_size=32,
                                 captions_jsonl=str(jsonl))
    batch = next(iter(loaders["train"]))
    assert any(c.startswith("a generated description")
               for c in batch.captions)


def test_gen_label_cli_end_to_end(tmp_path):
    """cli/gen_label.py (config 5 flow, chunked decode + batched
    extraction): every image gets a record, stub captions are drawn
    from the deterministic template bank, and the jsonl feeds straight
    into RAFDBDataset(captions_jsonl=...)."""
    from PIL import Image

    from vlm_clip_tpu.cli import gen_label
    from vlm_clip_tpu.core.config import EMOTIONS
    from vlm_clip_tpu.data.rafdb import RAFDBDataset
    from vlm_clip_tpu.data.tokenizer import HashTokenizer
    from vlm_clip_tpu.vlm.extractor import StubContextExtractor

    rng = np.random.default_rng(1)
    root = tmp_path / "train"
    n = 0
    for emo in EMOTIONS[:3]:
        d = root / emo
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (48, 48, 3),
                                         dtype=np.uint8)).save(
                d / f"{i}.jpg")
            n += 1

    out = tmp_path / "labels.jsonl"
    gen_label.main(["--data-dir", str(root), "--out", str(out),
                    "--vlm-backend", "stub", "--chunk", "4",
                    "--image-size", "32", "--no-native",
                    "--clip-model-name", "vit-base-patch32"])
    recs = [json.loads(l) for l in out.read_text().splitlines()]
    assert len(recs) == n
    assert all(r["caption"] in StubContextExtractor._TEMPLATES
               for r in recs)
    assert {r["emotion"] for r in recs} == set(EMOTIONS[:3])

    # consumable by the config-5 dataset route
    ds = RAFDBDataset(str(tmp_path), "train", HashTokenizer(1000),
                      image_size=32, captions_jsonl=str(out))
    assert len(ds.captions) == n
    item = ds[0]
    assert item["caption"] in StubContextExtractor._TEMPLATES
