"""Folded-normalization uint8 image path == normalize + fp tower."""

import numpy as np

import jax
import jax.numpy as jnp

from vlm_clip_tpu.core.dtypes import FP32
from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
from vlm_clip_tpu.models import clip as C
from vlm_clip_tpu.models.clip import init_clip

from helpers import tiny_clip_config


def test_u8_folded_path_matches_fp_path():
    cfg = tiny_clip_config()
    params = init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)

    # reference path: host/device normalize -> NCHW fp tower
    px = normalize_batch_tpu(jnp.asarray(u8))
    ref = C.get_image_features(params, px, cfg, FP32)

    # folded path: uint8 straight in
    folded = dict(params)
    folded["vision"] = C.fold_image_normalization(params["vision"])
    got = C.get_image_features_u8(folded, jnp.asarray(u8), cfg, FP32)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=1e-4)


def test_patchify_hwc_matches_nchw_patchify():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    a = C.patchify_hwc(jnp.asarray(img), 16)
    b = C.patchify(jnp.asarray(img.transpose(0, 3, 1, 2)), 16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_m_train_step_accepts_uint8_batches():
    """uint8 HWC pixel batches (pixel-cache output) produce the same
    step as pre-normalized fp NCHW batches."""
    import optax

    from vlm_clip_tpu.core.config import AdapterConfig
    from vlm_clip_tpu.train.steps import init_train_state, make_m_train_step

    cfg = tiny_clip_config()
    acfg = AdapterConfig(text_adapter_size=8, vision_adapter_size=8,
                         shared_adapter_layers=1)
    tx = optax.adam(1e-3)
    rng = np.random.default_rng(2)
    u8 = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    ids = rng.integers(1, 90, (4, 12)).astype(np.int32)
    mask = np.ones((4, 12), np.int32)
    step = make_m_train_step(cfg, acfg, tx, FP32)

    s0 = init_train_state(jax.random.PRNGKey(3), cfg, acfg, tx)
    s_u8, m_u8 = step(s0, {"input_ids": jnp.asarray(ids),
                           "attention_mask": jnp.asarray(mask),
                           "pixel_values": jnp.asarray(u8)})
    s1 = init_train_state(jax.random.PRNGKey(3), cfg, acfg, tx)
    px = normalize_batch_tpu(jnp.asarray(u8))
    s_fp, m_fp = step(s1, {"input_ids": jnp.asarray(ids),
                           "attention_mask": jnp.asarray(mask),
                           "pixel_values": px})
    # loss and grad norm identical up to XLA fusion-level rounding
    # (post-Adam params are NOT compared: Adam divides by sqrt(v), which
    # amplifies ~1e-7 fusion differences to update scale)
    np.testing.assert_allclose(float(m_u8.loss), float(m_fp.loss),
                               atol=1e-6)
    np.testing.assert_allclose(float(m_u8.grad_norm),
                               float(m_fp.grad_norm), rtol=1e-4)
    assert int(s_u8.step) == int(s_fp.step) == 1
