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
