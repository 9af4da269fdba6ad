"""Golden-value parity vs the PyTorch/HF CLIP reference backbone.

Hermetic: a tiny randomly-initialized HF CLIPModel is converted with
convert/hf.py and compared to our from-scratch towers at fp32 tolerance
(the BASELINE.md parity gate: "output logits match PyTorch reference to
fp32 tolerance").
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from vlm_clip_tpu.convert.hf import convert_hf_clip  # noqa: E402
from vlm_clip_tpu.core.dtypes import FP32  # noqa: E402
from vlm_clip_tpu.models import clip as C  # noqa: E402

from helpers import make_tiny_hf_clip, rand_batch, tiny_clip_config  # noqa: E402

ATOL = 2e-5
RTOL = 1e-4


@pytest.fixture(scope="module")
def setup():
    hf = make_tiny_hf_clip()
    cfg = tiny_clip_config()
    params = convert_hf_clip(hf.state_dict(), cfg)
    px, ids, mask = rand_batch()
    return hf, cfg, params, px, ids, mask


def test_vision_tower_parity(setup):
    hf, cfg, params, px, _, _ = setup
    with torch.no_grad():
        out = hf.vision_model(pixel_values=torch.from_numpy(px))
    ours = C.vision_tower(params["vision"], jnp.asarray(px), cfg.vision, FP32)
    np.testing.assert_allclose(np.asarray(ours.last_hidden_state),
                               out.last_hidden_state.numpy(),
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(ours.pooled),
                               out.pooler_output.numpy(),
                               atol=ATOL, rtol=RTOL)


def test_text_tower_parity(setup):
    hf, cfg, params, _, ids, mask = setup
    with torch.no_grad():
        out = hf.text_model(input_ids=torch.from_numpy(ids),
                            attention_mask=torch.from_numpy(mask))
    ours = C.text_tower(params["text"], jnp.asarray(ids), jnp.asarray(mask),
                        cfg.text, FP32)
    np.testing.assert_allclose(np.asarray(ours.last_hidden_state),
                               out.last_hidden_state.numpy(),
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(ours.pooled),
                               out.pooler_output.numpy(),
                               atol=ATOL, rtol=RTOL)


def test_text_tower_no_mask(setup):
    hf, cfg, params, _, ids, _ = setup
    with torch.no_grad():
        out = hf.text_model(input_ids=torch.from_numpy(ids))
    ours = C.text_tower(params["text"], jnp.asarray(ids), None, cfg.text, FP32)
    np.testing.assert_allclose(np.asarray(ours.pooled),
                               out.pooler_output.numpy(),
                               atol=ATOL, rtol=RTOL)


def test_projected_features_and_logits(setup):
    hf, cfg, params, px, ids, mask = setup
    with torch.no_grad():
        t_img = hf.get_image_features(pixel_values=torch.from_numpy(px))
        t_txt = hf.get_text_features(input_ids=torch.from_numpy(ids),
                                     attention_mask=torch.from_numpy(mask))
        hf_out = hf(input_ids=torch.from_numpy(ids),
                    attention_mask=torch.from_numpy(mask),
                    pixel_values=torch.from_numpy(px))
    j_img = C.get_image_features(params, jnp.asarray(px), cfg, FP32)
    j_txt = C.get_text_features(params, jnp.asarray(ids), jnp.asarray(mask),
                                cfg, FP32)
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(),
                               atol=ATOL, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(),
                               atol=ATOL, rtol=RTOL)
    lpt, lpi = C.clip_logits(params, j_img, j_txt)
    np.testing.assert_allclose(np.asarray(lpt),
                               hf_out.logits_per_text.numpy(),
                               atol=1e-4, rtol=RTOL)
    np.testing.assert_allclose(np.asarray(lpi),
                               hf_out.logits_per_image.numpy(),
                               atol=1e-4, rtol=RTOL)
