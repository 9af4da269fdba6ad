"""Smoke test entry (reference utest.py:1-52): build the full
CLIPWithAdapters, run a dummy red image + one caption through the
contrastive forward, print loss and feature shapes. Hermetic by default
(random tiny towers); pass --clip-model-name for a real backbone."""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--clip-model-name", default=None,
                   help="preset/HF id; default: hermetic tiny towers")
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    import jax

    from vlm_clip_tpu.core.config import (AdapterConfig, CLIPConfig,
                                          TextConfig, VisionConfig)
    from vlm_clip_tpu.core.dtypes import BF16
    from vlm_clip_tpu.data.preprocess import preprocess_host
    from vlm_clip_tpu.data.tokenizer import get_tokenizer
    from vlm_clip_tpu.models import model_m as M
    from vlm_clip_tpu.models.clip import init_clip

    if args.clip_model_name:
        from vlm_clip_tpu.cli.common import load_backbone

        clip_params, cfg = load_backbone(args.clip_model_name)
    else:
        cfg = CLIPConfig(
            vision=VisionConfig(hidden_size=64, intermediate_size=128,
                                num_layers=2, num_heads=4, image_size=224,
                                patch_size=32),
            text=TextConfig(hidden_size=64, intermediate_size=128,
                            num_layers=2, num_heads=4),
            projection_dim=64, name="tiny")
        clip_params = init_clip(jax.random.PRNGKey(0), cfg)

    acfg = AdapterConfig(text_adapter_size=32, vision_adapter_size=32,
                         shared_adapter_layers=2, shared_num_heads=4)
    adapter_params = M.init_m_adapters(jax.random.PRNGKey(1), cfg, acfg)

    # dummy solid-red image + one caption (utest.py:25-26)
    img = Image.new("RGB", (cfg.vision.image_size, cfg.vision.image_size),
                    (255, 0, 0))
    px = preprocess_host(img, cfg.vision.image_size)[None]
    tok = get_tokenizer(vocab_size=cfg.text.vocab_size)
    ids, mask = tok(["a photo of a red square"])

    out = M.m_forward(clip_params, adapter_params, jax.numpy.asarray(ids),
                      jax.numpy.asarray(mask), jax.numpy.asarray(px), cfg,
                      acfg, BF16, return_loss=True)
    print(f"loss: {float(out.loss):.4f}")
    print(f"text_features: {tuple(out.text_features.shape)}")
    print(f"image_features: {tuple(out.image_features.shape)}")
    print(f"logits_per_text: {tuple(out.logits_per_text.shape)}")
    assert np.isfinite(float(out.loss))
    print("smoke test OK")


if __name__ == "__main__":
    main()
