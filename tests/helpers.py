"""Shared test fixtures: tiny hermetic CLIP configs (no HF downloads)."""

from __future__ import annotations

import numpy as np

from vlm_clip_tpu.core.config import CLIPConfig, TextConfig, VisionConfig

VOCAB = 1000


def tiny_clip_config() -> CLIPConfig:
    return CLIPConfig(
        vision=VisionConfig(hidden_size=64, intermediate_size=128,
                            num_layers=2, num_heads=4, image_size=32,
                            patch_size=16),
        text=TextConfig(hidden_size=64, intermediate_size=128, num_layers=2,
                        num_heads=4, vocab_size=VOCAB, max_positions=77),
        projection_dim=32,
        name="tiny",
    )


def make_tiny_hf_clip(seed: int = 0):
    """Randomly-initialized tiny HF CLIPModel matching tiny_clip_config."""
    import torch
    from transformers import (CLIPConfig as HFCLIPConfig, CLIPModel,
                              CLIPTextConfig, CLIPVisionConfig)

    torch.manual_seed(seed)
    tc = CLIPTextConfig(hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        max_position_embeddings=77, vocab_size=VOCAB,
                        eos_token_id=2)  # forces argmax(input_ids) pooling
    vc = CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                          num_hidden_layers=2, num_attention_heads=4,
                          image_size=32, patch_size=16)
    cfg = HFCLIPConfig(text_config=tc.to_dict(), vision_config=vc.to_dict(),
                       projection_dim=32)
    return CLIPModel(cfg).eval()


def rand_batch(batch: int = 3, seq: int = 12, image: int = 32,
               seed: int = 0):
    rng = np.random.default_rng(seed)
    pixel_values = rng.normal(size=(batch, 3, image, image)).astype(np.float32)
    input_ids = rng.integers(3, VOCAB, size=(batch, seq)).astype(np.int64)
    attention_mask = np.ones((batch, seq), dtype=np.int64)
    # ragged padding on the last row
    attention_mask[-1, seq // 2:] = 0
    input_ids[-1, seq // 2:] = 0
    return pixel_values, input_ids, attention_mask
