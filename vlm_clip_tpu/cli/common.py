"""Shared CLI plumbing: backbone loading and tokenizer selection."""

from __future__ import annotations

import logging
from typing import Optional, Tuple

from vlm_clip_tpu.core.config import CLIPConfig, clip_preset

log = logging.getLogger(__name__)


def load_backbone(model_name: str, hf_checkpoint: Optional[str] = None,
                  seed: int = 0) -> Tuple[dict, CLIPConfig]:
    """CLIP params for a preset name: HF-converted weights when available
    (local path / cache), else random init with a loud warning."""
    import os

    import jax

    from vlm_clip_tpu.models.clip import init_clip

    # zero-egress environment: make HF fail fast to local cache instead of
    # spending minutes in network retries
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

    cfg = clip_preset(model_name)
    source = hf_checkpoint or model_name
    try:
        from vlm_clip_tpu.convert.hf import load_hf_clip

        params, cfg = load_hf_clip(source, cfg)
        log.info("loaded HF weights from %s", source)
        return params, cfg
    except Exception as e:
        log.warning("could not load HF weights for %s (%s); "
                    "using RANDOM INIT — results will not be meaningful "
                    "until real weights are provided", source, e)
        return init_clip(jax.random.PRNGKey(seed), cfg), cfg


def make_tokenizer(cfg: CLIPConfig, vocab_json: Optional[str] = None,
                   merges_txt: Optional[str] = None):
    from vlm_clip_tpu.data.tokenizer import get_tokenizer

    tok = get_tokenizer(vocab_json, merges_txt, cfg.text.vocab_size)
    log.info("tokenizer backend: %s", type(tok).__name__)
    return tok
