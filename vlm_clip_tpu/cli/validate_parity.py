"""Real-weight golden validation: JAX towers vs PyTorch at fp32 tolerance.

The BASELINE.md parity gate ("EMOTIC eval mAP parity; logits match
PyTorch to fp32 tolerance") needs a runnable harness for the day real
weights are on disk. This CLI:

1. loads a CLIP checkpoint (HF name or local dir), converts it, and
   compares text/image features + logits against the torch model on
   fixed inputs (max abs/rel diff, pass/fail at --tol);
2. optionally compares Qwen2.5-VL text-decoder logits the same way
   (``--qwen DIR``; 3B fp32 on a small host is slow — budget minutes);
3. optionally runs RAF-DB zero-shot accuracy (``--rafdb DIR``) and
   EMOTIC mAP (``--emotic-npy DIR``) with the converted weights;
4. appends a markdown result block to ``--append`` (default BENCH.md).

Hermetic CI mode: ``--tiny-fixture`` builds a tiny random HF CLIP
in-process and runs step 1 end-to-end with no downloads
(tests/test_utils_infra.py exercises it).

Exact commands for when real weights are present (zero-egress: point at
local dirs):

    python -m vlm_clip_tpu.cli.validate_parity \
        --clip /data/clip-vit-large-patch14 --rafdb /data/rafdb \
        --emotic-npy /data/emotic_pre --append BENCH.md
    python -m vlm_clip_tpu.cli.validate_parity \
        --qwen /data/Qwen2.5-VL-3B-Instruct
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime
from typing import Dict, Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clip", default=None,
                   help="HF CLIP checkpoint name or local dir")
    p.add_argument("--qwen", default=None,
                   help="local Qwen2.5-VL weights dir (safetensors)")
    p.add_argument("--rafdb", default=None,
                   help="RAF-DB root (flat {emotion}/ folders) for "
                        "zero-shot accuracy")
    p.add_argument("--emotic-npy", default=None,
                   help="EMOTIC preprocessed npy dir for mAP")
    p.add_argument("--tol", type=float, default=5e-3,
                   help="max |diff| allowed on logits (fp32 gate)")
    p.add_argument("--append", default=None,
                   help="markdown file to append results to")
    p.add_argument("--tiny-fixture", action="store_true",
                   help="hermetic self-test on a tiny random HF CLIP")
    return p


def _force_fp32_matmuls():
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")


def validate_clip(hf_model, params, cfg, seed: int = 0) -> Dict:
    """Max diffs between JAX and torch towers on fixed random inputs."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    from vlm_clip_tpu.core.dtypes import FP32
    from vlm_clip_tpu.models.clip import (clip_logits, get_image_features,
                                          get_text_features)

    rng = np.random.default_rng(seed)
    B = 4
    ids = rng.integers(1, cfg.text.vocab_size - 2, (B, 12))
    ids = np.concatenate(
        [ids, np.full((B, 1), cfg.text.eos_token_id)], axis=1)
    mask = np.ones_like(ids)
    px = rng.normal(size=(B, 3, cfg.vision.image_size,
                          cfg.vision.image_size)).astype(np.float32)

    with torch.no_grad():
        t_txt = hf_model.get_text_features(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask)).numpy()
        t_img = hf_model.get_image_features(
            pixel_values=torch.from_numpy(px)).numpy()
        t_out = hf_model(input_ids=torch.from_numpy(ids),
                         attention_mask=torch.from_numpy(mask),
                         pixel_values=torch.from_numpy(px))
        t_logits = t_out.logits_per_image.numpy()

    j_txt = np.asarray(get_text_features(
        params, jnp.asarray(ids), jnp.asarray(mask), cfg, FP32))
    j_img = np.asarray(get_image_features(params, jnp.asarray(px), cfg,
                                          FP32))
    lt, li = clip_logits(params, jnp.asarray(j_img), jnp.asarray(j_txt))
    j_logits = np.asarray(li)

    def diffs(a, b):
        d = np.abs(a - b)
        return {"max_abs": float(d.max()),
                "rel": float(d.max() / (np.abs(b).max() + 1e-12))}

    return {"text_features": diffs(j_txt, t_txt),
            "image_features": diffs(j_img, t_img),
            "logits_per_image": diffs(j_logits, t_logits)}


def validate_qwen(weights_dir: str, seed: int = 0) -> Dict:
    """Text-decoder logits vs the HF model loaded from the same dir."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    from vlm_clip_tpu.vlm.qwen import load_safetensors_dir
    from vlm_clip_tpu.vlm.qwen_convert import convert_qwen_vl
    from vlm_clip_tpu.vlm.qwen_model import qwen25vl_3b, text_forward

    from transformers import Qwen2_5_VLForConditionalGeneration

    hf = Qwen2_5_VLForConditionalGeneration.from_pretrained(
        weights_dir, torch_dtype=torch.float32).eval()
    cfg = qwen25vl_3b()
    params = convert_qwen_vl(load_safetensors_dir(weights_dir), cfg)

    rng = np.random.default_rng(seed)
    ids = rng.integers(1, 10000, (1, 16))
    with torch.no_grad():
        t_logits = hf(input_ids=torch.from_numpy(ids),
                      attention_mask=torch.ones(1, 16,
                                                dtype=torch.long)
                      ).logits.numpy()
    T = ids.shape[1]
    pos = np.broadcast_to(np.arange(T), (3, 1, T))
    embeds = params["text"]["embed_tokens"][jnp.asarray(ids)]
    causal = jnp.tril(jnp.ones((T, T), bool))
    m = jnp.where(causal[None, None], 0.0, -3.4028235e38)
    j_logits, _ = text_forward(params["text"], embeds, jnp.asarray(pos),
                               cfg.text, m)
    d = np.abs(np.asarray(j_logits) - t_logits)
    return {"text_logits": {"max_abs": float(d.max()),
                            "rel": float(d.max()
                                         / (np.abs(t_logits).max()
                                            + 1e-12))}}


def zero_shot_rafdb(params, cfg, root: str) -> Dict:
    from vlm_clip_tpu.core.dtypes import FP32
    from vlm_clip_tpu.data.rafdb import BatchLoader, FolderDataset
    from vlm_clip_tpu.data.tokenizer import HashTokenizer, get_tokenizer
    from vlm_clip_tpu.eval.evaluate import evaluate_model
    from vlm_clip_tpu.models.model_t import ZeroShotEmotionRecognition

    tok = get_tokenizer(vocab_size=cfg.text.vocab_size)
    warn = isinstance(tok, HashTokenizer)
    model = ZeroShotEmotionRecognition(params, cfg, tok, policy=FP32)
    loader = BatchLoader(FolderDataset(root, cfg.vision.image_size), 64)
    res = evaluate_model(model, loader)
    return {"accuracy": float(res.accuracy),
            "tokenizer_degraded": warn,
            "num_images": int(len(res.labels))}


def emotic_map(params, cfg, npy_dir: str) -> Dict:
    from vlm_clip_tpu.data.emotic import EmoticPreDataset, emotic_collate
    from vlm_clip_tpu.data.rafdb import BatchLoader
    from vlm_clip_tpu.data.tokenizer import get_tokenizer
    from vlm_clip_tpu.eval.emotic import evaluate_emotic

    ds = EmoticPreDataset.from_dir(npy_dir, "test")
    loader = BatchLoader(ds, batch_size=64, collate_fn=emotic_collate)
    tok = get_tokenizer(vocab_size=cfg.text.vocab_size)
    out = evaluate_emotic(params, cfg, tok, loader)
    return {"mAP": out["mAP"], "num_samples": out["num_samples"]}


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    _force_fp32_matmuls()

    results: Dict[str, Dict] = {}
    checked = []

    if args.tiny_fixture:
        import torch
        from transformers import (CLIPConfig as HFCLIPConfig, CLIPModel,
                                  CLIPTextConfig, CLIPVisionConfig)

        from vlm_clip_tpu.convert.hf import (clip_config_from_hf,
                                             convert_hf_clip)

        torch.manual_seed(0)
        tc = CLIPTextConfig(hidden_size=64, intermediate_size=128,
                            num_hidden_layers=2, num_attention_heads=4,
                            max_position_embeddings=77, vocab_size=99,
                            eos_token_id=2)
        vc = CLIPVisionConfig(hidden_size=64, intermediate_size=128,
                              num_hidden_layers=2, num_attention_heads=4,
                              image_size=32, patch_size=16)
        hf = CLIPModel(HFCLIPConfig(text_config=tc.to_dict(),
                                    vision_config=vc.to_dict(),
                                    projection_dim=32)).eval()
        cfg = clip_config_from_hf(hf.config)
        params = convert_hf_clip(hf.state_dict(), cfg)
        results["clip(tiny-fixture)"] = validate_clip(hf, params, cfg)
        checked.append("clip(tiny-fixture)")
    elif args.clip:
        from transformers import CLIPModel

        from vlm_clip_tpu.convert.hf import (clip_config_from_hf,
                                             convert_hf_clip)

        hf = CLIPModel.from_pretrained(args.clip).eval()
        cfg = clip_config_from_hf(hf.config)
        params = convert_hf_clip(hf.state_dict(), cfg)
        results[f"clip({args.clip})"] = validate_clip(hf, params, cfg)
        checked.append(f"clip({args.clip})")
        if args.rafdb:
            results["rafdb-zeroshot"] = zero_shot_rafdb(params, cfg,
                                                        args.rafdb)
        if args.emotic_npy:
            results["emotic-mAP"] = emotic_map(params, cfg,
                                               args.emotic_npy)

    if args.qwen:
        results[f"qwen({args.qwen})"] = validate_qwen(args.qwen)
        checked.append(f"qwen({args.qwen})")

    if not results:
        print("nothing to validate: pass --clip/--qwen/--tiny-fixture")
        return 2

    ok = True
    for name in checked:
        for part, d in results[name].items():
            passed = d["max_abs"] <= args.tol
            ok &= passed
            print(f"{name}/{part}: max_abs={d['max_abs']:.2e} "
                  f"rel={d['rel']:.2e} "
                  f"{'PASS' if passed else 'FAIL'} (tol {args.tol})")
    for name in set(results) - set(checked):
        print(f"{name}: {json.dumps(results[name])}")

    if args.append:
        with open(args.append, "a", encoding="utf-8") as f:
            f.write(f"\n### Parity validation "
                    f"({datetime.now():%Y-%m-%d %H:%M})\n\n")
            f.write(f"```json\n{json.dumps(results, indent=2)}\n```\n")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
