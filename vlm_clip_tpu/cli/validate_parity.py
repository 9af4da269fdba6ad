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
   EMOTIC mAP (``--emotic-npy DIR``) with the converted weights —
   REFUSING to run them with the hash tokenizer unless
   ``--allow-hash-tokenizer`` (real weights + hash ids = garbage
   logits; the reference gets exactness implicitly via CLIPProcessor,
   /root/reference/dataset.py:152-159). When ``--clip`` is a local dir
   its vocab.json/merges.txt are picked up automatically;
4. appends a markdown result block to ``--append`` (default BENCH.md).

Hermetic CI mode: ``--tiny-fixture`` covers ALL FOUR legs with no
downloads — tiny random HF CLIP logits parity, tiny random HF
Qwen2.5-VL text-logits parity, RAF-DB zero-shot over a generated
7-class JPEG tree, and EMOTIC mAP over synthetic npy arrays
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
                   help="hermetic self-test: all four legs on tiny "
                        "random fixtures (no downloads)")
    p.add_argument("--allow-hash-tokenizer", action="store_true",
                   help="let the RAF-DB/EMOTIC legs run with the "
                        "non-CLIP hash tokenizer (hermetic drives only)")
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


def validate_qwen_model(hf, params, cfg, seed: int = 0) -> Dict:
    """Text-decoder logits: converted params vs the torch model."""
    import numpy as np
    import torch

    import jax.numpy as jnp

    from vlm_clip_tpu.vlm.qwen_model import text_forward

    rng = np.random.default_rng(seed)
    T = 16
    ids = rng.integers(1, min(10000, cfg.text.vocab_size - 1), (1, T))
    with torch.no_grad():
        t_logits = hf(input_ids=torch.from_numpy(ids),
                      attention_mask=torch.ones(1, T, dtype=torch.long)
                      ).logits.numpy()
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


def validate_qwen(weights_dir: str, seed: int = 0) -> Dict:
    """Dir wrapper: load HF + convert from the same safetensors dir."""
    import torch

    from transformers import Qwen2_5_VLForConditionalGeneration

    from vlm_clip_tpu.vlm.qwen import load_safetensors_dir
    from vlm_clip_tpu.vlm.qwen_convert import convert_qwen_vl
    from vlm_clip_tpu.vlm.qwen_model import qwen25vl_3b

    hf = Qwen2_5_VLForConditionalGeneration.from_pretrained(
        weights_dir, torch_dtype=torch.float32).eval()
    cfg = qwen25vl_3b()
    params = convert_qwen_vl(load_safetensors_dir(weights_dir), cfg)
    return validate_qwen_model(hf, params, cfg, seed)


def zero_shot_rafdb(params, cfg, root: str, tokenizer) -> Dict:
    from vlm_clip_tpu.core.dtypes import FP32
    from vlm_clip_tpu.data.rafdb import BatchLoader, FolderDataset
    from vlm_clip_tpu.data.tokenizer import HashTokenizer
    from vlm_clip_tpu.eval.evaluate import evaluate_model
    from vlm_clip_tpu.models.model_t import ZeroShotEmotionRecognition

    model = ZeroShotEmotionRecognition(params, cfg, tokenizer, policy=FP32)
    loader = BatchLoader(FolderDataset(root, cfg.vision.image_size), 64)
    res = evaluate_model(model, loader)
    return {"accuracy": float(res.accuracy),
            "tokenizer_degraded": isinstance(tokenizer, HashTokenizer),
            "num_images": int(len(res.labels))}


def emotic_map(params, cfg, npy_dir: str, tokenizer) -> Dict:
    from vlm_clip_tpu.data.emotic import EmoticPreDataset, emotic_collate
    from vlm_clip_tpu.data.rafdb import BatchLoader
    from vlm_clip_tpu.eval.emotic import evaluate_emotic

    ds = EmoticPreDataset.from_dir(npy_dir, "test")
    loader = BatchLoader(ds, batch_size=64, collate_fn=emotic_collate)
    out = evaluate_emotic(params, cfg, tokenizer, loader)
    return {"mAP": out["mAP"], "num_samples": out["num_samples"]}


def _tiny_hf_clip():
    """(hf_model, params, cfg) — tiny random HF CLIP, converted."""
    import torch
    from transformers import (CLIPConfig as HFCLIPConfig, CLIPModel,
                              CLIPTextConfig, CLIPVisionConfig)

    from vlm_clip_tpu.convert.hf import clip_config_from_hf, convert_hf_clip

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
    return hf, convert_hf_clip(hf.state_dict(), cfg), cfg


def _tiny_hf_qwen():
    """(hf_model, params, cfg) — tiny random HF Qwen2.5-VL, converted
    (same shape family as tests/test_qwen.py's oracle)."""
    import torch
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration,
                              Qwen2_5_VLTextConfig)
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import \
        Qwen2_5_VLVisionConfig

    from vlm_clip_tpu.vlm.qwen_convert import convert_qwen_vl
    from vlm_clip_tpu.vlm.qwen_model import (QwenTextConfig,
                                             QwenVisionConfig, QwenVLConfig)

    torch.manual_seed(0)
    tc = Qwen2_5_VLTextConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=256, tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        rope_theta=1000000.0, rms_norm_eps=1e-6)
    vc = Qwen2_5_VLVisionConfig(
        hidden_size=32, intermediate_size=64, out_hidden_size=64, depth=3,
        num_heads=4, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=16, fullatt_block_indexes=[1],
        hidden_act="silu")
    hf = Qwen2_5_VLForConditionalGeneration(
        Qwen2_5_VLConfig(text_config=tc.to_dict(),
                         vision_config=vc.to_dict(),
                         image_token_id=250, vision_start_token_id=249,
                         vision_end_token_id=249, eos_token_id=251,
                         bos_token_id=0)).eval()
    cfg = QwenVLConfig(
        text=QwenTextConfig(hidden_size=64, intermediate_size=128,
                            num_layers=2, num_heads=4, num_kv_heads=2,
                            head_dim=16, vocab_size=256,
                            mrope_section=(2, 3, 3),
                            tie_word_embeddings=True),
        vision=QwenVisionConfig(hidden_size=32, intermediate_size=64,
                                out_hidden_size=64, depth=3, num_heads=4,
                                patch_size=4, temporal_patch_size=2,
                                spatial_merge_size=2, window_size=16,
                                fullatt_block_indexes=(1,)),
        image_token_id=250, vision_start_token_id=249, eos_token_id=251)
    return hf, convert_qwen_vl(hf.state_dict(), cfg), cfg


def _fixture_rafdb_tree(root: str, image_size: int, per_class: int = 2
                        ) -> None:
    """Tiny 7-class JPEG tree (flat {emotion}/ layout)."""
    import numpy as np
    from PIL import Image

    from vlm_clip_tpu.core.config import EMOTIONS

    rng = np.random.default_rng(0)
    for emo in EMOTIONS:
        d = os.path.join(root, emo)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            arr = rng.integers(0, 255, (image_size, image_size, 3),
                               dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"{i}.jpg"))


def _fixture_emotic_npy(root: str, image_size: int, n: int = 8) -> None:
    """Synthetic preprocessed-EMOTIC arrays (test split)."""
    import numpy as np

    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    np.save(os.path.join(root, "test_context_arr.npy"),
            rng.integers(0, 255, (n, image_size, image_size, 3),
                         dtype=np.uint8))
    np.save(os.path.join(root, "test_body_arr.npy"),
            rng.integers(0, 255, (n, 16, 16, 3), dtype=np.uint8))
    cat = np.zeros((n, 26), np.float32)
    cat[np.arange(n), rng.integers(0, 26, n)] = 1.0
    np.save(os.path.join(root, "test_cat_arr.npy"), cat)
    np.save(os.path.join(root, "test_cont_arr.npy"),
            rng.uniform(0, 10, (n, 3)).astype(np.float32))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")
    _force_fp32_matmuls()

    results: Dict[str, Dict] = {}
    checked = []

    if args.tiny_fixture:
        import tempfile

        from vlm_clip_tpu.data.tokenizer import HashTokenizer

        hf, params, cfg = _tiny_hf_clip()
        results["clip(tiny-fixture)"] = validate_clip(hf, params, cfg)
        checked.append("clip(tiny-fixture)")
        qhf, qparams, qcfg = _tiny_hf_qwen()
        results["qwen(tiny-fixture)"] = validate_qwen_model(qhf, qparams,
                                                            qcfg)
        checked.append("qwen(tiny-fixture)")
        tok = HashTokenizer(cfg.text.vocab_size)  # hermetic by design
        with tempfile.TemporaryDirectory() as td:
            rafdb = os.path.join(td, "rafdb")
            _fixture_rafdb_tree(rafdb, cfg.vision.image_size)
            results["rafdb-zeroshot(tiny-fixture)"] = zero_shot_rafdb(
                params, cfg, rafdb, tok)
            emotic = os.path.join(td, "emotic")
            _fixture_emotic_npy(emotic, cfg.vision.image_size)
            results["emotic-mAP(tiny-fixture)"] = emotic_map(
                params, cfg, emotic, tok)
    elif args.clip:
        from transformers import CLIPModel

        from vlm_clip_tpu.convert.hf import (clip_config_from_hf,
                                             convert_hf_clip)

        hf = CLIPModel.from_pretrained(args.clip).eval()
        cfg = clip_config_from_hf(hf.config)
        params = convert_hf_clip(hf.state_dict(), cfg)
        results[f"clip({args.clip})"] = validate_clip(hf, params, cfg)
        checked.append(f"clip({args.clip})")
        if args.rafdb or args.emotic_npy:
            from vlm_clip_tpu.cli.common import make_tokenizer

            # real weights: refuse the hash fallback unless explicitly
            # allowed; a local --clip dir supplies vocab.json/merges.txt
            tok = make_tokenizer(
                cfg,
                checkpoint_dir=args.clip if os.path.isdir(args.clip)
                else None,
                require_real=not args.allow_hash_tokenizer)
            if args.rafdb:
                results["rafdb-zeroshot"] = zero_shot_rafdb(
                    params, cfg, args.rafdb, tok)
            if args.emotic_npy:
                results["emotic-mAP"] = emotic_map(params, cfg,
                                                   args.emotic_npy, tok)

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
