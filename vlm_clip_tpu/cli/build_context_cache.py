"""Offline VLM context-cache builder.

Removes the reference's dominant hot-path cost (the per-image per-epoch
Qwen decode inside the dataloader, SURVEY.md §3.1): run once ahead of
training, then train with ``--vlm-backend=cache``.

Writes <out>/contexts.json (key -> description | null) and
<out>/features.npz (key -> [P] normalized CLIP text features), keyed by
image path hash (CachedContextExtractor.key_for).
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Precompute VLM context "
                                            "descriptions + CLIP features")
    p.add_argument("--data-dir", required=True,
                   help="root/{emotion}/ image tree")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--clip-model-name", default="vit-large-patch14")
    p.add_argument("--vlm-backend", default="stub",
                   choices=["stub", "qwen"])
    p.add_argument("--qwen-weights", default=None,
                   help="dir with Qwen2.5-VL safetensors + tokenizer.json "
                        "for --vlm-backend=qwen")
    p.add_argument("--qwen-quant-bits", default="mixed",
                   choices=["0", "4", "8", "mixed"])
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--batch-size", type=int, default=8,
                   help="images per batched VLM decode (qwen backend: "
                        "B=8 measured ~3x the per-image rate)")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    import numpy as np

    from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer
    from vlm_clip_tpu.cli.main_v import make_extractor
    from vlm_clip_tpu.data.preprocess import load_and_resize
    from vlm_clip_tpu.data.rafdb import scan_class_folders
    from vlm_clip_tpu.vlm.extractor import CachedContextExtractor

    from pathlib import Path

    clip_params, cfg = load_backbone(args.clip_model_name, seed=args.seed)
    tokenizer = make_tokenizer(cfg)
    extractor = make_extractor(args.vlm_backend, clip_params, cfg,
                               tokenizer, qwen_weights=args.qwen_weights,
                               qwen_quant_bits=args.qwen_quant_bits)

    samples = scan_class_folders(Path(args.data_dir))
    texts, feats = {}, {}
    n_fail = 0
    batched = hasattr(extractor, "extract_contexts_batch") \
        and args.batch_size > 1

    def record(key, desc):
        nonlocal n_fail
        texts[key] = desc
        f = extractor.encode_context_descriptions(desc)
        if f is not None:
            feats[key] = np.asarray(f, np.float32).reshape(-1)
        else:
            n_fail += 1

    pending = []  # (key, img) awaiting a batched decode
    for i, (path, _label) in enumerate(samples):
        key = CachedContextExtractor.key_for(path)
        try:
            img = load_and_resize(path, args.image_size)
        except Exception:
            texts[key] = None
            n_fail += 1
            continue
        if batched:
            pending.append((key, img))
            if len(pending) == args.batch_size:
                descs = extractor.extract_contexts_batch(
                    [im for _, im in pending])
                for (k, _), d in zip(pending, descs):
                    record(k, d)
                pending = []
        else:
            record(key, extractor.extract_context_from_image(img))
        if (i + 1) % 100 == 0:
            print(f"  {i + 1}/{len(samples)} contexts built")
    for k, im in pending:  # ragged tail: per-image path
        record(k, extractor.extract_context_from_image(im))

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "contexts.json"), "w") as f:
        json.dump(texts, f)
    np.savez(os.path.join(args.out_dir, "features.npz"), **feats)
    print(f"cached {len(feats)} contexts ({n_fail} failures) "
          f"-> {args.out_dir}")


if __name__ == "__main__":
    main()
