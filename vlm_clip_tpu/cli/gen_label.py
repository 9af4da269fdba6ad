"""LLM-augmented label generator.

The reference README advertises ``gen_label/label_generator.py``
(README.md:14-27) which does not exist in its checkout (SURVEY.md scope
note); BASELINE.json config 5 requires "adapter fine-tune with
LLM-augmented labels". This CLI realizes it: for every image in a
folder-per-class tree, generate a VLM description and write a jsonl of
``{path, emotion, caption}`` records usable as contrastive captions
(pipeline M) or cached contexts (pipeline V).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="Generate LLM-augmented "
                                            "labels/captions per image")
    p.add_argument("--data-dir", required=True,
                   help="root/{emotion}/ image tree")
    p.add_argument("--out", required=True, help="output jsonl path")
    p.add_argument("--clip-model-name", default="vit-large-patch14")
    p.add_argument("--vlm-backend", default="stub",
                   choices=["stub", "qwen"])
    p.add_argument("--qwen-weights", default=None)
    p.add_argument("--image-size", type=int, default=448)
    args = p.parse_args(argv)

    from pathlib import Path

    from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer
    from vlm_clip_tpu.cli.main_v import make_extractor
    from vlm_clip_tpu.core.config import EMOTIONS
    from vlm_clip_tpu.data.preprocess import load_and_resize
    from vlm_clip_tpu.data.rafdb import scan_class_folders

    clip_params, cfg = load_backbone(args.clip_model_name)
    tokenizer = make_tokenizer(cfg)
    extractor = make_extractor(args.vlm_backend, clip_params, cfg,
                               tokenizer, qwen_weights=args.qwen_weights)

    samples = scan_class_folders(Path(args.data_dir))
    n_ok = 0
    with open(args.out, "w") as f:
        for i, (path, label) in enumerate(samples):
            try:
                img = load_and_resize(path, args.image_size)
                caption = extractor.extract_context_from_image(img)
            except Exception:
                caption = None
            rec = {"path": path, "emotion": EMOTIONS[label],
                   "caption": caption}
            f.write(json.dumps(rec) + "\n")
            n_ok += caption is not None
            if (i + 1) % 100 == 0:
                print(f"  {i + 1}/{len(samples)} labeled")
    print(f"wrote {len(samples)} records ({n_ok} with captions) "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
