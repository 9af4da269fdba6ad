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
    p.add_argument("--chunk", type=int, default=64,
                   help="decode + extract batch size")
    p.add_argument("--no-native", action="store_true",
                   help="per-image PIL decode instead of the threaded "
                        "C++ batch decoder")
    args = p.parse_args(argv)

    from pathlib import Path

    from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer
    from vlm_clip_tpu.cli.main_v import make_extractor
    from vlm_clip_tpu.core.config import EMOTIONS
    from vlm_clip_tpu.data import native_loader
    from vlm_clip_tpu.data.preprocess import load_and_resize
    from vlm_clip_tpu.data.rafdb import scan_class_folders

    clip_params, cfg = load_backbone(args.clip_model_name)
    tokenizer = make_tokenizer(cfg)
    extractor = make_extractor(args.vlm_backend, clip_params, cfg,
                               tokenizer, qwen_weights=args.qwen_weights)

    samples = scan_class_folders(Path(args.data_dir))
    use_native = not args.no_native and native_loader.native_available()
    n_ok = 0
    with open(args.out, "w") as f:
        # chunked: one threaded C++ decode + one batched extraction per
        # chunk (the qwen backend's extract_contexts_batch is the
        # measured 55.2k contexts/hour chunked-prefill path; per-image
        # PIL + per-image extract was ~20x slower end-to-end)
        for off in range(0, len(samples), args.chunk):
            group = samples[off:off + args.chunk]
            imgs = [None] * len(group)
            if use_native:
                batch, ok = native_loader.load_batch_native(
                    [p for p, _ in group], args.image_size)
                for j, good in enumerate(ok):
                    if good:
                        imgs[j] = batch[j]
            else:
                for j, (path, _) in enumerate(group):
                    try:
                        imgs[j] = load_and_resize(path, args.image_size)
                    except Exception:
                        imgs[j] = None
            valid = [j for j, im in enumerate(imgs) if im is not None]
            caps = [None] * len(group)
            if valid:
                try:
                    got = extractor.extract_contexts_batch(
                        [imgs[j] for j in valid]) \
                        if hasattr(extractor, "extract_contexts_batch") \
                        else [extractor.extract_context_from_image(
                            imgs[j]) for j in valid]
                    for j, c in zip(valid, got):
                        caps[j] = c
                except Exception:
                    pass  # None-on-error contract (reference utils.py)
            for (path, label), caption in zip(group, caps):
                f.write(json.dumps({"path": path,
                                    "emotion": EMOTIONS[label],
                                    "caption": caption}) + "\n")
                n_ok += caption is not None
            done = off + len(group)
            if done % 256 < args.chunk:
                print(f"  {done}/{len(samples)} labeled", flush=True)
    print(f"wrote {len(samples)} records ({n_ok} with captions) "
          f"-> {args.out}")


if __name__ == "__main__":
    main()
