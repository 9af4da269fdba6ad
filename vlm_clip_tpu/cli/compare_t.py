"""Pipeline-T entry: zero-shot vs adapter comparison
(reference trung.py:806-860 ``main``).

Builds the zero-shot baseline and the CLIP-Adapter on the same backbone,
trains the adapters, then runs the 2x2 {model} x {avg, all-descriptions}
comparison harness with plots.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Zero-shot vs CLIP-Adapter "
                                            "comparison (pipeline T)")
    p.add_argument("--train-dir", required=True,
                   help="flat root/{emotion}/ train folder")
    p.add_argument("--test-dir", required=True)
    p.add_argument("--clip-model-name", default="vit-large-patch14")
    p.add_argument("--bottleneck-dim", type=int, default=64)
    p.add_argument("--alpha", type=float, default=0.2)
    p.add_argument("--beta", type=float, default=0.2)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-epochs", type=int, default=5)
    p.add_argument("--learning-rate", type=float, default=3e-4)
    p.add_argument("--image-size", type=int, default=None,
                   help="defaults to the model config image size")
    p.add_argument("--no-plots", action="store_true")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--seed", type=int, default=42)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer
    from vlm_clip_tpu.data.rafdb import BatchLoader, FolderDataset
    from vlm_clip_tpu.eval.compare import compare_models
    from vlm_clip_tpu.models.model_t import (CLIPAdapterT,
                                             ZeroShotEmotionRecognition)
    from vlm_clip_tpu.utils.logging import seed_everything, setup_logging

    setup_logging(name="compare_t")
    seed_everything(args.seed)

    clip_params, cfg = load_backbone(args.clip_model_name, seed=args.seed)
    tokenizer = make_tokenizer(cfg)
    image_size = args.image_size or cfg.vision.image_size
    zero_shot = ZeroShotEmotionRecognition(clip_params, cfg, tokenizer)
    adapter = CLIPAdapterT(clip_params, cfg, tokenizer, alpha=args.alpha,
                           beta=args.beta,
                           bottleneck_dim=args.bottleneck_dim,
                           seed=args.seed)

    train_ds = FolderDataset(args.train_dir, image_size=image_size)
    test_ds = FolderDataset(args.test_dir, image_size=image_size)
    train_loader = BatchLoader(train_ds, args.batch_size, shuffle=True,
                               drop_last=True, seed=args.seed)
    test_loader = BatchLoader(test_ds, args.batch_size)

    adapter.train(train_loader, num_epochs=args.num_epochs,
                  learning_rate=args.learning_rate)
    results = compare_models(adapter, zero_shot, test_loader,
                             use_all_descriptions=True,
                             plots=not args.no_plots, out_dir=args.out_dir)
    print(results)


if __name__ == "__main__":
    main()
