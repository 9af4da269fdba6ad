"""Pipeline-M training entry (reference train.py:11-97, with its broken
``from dataset import ...`` fixed — SURVEY.md §1-L2).

Defaults mirror the reference config dict (train.py:13-36): ViT-B/32,
adapter sizes 256/256, 2 shared layers, bs=32, 10 epochs, lr=5e-5,
wd=0.01, warmup=100, clip=1.0.
"""

from __future__ import annotations

import argparse
import logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Contrastive CLIP-adapter "
                                            "fine-tuning (pipeline M)")
    p.add_argument("--data-root", required=True,
                   help="RAF-DB root with train/val/test split dirs")
    p.add_argument("--clip-model-name", default="vit-base-patch32")
    p.add_argument("--text-adapter-size", type=int, default=256)
    p.add_argument("--vision-adapter-size", type=int, default=256)
    p.add_argument("--shared-adapter-layers", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--num-epochs", type=int, default=10)
    p.add_argument("--learning-rate", type=float, default=5e-5)
    p.add_argument("--weight-decay", type=float, default=0.01)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--max-grad-norm", type=float, default=1.0)
    p.add_argument("--output-dir", default="./clip_adapter_checkpoints")
    p.add_argument("--save-every", type=int, default=1)
    p.add_argument("--eval-every", type=int, default=1)
    p.add_argument("--full-finetune", action="store_true",
                   help="unfreeze the CLIP backbone (model_m.py:72-75)")
    p.add_argument("--schedule", default="linear",
                   choices=["constant", "linear", "cosine"],
                   help="cosine + --full-finetune = the AdamW+cosine "
                        "full fine-tune recipe")
    p.add_argument("--image-size", type=int, default=None,
                   help="defaults to the model config image size")
    p.add_argument("--captions", default=None,
                   help="cli/gen_label.py jsonl of LLM-augmented captions "
                        "({path, emotion, caption}); images present in it "
                        "train against their generated caption instead of "
                        "a prompt-bank draw (BASELINE config 5)")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--zero1", action="store_true",
                   help="shard the Adam moments over all devices "
                        "(ZeRO-1; pairs with --full-finetune, where the "
                        "moments are 2x the tower params)")
    return p


def _zero1_mesh(args):
    """Data-axis mesh over every visible device for --zero1."""
    if not args.zero1:
        return None
    import jax

    from vlm_clip_tpu.parallel.mesh import MeshConfig, create_mesh

    return create_mesh(MeshConfig(data=len(jax.devices()), model=1),
                       jax.devices())


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer
    from vlm_clip_tpu.core.config import AdapterConfig
    from vlm_clip_tpu.data.rafdb import create_dataloaders
    from vlm_clip_tpu.train.trainer_m import CLIPAdapterTrainer
    from vlm_clip_tpu.utils.logging import seed_everything, setup_logging

    from vlm_clip_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()  # multi-host: must precede first backend use
    setup_logging(name="train_m")
    seed_everything(args.seed)
    log = logging.getLogger(__name__)

    clip_params, cfg = load_backbone(args.clip_model_name, seed=args.seed)
    tokenizer = make_tokenizer(cfg)
    image_size = args.image_size or cfg.vision.image_size
    acfg = AdapterConfig(text_adapter_size=args.text_adapter_size,
                         vision_adapter_size=args.vision_adapter_size,
                         shared_adapter_layers=args.shared_adapter_layers)
    loaders = create_dataloaders(args.data_root, tokenizer,
                                 batch_size=args.batch_size,
                                 image_size=image_size,
                                 captions_jsonl=args.captions)
    trainer = CLIPAdapterTrainer(
        clip_params, cfg, acfg, loaders["train"],
        val_dataloader=loaders.get("val"),
        learning_rate=args.learning_rate, weight_decay=args.weight_decay,
        warmup_steps=args.warmup_steps, max_grad_norm=args.max_grad_norm,
        output_dir=args.output_dir, num_epochs_hint=args.num_epochs,
        freeze_clip=not args.full_finetune, schedule=args.schedule,
        seed=args.seed, zero1_mesh=_zero1_mesh(args))
    history = trainer.train(args.num_epochs, save_every=args.save_every,
                            eval_every=args.eval_every)
    log.info("training history: %s", history)

    # final test-split contrastive loss (train.py:85-92)
    trainer.val_dataloader = loaders["test"]
    log.info("test loss: %.4f", trainer.evaluate())


if __name__ == "__main__":
    main()
