"""Worked example (reference example.py:8-112): param-count report,
short adapter training, best-checkpoint reload, and a text<->image
cosine-retrieval demo.

The reference's version calls a ``create_dataloaders(image_paths=...,
captions=...)`` signature that exists nowhere in its repo
(example.py:48-54, SURVEY.md §5 behavioral quirk); here the demo runs on
the standard RAF-DB split loaders.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data-root", required=True)
    p.add_argument("--clip-model-name", default="vit-base-patch32")
    p.add_argument("--num-epochs", type=int, default=2)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--output-dir", default="./example_checkpoints")
    args = p.parse_args(argv)

    import numpy as np

    import jax.numpy as jnp

    from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer
    from vlm_clip_tpu.core.config import AdapterConfig
    from vlm_clip_tpu.core.dtypes import BF16
    from vlm_clip_tpu.data.captions import all_descriptions_flat
    from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
    from vlm_clip_tpu.data.rafdb import create_dataloaders
    from vlm_clip_tpu.models import layers as L
    from vlm_clip_tpu.models import model_m as M
    from vlm_clip_tpu.train.trainer_m import CLIPAdapterTrainer

    clip_params, cfg = load_backbone(args.clip_model_name)
    tokenizer = make_tokenizer(cfg)
    acfg = AdapterConfig()

    # parameter-count report (example.py:31-35)
    import jax

    n_clip = sum(int(np.prod(x.shape))
                 for x in jax.tree.leaves(clip_params))
    adapters = M.init_m_adapters(jax.random.PRNGKey(0), cfg, acfg)
    n_adapt = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(adapters))
    print(f"Frozen CLIP parameters:     {n_clip:,}")
    print(f"Trainable adapter params:   {n_adapt:,} "
          f"({100.0 * n_adapt / (n_clip + n_adapt):.2f}%)")

    loaders = create_dataloaders(args.data_root, tokenizer,
                                 batch_size=args.batch_size,
                                 image_size=cfg.vision.image_size)
    trainer = CLIPAdapterTrainer(
        clip_params, cfg, acfg, loaders["train"],
        val_dataloader=loaders.get("val"), output_dir=args.output_dir,
        num_epochs_hint=args.num_epochs)
    trainer.train(args.num_epochs)

    best = os.path.join(args.output_dir, "best_adapter")
    if os.path.exists(best):
        trainer.load_model(best)
        print(f"reloaded best checkpoint from {best}")

    # retrieval demo (example.py:80-109): rank captions for test images
    captions = all_descriptions_flat()
    ids, mask = tokenizer(captions)
    txt = M.m_get_text_features(trainer.state.clip_params,
                               trainer.state.adapter_params,
                               jnp.asarray(ids), jnp.asarray(mask), cfg,
                               acfg, BF16)
    txt = L.l2_normalize(txt).astype(jnp.float32)
    batch = next(iter(loaders["test"]))
    px = normalize_batch_tpu(jnp.asarray(batch.images[:4]))
    img = M.m_get_image_features(trainer.state.clip_params,
                                 trainer.state.adapter_params, px, cfg,
                                 acfg, BF16)
    img = L.l2_normalize(img).astype(jnp.float32)
    sims = np.asarray(img @ txt.T)
    for i in range(sims.shape[0]):
        top = np.argsort(-sims[i])[:3]
        print(f"\nimage {i} (true: "
              f"{batch.paths[i] if batch.paths else '?'}):")
        for r, j in enumerate(top):
            print(f"  {r + 1}. [{sims[i, j]:.3f}] {captions[j]}")


if __name__ == "__main__":
    main()
