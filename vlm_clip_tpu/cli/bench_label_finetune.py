"""BASELINE config 5: ViT-L/14@336 adapter fine-tune with LLM-augmented
labels, driven end-to-end as one flow.

The reference README advertises the flow (gen_label -> adapter
fine-tune, README.md:14-27) but ships no runner for it; BASELINE.json
config 5 defines it as a benchmark. This CLI drives the whole thing:

1. a RAF-DB-shaped folder tree (synthetic JPEGs at source resolution,
   or ``--data-root`` for a real one);
2. ``cli/gen_label.py`` over the train split -> {path, emotion,
   caption} jsonl (the LLM-augmented labels; ``--vlm-backend qwen``
   with real weights, stub otherwise — caption TEXT does not affect
   train throughput, every caption tokenizes to the same padded 77);
3. decoded-uint8 pixel-cache build at 336 (data/pixel_cache.py — the
   deployment data path: epochs read mmap, host cores decode once);
4. pipeline-M adapter fine-tune (frozen ViT-L/14@336 towers fwd in the
   FAST policy + adapter bwd + Adam) with the jsonl captions routed in
   via ``RAFDBDataset(captions_jsonl=...)``.

Reports label-generation rate, cache-build rate and train pairs/s/chip
(first epoch = compile, later epochs timed).

    python -m vlm_clip_tpu.cli.bench_label_finetune --per-class 48
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/vlm_clip_tpu_jaxcache")


def synth_tree(root: str, per_class: int, res: int, val_per_class: int = 4
               ) -> int:
    """RAF-DB-shaped train/val tree of synthetic JPEGs; returns #train."""
    import numpy as np
    from PIL import Image

    from vlm_clip_tpu.core.config import EMOTIONS

    rng = np.random.default_rng(0)
    n = 0
    for split, k in (("train", per_class), ("val", val_per_class)):
        for emo in EMOTIONS:
            d = os.path.join(root, split, emo)
            os.makedirs(d, exist_ok=True)
            for i in range(k):
                # smooth random field: JPEG-compressible, non-trivial
                x = rng.integers(0, 255, (res // 8, res // 8, 3),
                                 dtype=np.uint8)
                img = Image.fromarray(x).resize((res, res))
                img.save(os.path.join(d, f"{i:04d}.jpg"), quality=90)
                n += split == "train"
    return n


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-root", default=None,
                   help="existing RAF-DB-shaped root (train/val splits); "
                        "default: synthesize one")
    p.add_argument("--per-class", type=int, default=48)
    p.add_argument("--source-res", type=int, default=448,
                   help="synthetic JPEG resolution (decode work)")
    p.add_argument("--model", default="vit-large-patch14-336")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--vlm-backend", default="stub",
                   choices=("stub", "qwen"))
    p.add_argument("--qwen-weights", default=None)
    p.add_argument("--tmpdir", default="/tmp/bench_config5")
    args = p.parse_args(argv)

    from vlm_clip_tpu.cli import gen_label
    from vlm_clip_tpu.cli.common import load_backbone, make_tokenizer
    from vlm_clip_tpu.core.config import AdapterConfig
    from vlm_clip_tpu.core.dtypes import FAST
    from vlm_clip_tpu.data.pixel_cache import PixelCache
    from vlm_clip_tpu.data.rafdb import BatchLoader, RAFDBDataset
    from vlm_clip_tpu.train.trainer_m import CLIPAdapterTrainer

    root = args.data_root
    if root is None:
        root = os.path.join(args.tmpdir, "rafdb")
        t0 = time.perf_counter()
        n = synth_tree(root, args.per_class, args.source_res)
        print(f"synth tree: {n} train JPEGs @ {args.source_res}px "
              f"({time.perf_counter() - t0:.1f}s) -> {root}", flush=True)

    # --- 1. LLM-augmented labels (the gen_label CLI itself) ---------------
    jsonl = os.path.join(args.tmpdir, "labels.jsonl")
    t0 = time.perf_counter()
    gl_args = ["--data-dir", os.path.join(root, "train"), "--out", jsonl,
               "--vlm-backend", args.vlm_backend,
               "--clip-model-name", args.model]
    if args.qwen_weights:
        gl_args += ["--qwen-weights", args.qwen_weights]
    gen_label.main(gl_args)
    dt = time.perf_counter() - t0
    n_lab = sum(1 for _ in open(jsonl))
    print(f"gen_label ({args.vlm_backend}): {n_lab} labels in {dt:.1f}s "
          f"-> {n_lab / dt:.1f} labels/s", flush=True)

    # --- 2. backbone + datasets + pixel cache ------------------------------
    clip_params, cfg = load_backbone(args.model)
    size = cfg.vision.image_size
    tokenizer = make_tokenizer(cfg)
    train_ds = RAFDBDataset(root, "train", tokenizer, image_size=size,
                            captions_jsonl=jsonl)
    assert train_ds.captions, "no captions loaded from the jsonl"
    t0 = time.perf_counter()
    cache = PixelCache.for_dataset(
        train_ds, os.path.join(args.tmpdir, f"pixcache{size}"))
    dt = time.perf_counter() - t0
    print(f"pixel cache @ {size}px: {len(train_ds)} images in {dt:.1f}s "
          f"-> {len(train_ds) / dt:.0f} img/s "
          f"({cache.pixels.nbytes / 1e6:.0f} MB mmap)", flush=True)
    loader = BatchLoader(train_ds, args.batch, shuffle=True,
                         drop_last=True)

    # --- 3. adapter fine-tune ---------------------------------------------
    acfg = AdapterConfig(text_adapter_size=256, vision_adapter_size=256,
                         shared_adapter_layers=2)
    trainer = CLIPAdapterTrainer(
        clip_params, cfg, acfg, loader, val_dataloader=None,
        warmup_steps=10, output_dir=os.path.join(args.tmpdir, "ckpt"),
        num_epochs_hint=args.epochs, freeze_clip=True, policy=FAST,
        device_prefetch=2)
    hist = trainer.train(args.epochs, save_every=10 ** 6,
                         eval_every=10 ** 6)
    steps = len(loader)
    pairs = steps * args.batch
    for h in hist:
        print(f"  epoch {h['epoch']}: {h['seconds']:.1f}s "
              f"({pairs / h['seconds']:.1f} pairs/s)"
              + ("  <- includes compile" if h["epoch"] == 1 else ""),
              flush=True)
    best = pairs / min(h["seconds"] for h in hist[1:] or hist)
    print(f"config 5 (ViT-L/14@{size} adapter fine-tune, LLM-augmented "
          f"labels, B={args.batch}): {best:.1f} pairs/s/chip e2e",
          flush=True)

    # --- device-resident step rate ----------------------------------------
    # The epochs above pay per-step H2D (uint8 batch upload) which in
    # this dev environment rides the ~33 MB/s axon tunnel; on-host TPU
    # DMA never binds. Time the donated jit step on a resident batch to
    # pin the chip's own rate (comparable to the full-finetune entry in
    # BENCH.md "Large-model capability checks").
    import time as _t

    import jax

    from vlm_clip_tpu.train.trainer_m import _device_batch

    db = _device_batch(next(iter(loader)))
    db = {k: jax.device_put(v) for k, v in db.items()}
    state = trainer.state
    state, m = trainer._step(state, db)
    float(m.loss)  # sync (block_until_ready is a no-op via axon)
    n_steps = 20
    t0 = _t.perf_counter()
    for _ in range(n_steps):
        state, m = trainer._step(state, db)
    float(m.loss)
    dt = _t.perf_counter() - t0
    print(f"device-resident step: {dt / n_steps * 1e3:.0f} ms -> "
          f"{n_steps * args.batch / dt:.1f} pairs/s/chip "
          f"(H2D excluded)", flush=True)


if __name__ == "__main__":
    main()
