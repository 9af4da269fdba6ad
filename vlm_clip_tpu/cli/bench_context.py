"""End-to-end VLM context extraction bench on the real TPU.

Times the full public path the V pipeline pays per image — host
preprocessing → vision tower → prefill → 200-token decode — via
``QwenVLGenerator.generate_from_ids`` / ``generate_batch_from_ids`` on
random 3B-shape weights (the reference's checkpoint dims). This is the
number the reference's per-image 4-bit GPU generation ("several
seconds", reference model_v.py:108-118, rerun EVERY epoch) compares
against; ours runs once and is replayed from the context cache.

    python -m vlm_clip_tpu.cli.bench_context --bits mixed --batch 8
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/vlm_clip_tpu_jaxcache")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bits", default="8h4",
                   choices=("4", "8", "8h4", "mixed"))
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--new", type=int, default=200,
                   help="tokens to decode (reference max_new_tokens=200)")
    p.add_argument("--size", type=int, default=448)
    p.add_argument("--max-len", type=int, default=1536,
                   help="KV-cache rows; the 448px/200-token context path "
                        "needs 483 — 512 lets B=64 fit in HBM (B=64 at "
                        "1536 OOMs: 16.4 of 15.75 GB)")
    p.add_argument("--u8", action="store_true",
                   help="raw uint8 patches + normalization-folded patch "
                        "embed (the extractor's default; 4x smaller "
                        "host->device patch upload)")
    p.add_argument("--prefill-chunk", type=int, default=None,
                   help="run vision+prefill in sub-batches of this size "
                        "feeding one full-batch decode loop — caps the "
                        "activation memory that OOMs B=128 (~19 GB)")
    p.add_argument("--kv-bits", type=int, default=16, choices=(8, 16),
                   help="8 = int8 KV cache (halves decode cache reads)")
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_clip_tpu.cli.bench_decode import synth_quantized_text_params
    from vlm_clip_tpu.cli.bench_vision import synth_vision_params
    from vlm_clip_tpu.vlm.qwen import QwenVLGenerator
    from vlm_clip_tpu.vlm.qwen_convert import (
        fold_qwen_patch_normalization, quantize_qwen_params)
    from vlm_clip_tpu.vlm.qwen_model import qwen25vl_3b
    from vlm_clip_tpu.vlm.qwen_process import prepare_vision_inputs

    bits = args.bits if args.bits in ("mixed", "8h4") else int(args.bits)
    head_bits = 4 if bits in ("mixed", "8h4") else 0
    if bits == "8h4":  # int8 layers + int4 untied head (speed pick)
        bits = 8
    cfg = qwen25vl_3b()
    if head_bits:
        cfg = dataclasses.replace(cfg, text=dataclasses.replace(
            cfg.text, tie_word_embeddings=False))
    print(f"synthesizing 3B-shape params (bits={bits}) ...", flush=True)
    text = synth_quantized_text_params(cfg.text, bits, head_bits,
                                       fused=True)  # extractor layout
    vision = synth_vision_params(cfg.vision)
    if args.u8:
        vision = fold_qwen_patch_normalization(vision, cfg.vision)
    vision = quantize_qwen_params({"vision": vision}, 8)["vision"]
    gen = QwenVLGenerator({"text": text, "vision": vision}, cfg,
                          max_len=args.max_len, kv_bits=args.kv_bits)

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (args.size, args.size, 3), np.uint8)
            for _ in range(args.batch)]
    vins = [prepare_vision_inputs(im, cfg.vision,
                                  fixed_resolution=args.size,
                                  raw_uint8=args.u8)
            for im in imgs]
    n_vis = vins[0].num_vision_tokens
    ids = np.asarray(
        [11, 22, cfg.vision_start_token_id] + [cfg.image_token_id] * n_vis
        + list(rng.integers(1, 10000, 24)), np.int64)
    print(f"prompt {len(ids)} tokens ({n_vis} vision) + {args.new} new",
          flush=True)

    def run():
        if args.batch == 1:
            return gen.generate_from_ids(ids, vins[0],
                                         max_new_tokens=args.new)
        return gen.generate_batch_from_ids(
            ids, vins, max_new_tokens=args.new,
            prefill_chunk=args.prefill_chunk)

    print("compiling (vision + prefill + decode loop) ...", flush=True)
    t0 = time.perf_counter()
    out = run()
    print(f"first call (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run()
        times.append(time.perf_counter() - t0)
    n_tok = (len(out) if args.batch == 1
             else sum(len(o) for o in out) / len(out))
    dt = min(times)
    per_img = dt / args.batch
    print(f"bits={bits} B={args.batch} u8={args.u8} "
          f"kv={args.kv_bits}: {dt:.2f} s/call -> "
          f"{per_img:.2f} s/image ({n_tok:.0f} tokens), "
          f"{3600/per_img:.0f} contexts/hour/chip")


if __name__ == "__main__":
    main()
