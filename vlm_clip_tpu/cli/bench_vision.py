"""Benchmark the Qwen2.5-VL vision tower on the real TPU.

Times the SHIPPED tower path — ``vision_forward`` jitted exactly as
``QwenVLGenerator._run_vision`` wraps it — on random 3B-shape weights
(reference checkpoint dims, reference config.py:9) at the fixed 448²
resolution policy (grid 32×32 → S=1024 patches, 16 uniform windows).

    python -m vlm_clip_tpu.cli.bench_vision --dtype bf16 --batch 1

Used for the BENCH.md "Qwen-3B vision tower" entries.
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/vlm_clip_tpu_jaxcache")


def synth_vision_params(cfg, seed: int = 0, dtype=None):
    """Random vision params matching init_vision's pytree (stacked
    [depth, ...] blocks), sized for the 3B checkpoint."""
    import jax
    import jax.numpy as jnp

    from vlm_clip_tpu.vlm.qwen_model import init_vision

    params = init_vision(jax.random.PRNGKey(seed), cfg)
    if dtype is not None:
        params = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            params)
    return params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dtype", default="fp32", choices=("fp32", "bf16"),
                   help="weight storage dtype (activations always bf16)")
    p.add_argument("--quant", default="none", choices=("none", "int8"),
                   help="weight-only quantized linears (the extractor's "
                        "default is int8)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--size", type=int, default=448)
    p.add_argument("--reps", type=int, default=10, help="timed calls")
    p.add_argument("--path", default="fast", choices=("fast", "masked"),
                   help="fast = batched block-diagonal window attention "
                        "(shipped default for uniform grids); masked = "
                        "dense [S,S] additive-mask attention")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_clip_tpu.vlm.qwen_model import qwen25vl_3b, vision_forward
    from vlm_clip_tpu.vlm.qwen_process import prepare_vision_inputs

    cfg = qwen25vl_3b().vision
    print(f"devices: {jax.devices()}", flush=True)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else None
    params = synth_vision_params(cfg, dtype=dtype)
    if args.quant == "int8":
        from vlm_clip_tpu.vlm.qwen_convert import quantize_qwen_params

        params = quantize_qwen_params({"vision": params}, 8)["vision"]

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (args.size, args.size, 3), np.uint8)
    vin = prepare_vision_inputs(img, cfg, fixed_resolution=args.size)
    S = vin.patches.shape[0]
    print(f"S={S} patches, grid={vin.grid}", flush=True)

    bf16 = jnp.bfloat16
    uw = vin.uniform_window if args.path == "fast" else None
    print(f"uniform_window={uw}", flush=True)

    if args.batch == 1:
        @jax.jit
        def run(vp, patches, rope, wmask, fmask):
            return vision_forward(vp, patches.astype(bf16), rope, wmask,
                                  fmask, cfg, uniform_window=uw)

        pat = jnp.asarray(vin.patches)
    else:
        @jax.jit
        def run(vp, patches, rope, wmask, fmask):
            return jax.vmap(
                lambda pt: vision_forward(vp, pt.astype(bf16), rope,
                                          wmask, fmask, cfg,
                                          uniform_window=uw))(patches)

        pat = jnp.asarray(np.broadcast_to(
            vin.patches, (args.batch,) + vin.patches.shape).copy())

    rope = jnp.asarray(vin.rot_pos_emb)
    if uw is not None:  # fast path never reads the masks
        wmask = fmask = jnp.zeros((1, 1), jnp.float32)
    else:
        wmask = jnp.asarray(vin.window_mask)
        fmask = jnp.asarray(vin.full_mask)

    print("compiling ...", flush=True)
    t0 = time.perf_counter()
    out = run(params, pat, rope, wmask, fmask)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print(f"first call (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    # Chain all reps and sync ONCE: a per-call float() sync pays the
    # ~28 ms axon-tunnel RTT every rep and swamps the ~16 ms device
    # time (BENCH.md "cached single jit call floor").
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run(params, pat, rope, wmask, fmask)
                for _ in range(args.reps)]
        # single-device dispatch is ordered: syncing the last call
        # implies all previous calls completed
        _ = float(jnp.sum(outs[-1].astype(jnp.float32)))
        times.append((time.perf_counter() - t0) / args.reps)
    dt = min(times)
    per_img = dt / args.batch
    print(f"dtype={args.dtype} quant={args.quant} B={args.batch} "
          f"size={args.size} path={args.path}: {dt*1e3:.1f} ms/call -> "
          f"{per_img*1e3:.2f} ms/image, {args.batch/dt:.1f} img/s")


if __name__ == "__main__":
    main()
