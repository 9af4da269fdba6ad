"""Continuous-batching engine vs static batched generation (real TPU).

The reference's serving pattern is a fixed ``generate()`` batch
(model_v.py:108-118): the batch runs until its LAST row finishes, so
under heterogeneous generation lengths every early-finishing row idles.
The engine (vlm/engine.py) refills finished slots immediately. This
bench quantifies that on 3B-shape weights:

- ``--workload uniform``: every request wants the same token budget —
  measures pure engine overhead vs ``generate_batch_from_ids`` (per-row
  masks/scatter writes + one host sync per chunk).
- ``--workload mixed``: budgets drawn uniformly from [lo, hi] — the
  static path must decode every batch to its max budget, the engine
  reclaims each slot the step its request finishes.
- ``--arrivals``: open-loop STREAMING load (Poisson arrivals) instead of
  the queue-everything-at-t0 drain — the regime continuous batching
  exists for. Requests arrive at rate λ req/s; the engine installs each
  into the next free slot (slots partially busy, adaptive chunking vs
  arrival jitter), the static baseline batches whatever has arrived
  when its previous fixed batch finishes (the reference's one
  ``generate()``-at-a-time pattern, model_v.py:108-118). Reports tok/s,
  TTFT p50/p95 and completion-latency p50/p95 per rate. Rates are a
  comma list (``--arrivals 20,35,50``) or ``auto`` = {0.5, 0.75, 0.95}×
  the engine's measured drain saturation.

    python -m vlm_clip_tpu.cli.bench_engine --slots 64 --requests 256
    python -m vlm_clip_tpu.cli.bench_engine --slots 64 --requests 192 \
        --arrivals auto
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/vlm_clip_tpu_jaxcache")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--slots", type=int, default=64)
    p.add_argument("--requests", type=int, default=256)
    p.add_argument("--sync-steps", type=int, default=16)
    p.add_argument("--size", type=int, default=448)
    p.add_argument("--max-len", type=int, default=768)
    p.add_argument("--workload", default="mixed",
                   choices=("mixed", "uniform"))
    p.add_argument("--budget-lo", type=int, default=25)
    p.add_argument("--budget-hi", type=int, default=200)
    p.add_argument("--kv-bits", type=int, default=16, choices=(8, 16))
    p.add_argument("--skip-static", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="per-phase engine attribution (install/steps/"
                        "sync; adds a device sync per phase)")
    p.add_argument("--refill-chunks", default="32,8,1")
    p.add_argument("--no-adaptive", action="store_true",
                   help="fixed sync-steps chunks (disable the "
                        "remaining-budget-driven adaptive chunk length)")
    p.add_argument("--chunk-max", type=int, default=None,
                   help="adaptive chunk-length cap (default "
                        "8*sync-steps)")
    p.add_argument("--no-pipeline", action="store_true",
                   help="disable pipelined chunk dispatch (chunk N "
                        "dispatched before chunk N-1's harvest) for "
                        "the A/B against the synchronous round-3 loop")
    p.add_argument("--arrivals", default=None,
                   help="streaming mode: comma list of Poisson arrival "
                        "rates (req/s) or 'auto' (see module docstring)")
    p.add_argument("--arrival-seed", type=int, default=1)
    p.add_argument("--spec-k", type=int, default=0,
                   help="n-gram speculative decoding: verify K drafts "
                        "per forward (greedy-exact; random synth "
                        "weights measure pure overhead — acceptance "
                        "needs real text statistics)")
    args = p.parse_args(argv)

    import dataclasses

    import numpy as np

    from vlm_clip_tpu.cli.bench_decode import synth_quantized_text_params
    from vlm_clip_tpu.cli.bench_vision import synth_vision_params
    from vlm_clip_tpu.vlm.engine import ContinuousBatchingEngine
    from vlm_clip_tpu.vlm.qwen import QwenVLGenerator
    from vlm_clip_tpu.vlm.qwen_convert import (
        fold_qwen_patch_normalization, quantize_qwen_params)
    from vlm_clip_tpu.vlm.qwen_model import qwen25vl_3b
    from vlm_clip_tpu.vlm.qwen_process import prepare_vision_inputs

    cfg = qwen25vl_3b()
    cfg = dataclasses.replace(cfg, text=dataclasses.replace(
        cfg.text, tie_word_embeddings=False))
    print("synthesizing 3B-shape params (8h4) ...", flush=True)
    text = synth_quantized_text_params(cfg.text, 8, 4, fused=True)
    vision = synth_vision_params(cfg.vision)
    vision = fold_qwen_patch_normalization(vision, cfg.vision)
    vision = quantize_qwen_params({"vision": vision}, 8)["vision"]
    gen = QwenVLGenerator({"text": text, "vision": vision}, cfg,
                          max_len=args.max_len, kv_bits=args.kv_bits)

    rng = np.random.default_rng(0)
    n = args.requests
    imgs = [rng.integers(0, 255, (args.size, args.size, 3), np.uint8)
            for _ in range(n)]
    vins = [prepare_vision_inputs(im, cfg.vision,
                                  fixed_resolution=args.size,
                                  raw_uint8=True) for im in imgs]
    n_vis = vins[0].num_vision_tokens
    ids = np.asarray(
        [11, 22, cfg.vision_start_token_id] + [cfg.image_token_id] * n_vis
        + list(rng.integers(1, 10000, 24)), np.int64)
    if args.workload == "mixed":
        budgets = rng.integers(args.budget_lo, args.budget_hi + 1,
                               n).tolist()
    else:
        budgets = [args.budget_hi] * n
    total_tokens = sum(budgets)
    print(f"{n} requests, prompt {len(ids)} tokens, budgets "
          f"{min(budgets)}..{max(budgets)} (sum {total_tokens})",
          flush=True)

    # --- engine ------------------------------------------------------------
    chunks = tuple(int(c) for c in args.refill_chunks.split(","))

    def engine_run():
        eng = ContinuousBatchingEngine(
            gen, n_slots=args.slots, sync_steps=args.sync_steps,
            refill_chunks=chunks, profile=args.profile,
            spec_k=args.spec_k, pipeline=not args.no_pipeline,
            adaptive=not args.no_adaptive, chunk_max=args.chunk_max)
        t_start = time.perf_counter()
        for v, m in zip(vins, budgets):
            eng.submit(ids, v, max_new_tokens=m)
        out = {}
        finish = {}
        while eng.pending:
            done = eng.poll()
            now = time.perf_counter() - t_start
            for rid in done:
                finish[rid] = now
            out.update(done)
        engine_run.latencies = sorted(finish.values())
        if args.profile:
            st = eng.stats
            print(f"  install {st['install_s']:.2f}s "
                  f"({st['installs']} prefills, "
                  f"{st['install_s'] / max(st['installs'], 1) * 1e3:.0f} "
                  f"ms/img)  steps {st['steps_s']:.2f}s "
                  f"({st['steps']} steps, "
                  f"{st['steps_s'] / max(st['steps'], 1) * 1e3:.1f} "
                  f"ms/step)  sync {st['sync_s']:.2f}s", flush=True)
        return out

    print("engine: compiling ...", flush=True)
    t0 = time.perf_counter()
    res = engine_run()
    print(f"engine first run (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    res = engine_run()
    dt_e = time.perf_counter() - t0
    got_tokens = sum(len(v) for v in res.values())
    lat = engine_run.latencies
    print(f"engine: {dt_e:.2f} s, {got_tokens} tokens -> "
          f"{got_tokens / dt_e:.0f} tok/s, "
          f"{n / dt_e * 3600:.0f} requests/hour; request latency "
          f"p50 {lat[len(lat) // 2]:.1f}s "
          f"p95 {lat[int(len(lat) * 0.95)]:.1f}s (queue-at-t0 model)",
          flush=True)

    if args.skip_static and not args.arrivals:
        return

    # --- static batches ------------------------------------------------------
    # a static server batches `slots` requests and decodes each batch to
    # its own max budget (per-batch max_new compiles are shape-identical:
    # max_new is a while_loop bound, but it IS a static arg — use the
    # batch's max)
    def static_run():
        out = []
        lats = []
        t_start = time.perf_counter()
        for off in range(0, n, args.slots):
            bvins = vins[off:off + args.slots]
            cap = max(budgets[off:off + args.slots])
            toks = gen.generate_batch_from_ids(
                ids, bvins, max_new_tokens=cap,
                prefill_chunk=32 if len(bvins) > 32 else None)
            out.extend(t[:b] for t, b in
                       zip(toks, budgets[off:off + args.slots]))
            # every request in the batch finishes when the batch does
            lats.extend([time.perf_counter() - t_start] * len(bvins))
        static_run.latencies = sorted(lats)
        return out

    if not args.skip_static:
        print("static: compiling ...", flush=True)
        t0 = time.perf_counter()
        out = static_run()
        print(f"static first run (compile): {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        out = static_run()
        dt_s = time.perf_counter() - t0
        s_tokens = sum(len(t) for t in out)
        slat = static_run.latencies
        print(f"static request latency p50 {slat[len(slat) // 2]:.1f}s "
              f"p95 {slat[int(len(slat) * 0.95)]:.1f}s (queue-at-t0 model)",
              flush=True)
        print(f"static: {dt_s:.2f} s, {s_tokens} tokens -> "
              f"{s_tokens / dt_s:.0f} tok/s, "
              f"{n / dt_s * 3600:.0f} requests/hour", flush=True)
        print(f"engine speedup: {dt_s / dt_e:.2f}x", flush=True)

    if not args.arrivals:
        return

    # --- streaming (Poisson) arrivals --------------------------------------
    # Open-loop load at rate λ: the schedule is fixed up front (exponential
    # inter-arrivals) and shared by engine and static so both serve the
    # SAME trace. Engine TTFT = arrival -> first harvested token
    # (engine.progress(); resolution = one decode chunk). The static
    # baseline is the reference's fixed-batch pattern: one generate() at a
    # time over whatever has arrived (padded to a full `slots` batch for
    # one compiled shape), so a request's first token is only observable
    # at batch completion — TTFT == completion by construction, which IS
    # the point being measured.
    sat = n / dt_e  # engine drain saturation (req/s) — compiles are warm
    rates = ([sat * f for f in (0.5, 0.75, 0.95)]
             if args.arrivals == "auto"
             else [float(r) for r in args.arrivals.split(",")])

    def pctl(xs, q):
        return xs[min(len(xs) - 1, int(len(xs) * q))]

    def engine_stream(arrivals):
        eng = ContinuousBatchingEngine(
            gen, n_slots=args.slots, sync_steps=args.sync_steps,
            refill_chunks=chunks, spec_k=args.spec_k,
            pipeline=not args.no_pipeline, adaptive=not args.no_adaptive,
            chunk_max=args.chunk_max)
        rid2i, ttft, comp = {}, {}, {}
        tokens = 0
        nxt = 0
        t0 = time.perf_counter()
        while len(comp) < n:
            now = time.perf_counter() - t0
            while nxt < n and arrivals[nxt] <= now:
                rid = eng.submit(ids, vins[nxt],
                                 max_new_tokens=budgets[nxt])
                rid2i[rid] = nxt
                nxt += 1
            if not eng.pending:
                time.sleep(max(0.0, arrivals[nxt]
                               - (time.perf_counter() - t0)))
                continue
            fin = eng.poll()
            now = time.perf_counter() - t0
            for rid, cnt in eng.progress().items():
                if cnt and rid not in ttft:
                    ttft[rid] = now - arrivals[rid2i[rid]]
            for rid, toks in fin.items():
                comp[rid] = now - arrivals[rid2i[rid]]
                ttft.setdefault(rid, comp[rid])
                tokens += len(toks)
        mk = time.perf_counter() - t0
        return mk, tokens, sorted(ttft.values()), sorted(comp.values())

    def static_stream(arrivals):
        backlog, comp = [], {}
        tokens = 0
        nxt = 0
        t0 = time.perf_counter()
        while len(comp) < n:
            now = time.perf_counter() - t0
            while nxt < n and arrivals[nxt] <= now:
                backlog.append(nxt)
                nxt += 1
            if not backlog:
                time.sleep(max(0.0, arrivals[nxt]
                               - (time.perf_counter() - t0)))
                continue
            batch = backlog[:args.slots]
            del backlog[:len(batch)]
            pad = batch + [batch[-1]] * (args.slots - len(batch))
            cap = max(budgets[j] for j in batch)
            toks = gen.generate_batch_from_ids(
                ids, [vins[j] for j in pad], max_new_tokens=cap,
                prefill_chunk=32 if len(pad) > 32 else None)
            now = time.perf_counter() - t0
            for row, j in zip(toks[:len(batch)], batch):
                tokens += len(row[:budgets[j]])
                comp[j] = now - arrivals[j]
        mk = time.perf_counter() - t0
        return mk, tokens, sorted(comp.values())

    arr_rng = np.random.default_rng(args.arrival_seed)
    print(f"\nstreaming arrivals (Poisson, seed {args.arrival_seed}); "
          f"engine drain saturation {sat:.1f} req/s", flush=True)
    for rate in rates:
        arrivals = np.cumsum(arr_rng.exponential(1.0 / rate, n))
        mk, tok, tf, cp = engine_stream(arrivals)
        print(f"  engine λ={rate:5.1f}/s: makespan {mk:6.1f}s "
              f"{tok / mk:6.0f} tok/s  TTFT p50 {pctl(tf, .5):6.2f}s "
              f"p95 {pctl(tf, .95):6.2f}s  completion "
              f"p50 {pctl(cp, .5):6.2f}s p95 {pctl(cp, .95):6.2f}s",
              flush=True)
        if not args.skip_static:
            mk, tok, cp = static_stream(arrivals)
            print(f"  static λ={rate:5.1f}/s: makespan {mk:6.1f}s "
                  f"{tok / mk:6.0f} tok/s  TTFT == completion "
                  f"p50 {pctl(cp, .5):6.2f}s p95 {pctl(cp, .95):6.2f}s",
                  flush=True)


if __name__ == "__main__":
    main()
