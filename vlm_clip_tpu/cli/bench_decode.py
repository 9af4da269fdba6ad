"""Benchmark Qwen-3B-shape quantized decode on the real TPU.

Times the SHIPPED decode path — ``QwenVLGenerator``'s jitted
``lax.while_loop`` (one host sync per generation) — on a random-weight
model with the exact Qwen2.5-VL-3B text dims (the reference's checkpoint,
reference config.py:9). Weights are synthesized directly in quantized
form (packed uint8 / int8 + scales) so the harness never materializes
the 12 GB fp32 model on the host.

    python -m vlm_clip_tpu.cli.bench_decode --bits 4 --batch 1 --new 64

Prints per-token latency and aggregate tok/s. Used for the BENCH.md
"Qwen-3B int8/int4 decode" entries.
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/vlm_clip_tpu_jaxcache")


def synth_quantized_text_params(cfg, bits: int, head_bits: int = 0,
                                seed: int = 0, fused: bool = False):
    """Random 3B-shape text params with quantized linears.

    Matches the pytree layout of vlm/qwen_convert.quantize_qwen_params:
    stacked [L, ...] QuantizedLinear layers, fp embed/norms. ``head_bits``
    optionally quantizes a SEPARATE lm head (untying it) — the tied bf16
    embedding head streams 0.62 GB/token, the single largest tensor in
    the decode loop.
    """
    import jax.numpy as jnp
    import numpy as np

    from vlm_clip_tpu.ops.quant import QuantizedLinear, _I4_TK, _I4_TN

    rng = np.random.default_rng(seed)
    L, H = cfg.num_layers, cfg.hidden_size
    heads, kv, hd, inter = (cfg.num_heads, cfg.num_kv_heads, cfg.head_dim,
                            cfg.intermediate_size)

    if bits == "mixed":
        from vlm_clip_tpu.vlm.qwen_convert import MIXED_DECODE_BITS

        def role_bits(role):
            # full pytree paths, exactly as quantize_qwen_params matches
            return MIXED_DECODE_BITS.get(f"text/layers/{role}",
                                         MIXED_DECODE_BITS["default"])
    else:
        def role_bits(role):
            return bits

    def qlin(k, n, bias, bits):
        if bits == 8:
            qw = rng.integers(-127, 128, size=(L, k, n), dtype=np.int8)
            q = QuantizedLinear(jnp.asarray(qw),
                                jnp.full((L, n), 0.01, jnp.float32), 8,
                                jnp.zeros((L, n), jnp.float32)
                                if bias else None)
            return q
        k2 = k // 2
        k2p = k2 + (-k2) % (_I4_TK // 2)
        np_ = n + (-n) % _I4_TN
        qw = rng.integers(0, 256, size=(L, k2p, np_), dtype=np.uint8)
        return QuantizedLinear(
            jnp.asarray(qw), jnp.full((L, np_), 0.01, jnp.float32), 4,
            jnp.zeros((L, n), jnp.float32) if bias else None,
            in_features=k, out_features=n)

    if fused:
        attn = {"qkv": qlin(H, (heads + 2 * kv) * hd, True,
                            role_bits("attn/qkv")),
                "o": qlin(heads * hd, H, False, role_bits("attn/o"))}
        mlp = {"gateup": qlin(H, 2 * inter, False,
                              role_bits("mlp/gateup")),
               "down": qlin(inter, H, False, role_bits("mlp/down"))}
    else:
        attn = {"q": qlin(H, heads * hd, True, role_bits("attn/q")),
                "k": qlin(H, kv * hd, True, role_bits("attn/k")),
                "v": qlin(H, kv * hd, True, role_bits("attn/v")),
                "o": qlin(heads * hd, H, False, role_bits("attn/o"))}
        mlp = {"gate": qlin(H, inter, False, role_bits("mlp/gate")),
               "up": qlin(H, inter, False, role_bits("mlp/up")),
               "down": qlin(inter, H, False, role_bits("mlp/down"))}
    params = {
        "embed_tokens": jnp.asarray(
            rng.normal(size=(cfg.vocab_size, H)).astype(np.float32) * 0.02,
            jnp.bfloat16),
        "final_norm": {"scale": jnp.ones((H,), jnp.float32)},
        "layers": {
            "attn": attn,
            "mlp": mlp,
            "ln1": {"scale": jnp.ones((L, H), jnp.float32)},
            "ln2": {"scale": jnp.ones((L, H), jnp.float32)},
        },
    }
    if head_bits:
        from vlm_clip_tpu.ops.quant import quantize_weight

        # quantize a random untied head (one ~1.2 GB fp32 host array)
        w = rng.normal(size=(H, cfg.vocab_size)).astype(np.float32) * 0.02
        params["lm_head"] = quantize_weight(jnp.asarray(w), head_bits)
    return params


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bits", default="4", choices=("4", "8", "mixed"))
    p.add_argument("--head-bits", type=int, default=0, choices=(0, 4, 8),
                   help="quantize an untied lm head (0 = tied bf16 head)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--new", type=int, default=64, help="tokens to decode")
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--max-len", type=int, default=256)
    p.add_argument("--fused", action="store_true",
                   help="fused qkv/gateup decode GEMVs (the extractor's "
                        "default layout)")
    p.add_argument("--kv-bits", type=int, default=16, choices=(8, 16),
                   help="8 = int8 KV cache (per-row scales; halves the "
                        "per-step cache read that bounds batched decode)")
    args = p.parse_args(argv)

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_clip_tpu.vlm.qwen import QwenVLGenerator
    from vlm_clip_tpu.vlm.qwen_model import (QwenVLConfig, QwenTextConfig,
                                             init_kv_cache)
    from vlm_clip_tpu.vlm.sampling import GREEDY

    bits = args.bits if args.bits == "mixed" else int(args.bits)
    head_bits = args.head_bits or (4 if bits == "mixed" else 0)
    tcfg = QwenTextConfig()  # 3B dims
    if head_bits:
        tcfg = dataclasses.replace(tcfg, tie_word_embeddings=False)
    cfg = QwenVLConfig(text=tcfg)
    print(f"synthesizing 3B-shape params (bits={bits}, "
          f"head_bits={head_bits}) ...", flush=True)
    text = synth_quantized_text_params(tcfg, bits, head_bits,
                                       fused=args.fused)
    gen = QwenVLGenerator({"text": text, "vision": {}}, cfg,
                          max_len=args.max_len)

    B, T = args.batch, args.prompt_len
    cache = init_kv_cache(tcfg, B, args.max_len, jnp.bfloat16,
                          quantized=args.kv_bits == 8)
    # pretend a prefill of T tokens already happened
    cache = cache._replace(length=jnp.int32(T))
    logits0 = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, tcfg.vocab_size)),
        jnp.float32)
    presence = jnp.zeros((B, 1), bool)

    def run(cache):
        buf, n_out, cache = gen._decode_loop(
            text, logits0, jnp.int32(T), cache, jnp.int32(T), presence,
            jax.random.PRNGKey(0), args.new, GREEDY)
        return np.asarray(buf), cache

    print("compiling decode loop ...", flush=True)
    t0 = time.perf_counter()
    buf, cache = run(cache)
    print(f"first call (compile): {time.perf_counter() - t0:.1f}s",
          flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        buf, cache = run(cache)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    per_tok = dt / args.new
    print(f"bits={bits} head_bits={head_bits} B={B} fused={args.fused} "
          f"kv_bits={args.kv_bits}: "
          f"{dt*1e3:.1f} ms for {args.new} tokens -> "
          f"{per_tok*1e3:.2f} ms/token, "
          f"{B/per_tok:.1f} tok/s aggregate")


if __name__ == "__main__":
    main()
