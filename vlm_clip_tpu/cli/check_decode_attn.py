"""CI check for the ENABLED decode-attention Pallas path (real TPU).

The streaming fused decode-attention kernel (ops/decode_attention.py)
is a measured loss on 3B decode and ships DEFAULT-OFF behind
``VLM_CLIP_DECODE_ATTN_PALLAS=1`` (BENCH.md round 4). Hermetic tests
cover it only under ``interpret=True``, so the documented opt-in could
silently rot on the compiled path (VERDICT r4 weak #5 / next #8). This
check compiles and runs the REAL kernel on the TPU across the shapes
the dispatcher would route (lane-aligned head dim, decode T=1 and
spec-verify T=5, fp and int8-quantized caches), verifies parity against
the jnp reference, and confirms the dispatcher actually routes to the
kernel when the flag is on (bit-exact match with the direct kernel
call).

Exit 0 = opt-in healthy. Run whenever the decode path changes:

    python -m vlm_clip_tpu.cli.check_decode_attn
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/vlm_clip_tpu_jaxcache")


def main(argv=None) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vlm_clip_tpu.ops import decode_attention as DA

    if jax.default_backend() != "tpu":
        raise SystemExit(
            f"backend is {jax.default_backend()!r}: this check exists to "
            "exercise the compiled-on-TPU kernel path; the interpreter "
            "path is covered hermetically by tests/test_decode_attention"
            ".py. Nothing to check here.")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "..", "tests"))
    from test_decode_attention import _rand_case

    DA.set_decode_attn_pallas(True)
    try:
        cases = [
            # (T, dtype, quant) — d=128/S=512 satisfy the dispatcher
            # gate (d % 128 == 0, S >= 128, T <= 16)
            (1, jnp.bfloat16, False),
            (1, jnp.bfloat16, True),
            (5, jnp.bfloat16, False),   # spec-verify block
            (1, jnp.float32, False),
        ]
        for i, (T, dtype, quant) in enumerate(cases):
            case = _rand_case(jax.random.PRNGKey(i), B=8, T=T, h=16,
                              kv=2, d=128, S=512, dtype=dtype,
                              quant=quant)
            q, k_old, v_old, k_cur, v_cur, depths, ks_, vs_ = case
            t0 = time.perf_counter()
            got = np.asarray(DA.decode_attention_pallas(
                q, k_old, v_old, k_cur, v_cur, depths, ks_, vs_))
            dt = time.perf_counter() - t0
            ref = np.asarray(DA.decode_attention_reference(
                q, k_old, v_old, k_cur, v_cur, depths, ks_, vs_)
            ).astype(np.float32)
            err = np.abs(got.astype(np.float32) - ref).max()
            # bf16 compute both sides; TPU fp32 matmul is loose by
            # default — rot detection, not tight numerics
            assert err < 6e-2, (T, str(dtype), quant, err)
            # dispatcher really routes to the kernel when the flag is on
            via = np.asarray(DA.decode_attention(
                q, k_old, v_old, k_cur, v_cur, depths, ks_, vs_))
            assert np.array_equal(via, got), "dispatcher took the " \
                "reference route despite the flag"
            print(f"T={T} {np.dtype(jnp.dtype(dtype)).name:8s} "
                  f"quant={quant}: kernel ok (max err {err:.1e}, "
                  f"first call {dt:.1f}s)", flush=True)
    finally:
        DA.set_decode_attn_pallas(False)
    print("decode-attention enabled path: ALL OK", flush=True)


if __name__ == "__main__":
    main()
