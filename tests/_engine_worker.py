"""Subprocess worker for the 2-process DP engine test
(test_distributed_multiprocess.py).

Runs as one of TWO real OS processes (CPU backend, localhost
coordinator): builds the tiny Qwen model deterministically (same PRNG
key, same backend => identical weights on both processes), runs the
continuous-batching engine over the GLOBAL ('data'=2) mesh — slot
state and the KV cache sharded across the two processes, install
scatters crossing the process boundary, harvests all-gathering the
slot shards (engine._fetch) — and writes each request's tokens to
JSON for the parent to compare against a single-process engine run.

    python tests/_engine_worker.py OUT_JSON
"""

import json
import os
import sys


def main() -> int:
    out_json = sys.argv[1]
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)                       # test_engine helpers
    sys.path.insert(0, os.path.dirname(here))      # vlm_clip_tpu package

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from vlm_clip_tpu.parallel import distributed as D

    assert D.maybe_initialize() is True, "initialize did not run"
    assert jax.process_count() == 2, jax.process_count()

    import jax.numpy as jnp

    from test_engine import _requests, tiny_cfgs
    from vlm_clip_tpu.vlm import qwen_model as QM
    from vlm_clip_tpu.vlm.engine import ContinuousBatchingEngine
    from vlm_clip_tpu.vlm.qwen import QwenVLGenerator

    mesh = D.global_mesh()
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "model": 1}, mesh

    cfg = tiny_cfgs()
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {"text": QM.init_text(k1, cfg.text),
              "vision": QM.init_vision(k2, cfg.vision)}
    ids, visions = _requests(cfg, 4, seed=51)
    budgets = [5, 3, 6, 4]

    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=3,
                                   refill_chunks=(2, 1), mesh=mesh)
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    got = eng.flush()

    with open(out_json, "w") as f:
        json.dump({
            "process_index": jax.process_index(),
            "tokens": [got[r] for r in rids],
        }, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
