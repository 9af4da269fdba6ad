"""Multi-host wiring decision logic (parallel/distributed.py).

The initialize call itself needs a cluster; everything that decides
WHEN/HOW to call it — env parsing, validation, hybrid mesh
factorization, primary gating — is pure and tested here (VERDICT r01
item 4; SURVEY §2.10 is the spec).
"""

import numpy as np
import pytest

import jax

from vlm_clip_tpu.parallel import distributed as D


def test_config_from_env_single_process():
    cfg = D.config_from_env({})
    assert not cfg.wanted
    cfg.validate()  # no-op
    assert D.maybe_initialize(cfg) is False


def test_config_from_env_multi():
    env = {D.ENV_COORDINATOR: "10.0.0.1:1234",
           D.ENV_NUM_PROCESSES: "4", D.ENV_PROCESS_ID: "2"}
    cfg = D.config_from_env(env)
    assert cfg.wanted
    cfg.validate()
    assert cfg.num_processes == 4 and cfg.process_id == 2


def test_config_validation_errors():
    with pytest.raises(ValueError, match="requires"):
        D.DistributedConfig(num_processes=4).validate()
    with pytest.raises(ValueError, match="missing"):
        D.DistributedConfig(coordinator_address="h:1").validate()
    with pytest.raises(ValueError, match="outside"):
        D.DistributedConfig(coordinator_address="h:1", num_processes=2,
                            process_id=5).validate()


def test_hybrid_mesh_shape():
    # 4 slices x 8 chips, TP=4 inside a slice
    dcn, ici = D.hybrid_mesh_shape(32, 4, model=4)
    assert dcn == (4, 1) and ici == (2, 4)
    # TP must not cross DCN
    with pytest.raises(ValueError, match="must not cross DCN"):
        D.hybrid_mesh_shape(32, 4, model=16)
    with pytest.raises(ValueError, match="not divisible"):
        D.hybrid_mesh_shape(30, 4)


def test_is_primary_and_gating():
    # single process: this IS process 0
    assert D.is_primary()
    calls = []

    @D.primary_only
    def save(x):
        calls.append(x)
        return x

    assert save(1) == 1 and calls == [1]


def test_global_mesh_single_slice():
    # 8 virtual CPU devices, no slice_index attr -> plain mesh
    mesh = D.global_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="does not divide"):
        D.global_mesh(model=3)


def test_setup_logging_primary_gate(monkeypatch, tmp_path):
    import logging

    from vlm_clip_tpu.utils import logging as L

    monkeypatch.setattr(D, "is_primary", lambda: False)
    n0 = len(logging.getLogger().handlers)
    path = L.setup_logging(log_dir=str(tmp_path))
    assert path == ""
    assert len(logging.getLogger().handlers) == n0  # no new handlers


def test_tpu_pod_autodetect_decision():
    # single host / no TPU metadata: no auto-init
    assert not D.tpu_pod_autodetect({})
    assert not D.tpu_pod_autodetect({"TPU_WORKER_HOSTNAMES": "h0"})
    assert not D.tpu_pod_autodetect({"MEGASCALE_NUM_SLICES": "1"})
    assert not D.tpu_pod_autodetect({"MEGASCALE_NUM_SLICES": "bogus"})
    # multi-host pod or multi-slice megascale: arg-free initialize()
    assert D.tpu_pod_autodetect({"TPU_WORKER_HOSTNAMES": "h0,h1,h2,h3"})
    assert D.tpu_pod_autodetect({"MEGASCALE_NUM_SLICES": "2"})


def test_is_primary_tpu_worker_id(monkeypatch):
    monkeypatch.setenv("TPU_WORKER_ID", "1")
    assert not D.is_primary()
    monkeypatch.setenv("TPU_WORKER_ID", "0")
    assert D.is_primary()
    # the explicit JAX_PROCESS_ID contract wins over TPU metadata
    monkeypatch.setenv("TPU_WORKER_ID", "1")
    monkeypatch.setenv(D.ENV_PROCESS_ID, "0")
    assert D.is_primary()
