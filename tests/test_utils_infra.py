"""Infra utilities: device prefetch, profiling helpers, seq-axis mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_clip_tpu.data.device_prefetch import prefetch_to_device
from vlm_clip_tpu.parallel.mesh import MeshConfig, create_mesh
from vlm_clip_tpu.utils.profiling import StepTimer, annotate, debug_mode


def test_prefetch_to_device_order_and_placement():
    items = [{"x": np.full((4, 2), i, np.float32)} for i in range(5)]
    out = list(prefetch_to_device(iter(items), size=2))
    assert len(out) == 5
    for i, item in enumerate(out):
        assert isinstance(item["x"], jax.Array)
        np.testing.assert_array_equal(np.asarray(item["x"]),
                                      items[i]["x"])


def test_prefetch_with_mesh_shards_batch():
    mesh = create_mesh(MeshConfig(data=8), jax.devices()[:8])
    items = [np.arange(16, dtype=np.float32).reshape(16, 1)
             for _ in range(3)]
    out = list(prefetch_to_device(iter(items), size=2, mesh=mesh))
    sh = out[0].sharding
    assert sh.is_fully_replicated is False
    np.testing.assert_array_equal(np.asarray(out[0]), items[0])


def test_seq_axis_mesh():
    mesh = create_mesh(MeshConfig(data=2, model=2, seq=2),
                       jax.devices()[:8])
    assert dict(mesh.shape) == {"data": 2, "model": 2, "seq": 2}
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data=3, model=3), jax.devices()[:8])


def test_step_timer_and_debug_mode():
    t = StepTimer(warmup=1)
    import time

    for _ in range(5):
        t.tick()
        time.sleep(0.001)
    s = t.summary()
    assert s["steps"] == 3 and s["mean_s"] > 0

    with debug_mode(nans=True):
        assert jax.config.jax_debug_nans
        with pytest.raises(Exception):
            jax.jit(lambda x: x / 0.0 * 0.0)(jnp.float32(1.0))
    assert not jax.config.jax_debug_nans

    with annotate("test-scope"):
        _ = jnp.ones((2, 2)) @ jnp.ones((2, 2))


def test_validate_parity_tiny_fixture(capsys):
    """cli/validate_parity.py end-to-end in hermetic mode (VERDICT r01
    item 7: the real-weight golden-validation harness must run in CI)."""
    from vlm_clip_tpu.cli.validate_parity import main

    rc = main(["--tiny-fixture"])
    out = capsys.readouterr().out
    assert rc == 0
    # four legs: 3 CLIP diffs + 1 Qwen diff + the two eval legs
    assert out.count("PASS") == 4 and "FAIL" not in out
    assert "rafdb-zeroshot(tiny-fixture)" in out
    assert "emotic-mAP(tiny-fixture)" in out and '"mAP"' in out


def test_validate_parity_append(tmp_path, capsys):
    from vlm_clip_tpu.cli.validate_parity import main

    md = tmp_path / "results.md"
    rc = main(["--tiny-fixture", "--append", str(md)])
    assert rc == 0
    text = md.read_text()
    assert "Parity validation" in text and "logits_per_image" in text
