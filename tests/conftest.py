"""Test env: force an 8-device virtual CPU mesh before JAX backend init.

Mirrors the driver's multi-chip dry-run environment so sharding tests run
without real TPU hardware (SURVEY.md §4 implications). Note: the axon TPU
plugin ignores the JAX_PLATFORMS env var on this image, so we must use
jax.config.update *before* first backend use.
"""

import os
import tempfile

# CLI drives under test must not drop timestamped logs into the repo
# (utils/logging.setup_logging honors this override).
os.environ.setdefault(
    "VLM_CLIP_LOG_DIR", tempfile.mkdtemp(prefix="vlm_clip_tpu_logs_"))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# fp32 matmuls at full precision: parity tests compare against torch at
# fp32 tolerance, so disable bf16-pass matmul lowering.
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_enable_x64", False)

# torch (used only as a parity oracle) must not fight JAX for cores.
try:
    import torch  # noqa: F401

    torch.set_num_threads(max(1, (os.cpu_count() or 2) // 2))
except ImportError:
    pass
