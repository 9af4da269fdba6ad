"""Logging + seeding utilities (reference main.py:23-52).

- :func:`setup_logging`: timestamped ``logs/training_%Y%m%d_%H%M%S.log``
  file handler + console handler (main.py:33-52);
- :func:`seed_everything`: the JAX equivalent of the reference's all-RNG
  seeding (main.py:23-28) — numpy/python seeds plus a root PRNG key
  (explicit keys replace CUDA RNG state).
"""

from __future__ import annotations

import logging
import os
import random
from datetime import datetime


def setup_logging(log_dir: str = "logs", name: str = "training",
                  level: int = logging.INFO) -> str:
    """File + console handlers; on multi-process runs only process 0
    gets handlers (others return "" and stay at WARNING), so a pod
    doesn't write N copies of every line.

    ``VLM_CLIP_LOG_DIR`` overrides ``log_dir`` when set — test/CI
    harnesses point it at a tmp dir so CLI drives never drop
    timestamped logs into the checked-out repo (default stays ``logs/``
    for reference parity, main.py:33-52)."""
    from vlm_clip_tpu.parallel.distributed import is_primary

    log_dir = os.environ.get("VLM_CLIP_LOG_DIR", log_dir)

    root = logging.getLogger()
    try:
        primary = is_primary()
    except Exception:  # jax backend not up yet: single process
        primary = True
    if not primary:
        root.setLevel(logging.WARNING)
        return ""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(
        log_dir, f"{name}_{datetime.now():%Y%m%d_%H%M%S}.log")
    fmt = logging.Formatter(
        "%(asctime)s - %(levelname)s - %(message)s")
    root.setLevel(level)
    fh = logging.FileHandler(path)
    fh.setFormatter(fmt)
    ch = logging.StreamHandler()
    ch.setFormatter(fmt)
    root.addHandler(fh)
    root.addHandler(ch)
    return path


def seed_everything(seed: int = 42):
    """Seed host RNGs and return the root JAX PRNG key."""
    import numpy as np

    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
