"""Small API-parity helpers (reference utils.py:15-20)."""

from __future__ import annotations

from typing import Any

import numpy as np


def get_device():
    """First accelerator device (reference get_device, utils.py:15-16)."""
    import jax

    return jax.devices()[0]


def count_trainable_params(params: Any) -> int:
    """Total parameter count of a pytree (reference
    count_trainable_params, utils.py:19-20 — here 'trainable' is whatever
    subtree you pass, since freezing is a partition choice)."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
