"""Mixed-precision dtype policy for TPU.

Params live in fp32; matmul-heavy compute runs in bf16 (MXU-native) with
fp32 accumulation (``preferred_element_type``); numerically sensitive ops
(LayerNorm statistics, softmax, losses, logit_scale) stay fp32. A pure-fp32
policy is used for parity tests against the PyTorch reference.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dtype used for softmax/layernorm internals and final logits
    stable_dtype: jnp.dtype = jnp.float32

    @staticmethod
    def from_name(name: str) -> "DTypePolicy":
        if name in ("bfloat16", "bf16", "mixed"):
            return DTypePolicy(compute_dtype=jnp.bfloat16)
        if name in ("float32", "fp32", "full"):
            return DTypePolicy(compute_dtype=jnp.float32)
        if name == "fast":
            return DTypePolicy(compute_dtype=jnp.bfloat16,
                               stable_dtype=jnp.bfloat16)
        raise ValueError(f"unknown dtype policy {name!r}")

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_stable(self, x):
        return x.astype(self.stable_dtype)


FP32 = DTypePolicy(compute_dtype=jnp.float32)
BF16 = DTypePolicy(compute_dtype=jnp.bfloat16)
# FAST: bf16 LN statistics + max-subtracted bf16 softmax inside the
# FROZEN towers (~16% tower time at ViT-B/16 train shapes). Keep fp32
# (BF16 policy) when fine-tuning the towers themselves.
FAST = DTypePolicy(compute_dtype=jnp.bfloat16, stable_dtype=jnp.bfloat16)
