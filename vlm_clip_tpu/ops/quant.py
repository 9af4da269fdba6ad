"""Weight-only quantization (int8 / packed-int4) + dequantizing matmul.

TPU-native replacement for the reference's bitsandbytes NF4 4-bit
quantization of the Qwen VLM (model_v.py:46-51): symmetric per-output-
channel scales, weights stored int8 (or two int4 nibbles per int8 byte),
dequantized inside the matmul. HBM for the 3B VLM drops 4x (int8) / 8x
(int4) vs fp32 — the quantized weight is what streams from HBM, which is
the serving bottleneck.

Two implementations with identical semantics:
- jnp path (default): dequantize-then-dot; XLA fuses the dequant multiply
  into the matmul epilogue/prologue;
- Pallas kernel (:func:`quant_matmul_pallas`): tiles with in-VMEM dequant,
  for the serving path where the fused epilogue matters.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass
class QuantizedLinear:
    """Per-output-channel symmetric weight-only quantization.

    ``qweight``: int8 [in, out] (bits=8) or packed uint8 [in, out/2]
    holding two 4-bit nibbles (bits=4). ``scale``: fp32 [out].
    """
    qweight: jnp.ndarray
    scale: jnp.ndarray
    bits: int = 8
    bias: Optional[jnp.ndarray] = None

    def tree_flatten(self):
        return (self.qweight, self.scale, self.bias), (self.bits,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qweight, scale, bias = children
        return cls(qweight=qweight, scale=scale, bits=aux[0], bias=bias)


jax.tree_util.register_pytree_node(
    QuantizedLinear, QuantizedLinear.tree_flatten,
    QuantizedLinear.tree_unflatten)


def quantize_weight(w: jnp.ndarray, bits: int = 8,
                    bias: Optional[jnp.ndarray] = None) -> QuantizedLinear:
    """fp weight [in, out] -> QuantizedLinear."""
    w = jnp.asarray(w, jnp.float32)
    if bits == 8:
        amax = jnp.max(jnp.abs(w), axis=0)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return QuantizedLinear(q, scale.astype(jnp.float32), 8, bias)
    if bits == 4:
        amax = jnp.max(jnp.abs(w), axis=0)
        scale = jnp.where(amax > 0, amax / 7.0, 1.0)
        q = jnp.clip(jnp.round(w / scale), -7, 7).astype(jnp.int8)
        out = q.shape[1]
        if out % 2:
            raise ValueError("int4 packing requires even out dim")
        lo = (q[:, 0::2] + 8).astype(jnp.uint8)         # [in, out/2]
        hi = (q[:, 1::2] + 8).astype(jnp.uint8)
        packed = (lo | (hi << 4)).astype(jnp.uint8)
        return QuantizedLinear(packed, scale.astype(jnp.float32), 4, bias)
    raise ValueError(f"bits must be 4 or 8, got {bits}")


def dequantize_weight(q: QuantizedLinear) -> jnp.ndarray:
    if q.bits == 8:
        return q.qweight.astype(jnp.float32) * q.scale[None, :]
    lo = (q.qweight & 0xF).astype(jnp.int32) - 8
    hi = (q.qweight >> 4).astype(jnp.int32) - 8
    out = jnp.stack([lo, hi], axis=-1).reshape(q.qweight.shape[0], -1)
    return out.astype(jnp.float32) * q.scale[None, :]


def quant_matmul(x: jnp.ndarray, q: QuantizedLinear,
                 use_pallas: bool = False) -> jnp.ndarray:
    """x [.., in] @ dequant(q) [in, out] (+bias). fp32 accumulation."""
    if use_pallas and q.bits == 8 and jax.default_backend() == "tpu" \
            and x.ndim == 2:
        y = quant_matmul_pallas(x, q.qweight, q.scale)
    else:
        w = dequantize_weight(q).astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if q.bias is not None:
        y = y + q.bias.astype(jnp.float32)
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas int8 dequant-matmul
# ---------------------------------------------------------------------------

_TM, _TN = 256, 512


def _qmm_kernel(x_ref, qw_ref, scale_ref, o_ref):
    x = x_ref[:].astype(jnp.float32)
    w = qw_ref[:].astype(jnp.float32)
    acc = jnp.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * scale_ref[:].astype(jnp.float32)[None, :]
                ).astype(o_ref.dtype)


def quant_matmul_pallas(x: jnp.ndarray, qweight: jnp.ndarray,
                        scale: jnp.ndarray) -> jnp.ndarray:
    """int8 weight matmul: x [M, K] @ (int8 [K, N] * scale[N])."""
    M, K = x.shape
    N = qweight.shape[1]
    pm = (-M) % _TM
    pn = (-N) % _TN
    xp = jnp.pad(x, ((0, pm), (0, 0))) if pm else x
    qp = jnp.pad(qweight, ((0, 0), (0, pn))) if pn else qweight
    sp = jnp.pad(scale, (0, pn)) if pn else scale
    Mp, Np = M + pm, N + pn
    y = pl.pallas_call(
        _qmm_kernel,
        grid=(Mp // _TM, Np // _TN),
        in_specs=[
            pl.BlockSpec((_TM, K), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, _TN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TM, _TN), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xp, qp, sp)
    return y[:M, :N]
