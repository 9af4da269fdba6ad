"""Weight-only quantization (int8 / packed-int4) + dequantizing matmul.

TPU-native replacement for the reference's bitsandbytes NF4 4-bit
quantization of the Qwen VLM (model_v.py:46-51): symmetric per-output-
channel scales, weights stored int8 (or two int4 nibbles per int8 byte),
dequantized inside the matmul. HBM for the 3B VLM drops 4x (int8) / 8x
(int4) vs fp32 — the quantized weight is what streams from HBM, which is
the serving bottleneck.

int8 uses the jnp dequantize-then-dot path only: XLA fuses the dequant
multiply into the matmul and streams the int8 weight at the HBM ceiling
(~557 GB/s measured on the 3B decode GEMVs, BENCH.md round 2); a Pallas
int8 kernel measured equal-or-worse (390 GB/s TM8 GEMV) and was deleted
in round 3. int4 keeps a Pallas kernel (:func:`quant_matmul_pallas_int4`)
because XLA's nibble-unpack does NOT fuse at decode shapes (7.3x win).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass
class QuantizedLinear:
    """Per-output-channel symmetric weight-only quantization.

    ``qweight``: int8 [in, out] (bits=8) or packed uint8 [in/2, out]
    holding two 4-bit nibbles per byte (bits=4). ``scale``: fp32 [out].

    int4 weights are PRE-PADDED at quantization time to the Pallas tile
    grid (multiples of 1024 on both packed axes): runtime ``jnp.pad`` of
    the packed weight copied the whole tensor every decode step and was
    the dominant cost of the round-1 kernel (measured: lm-head GEMV
    171 -> 528 GB/s once pre-padded). ``in_features``/``out_features``
    keep the logical shape; padded rows/cols hold zeros.
    """
    qweight: jnp.ndarray
    scale: jnp.ndarray
    bits: int = 8
    bias: Optional[jnp.ndarray] = None
    in_features: Optional[int] = None
    out_features: Optional[int] = None
    # False routes this weight's int4 matmuls to the pure-XLA
    # formulations. Set per-instance by parallel/sharding.shard_params
    # when the weight is model-sharded (GSPMD cannot partition the
    # pallas_call) — per-node so one sharded model never degrades other
    # models in the same process.
    pallas_ok: bool = True

    def tree_flatten_with_keys(self):
        # Named keys so partition rules (parallel/sharding.py) can match
        # .../q/qweight etc. — index keys would fall through to
        # replication and defeat TP for quantized decode.
        ga = jax.tree_util.GetAttrKey
        return ((ga("qweight"), self.qweight), (ga("scale"), self.scale),
                (ga("bias"), self.bias)), \
            (self.bits, self.in_features, self.out_features,
             self.pallas_ok)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qweight, scale, bias = children
        return cls(qweight=qweight, scale=scale, bits=aux[0], bias=bias,
                   in_features=aux[1], out_features=aux[2],
                   pallas_ok=aux[3])

    @property
    def logical_in(self) -> int:
        if self.in_features is not None:
            return self.in_features
        return self.qweight.shape[0] * (2 if self.bits == 4 else 1)

    @property
    def logical_out(self) -> int:
        return (self.out_features if self.out_features is not None
                else self.qweight.shape[1])


jax.tree_util.register_pytree_with_keys_class(QuantizedLinear)

# int4 Pallas tile grid; quantize-time padding targets multiples of these.
_I4_TM, _I4_TN, _I4_TK = 8, 1024, 2048

# GSPMD has no partitioning rule for pallas_call: under tensor
# parallelism a model-sharded int4 weight feeding the kernel would be
# all-gathered (or fail to lower). parallel/sharding.shard_params flips
# this off when it actually shards int4 leaves, routing int4 matmuls to
# the pure-XLA formulations that GSPMD partitions natively.
_INT4_PALLAS_ENABLED = True


def set_int4_pallas_enabled(on: bool) -> None:
    global _INT4_PALLAS_ENABLED
    _INT4_PALLAS_ENABLED = bool(on)


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
        if q.shape[0] % 2:
            raise ValueError("int4 packing requires even in dim")
        # ROW-pair packing: nibbles hold w[2k, n] (lo) and w[2k+1, n]
        # (hi). This lets both the Pallas kernel and the fused-XLA GEMV
        # dequantize without any interleave/shape-cast (Mosaic rejects
        # those, and jnp.stack+reshape breaks XLA's dot-operand fusion):
        # the matmul splits as x_even @ lo + x_odd @ hi.
        lo = (q[0::2, :] + 8).astype(jnp.uint8)          # [in/2, out]
        hi = (q[1::2, :] + 8).astype(jnp.uint8)
        packed = (lo | (hi << 4)).astype(jnp.uint8)
        K, N = w.shape
        pk2 = (-packed.shape[0]) % (_I4_TK // 2)
        pn = (-N) % _I4_TN
        if pk2 or pn:  # pay the pad copy ONCE here, never per matmul
            packed = jnp.pad(packed, ((0, pk2), (0, pn)),
                             constant_values=0x88)  # 0x88 = (0, 0) nibbles
            scale = jnp.pad(scale, (0, pn), constant_values=1.0)
        return QuantizedLinear(packed, scale.astype(jnp.float32), 4, bias,
                               in_features=K, out_features=N)
    raise ValueError(f"bits must be 4 or 8, got {bits}")


def dequantize_weight(q: QuantizedLinear) -> jnp.ndarray:
    if q.bits == 8:
        return q.qweight.astype(jnp.float32) * q.scale[None, :]
    lo = (q.qweight & 0xF).astype(jnp.int32) - 8   # rows 0, 2, 4, ...
    hi = (q.qweight >> 4).astype(jnp.int32) - 8    # rows 1, 3, 5, ...
    out = jnp.stack([lo, hi], axis=1).reshape(2 * q.qweight.shape[0], -1)
    out = out.astype(jnp.float32) * q.scale[None, :]
    return out[:q.logical_in, :q.logical_out]


def _int4_gemv_xla(x: jnp.ndarray, q: QuantizedLinear) -> jnp.ndarray:
    """Fused-XLA row-pair int4 GEMV: x [M, K] -> [M, N] fp32.

    The unpack chain is pure elementwise on the packed weight, so XLA
    fuses it into the dot operand exactly as it fuses the int8
    ``qw * scale`` dequant — no fp weight ever materializes in HBM.
    (The round-1 "XLA int4 is 15x slower" result came from the
    stack+reshape formulation, which defeats that fusion.) Measured
    faster than the Pallas kernel at narrow N (q/o/k/v/down GEMVs)
    where the kernel's per-call grid overhead dominates.
    """
    K = q.logical_in
    xe = x[:, 0:K:2].astype(jnp.float32)
    xo = x[:, 1:K:2].astype(jnp.float32)
    K2p = q.qweight.shape[0]
    if K2p != K // 2:  # padded rows: zero x contribution
        xe = jnp.pad(xe, ((0, 0), (0, K2p - K // 2)))
        xo = jnp.pad(xo, ((0, 0), (0, K2p - K // 2)))
    # slice off the tile-pad columns BEFORE the dot (static slice, fused
    # into the operand read) — narrow-N weights are padded up to 1024
    # cols, and dotting the pads would stream up to 4x the bytes needed
    N = q.logical_out
    qw = q.qweight[:, :N]
    sf = q.scale[None, :N]
    lo = ((qw & 0xF).astype(jnp.int32) - 8).astype(jnp.float32) * sf
    hi = ((qw >> 4).astype(jnp.int32) - 8).astype(jnp.float32) * sf
    return jnp.dot(xe, lo) + jnp.dot(xo, hi)


def quant_matmul(x: jnp.ndarray, q: QuantizedLinear,
                 out_dtype=None) -> jnp.ndarray:
    """x [.., in] @ dequant(q) [in, out] (+bias). fp32 accumulation.

    ``out_dtype`` overrides the x.dtype output cast — the untied LM head
    passes float32 so logits keep full accumulator precision (the tied
    head never rounds; sampling cutoffs must match it).

    int4 on TPU routes by shape (measured, BENCH.md rounds 2 and 4):
    - GEMV (M <= 32), wide N: Pallas tiled kernel with in-VMEM unpack —
      streams the pre-padded weight at ~250-530 GB/s;
    - GEMV, narrow N: fused-XLA row-pair (:func:`_int4_gemv_xla`) — the
      Pallas per-call overhead (~20 us) loses to XLA's fused GEMV there;
    - 32 < M <= 1024 (large decode batches, speculative verify,
      chunked prefill): the same fused-XLA row-pair formulation as a
      GEMM — weight streamed once, unpack fused into the dot operand.
      On the 3B untied head it runs 2.3/3.1/5.1 ms at M=320/512/1024
      vs the materialize route's flat ~17 ms (round 4). A bf16
      nibble-plane variant (two bf16 MXU dots, scale applied to the
      accumulator) was built and measured for this band and LOST
      slightly at every point (2.5/3.6/5.0 ms) with looser input
      numerics, so it was removed — the fp32 row-pair dots already
      ride the MXU via XLA's precision splitting;
    - prefill (M > 1024): materialized bf16 dequant + MXU dot — the
      matmul is compute-bound, and re-unpacking nibbles per M tile
      costs more than one weight materialization.
    """
    if q.bits == 4 and jax.default_backend() == "tpu" and x.ndim == 2:
        M = x.shape[0]
        if M <= 32 and q.qweight.shape[1] >= 4 * _I4_TN \
                and _INT4_PALLAS_ENABLED and q.pallas_ok:
            y = quant_matmul_pallas_int4(x, q.qweight, q.scale,
                                         out_features=q.logical_out,
                                         in_features=q.logical_in)
        elif M <= 1024:
            # mid-M (large decode batches / speculative verify /
            # chunked prefill): the fused-XLA row-pair GEMM streams the
            # packed weight once with the unpack fused into the dot
            # operand; the bf16-dequant route would materialize the
            # full weight (~17 ms flat on the 3B head, round-4 table),
            # and the Pallas kernel's 8-row M tiles would re-stream it
            # M/8 times (B=64 measured 2.3k -> BENCH round 2)
            y = _int4_gemv_xla(x, q)
        else:
            w = dequantize_weight(q).astype(jnp.bfloat16)
            y = jnp.dot(x.astype(jnp.bfloat16), w,
                        preferred_element_type=jnp.float32)
    else:
        w = dequantize_weight(q).astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if q.bias is not None:
        y = y + q.bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


# int4: tiled matmul with per-tile nibble unpack in VMEM
def _qmm4_kernel(xe_ref, xo_ref, packed_ref, scale_ref, o_ref, acc_ref):
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = packed_ref[:].astype(jnp.int32)  # [TK/2, TN], row-pair packed
    # fp32 unpack. (bf16 unpack measured 33% faster on the isolated big
    # matmul but slightly SLOWER end-to-end at decode shapes and loosens
    # accuracy — reverted.)
    lo = (p & 0xF).astype(jnp.float32) - 8.0   # even input rows
    hi = (p >> 4).astype(jnp.float32) - 8.0    # odd input rows
    acc_ref[:] += (
        jnp.dot(xe_ref[:].astype(jnp.float32), lo,
                preferred_element_type=jnp.float32)
        + jnp.dot(xo_ref[:].astype(jnp.float32), hi,
                  preferred_element_type=jnp.float32))

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = (acc_ref[:] * scale_ref[:].astype(jnp.float32)
                    ).astype(o_ref.dtype)


def quant_matmul_pallas_int4(x: jnp.ndarray, packed: jnp.ndarray,
                             scale: jnp.ndarray,
                             out_features: Optional[int] = None,
                             in_features: Optional[int] = None
                             ) -> jnp.ndarray:
    """x [M, K] @ unpack_int4(packed [K2p, Np]) * scale[Np].

    Row-pair packing: the kernel computes x_even @ lo + x_odd @ hi with
    the nibble unpack per-tile in VMEM (never materializing the fp
    weight in HBM). x_even/x_odd are strided views taken in XLA.

    ``packed``/``scale`` MUST be tile-aligned (quantize_weight pre-pads
    to multiples of _I4_TK/2 x _I4_TN) — padding the weight here would
    copy it every call, which was the round-1 kernel's dominant cost.
    Only the (tiny) activation is padded at runtime.
    """
    M, K = x.shape
    K2p, Np = packed.shape
    if K2p % (_I4_TK // 2) or Np % _I4_TN:
        raise ValueError(
            f"packed weight {packed.shape} is not tile-aligned "
            f"({_I4_TK // 2} x {_I4_TN}); quantize with quantize_weight "
            "(which pre-pads) instead of packing by hand")
    Kl = in_features if in_features is not None else K
    xe, xo = x[:, 0:Kl:2], x[:, 1:Kl:2]  # [M, K/2]
    pm = (-M) % _I4_TM
    pk2 = K2p - xe.shape[1]
    if pm or pk2:
        xe = jnp.pad(xe, ((0, pm), (0, pk2)))
        xo = jnp.pad(xo, ((0, pm), (0, pk2)))
    Mp = xe.shape[0]
    y = pl.pallas_call(
        _qmm4_kernel,
        grid=(Mp // _I4_TM, Np // _I4_TN, K2p // (_I4_TK // 2)),
        in_specs=[
            pl.BlockSpec((_I4_TM, _I4_TK // 2), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_I4_TM, _I4_TK // 2), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_I4_TK // 2, _I4_TN), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            # scale as 2-D [1, TN]: 1-D blocked operands trip
            # XLA-vs-Mosaic layout verification
            pl.BlockSpec((1, _I4_TN), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_I4_TM, _I4_TN), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), x.dtype),
        scratch_shapes=[pltpu.VMEM((_I4_TM, _I4_TN), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(xe, xo, packed, scale.reshape(1, -1))
    return y[:M, :out_features if out_features is not None else Np]
