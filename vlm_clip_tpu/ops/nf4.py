"""NF4 (NormalFloat-4) blockwise quantization with double quantization.

The reference quantizes the Qwen VLM with bitsandbytes NF4 + double
quantization (``load_in_4bit, bnb_4bit_quant_type="nf4",
bnb_4bit_use_double_quant=True``, model_v.py:46-51). The symmetric int4
quantizer in ops/quant.py is a different quantizer with different error
characteristics: its 15 levels are uniform, while NF4's 16 levels are
the quantiles of N(0, 1) — information-theoretically matched to
normally-distributed weights (QLoRA, Dettmers et al. 2023). On gaussian
weights NF4's RMS error is ~25-30% lower than symmetric int4 at the
same bit width (pinned by tests/test_fused_ops.py), which is the
quality rationale for shipping it as a preset.

Semantics implemented here (hermetically parity-tested against an
independent numpy oracle in tests/test_fused_ops.py):

- blockwise absmax scaling: blocks of ``block`` (default 64, the
  bitsandbytes default) consecutive INPUT elements per output column
  of the [in, out] kernel; each block is divided by its absmax and
  every element rounded to the NEAREST of the 16 :data:`NF4_CODE`
  values (ties to the higher code);
- double quantization of the absmax tensor: subtract its mean
  (``dq_offset``), then blockwise-256 symmetric int8 with fp32
  second-level scales — absmax storage drops 32 -> ~8.5 bits/block;
- storage: two NF4 indices per byte, row-pair packed exactly like
  ops/quant.py int4 (even input rows in the low nibble) so the unpack
  is a pure elementwise chain XLA fuses into consumers.

Blocking runs along the input dim of OUR [in, out] kernel layout
(bitsandbytes blocks the flattened torch [out, in] weight — same
quantizer, transposed storage order; error statistics are identical
because blocks see the same per-output-row values).

Matmul: a 16-entry codebook GATHER does not fuse into a dot operand
(that route materialized the bf16 weight per call, ~20 ms on the 3B
head), but a depth-4 branchless SELECT TREE on the nibble bits does:
:func:`_code_select_tree` turns the lookup into 15 elementwise
``where``s, which XLA fuses into the row-pair dot operands exactly
like the int4/int8 arithmetic dequants. Measured on the 3B untied head
[2048, 151936] (BENCH.md round 5), the fused route wins at EVERY
measured M — 5.5 ms at M=8 and 20.8 ms at M=4096 vs the materialize
route's flat ~21-31 ms — so all M <= 4096 route through it; beyond the
measured range the bf16 materialize route remains as the conservative
fallback. NF4 is still ~2x routed int4 (5.5 vs 2.6 ms at M=8: the
fp32 dots plus the absmax-dequant broadcast), so int8/int4 remain the
speed presets and NF4 the quality preset (~0.61x int4's RMS error on
gaussian weights).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# The 16 NF4 values: quantiles of N(0,1) normalized to [-1, 1], exactly
# bitsandbytes' NF4 data type (functional.py create_normal_map / CUDA
# kNF4Data table). Index 7 is exactly 0.0 (zero is representable).
NF4_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367,
    -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
    -0.09105003625154495, 0.0, 0.07958029955625534, 0.16093020141124725,
    0.24611230194568634, 0.33791524171829224, 0.44070982933044434,
    0.5626170039176941, 0.7229568362236023, 1.0], dtype=np.float32)

# decision boundaries for nearest-code rounding (15 midpoints)
_NF4_MID = (NF4_CODE[1:] + NF4_CODE[:-1]) / 2.0

NF4_BLOCK = 64        # first-level block (bitsandbytes default)
NF4_DQ_GROUP = 256    # second-level (double-quant) group size


@dataclasses.dataclass
class NF4Linear:
    """Blockwise NF4 weight + double-quantized absmax.

    ``qweight``: packed uint8 [in_p/2, out] — two NF4 code indices per
    byte, row-pair packed (even logical input rows in the low nibble).
    ``absmax_q``: int8 [in_p/block, out] — double-quantized block
    absmax. ``dq_scale``: fp32 [ceil(nblk*out/256)] second-level
    scales. ``dq_offset``: fp32 scalar (mean of the absmax tensor).
    ``in_features``/``out_features`` keep the logical shape (the input
    dim is zero-padded to a multiple of ``block``).
    """
    qweight: jnp.ndarray
    absmax_q: jnp.ndarray
    dq_scale: jnp.ndarray
    dq_offset: jnp.ndarray
    bias: Optional[jnp.ndarray] = None
    in_features: int = 0
    out_features: int = 0
    block: int = NF4_BLOCK

    def tree_flatten_with_keys(self):
        ga = jax.tree_util.GetAttrKey
        return ((ga("qweight"), self.qweight),
                (ga("absmax_q"), self.absmax_q),
                (ga("dq_scale"), self.dq_scale),
                (ga("dq_offset"), self.dq_offset),
                (ga("bias"), self.bias)), \
            (self.in_features, self.out_features, self.block)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qweight, absmax_q, dq_scale, dq_offset, bias = children
        return cls(qweight=qweight, absmax_q=absmax_q, dq_scale=dq_scale,
                   dq_offset=dq_offset, bias=bias, in_features=aux[0],
                   out_features=aux[1], block=aux[2])

    @property
    def logical_in(self) -> int:
        return self.in_features

    @property
    def logical_out(self) -> int:
        return self.out_features


jax.tree_util.register_pytree_with_keys_class(NF4Linear)


def _nearest_code(scaled: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] values -> nearest NF4_CODE index (ties to the higher
    code). 15 broadcast compares instead of a [.., 16] distance tensor:
    conversion of a 3B checkpoint would otherwise build ~20 GB of
    temporaries."""
    idx = jnp.zeros(scaled.shape, jnp.uint8)
    for m in _NF4_MID:
        idx = idx + (scaled >= jnp.float32(m)).astype(jnp.uint8)
    return idx


def quantize_nf4(w: jnp.ndarray, bias: Optional[jnp.ndarray] = None,
                 block: int = NF4_BLOCK) -> NF4Linear:
    """fp weight [in, out] -> NF4Linear (blockwise NF4 + double quant)."""
    if block % 2:
        raise ValueError(f"block must be even (row-pair packing), "
                         f"got {block}")
    w = jnp.asarray(w, jnp.float32)
    K, N = w.shape
    pad = (-K) % block
    if pad:
        w = jnp.pad(w, ((0, pad), (0, 0)))
    Kp = K + pad
    nblk = Kp // block

    wb = w.reshape(nblk, block, N)
    absmax = jnp.max(jnp.abs(wb), axis=1)                   # [nblk, N]
    safe = jnp.where(absmax > 0, absmax, 1.0)
    idx = _nearest_code(wb / safe[:, None, :])              # [nblk, b, N]
    idx = idx.reshape(Kp, N)
    lo = idx[0::2, :]
    hi = idx[1::2, :]
    packed = (lo | (hi << 4)).astype(jnp.uint8)             # [Kp/2, N]

    # double quantization of absmax: mean offset + blockwise-256 int8
    flat = absmax.reshape(-1)
    offset = jnp.mean(flat)
    centered = flat - offset
    gpad = (-centered.shape[0]) % NF4_DQ_GROUP
    cg = jnp.pad(centered, (0, gpad)).reshape(-1, NF4_DQ_GROUP)
    amax2 = jnp.max(jnp.abs(cg), axis=1)
    scale2 = jnp.where(amax2 > 0, amax2 / 127.0, 1.0)       # [ngroups]
    aq = jnp.clip(jnp.round(cg / scale2[:, None]), -127, 127)
    absmax_q = aq.reshape(-1)[:flat.shape[0]].reshape(
        nblk, N).astype(jnp.int8)

    return NF4Linear(packed, absmax_q, scale2.astype(jnp.float32),
                     offset.astype(jnp.float32), bias, K, N, block)


def _dequant_absmax(q: NF4Linear) -> jnp.ndarray:
    """[nblk, out] fp32 block absmax from the double-quantized form."""
    nblk, N = q.absmax_q.shape
    flat = q.absmax_q.reshape(-1).astype(jnp.float32)
    gpad = (-flat.shape[0]) % NF4_DQ_GROUP
    fg = jnp.pad(flat, (0, gpad)).reshape(-1, NF4_DQ_GROUP)
    dec = fg * q.dq_scale[:, None]
    return (dec.reshape(-1)[:nblk * N].reshape(nblk, N)
            + q.dq_offset)


def dequantize_nf4(q: NF4Linear, dtype=jnp.float32) -> jnp.ndarray:
    """NF4Linear -> dense [in_features, out_features] weight."""
    code = jnp.asarray(NF4_CODE)
    lo = code[(q.qweight & 0xF).astype(jnp.int32)]   # even rows
    hi = code[(q.qweight >> 4).astype(jnp.int32)]    # odd rows
    Kp2, N = q.qweight.shape
    vals = jnp.stack([lo, hi], axis=1).reshape(2 * Kp2, N)
    absmax = _dequant_absmax(q)                      # [nblk, N]
    w = (vals.reshape(-1, q.block, N) * absmax[:, None, :]).reshape(
        2 * Kp2, N)
    return w[:q.in_features, :q.out_features].astype(dtype)


def _code_select_tree(nib: jnp.ndarray) -> jnp.ndarray:
    """NF4 code index [..] uint8 -> fp32 code VALUE, branchlessly.

    A depth-4 binary select tree on the nibble bits (8+4+2+1 = 15
    ``where``s + 4 bit tests) replaces the 16-entry gather. Every op is
    elementwise, so XLA treats the whole lookup like the int4/int8
    arithmetic dequants — fusable into the consuming dot's operand
    load — where a gather never is. Measured on the 3B head (BENCH.md
    round 5): 5.5/6.4/9.5 ms at M=8/320/1024 vs the gather-materialize
    route's flat ~21 ms."""
    bits = [(nib & (1 << b)) > 0 for b in range(4)]
    level = [jnp.float32(c) for c in NF4_CODE]
    for b in range(4):
        level = [jnp.where(bits[b], level[2 * i + 1], level[2 * i])
                 for i in range(len(level) // 2)]
    return level[0]


def _nf4_matmul_fused(x2: jnp.ndarray, q: NF4Linear) -> jnp.ndarray:
    """Fused-XLA row-pair NF4 matmul: x2 [M, in] -> [M, out] fp32.

    Same formulation as ops/quant._int4_gemv_xla — split x into even/
    odd input rows matching the low/high nibbles, dequantize each
    nibble plane with a pure-elementwise chain (select-tree codebook ×
    broadcast block absmax), and let XLA fuse the chain into the two
    fp32 dot operands. The block absmax [nblk, out] is dequantized
    once per call (tiny: in/64 × out fp32) and broadcast across each
    block's 32 packed rows by reshape — elementwise, no repeat.
    """
    K = q.in_features
    xe = x2[:, 0:K:2].astype(jnp.float32)
    xo = x2[:, 1:K:2].astype(jnp.float32)
    K2p = q.qweight.shape[0]
    # block-padded rows (and the odd-K high nibble): zero x contribution
    if K2p > xe.shape[1]:
        xe = jnp.pad(xe, ((0, 0), (0, K2p - xe.shape[1])))
    if K2p > xo.shape[1]:
        xo = jnp.pad(xo, ((0, 0), (0, K2p - xo.shape[1])))
    am = _dequant_absmax(q)                       # [nblk, N] fp32
    nblk, N = am.shape
    half = q.block // 2                           # packed rows per block
    am2 = jnp.broadcast_to(am[:, None, :], (nblk, half, N)).reshape(
        nblk * half, N)                           # [Kp/2, N]
    lo = _code_select_tree(q.qweight & 0xF) * am2
    hi = _code_select_tree(q.qweight >> 4) * am2
    return (jnp.dot(xe, lo, preferred_element_type=jnp.float32)
            + jnp.dot(xo, hi, preferred_element_type=jnp.float32))


# Cutoff for the fused route = the edge of measurement: the select-tree
# route won at every measured M (8..4096, BENCH.md round 5 — 20.8 vs
# 31.3 ms even at M=4096). Beyond it the per-M-tile re-dequant cost
# keeps growing while the materialize route pays its ~622 MB weight
# write once, so bulk-prefill M falls back to bf16 materialize.
_NF4_FUSED_MAX_M = 4096


def nf4_matmul(x: jnp.ndarray, q: NF4Linear, out_dtype=None
               ) -> jnp.ndarray:
    """x [.., in] @ dequant(q) [in, out] (+bias), fp32 accumulation.

    Routing (measured on the 3B untied head [2048, 151936], BENCH.md
    round 5): M <= 4096 takes the fused row-pair route — the
    select-tree codebook replaces the gather, so the dequant chain
    fuses into the dot operands like the int4 route and no fp weight
    reaches HBM. Measured: 5.5/6.4/9.5/13.2/20.8 ms at
    M=8/320/1024/2048/4096 vs the materialize route's ~21-31 ms (2.4-
    3.9x); still ~2x routed int4, so int8/int4 remain the speed picks.
    Beyond the measured range (bulk prefill) the bf16 materialize
    route is the conservative fallback. The 16-entry gather is never
    used in a matmul: it is what made NF4 ~9-18x slower than int4
    before this route (the gather itself, not the bytes).
    """
    lead = x.shape[:-1]
    M = int(np.prod(lead)) if lead else 1
    if M <= _NF4_FUSED_MAX_M:
        y = _nf4_matmul_fused(x.reshape(M, x.shape[-1]), q)
        y = y.reshape(*lead, q.out_features)
    else:
        mat_dtype = jnp.bfloat16 if jax.default_backend() == "tpu" \
            else jnp.float32
        w = dequantize_nf4(q, mat_dtype)
        y = jnp.dot(x.astype(mat_dtype), w,
                    preferred_element_type=jnp.float32)
    if q.bias is not None:
        y = y + q.bias.astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)
