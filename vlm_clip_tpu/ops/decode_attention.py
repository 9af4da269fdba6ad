"""Streaming fused decode-attention for the cached GQA path.

The jnp cached-attention route (`vlm/qwen_model._gqa_attention_cached`)
materializes fp32 scores/probs of shape [B, kv, rep, T, S+T] in HBM
every decode step — ~4 MB per layer at B=128/S=512/T=1 and ~16 MB at
the speculative-verify shape B=64/S=768/T=5. This kernel streams the
KV cache in S-chunks with an online softmax so those tensors never
reach HBM — and it is a measured NEGATIVE result, default OFF (see the
table at `_DECODE_ATTN_PALLAS_ENABLED` below): XLA's batched-GEMM
lowering of the same semantics is ~2x faster at every production
shape because the op is skinny (8 query rows per kv head) and the
kernel's serialized per-head dots can't fill the MXU. What round 4
kept from this attempt is the CANONICAL mask contract (`mask=None` in
text_forward) and `decode_attention_reference`, which builds the mask
from per-row depths inside jit instead of materializing [B,1,1,S]
masks on every decode step. The module stays as the documented
negative + a working kernel for future shapes (tiny-B long-S wins
1.1x today).

Semantics (the CANONICAL decode contract shared by every decode caller
— vlm/engine.py `_engine_steps`/`_engine_spec_steps` and
vlm/qwen.py `decode_step_inner` all construct exactly this mask):

- q [B, T, h, d] attends cache columns ``col < depth_b`` (per-row
  depths [B]; the stale-row cut IS the mask) plus a causal triangle
  over the T fresh columns (speculative verification blocks: fresh
  position i attends fresh cols <= i). With T == 1 the self column is
  trivially admitted. Equivalent to the reference's HF
  write-then-attend decode semantics (model_v.py:108-118) for each
  position.
- int8 KV cache: per-row scales fold algebraically — k scales into the
  scores (per-source-column multiply), v scales into the probs before
  the PV dot — identical to the jnp route's folding (BENCH.md round 3),
  but applied in VMEM.

Kernel structure: grid (B, S/chunk); each program streams one
[chunk, kv, d] contiguous cache slice (both kv heads together — one
DMA, 512-byte-aligned rows) and updates per-kv-head flash accumulators
held in VMEM scratch across the chunk axis; the fresh block and the
final normalization run on the last chunk. Masked scores use -1e30
(finite: a fully-masked chunk yields alpha = exp(0) = 1, not NaN) and
masked probs are explicitly zeroed so block padding can never leak.

Off-TPU the dispatcher returns the jnp reference path — the kernel is
exercised hermetically via ``interpret=True`` in tests
(tests/test_decode_attention.py), keeping the suite fast.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default OFF: the kernel is a measured NEGATIVE result (round 4).
# 36-layer scanned A/B on the real v5e chip, int8 KV, min-of-4:
#   B=128 T=1 S=512:  jnp 125 us/layer (268 GB/s)  pallas 237 (0.53x)
#   B=64  T=5 S=768:  jnp 123 us/layer            pallas 279 (0.44x)
#   B=64  T=1 S=4096: jnp 446 us/layer (301 GB/s)  pallas 852 (0.52x)
#   B=8   T=5 S=768:  jnp 108 us/layer            pallas  95 (1.14x)
#   B=16  T=1 S=8192: jnp 512 us/layer            pallas 460 (1.11x)
# The op is inherently skinny (rep=8 query rows per kv head): the
# kernel's per-(row, head) dots fill 8/128 MXU rows and serialize 16
# dot->VPU->dot chains per program (~150 GB/s ceiling), while XLA's
# batched-GEMM route for the SAME semantics hits ~300 GB/s. Streaming
# only wins where batched-GEMM overhead dominates (tiny B or very long
# S at small B) — not worth a routing split. Third and final attention
# kernel attempt; see BENCH.md round 4.
_DECODE_ATTN_PALLAS_ENABLED = \
    os.environ.get("VLM_CLIP_DECODE_ATTN_PALLAS", "0") == "1"
_NEG = -3.4028235e38  # additive-mask -inf used by the jnp reference


def set_decode_attn_pallas(on: bool) -> None:
    """Test/debug escape hatch: force the jnp reference route."""
    global _DECODE_ATTN_PALLAS_ENABLED
    _DECODE_ATTN_PALLAS_ENABLED = bool(on)


def decode_attention_reference(q, k_old, v_old, k_cur, v_cur, depths,
                               k_scale=None, v_scale=None):
    """jnp canonical-decode attention (no HBM-materialization savings).

    Numerically identical to `_gqa_attention_cached` with the canonical
    masks built from ``depths`` — used off-TPU and as the parity oracle
    for the kernel.
    """
    B, T, h, d = q.shape
    S = k_old.shape[1]
    kv = k_old.shape[2]
    rep = h // kv
    qg = q.reshape(B, T, kv, rep, d)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S,), 0)
    neg = jnp.float32(_NEG)
    mask_past = jnp.where(cols[None, None, None] >= depths[:, None, None,
                                                           None],
                          neg, 0.0)                      # [B, 1, 1, S]
    tri = jnp.tril(jnp.ones((T, T), bool))
    mask_self = jnp.where(tri, 0.0, neg)[None, None]     # [1, 1, T, T]
    s_past = jnp.einsum("btkrd,bskd->bkrts", qg, k_old.astype(q.dtype),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    if k_scale is not None:
        s_past = s_past * jnp.transpose(
            k_scale, (0, 2, 1))[:, :, None, None, :]
    s_past = s_past + mask_past[:, :, None]
    s_self = jnp.einsum("btkrd,bskd->bkrts", qg, k_cur.astype(q.dtype),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    s_self = s_self + mask_self[:, :, None]
    s = jnp.concatenate([s_past, s_self], axis=-1)
    probs = jax.nn.softmax(s, axis=-1)
    p_past = probs[..., :S]
    if v_scale is not None:
        p_past = p_past * jnp.transpose(
            v_scale, (0, 2, 1))[:, :, None, None, :]
    p_past = p_past.astype(q.dtype)
    p_self = probs[..., S:].astype(q.dtype)
    out = jnp.einsum("bkrts,bskd->btkrd", p_past, v_old.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bkrts,bskd->btkrd", p_self,
                           v_cur.astype(q.dtype),
                           preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(B, T, h * d)


def _make_kernel(T, rep, kv, d, chunk, quant, q_dtype, scale, S, BB):
    R = T * rep
    mneg = -1e30  # finite: -1e30 - -1e30 == 0, not NaN like -inf

    def online_update(i, s, valid, pv_fn, vs_row, m_ref, l_ref, acc_ref):
        s = jnp.where(valid, s * scale, mneg)
        m_old = m_ref[i]
        m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(valid, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_old - m_new)
        l_ref[i] = l_ref[i] * alpha + jnp.sum(p, axis=1, keepdims=True)
        if vs_row is not None:
            # fold v scales into the probs; where-guard because the
            # scale block's out-of-bounds padding is undefined (NaN in
            # the interpreter, arbitrary bits on TPU) and 0 * NaN = NaN
            p = p * jnp.where(valid, vs_row, 0.0)
        acc_ref[i] = acc_ref[i] * alpha + pv_fn(p)
        m_ref[i] = m_new

    # Layout: all tensor blocks keep (rows, kv*d) tile planes — the kv
    # axis is flattened into lanes so the inner tile is (chunk, kv*128),
    # never a (kv=2, d) sliver Mosaic would pad 8x to the min sublane
    # tile. Per-(row, head) operands are static slices.
    # BB batch rows per program: with one row per program the ~2 us of
    # per-program grid overhead dominated the ~0.5 us of DMA+compute and
    # the kernel measured 2x SLOWER than the jnp route (round 4).
    def kernel(depth_ref, q_ref, kc_ref, vc_ref, ko_ref, vo_ref, *args):
        if quant:
            ks_ref, vs_ref, out_ref, m_ref, l_ref, acc_ref = args
        else:
            out_ref, m_ref, l_ref, acc_ref = args
        j = pl.program_id(1)
        nc = pl.num_programs(1)

        @pl.when(j == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, mneg)
            l_ref[:] = jnp.zeros_like(l_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        cols = j * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, chunk), 1)

        for b in range(BB):
            depth = depth_ref[pl.program_id(0) * BB + b]
            valid = cols < depth                         # [1, chunk]
            for k in range(kv):
                i = b * kv + k
                qk = q_ref[b, k * R:(k + 1) * R, :]      # [R, d]
                s = jax.lax.dot_general(
                    qk, ko_ref[b, :, k * d:(k + 1) * d].astype(q_dtype),
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [R, chunk]
                if quant:
                    s = s * ks_ref[b, k][None, :]
                vs_row = vs_ref[b, k][None, :] if quant else None
                v_mat = vo_ref[b, :, k * d:(k + 1) * d]
                if S % chunk:
                    # ragged final chunk: out-of-bounds block padding
                    # is undefined (NaN in the interpreter) — its probs
                    # are already zeroed via ``valid``, but 0 * NaN =
                    # NaN in the PV dot, so zero the pad V rows too
                    cb = j * chunk + jax.lax.broadcasted_iota(
                        jnp.int32, (chunk, 1), 0)
                    v_mat = jnp.where(cb < S, v_mat, 0)

                def pv_fn(p, v_mat=v_mat):
                    return jax.lax.dot_general(
                        p.astype(q_dtype), v_mat.astype(q_dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)

                online_update(i, s, valid, pv_fn, vs_row,
                              m_ref, l_ref, acc_ref)

        @pl.when(j == nc - 1)
        def _():
            # fresh block: T <= 16 columns — tiny-N dots trip Mosaic's
            # MXU lowering, and the VPU does R*d*T fp32 mult-reduces in
            # noise time, MORE accurately than the bf16 reference dots
            row_t = jax.lax.broadcasted_iota(jnp.int32, (R, T), 0) // rep
            col_t = jax.lax.broadcasted_iota(jnp.int32, (R, T), 1)
            causal = col_t <= row_t
            for b in range(BB):
                for k in range(kv):
                    i = b * kv + k
                    qk = q_ref[b, k * R:(k + 1) * R, :] \
                        .astype(jnp.float32)
                    s = jnp.concatenate(
                        [jnp.sum(qk * kc_ref[b, t, k * d:(k + 1) * d]
                                 .astype(jnp.float32)[None, :],
                                 axis=1, keepdims=True)
                         for t in range(T)], axis=1)     # [R, T] fp32

                    def pv_fn(p, b=b, k=k):
                        acc = jnp.zeros((R, d), jnp.float32)
                        for t in range(T):
                            acc = acc + p[:, t:t + 1] * vc_ref[
                                b, t, k * d:(k + 1) * d
                            ].astype(jnp.float32)[None, :]
                        return acc

                    online_update(i, s, causal, pv_fn, None,
                                  m_ref, l_ref, acc_ref)
                    out_ref[b, k * R:(k + 1) * R, :] = \
                        acc_ref[i] / l_ref[i]

    return kernel


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def decode_attention_pallas(q, k_old, v_old, k_cur, v_cur, depths,
                            k_scale=None, v_scale=None, *,
                            chunk: int = 512, interpret: bool = False):
    """Pallas streaming kernel; same contract as the reference above.

    ``interpret=True`` runs the Mosaic interpreter (CPU tests)."""
    B, T, h, d = q.shape
    S = k_old.shape[1]
    kv = k_old.shape[2]
    rep = h // kv
    R = T * rep
    chunk = min(chunk, _round_up(S, 128))
    nc = pl.cdiv(S, chunk)
    quant = k_scale is not None
    # batch rows per program: amortizes the ~2 us/program grid overhead
    # that made the one-row-per-program variant 2x slower than jnp
    BB = next(bb for bb in (8, 4, 2, 1) if B % bb == 0)

    # [B, T, kv, rep, d] -> [B, kv*T*rep, d]; row k*R + r with
    # r = t*rep + rr, so the fresh-block causal compare is a row div.
    # The cache flattens its (kv, d) tail into lanes — a free reshape
    # of contiguous memory — so blocks carry (chunk, kv*d) tile planes.
    qr = q.reshape(B, T, kv, rep, d).transpose(0, 2, 1, 3, 4) \
          .reshape(B, kv * R, d)
    k_old = k_old.reshape(B, S, kv * d)
    v_old = v_old.reshape(B, S, kv * d)
    kc = k_cur.astype(q.dtype).reshape(B, T, kv * d)
    vc = v_cur.astype(q.dtype).reshape(B, T, kv * d)
    depths2 = jnp.broadcast_to(depths.astype(jnp.int32), (B,))

    in_specs = [
        pl.BlockSpec((BB, kv * R, d), lambda i, j, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, T, kv * d), lambda i, j, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, T, kv * d), lambda i, j, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, chunk, kv * d), lambda i, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((BB, chunk, kv * d), lambda i, j, *_: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qr, kc, vc, k_old, v_old]
    if quant:
        # [B, S, kv] -> [B, kv, S]: scale rows land along lanes so the
        # per-column score/prob folds are plain lane broadcasts
        args += [jnp.transpose(k_scale, (0, 2, 1)),
                 jnp.transpose(v_scale, (0, 2, 1))]
        in_specs += [pl.BlockSpec((BB, kv, chunk),
                                  lambda i, j, *_: (i, 0, j),
                                  memory_space=pltpu.VMEM)] * 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # depths [B], read depth_ref[i*BB + b]
        grid=(B // BB, nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BB, kv * R, d),
                               lambda i, j, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((BB * kv, R, 1), jnp.float32),
                        pltpu.VMEM((BB * kv, R, 1), jnp.float32),
                        pltpu.VMEM((BB * kv, R, d), jnp.float32)],
    )
    out = pl.pallas_call(
        _make_kernel(T, rep, kv, d, chunk, quant, q.dtype,
                     float(d) ** -0.5, S, BB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, kv * R, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(depths2, *args)
    out = out.reshape(B, kv, T, rep, d).transpose(0, 2, 1, 3, 4)
    return out.astype(q.dtype).reshape(B, T, h * d)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def decode_attention(q, k_old, v_old, k_cur, v_cur, depths,
                     k_scale=None, v_scale=None):
    """Dispatcher: Pallas streaming kernel on TPU (lane-aligned head
    dim, non-trivial cache), jnp reference elsewhere."""
    d = q.shape[-1]
    S = k_old.shape[1]
    if (_DECODE_ATTN_PALLAS_ENABLED and jax.default_backend() == "tpu"
            and d % 128 == 0 and S >= 128 and q.shape[1] <= 16):
        return decode_attention_pallas(q, k_old, v_old, k_cur, v_cur,
                                       depths, k_scale, v_scale)
    return decode_attention_reference(q, k_old, v_old, k_cur, v_cur,
                                      depths, k_scale, v_scale)
