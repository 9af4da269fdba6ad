"""Fused short-sequence attention (Pallas, TPU).

The CLIP towers run at tiny sequence lengths (vision 197 = 196 patches +
CLS at 224^2/p16, text 77) where stock flash-attention kernels lose to
their own pad-to-block overhead (rejected in round 1). This kernel keeps
the WHOLE sequence of a (batch-tile, head) in VMEM: one matmul ->
softmax -> matmul chain per program, so the [T, T] score/prob tensors
never round-trip HBM (XLA materializes both per layer — at B=128,
ViT-B/16 that is ~0.5 GB of score traffic per layer).

Supported masks: ``None`` (vision), ``[T, T]`` (causal), ``[B, 1, T, T]``
(padding+causal, HF CLIP text layout). Backward (full fine-tune mode)
is a custom VJP that recomputes attention in plain XLA — the kernel is
forward-only by design since every reference pipeline freezes the
towers (model_t.py:158, model_v.py:269; trainer.py:40-43 trains
adapters only).

Enable via ``set_fused_attention(True)`` (models/layers.py consults it)
or per-call. Equivalence vs the XLA path is tested in
tests/test_fused_ops.py; interpret mode covers CPU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BATCH_TILE = 16  # measured sweet spot: 32 OOMs VMEM at T=197, 8 underfills

_ENABLED = False


def set_fused_attention(on: bool) -> None:
    """Global opt-in used by models/layers.py:mha."""
    global _ENABLED
    _ENABLED = bool(on)


def fused_attention_enabled() -> bool:
    return _ENABLED


def supports(mask: Optional[jnp.ndarray], T: int) -> bool:
    """Mask layouts this kernel handles."""
    if mask is None:
        return True
    if mask.ndim == 2:
        return mask.shape == (T, T)
    if mask.ndim == 4:
        return mask.shape[1] == 1 and mask.shape[2:] == (T, T)
    return False


def _attn_kernel_nomask(q_ref, k_ref, v_ref, o_ref, *, scale):
    _attn_body(q_ref, k_ref, v_ref, None, o_ref, scale)


def _attn_kernel_mask(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale):
    _attn_body(q_ref, k_ref, v_ref, m_ref, o_ref, scale)


def _attn_body(q_ref, k_ref, v_ref, m_ref, o_ref, scale):
    q = q_ref[:, 0]  # [NB, T, d] in input dtype (bf16 -> MXU bf16 path)
    k = k_ref[:, 0]
    v = v_ref[:, 0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [NB, T, T] fp32
    if m_ref is not None:
        m = m_ref[:]
        m = m[:, 0] if m.ndim == 4 else m[None]
        s = s + m.astype(jnp.float32)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[:, 0] = o.astype(o_ref.dtype)


def _xla_attention(q, k, v, scale, mask):
    """Reference path; also the custom-VJP backward (recompute)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        m = mask if mask.ndim == 4 else mask[None, None]
        s = s + m.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale, mask=None):
    """Attention over [B, h, T, d] q/k/v -> [B, h, T, d].

    Whole-sequence-in-VMEM Pallas kernel (softmax fp32); see module
    docstring for supported mask layouts. Falls back to XLA off-TPU
    via interpret mode semantics.
    """
    return _fused_attention_fwd_impl(q, k, v, scale, mask)


def _fused_attention_fwd_impl(q, k, v, scale, mask):
    B, h, T, d = q.shape
    if mask is not None and mask.ndim == 4 and mask.shape[0] != B:
        # batch-broadcast masks ([1, 1, T, T] — what the CLIP text tower
        # emits when attention_mask is None) must be materialized to B
        # BEFORE batch padding/tiling, or the kernel reads out-of-range
        # mask blocks and returns silently wrong attention
        mask = jnp.broadcast_to(mask, (B,) + mask.shape[1:])
    nb = _BATCH_TILE
    pad = (-B) % nb
    if pad:
        zpad = [(0, pad), (0, 0), (0, 0), (0, 0)]
        q = jnp.pad(q, zpad)
        k = jnp.pad(k, zpad)
        v = jnp.pad(v, zpad)
        if mask is not None and mask.ndim == 4:
            mask = jnp.pad(mask, [(0, pad), (0, 0), (0, 0), (0, 0)])
    Bp = B + pad

    qkv_spec = pl.BlockSpec((nb, 1, T, d), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
    if mask is None:
        kernel = functools.partial(_attn_kernel_nomask, scale=scale)
    else:
        kernel = functools.partial(_attn_kernel_mask, scale=scale)
        if mask.ndim == 2:
            in_specs.append(pl.BlockSpec((T, T), lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((nb, 1, T, T),
                                         lambda i, j: (i, 0, 0, 0),
                                         memory_space=pltpu.VMEM))
        args.append(mask)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // nb, h),
        in_specs=in_specs,
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, h, T, d), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(*args)
    return out[:B] if pad else out


def _fwd(q, k, v, scale, mask):
    return _fused_attention_fwd_impl(q, k, v, scale, mask), (q, k, v, mask)


def _bwd(scale, res, g):
    # XLA recompute backward: p = softmax(qk'), o = pv.
    # dv = p' g; dp = g v'; ds = p * (dp - sum(dp * p)); dq = ds k * scale;
    # dk = ds' q * scale. Only exercised in full fine-tune mode.
    q, k, v, mask = res
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if mask is not None:
        m = mask if mask.ndim == 4 else mask[None, None]
        s = s + m.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    g32 = g.astype(jnp.float32)
    p32 = p.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p32, g32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", g32, v.astype(jnp.float32))
    ds = p32 * (dp - jnp.sum(dp * p32, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32)) * scale
    dmask = None
    if mask is not None:
        dm = ds.astype(jnp.float32)
        if mask.ndim == 2:
            dmask = dm.sum(axis=(0, 1)).astype(mask.dtype)
        else:
            dmask = dm.sum(axis=1, keepdims=True)
            if mask.shape[0] == 1:  # batch-broadcast mask cotangent
                dmask = dmask.sum(axis=0, keepdims=True)
            dmask = dmask.astype(mask.dtype)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dmask)


fused_attention.defvjp(_fwd, _bwd)
