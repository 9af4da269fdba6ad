"""Fused Pallas TPU kernels for the bottleneck-adapter hot ops.

Two fusions (BASELINE.json north star: "the bottleneck adapter modules
become fused Pallas kernels"):

1. :func:`feature_adapter_blend_fused` — the T/V feature-branch op
   (model_t.py:163-169 semantics):
       y = l2norm( r * (relu(x@W1+b1)@W2+b2) + (1-r) * x )
2. :func:`seq_adapter_fused` — the M sequence-adapter op
   (clip_adapter.py:17-23 semantics):
       y = LN( x + gelu(x@W1+b1)@W2+b2 )

Each is one VMEM-resident pass over the rows: x is read from HBM once and
y written once, vs. the unfused graph's materialized [N, K] bottleneck +
blend + norm intermediates. Both carry custom VJPs whose backward is also
a single fused kernel (recomputing the cheap bottleneck activations
instead of saving them — remat inside the kernel).

Grid: 1-D over row tiles; weights live fully in VMEM (<=1.5 MB for
H=1024, K=256). Weight/bias gradients are accumulated across the
sequential TPU grid into constant-index output blocks. All math fp32
internally regardless of input dtype (adapters are numerically sensitive:
they sit right before an L2/LN normalization).

Off-TPU these run through the Pallas interpreter (slow but exact), so the
same code path is testable on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 256


def fused_enabled() -> bool:
    """Auto-dispatch gate for the Pallas adapter kernels.

    Single TPU device only: under multi-chip GSPMD a pallas_call has no
    partitioning rule, so XLA replicates it — all-gathering the
    batch-sharded activations onto every chip, a silent perf cliff.
    Sharded meshes take the jnp path (identical semantics); wrapping
    the kernels in shard_map over the data axis is the future
    single-kernel-per-shard route.
    """
    return jax.default_backend() == "tpu" and jax.device_count() == 1


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _erf(x):
    """fp32-accurate erf (Abramowitz & Stegun 7.1.26, |err| <= 1.5e-7).

    Pallas TPU has no erf/erfc lowering; exp/mul/select it does.
    """
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _gelu(x):
    # exact GELU via erf (matches torch nn.GELU / jax.nn.gelu exact mode
    # to fp32 tolerance)
    return 0.5 * x * (1.0 + _erf(x * (1.0 / jnp.sqrt(2.0))))


def _cdiv(a, b):
    return -(-a // b)


# ===========================================================================
# 1. feature adapter + blend + l2norm (T/V)
# ===========================================================================

def _dropout_mask(shape, seed, keep_prob):
    """Deterministic in-kernel dropout mask (remat of randomness).

    Counter-based murmur-style hash over (row, col, seed, tile) — the
    backward regenerates the identical mask from the same seed, and the
    same code lowers on TPU Mosaic and the CPU interpreter (pltpu.prng_*
    has no interpreter lowering)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    key = (seed.astype(jnp.uint32)
           + pl.program_id(0).astype(jnp.uint32) * jnp.uint32(1000003))
    h = (rows * jnp.uint32(0x9E3779B1)) ^ (cols * jnp.uint32(0x85EBCA77)) \
        ^ (key * jnp.uint32(0xC2B2AE3D))
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> 12)
    h = h * jnp.uint32(0x297A2D39)
    h = h ^ (h >> 15)
    threshold = jnp.uint32(keep_prob * 4294967295.0)
    return (h < threshold).astype(jnp.float32) / keep_prob


def _feat_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, r_ref,
                     seed_ref, y_ref, *, dropout: float):
    x = x_ref[:].astype(jnp.float32)
    h = jnp.maximum(
        jnp.dot(x, w1_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)
        + b1_ref[:].astype(jnp.float32), 0.0)
    if dropout > 0.0:
        h = h * _dropout_mask(h.shape, seed_ref[0], 1.0 - dropout)
    a = jnp.dot(h, w2_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32)
    r = r_ref[0]
    z = r * a + (1.0 - r) * x
    inv = jax.lax.rsqrt(jnp.sum(z * z, axis=-1, keepdims=True))
    y_ref[:] = (z * inv).astype(y_ref.dtype)


def _feat_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, r_ref,
                     seed_ref, g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref,
                     db2_ref, *, dropout: float):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    w1 = w1_ref[:].astype(jnp.float32)
    w2 = w2_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    r = r_ref[0]

    # recompute forward intermediates (remat, incl. the dropout mask —
    # the per-tile seed regenerates the exact forward bits)
    pre = jnp.dot(x, w1, preferred_element_type=jnp.float32) \
        + b1_ref[:].astype(jnp.float32)
    relu = jnp.maximum(pre, 0.0)
    if dropout > 0.0:
        mask = _dropout_mask(relu.shape, seed_ref[0], 1.0 - dropout)
        h = relu * mask
    else:
        mask = None
        h = relu
    a = jnp.dot(h, w2, preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32)
    z = r * a + (1.0 - r) * x
    inv = jax.lax.rsqrt(jnp.sum(z * z, axis=-1, keepdims=True))
    y = z * inv

    # d l2norm: dz = (g - y * <g, y>) * inv
    dz = (g - y * jnp.sum(g * y, axis=-1, keepdims=True)) * inv
    da = r * dz
    dh = jnp.dot(da, w2.T, preferred_element_type=jnp.float32)
    if mask is not None:
        dh = dh * mask
    dh = jnp.where(pre > 0.0, dh, 0.0)
    dx = (1.0 - r) * dz + jnp.dot(dh, w1.T,
                                  preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    # weight grads: accumulate across the sequential grid
    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    dw1_ref[:] += jnp.dot(x.T, dh, preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dh, axis=0)
    dw2_ref[:] += jnp.dot(h.T, da, preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(da, axis=0)


def _pad_rows(x, tile, fill=1.0):
    """Pad rows to a tile multiple. fill=1 for inputs (avoids zero-norm
    rows in the fwd l2norm), fill=0 for cotangents (padding must not
    contribute to weight grads)."""
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], fill, x.dtype)], axis=0)
    return x, n


def _gelu_grad(x):
    # d/dx [x * Phi(x)] = Phi(x) + x * phi(x), exact-GELU derivative
    phi = jnp.exp(-0.5 * x * x) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    Phi = 0.5 * (1.0 + _erf(x * (1.0 / jnp.sqrt(2.0))))
    return Phi + x * phi


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def feature_adapter_blend_fused(x, w1, b1, w2, b2, ratio: float,
                                dropout: float = 0.0, seed=None):
    """y = l2norm(ratio*MLP_relu(x) + (1-ratio)*x), one fused kernel.

    x: [N, D]; w1: [D, K]; w2: [K, D]. Semantically identical to
    adapters.adapt_features — tested against it. With ``dropout`` > 0,
    an in-kernel PRNG mask is applied between relu and fc2
    (model_v.py:26-27 semantics); the backward regenerates the identical
    mask from the same per-tile seed. ``seed``: int32 array.
    """
    return _feat_fwd(x, w1, b1, w2, b2, ratio, dropout, seed)


def _seed_arr(seed):
    if seed is None:
        return jnp.zeros((1,), jnp.int32)
    return jnp.asarray(seed, jnp.int32).reshape(1)


def _feat_fwd(x, w1, b1, w2, b2, ratio, dropout=0.0, seed=None):
    xp, n = _pad_rows(x, ROW_TILE)
    N, D = xp.shape
    r = jnp.asarray([ratio], jnp.float32)
    y = pl.pallas_call(
        functools.partial(_feat_fwd_kernel, dropout=dropout),
        grid=(N // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=_interpret(),
    )(xp, w1, b1, w2, b2, r, _seed_arr(seed))
    return y[:n]


def _feat_fwd_rule(x, w1, b1, w2, b2, ratio, dropout, seed=None):
    return (_feat_fwd(x, w1, b1, w2, b2, ratio, dropout, seed),
            (x, w1, b1, w2, b2, seed))


def _feat_bwd_rule(ratio, dropout, res, g):
    x, w1, b1, w2, b2, seed = res
    xp, n = _pad_rows(x, ROW_TILE)
    gp, _ = _pad_rows(g, ROW_TILE, fill=0.0)
    N, D = xp.shape
    K = w1.shape[1]
    r = jnp.asarray([ratio], jnp.float32)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_feat_bwd_kernel, dropout=dropout),
        grid=(N // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), x.dtype),
            jax.ShapeDtypeStruct((D, K), jnp.float32),
            jax.ShapeDtypeStruct((K,), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
        ],
        interpret=_interpret(),
    )(xp, w1, b1, w2, b2, r, _seed_arr(seed), gp)
    dseed = None if seed is None else \
        jnp.zeros(jnp.shape(seed), jax.dtypes.float0)
    return (dx[:x.shape[0]], dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), dseed)


feature_adapter_blend_fused.defvjp(_feat_fwd_rule, _feat_bwd_rule)


# ===========================================================================
# 2. sequence adapter: LN(x + up(gelu(down(x)))) (M)
# ===========================================================================

def _seq_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref, lb_ref,
                    eps_ref, y_ref):
    x = x_ref[:].astype(jnp.float32)
    h = _gelu(jnp.dot(x, w1_ref[:].astype(jnp.float32),
                      preferred_element_type=jnp.float32)
              + b1_ref[:].astype(jnp.float32))
    z = x + jnp.dot(h, w2_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32)
    mean = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps_ref[0])
    y = zc * inv * ls_ref[:].astype(jnp.float32) \
        + lb_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _seq_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
                    eps_ref, g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref,
                    db2_ref, dls_ref, dlb_ref):
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)
    w1 = w1_ref[:].astype(jnp.float32)
    w2 = w2_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)

    pre = jnp.dot(x, w1, preferred_element_type=jnp.float32) \
        + b1_ref[:].astype(jnp.float32)
    h = _gelu(pre)
    z = x + jnp.dot(h, w2, preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32)
    D = z.shape[-1]
    mean = jnp.mean(z, axis=-1, keepdims=True)
    zc = z - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps_ref[0])
    xhat = zc * inv
    ls = ls_ref[:].astype(jnp.float32)

    # layernorm backward
    gx = g * ls
    dz = inv * (gx - jnp.mean(gx, axis=-1, keepdims=True)
                - xhat * jnp.mean(gx * xhat, axis=-1, keepdims=True))

    # mlp backward (gelu')
    dh = jnp.dot(dz, w2.T, preferred_element_type=jnp.float32)
    dpre = dh * _gelu_grad(pre)
    dx = dz + jnp.dot(dpre, w1.T, preferred_element_type=jnp.float32)
    dx_ref[:] = dx.astype(dx_ref.dtype)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)

    dw1_ref[:] += jnp.dot(x.T, dpre, preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dpre, axis=0)
    dw2_ref[:] += jnp.dot(h.T, dz, preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dz, axis=0)
    dls_ref[:] += jnp.sum(g * xhat, axis=0)
    dlb_ref[:] += jnp.sum(g, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def seq_adapter_fused(x, w1, b1, w2, b2, ln_scale, ln_bias,
                      eps: float = 1e-5):
    """y = LN(x + gelu(x@w1+b1)@w2+b2) over [N, H] rows, one fused kernel.

    Semantically identical to adapters.seq_adapter on the flattened
    [B*T, H] view — tested against it (forward AND grads).
    """
    return _seq_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, eps)


def _seq_fwd(x, w1, b1, w2, b2, ls, lb, eps):
    xp, n = _pad_rows(x, ROW_TILE)
    N, D = xp.shape
    e = jnp.asarray([eps], jnp.float32)
    y = pl.pallas_call(
        _seq_fwd_kernel,
        grid=(N // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ls.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(lb.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        interpret=_interpret(),
    )(xp, w1, b1, w2, b2, ls, lb, e)
    return y[:n]


def _seq_fwd_rule(x, w1, b1, w2, b2, ls, lb, eps):
    return _seq_fwd(x, w1, b1, w2, b2, ls, lb, eps), (x, w1, b1, w2, b2, ls)


def _seq_bwd_rule(eps, res, g):
    x, w1, b1, w2, b2, ls = res
    xp, n = _pad_rows(x, ROW_TILE)
    gp, _ = _pad_rows(g, ROW_TILE, fill=0.0)
    N, D = xp.shape
    K = w1.shape[1]
    e = jnp.asarray([eps], jnp.float32)
    outs = pl.pallas_call(
        _seq_bwd_kernel,
        grid=(N // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ls.shape, lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), x.dtype),
            jax.ShapeDtypeStruct((D, K), jnp.float32),
            jax.ShapeDtypeStruct((K,), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
        ],
        interpret=_interpret(),
    )(xp, w1, b1, w2, b2, ls, e, gp)
    dx, dw1, db1, dw2, db2, dls, dlb = outs
    return (dx[:x.shape[0]], dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), dls.astype(ls.dtype),
            dlb.astype(ls.dtype))


seq_adapter_fused.defvjp(_seq_fwd_rule, _seq_bwd_rule)


# ===========================================================================
# 3. pre-norm MLP block: x + fc2(gelu(fc1(LN(x)))) (cross-modal adapter, M)
# ===========================================================================
#
# The cross-modal adapter's MLP half (adapters.cross_modal_adapter,
# clip_adapter.py:120-127 semantics: h + mlp(norm3(h)) with exact GELU).
# Unlike the K<=256 bottleneck kernels above, the 4xH hidden (2048 for
# H=512) is too big to materialize: the kernel walks it in static
# 512-column chunks so the [R, 4H] activations never exist anywhere —
# each chunk's gelu(fc1) feeds fc2 immediately, and the backward
# REMATERIALIZES them chunk-by-chunk instead of saving them (the unfused
# autodiff stashes [B, T, 4H] fp32 per scanned layer — the dominant
# adapter-scan HBM traffic in the round-3 headline profile).
#
# Residency plan (v5e scoped VMEM 16 MB): weights ship in the INPUT dtype
# (bf16 under the train policies — 4 MB for H=512) and the fp32
# dw1/dw2 accumulators (8 MB) live in constant-index output blocks, so
# both stay VMEM-resident across the whole 1-D row-tile grid; only
# x/g/dx tiles stream. (A first cut used a 2-D (rows, chunks) grid with
# chunk-blocked dw outputs — the non-consecutive block revisits made
# Mosaic round-trip the 16 MB fp32 accumulators to HBM once per row
# tile, a measured -17% on the headline step.)
#
# Matmuls run in the input dtype with fp32 accumulation
# (preferred_element_type, exactly like layers.linear); LN statistics
# and all gradient accumulation stay fp32.

PN_ROW_TILE = 128
PN_K_CHUNK = 512


def _pn_chunks(K: int) -> int:
    """Number of static hidden-dim chunks (1 when K <= PN_K_CHUNK)."""
    if K % PN_K_CHUNK == 0 and K > PN_K_CHUNK:
        return K // PN_K_CHUNK
    return 1


def _ln_fwd(x, ls_ref, lb_ref, eps_ref):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    zc = x - mean
    var = jnp.mean(zc * zc, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps_ref[0])
    xhat = zc * inv
    u = xhat * ls_ref[:].astype(jnp.float32) + lb_ref[:].astype(jnp.float32)
    return u, xhat, inv


def _pnmlp_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, ls_ref,
                      lb_ref, eps_ref, y_ref, *, n_chunks: int):
    mm = x_ref.dtype  # matmul operand dtype (bf16 under train policies)
    x = x_ref[:].astype(jnp.float32)
    u, _, _ = _ln_fwd(x, ls_ref, lb_ref, eps_ref)
    um = u.astype(mm)
    acc = x + b2_ref[:].astype(jnp.float32)
    KC = w1_ref.shape[1] // n_chunks
    for c in range(n_chunks):
        lo, hi = c * KC, (c + 1) * KC
        pre = jnp.dot(um, w1_ref[:, lo:hi],
                      preferred_element_type=jnp.float32)             + b1_ref[0, lo:hi].astype(jnp.float32)
        h = _gelu(pre)
        acc += jnp.dot(h.astype(mm), w2_ref[lo:hi, :],
                       preferred_element_type=jnp.float32)
    y_ref[:] = acc.astype(y_ref.dtype)


def _pnmlp_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, ls_ref, lb_ref,
                      eps_ref, g_ref, dx_ref, dw1_ref, db1_ref, dw2_ref,
                      db2_ref, dls_ref, dlb_ref, *, n_chunks: int):
    i = pl.program_id(0)
    mm = x_ref.dtype
    x = x_ref[:].astype(jnp.float32)
    u, xhat, inv = _ln_fwd(x, ls_ref, lb_ref, eps_ref)
    um = u.astype(mm)
    g = g_ref[:].astype(jnp.float32)
    gm = g.astype(mm)

    @pl.when(i == 0)
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)

    du = jnp.zeros_like(u)
    KC = w1_ref.shape[1] // n_chunks
    for c in range(n_chunks):
        lo, hi = c * KC, (c + 1) * KC
        w1c = w1_ref[:, lo:hi]
        w2c = w2_ref[lo:hi, :]
        # remat this chunk's forward
        pre = jnp.dot(um, w1c, preferred_element_type=jnp.float32)             + b1_ref[0, lo:hi].astype(jnp.float32)
        h = _gelu(pre)
        dh = jnp.dot(gm, w2c.T, preferred_element_type=jnp.float32)
        dpre = dh * _gelu_grad(pre)
        dpm = dpre.astype(mm)
        du += jnp.dot(dpm, w1c.T, preferred_element_type=jnp.float32)
        dw1_ref[:, lo:hi] += jnp.dot(um.T, dpm,
                                     preferred_element_type=jnp.float32)
        db1_ref[0, lo:hi] += jnp.sum(dpre, axis=0)
        dw2_ref[lo:hi, :] += jnp.dot(h.astype(mm).T, gm,
                                     preferred_element_type=jnp.float32)

    # LN backward (stats recomputed from x — nothing saved)
    ls = ls_ref[:].astype(jnp.float32)
    dxhat = du * ls
    dx_ln = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                   - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    dx_ref[:] = (g + dx_ln).astype(dx_ref.dtype)
    db2_ref[:] += jnp.sum(g, axis=0)
    dls_ref[:] += jnp.sum(du * xhat, axis=0)
    dlb_ref[:] += jnp.sum(du, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def prenorm_mlp_fused(x, w1, b1, w2, b2, ln_scale, ln_bias,
                      eps: float = 1e-5):
    """y = x + gelu(LN(x)@w1+b1)@w2+b2 over [N, H] rows, one fused kernel.

    The cross-modal adapter MLP block (clip_adapter.py:120-127). The
    [N, 4H] hidden never touches HBM in forward OR backward (in-kernel
    remat). Matmuls run in x.dtype with fp32 accumulation; LN stats and
    weight-grad accumulation fp32.
    """
    return _pnmlp_fwd(x, w1, b1, w2, b2, ln_scale, ln_bias, eps)


def _pnmlp_fwd(x, w1, b1, w2, b2, ls, lb, eps):
    xp, n = _pad_rows(x, PN_ROW_TILE, fill=0.0)
    N, D = xp.shape
    K = w1.shape[1]
    nc = _pn_chunks(K)
    e = jnp.asarray([eps], jnp.float32)
    # weights stream once in the matmul dtype (4 MB bf16 for H=512
    # instead of 16 MB fp32), VMEM-resident across the whole grid
    wm = x.dtype
    y = pl.pallas_call(
        functools.partial(_pnmlp_fwd_kernel, n_chunks=nc),
        grid=(N // PN_ROW_TILE,),
        in_specs=[
            pl.BlockSpec((PN_ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            # b1 ships as (1, K): a chunk-sliced 1-D f32 vector trips
            # the XLA-vs-Mosaic 1-D tiling mismatch (T(1024) vs T(512))
            pl.BlockSpec((1, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((PN_ROW_TILE, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, w1.astype(wm), b1.reshape(1, K), w2.astype(wm), b2, ls, lb, e)
    return y[:n]


def _pnmlp_fwd_rule(x, w1, b1, w2, b2, ls, lb, eps):
    return (_pnmlp_fwd(x, w1, b1, w2, b2, ls, lb, eps),
            (x, w1, b1, w2, b2, ls, lb))


def _pnmlp_bwd_rule(eps, res, g):
    x, w1, b1, w2, b2, ls, lb = res
    xp, n = _pad_rows(x, PN_ROW_TILE, fill=0.0)
    gp, _ = _pad_rows(g, PN_ROW_TILE, fill=0.0)
    N, D = xp.shape
    K = w1.shape[1]
    nc = _pn_chunks(K)
    e = jnp.asarray([eps], jnp.float32)
    wm = x.dtype
    outs = pl.pallas_call(
        functools.partial(_pnmlp_bwd_kernel, n_chunks=nc),
        grid=(N // PN_ROW_TILE,),
        in_specs=[
            pl.BlockSpec((PN_ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((PN_ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((PN_ROW_TILE, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            # fp32 grad accumulators: constant-index, VMEM-resident for
            # the whole sequential grid (8 MB for H=512/K=2048)
            pl.BlockSpec((D, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, D), x.dtype),
            jax.ShapeDtypeStruct((D, K), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
            jax.ShapeDtypeStruct((K, D), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
            jax.ShapeDtypeStruct((D,), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, w1.astype(wm), b1.reshape(1, K), w2.astype(wm), ls, lb, e, gp)
    dx, dw1, db1, dw2, db2, dls, dlb = outs
    db1 = db1.reshape(K)
    return (dx[:x.shape[0]], dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype), dls.astype(ls.dtype),
            dlb.astype(lb.dtype))


prenorm_mlp_fused.defvjp(_pnmlp_fwd_rule, _pnmlp_bwd_rule)


# ===========================================================================
# 4. cross-modal attention block: q = LN(x@Wt); q + MHA(q, kv)@Wo (M)
# ===========================================================================
#
# The cross-modal adapter's attention half (adapters.cross_modal_adapter,
# clip_adapter.py:99-119): text projection -> pre-norm -> MHA against a
# BATCH-SHARED kv (the constant pseudo-image, model_m.py:95-100) -> out
# projection -> residual onto the NORMED text (reference quirk).
#
# Because every row attends the same Tk kv rows, attention is row-
# parallel and the per-head [R, hd] @ [hd, Tk] matmuls pack into ONE
# dense [R, H] @ [H, heads*64] matmul against a BLOCK-DIAGONAL key
# matrix (head h's keys occupy rows h*hd..(h+1)*hd and a 64-wide column
# segment; zeros elsewhere), and PV packs the same way — no head loop,
# no 3-D reshapes, every op lane-aligned. Per-head softmax runs
# segmented: one row-max over all segments (a shared per-row constant
# cancels per segment), masked exp, segment sums via an indicator-matrix
# matmul. Kbd/Vbd are built (and differentiated) OUTSIDE in XLA from the
# tiny [Tk, H] kv — see models/adapters.py.
#
# The backward REMATERIALIZES the whole forward per row tile (scores and
# probs are [R, heads*64] — never saved to HBM), mirroring the unfused
# autodiff's per-scanned-layer stash elimination of section 3.

ATTN_SEG_MAX = 256  # fused-path bound on the (padded) shared-kv rows


def attn_seg(Tk: int) -> int:
    """Per-head column segment: kv rows padded up to a lane multiple
    (pipeline M's pseudo-image is the 197-row position table -> 256)."""
    return max(128, -(-Tk // 128) * 128)


def _cab_seg_matrices(H_kv: int, heads: int, Tk: int, seg: int):
    """(seg [H_kv, heads] one-hot, mask [1, H_kv]) as fp32 iota exprs."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, H_kv), 1)
    mask = (col % seg < Tk).astype(jnp.float32)
    seg_col = jax.lax.broadcasted_iota(jnp.int32, (H_kv, heads), 0)
    seg_row = jax.lax.broadcasted_iota(jnp.int32, (H_kv, heads), 1)
    seg = (seg_col // seg == seg_row).astype(jnp.float32)
    return seg, mask


def _cab_forward(x, w_refs, eps_ref, *, heads, Tk, scale, mm):
    """Shared fwd math on one row tile. Returns the intermediates the
    backward needs (all [R, ...] locals, nothing persisted)."""
    (wt_ref, bt_ref, ls_ref, lb_ref, wq_ref, bq_ref, kbd_ref, vbd_ref,
     wo_ref, bo_ref) = w_refs
    t = jnp.dot(x.astype(mm), wt_ref[:].astype(mm),
                preferred_element_type=jnp.float32) \
        + bt_ref[:].astype(jnp.float32)
    u, xhat, inv = _ln_fwd(t, ls_ref, lb_ref, eps_ref)
    um = u.astype(mm)
    qp = jnp.dot(um, wq_ref[:].astype(mm),
                 preferred_element_type=jnp.float32) \
        + bq_ref[:].astype(jnp.float32)
    Hk = kbd_ref.shape[1]
    seg, mask = _cab_seg_matrices(Hk, heads, Tk, Hk // heads)
    scores = jnp.dot(qp.astype(mm), kbd_ref[:].astype(mm),
                     preferred_element_type=jnp.float32) * scale
    scores = jnp.where(mask > 0.0, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m) * mask
    segsum = jnp.dot(e, seg, preferred_element_type=jnp.float32)
    denom = jnp.dot(segsum, seg.T, preferred_element_type=jnp.float32)
    probs = e / denom
    o = jnp.dot(probs.astype(mm), vbd_ref[:].astype(mm),
                preferred_element_type=jnp.float32)
    attn = jnp.dot(o.astype(mm), wo_ref[:].astype(mm),
                   preferred_element_type=jnp.float32) \
        + bo_ref[:].astype(jnp.float32)
    y = u + attn
    return t, u, xhat, inv, um, qp, seg, mask, probs, o, y


def _cab_fwd_kernel(x_ref, wt_ref, bt_ref, ls_ref, lb_ref, wq_ref, bq_ref,
                    kbd_ref, vbd_ref, wo_ref, bo_ref, eps_ref, y_ref, *,
                    heads: int, Tk: int, scale: float):
    mm = x_ref.dtype
    w_refs = (wt_ref, bt_ref, ls_ref, lb_ref, wq_ref, bq_ref, kbd_ref,
              vbd_ref, wo_ref, bo_ref)
    *_, y = _cab_forward(x_ref[:].astype(jnp.float32), w_refs, eps_ref,
                         heads=heads, Tk=Tk, scale=scale, mm=mm)
    y_ref[:] = y.astype(y_ref.dtype)


def _cab_bwd_kernel(x_ref, wt_ref, bt_ref, ls_ref, lb_ref, wq_ref, bq_ref,
                    kbd_ref, vbd_ref, wo_ref, bo_ref, eps_ref, g_ref,
                    dx_ref, dwt_ref, dbt_ref, dls_ref, dlb_ref, dwq_ref,
                    dbq_ref, dkbd_ref, dvbd_ref, dwo_ref, dbo_ref, *,
                    heads: int, Tk: int, scale: float):
    i = pl.program_id(0)
    mm = x_ref.dtype
    x = x_ref[:].astype(jnp.float32)
    w_refs = (wt_ref, bt_ref, ls_ref, lb_ref, wq_ref, bq_ref, kbd_ref,
              vbd_ref, wo_ref, bo_ref)
    t, u, xhat, inv, um, qp, seg, mask, probs, o, _y = _cab_forward(
        x, w_refs, eps_ref, heads=heads, Tk=Tk, scale=scale, mm=mm)
    g = g_ref[:].astype(jnp.float32)
    gm = g.astype(mm)

    @pl.when(i == 0)
    def _():
        dwt_ref[:] = jnp.zeros_like(dwt_ref)
        dbt_ref[:] = jnp.zeros_like(dbt_ref)
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)
        dwq_ref[:] = jnp.zeros_like(dwq_ref)
        dbq_ref[:] = jnp.zeros_like(dbq_ref)
        dkbd_ref[:] = jnp.zeros_like(dkbd_ref)
        dvbd_ref[:] = jnp.zeros_like(dvbd_ref)
        dwo_ref[:] = jnp.zeros_like(dwo_ref)
        dbo_ref[:] = jnp.zeros_like(dbo_ref)

    # out projection
    dwo_ref[:] += jnp.dot(o.astype(mm).T, gm,
                          preferred_element_type=jnp.float32)
    dbo_ref[:] += jnp.sum(g, axis=0)
    do = jnp.dot(gm, wo_ref[:].astype(mm).T,
                 preferred_element_type=jnp.float32)
    # PV
    dvbd_ref[:] += jnp.dot(probs.astype(mm).T, do.astype(mm),
                           preferred_element_type=jnp.float32)
    dprobs = jnp.dot(do.astype(mm), vbd_ref[:].astype(mm).T,
                     preferred_element_type=jnp.float32)
    # segmented softmax backward: ds = probs * (dp - seg_bcast(<dp, p>))
    inner = jnp.dot(dprobs * probs, seg,
                    preferred_element_type=jnp.float32)
    ds = probs * (dprobs - jnp.dot(inner, seg.T,
                                   preferred_element_type=jnp.float32))
    ds = ds * scale  # scores were scaled before softmax
    dsm = ds.astype(mm)
    # scores = qp @ Kbd
    dkbd_ref[:] += jnp.dot(qp.astype(mm).T, dsm,
                           preferred_element_type=jnp.float32)
    dqp = jnp.dot(dsm, kbd_ref[:].astype(mm).T,
                  preferred_element_type=jnp.float32)
    # q projection
    dwq_ref[:] += jnp.dot(um.T, dqp.astype(mm),
                          preferred_element_type=jnp.float32)
    dbq_ref[:] += jnp.sum(dqp, axis=0)
    du = g + jnp.dot(dqp.astype(mm), wq_ref[:].astype(mm).T,
                     preferred_element_type=jnp.float32)
    # LN backward
    ls = ls_ref[:].astype(jnp.float32)
    dls_ref[:] += jnp.sum(du * xhat, axis=0)
    dlb_ref[:] += jnp.sum(du, axis=0)
    dxhat = du * ls
    dt = inv * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
                - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    # text projection
    dwt_ref[:] += jnp.dot(x.astype(mm).T, dt.astype(mm),
                          preferred_element_type=jnp.float32)
    dbt_ref[:] += jnp.sum(dt, axis=0)
    dx_ref[:] = jnp.dot(dt.astype(mm), wt_ref[:].astype(mm).T,
                        preferred_element_type=jnp.float32
                        ).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def cross_attn_block_fused(x, wt, bt, ls, lb, wq, bq, kbd, vbd, wo, bo,
                           heads: int, Tk: int, eps: float = 1e-5):
    """q = LN(x@wt+bt); y = q + softmax_seg((q@wq+bq)@kbd)*vbd@wo+bo.

    One fused kernel for the cross-modal adapter attention half with a
    batch-shared kv packed block-diagonally (kbd [H, heads*64] keys,
    vbd [heads*64, H] values; kv rows padded Tk -> 64 per segment).
    Semantics == the layers.mha shared-kv path; tested against it.
    """
    return _cab_fwd(x, wt, bt, ls, lb, wq, bq, kbd, vbd, wo, bo, heads,
                    Tk, eps)


def _cab_specs():
    full2 = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                       memory_space=pltpu.VMEM)
    vec = lambda n: pl.BlockSpec((n,), lambda i: (0,),
                                 memory_space=pltpu.VMEM)
    tile = lambda d: pl.BlockSpec((PN_ROW_TILE, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return full2, vec, tile


def _cab_fwd(x, wt, bt, ls, lb, wq, bq, kbd, vbd, wo, bo, heads, Tk, eps):
    xp, n = _pad_rows(x, PN_ROW_TILE, fill=0.0)
    N, Din = xp.shape
    H = wt.shape[1]
    Hk = kbd.shape[1]
    e = jnp.asarray([eps], jnp.float32)
    mm = x.dtype
    scale = (H // heads) ** -0.5
    full2, vec, tile = _cab_specs()
    y = pl.pallas_call(
        functools.partial(_cab_fwd_kernel, heads=heads, Tk=Tk,
                          scale=scale),
        grid=(N // PN_ROW_TILE,),
        in_specs=[tile(Din), full2((Din, H)), vec(H), vec(H), vec(H),
                  full2((H, H)), vec(H), full2((H, Hk)), full2((Hk, H)),
                  full2((H, H)), vec(H),
                  pl.BlockSpec((1,), lambda i: (0,),
                               memory_space=pltpu.SMEM)],
        out_specs=tile(H),
        out_shape=jax.ShapeDtypeStruct((N, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, wt.astype(mm), bt, ls, lb, wq.astype(mm), bq, kbd.astype(mm),
      vbd.astype(mm), wo.astype(mm), bo, e)
    return y[:n]


def _cab_fwd_rule(x, wt, bt, ls, lb, wq, bq, kbd, vbd, wo, bo, heads, Tk,
                  eps):
    return (_cab_fwd(x, wt, bt, ls, lb, wq, bq, kbd, vbd, wo, bo, heads,
                     Tk, eps),
            (x, wt, bt, ls, lb, wq, bq, kbd, vbd, wo, bo))


def _cab_bwd_rule(heads, Tk, eps, res, g):
    x, wt, bt, ls, lb, wq, bq, kbd, vbd, wo, bo = res
    xp, n = _pad_rows(x, PN_ROW_TILE, fill=0.0)
    gp, _ = _pad_rows(g, PN_ROW_TILE, fill=0.0)
    N, Din = xp.shape
    H = wt.shape[1]
    Hk = kbd.shape[1]
    e = jnp.asarray([eps], jnp.float32)
    mm = x.dtype
    scale = (H // heads) ** -0.5
    full2, vec, tile = _cab_specs()
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_cab_bwd_kernel, heads=heads, Tk=Tk,
                          scale=scale),
        grid=(N // PN_ROW_TILE,),
        in_specs=[tile(Din), full2((Din, H)), vec(H), vec(H), vec(H),
                  full2((H, H)), vec(H), full2((H, Hk)), full2((Hk, H)),
                  full2((H, H)), vec(H),
                  pl.BlockSpec((1,), lambda i: (0,),
                               memory_space=pltpu.SMEM),
                  tile(H)],
        out_specs=[tile(Din), full2((Din, H)), vec(H), vec(H), vec(H),
                   full2((H, H)), vec(H), full2((H, Hk)),
                   full2((Hk, H)), full2((H, H)), vec(H)],
        out_shape=[
            jax.ShapeDtypeStruct((N, Din), x.dtype),
            jax.ShapeDtypeStruct((Din, H), f32),
            jax.ShapeDtypeStruct((H,), f32),
            jax.ShapeDtypeStruct((H,), f32),
            jax.ShapeDtypeStruct((H,), f32),
            jax.ShapeDtypeStruct((H, H), f32),
            jax.ShapeDtypeStruct((H,), f32),
            jax.ShapeDtypeStruct((H, Hk), f32),
            jax.ShapeDtypeStruct((Hk, H), f32),
            jax.ShapeDtypeStruct((H, H), f32),
            jax.ShapeDtypeStruct((H,), f32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=_interpret(),
    )(xp, wt.astype(mm), bt, ls, lb, wq.astype(mm), bq, kbd.astype(mm),
      vbd.astype(mm), wo.astype(mm), bo, e, gp)
    (dx, dwt, dbt, dls, dlb, dwq, dbq, dkbd, dvbd, dwo, dbo) = outs
    return (dx[:x.shape[0]], dwt.astype(wt.dtype), dbt.astype(bt.dtype),
            dls.astype(ls.dtype), dlb.astype(lb.dtype),
            dwq.astype(wq.dtype), dbq.astype(bq.dtype),
            dkbd.astype(kbd.dtype), dvbd.astype(vbd.dtype),
            dwo.astype(wo.dtype), dbo.astype(bo.dtype))


cross_attn_block_fused.defvjp(_cab_fwd_rule, _cab_bwd_rule)
