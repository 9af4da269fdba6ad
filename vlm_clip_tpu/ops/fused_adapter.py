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
    return jax.default_backend() == "tpu"


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
