"""Fused contrastive head: l2norm -> scaled BxB matmul -> symmetric CE.

The pipeline-M loss (model_m.py:146-163) as one Pallas kernel pair
(SURVEY.md §7 kernel (b)): forward computes both row- and column-softmax
losses over the BxB logit matrix without materializing it in HBM; the
custom backward recomputes the logits in VMEM and applies the analytic
gradient

    dZ = (softmax_rows(Z) - I)/2B + (softmax_cols(Z) - I)/2B
    d_txt_raw = norm_bwd(s * dZ @ img_n),  d_img_raw = norm_bwd(s * dZ.T @ txt_n)

Whole-batch-in-VMEM kernel (B <= 1024, D <= 1024: logits 4 MB fp32);
larger batches fall back to the XLA composition automatically. Under DP
sharding the XLA path is used (the all_gather belongs to XLA).

Semantics identical to models.model_m.contrastive_loss — pinned by
tests/test_fused_ops.py.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_FUSED_B = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _norm_rows(x):
    inv = jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x * inv, inv


def _eye_like(z):
    return (jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
            == jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
            ).astype(jnp.float32)


def _lse2d(z, axis):
    """logsumexp with keepdims (Mosaic prefers 2-D intermediates)."""
    m = jnp.max(z, axis=axis, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(z - m), axis=axis, keepdims=True))


def _fwd_kernel(txt_ref, img_ref, scale_ref, loss_ref):
    t = txt_ref[:].astype(jnp.float32)
    m = img_ref[:].astype(jnp.float32)
    tn, _ = _norm_rows(t)
    mn, _ = _norm_rows(m)
    s = scale_ref[0]
    z = s * jnp.dot(tn, mn.T, preferred_element_type=jnp.float32)
    B = z.shape[0]
    eye = _eye_like(z)
    diag_col = jnp.sum(z * eye, axis=1, keepdims=True)   # [B, 1]
    diag_row = jnp.sum(z * eye, axis=0, keepdims=True)   # [1, B]
    loss_t = jnp.sum(_lse2d(z, 1) - diag_col) / B
    loss_i = jnp.sum(_lse2d(z, 0) - diag_row) / B
    loss_ref[0, 0] = 0.5 * (loss_t + loss_i)


def _bwd_kernel(txt_ref, img_ref, scale_ref, g_ref, dtxt_ref, dimg_ref,
                dls_ref):
    t = txt_ref[:].astype(jnp.float32)
    m = img_ref[:].astype(jnp.float32)
    tn, t_inv = _norm_rows(t)
    mn, m_inv = _norm_rows(m)
    s = scale_ref[0]
    z = s * jnp.dot(tn, mn.T, preferred_element_type=jnp.float32)
    B = z.shape[0]
    def _softmax(zz, axis):
        mx = jnp.max(zz, axis=axis, keepdims=True)
        e = jnp.exp(zz - mx)
        return e / jnp.sum(e, axis=axis, keepdims=True)

    p_rows = _softmax(z, 1)
    p_cols = _softmax(z, 0)
    eye = _eye_like(z)
    g = g_ref[0]
    dz = g * ((p_rows - eye) + (p_cols - eye)) / (2.0 * B)
    dtn = s * jnp.dot(dz, mn, preferred_element_type=jnp.float32)
    dmn = s * jnp.dot(dz.T, tn, preferred_element_type=jnp.float32)
    # l2norm backward: dx = (g - n * <g, n>) * inv
    dt = (dtn - tn * jnp.sum(dtn * tn, axis=-1, keepdims=True)) * t_inv
    dm = (dmn - mn * jnp.sum(dmn * mn, axis=-1, keepdims=True)) * m_inv
    dtxt_ref[:] = dt.astype(dtxt_ref.dtype)
    dimg_ref[:] = dm.astype(dimg_ref.dtype)
    # Z = e^{logit_scale} * C  =>  dZ/d(logit_scale) = Z, so
    # dL/d(logit_scale) = sum(dZ * Z)  (g already folded into dz)
    dls_ref[0, 0] = jnp.sum(dz * z)


def _xla_loss(txt, img, logit_scale):
    from vlm_clip_tpu.models.model_m import contrastive_loss

    return contrastive_loss(txt, img, logit_scale)[0]


@jax.custom_vjp
def contrastive_loss_fused(text_features: jnp.ndarray,
                           image_features: jnp.ndarray,
                           logit_scale: jnp.ndarray) -> jnp.ndarray:
    """Symmetric InfoNCE loss, fused on TPU for B <= 1024."""
    return _fwd(text_features, image_features, logit_scale)


def _use_fused(txt) -> bool:
    return txt.shape[0] <= MAX_FUSED_B


def _fwd(txt, img, logit_scale):
    if not _use_fused(txt):
        return _xla_loss(txt, img, logit_scale)
    scale = jnp.exp(logit_scale.astype(jnp.float32)).reshape(1)
    loss = pl.pallas_call(
        _fwd_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=_interpret(),
    )(txt, img, scale)
    return loss[0, 0]


def _fwd_rule(txt, img, logit_scale):
    return _fwd(txt, img, logit_scale), (txt, img, logit_scale)


def _bwd_rule(res, g):
    txt, img, logit_scale = res
    if not _use_fused(txt):
        _, vjp = jax.vjp(_xla_loss, txt, img, logit_scale)
        return vjp(g)
    scale = jnp.exp(logit_scale.astype(jnp.float32)).reshape(1)
    dtxt, dimg, dls = pl.pallas_call(
        _bwd_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(txt.shape, txt.dtype),
            jax.ShapeDtypeStruct(img.shape, img.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(txt, img, scale, jnp.asarray(g, jnp.float32).reshape(1))
    return dtxt, dimg, dls[0, 0].astype(logit_scale.dtype)


contrastive_loss_fused.defvjp(_fwd_rule, _bwd_rule)
