"""Pallas fused adapter kernels vs their jnp semantic references.

Runs through the Pallas interpreter on the CPU test mesh — same kernel
code that compiles on TPU. Checks forward AND all gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_clip_tpu.models import adapters as A
from vlm_clip_tpu.models import layers as L
from vlm_clip_tpu.ops.fused_adapter import (feature_adapter_blend_fused,
                                            prenorm_mlp_fused,
                                            seq_adapter_fused)

ATOL = 1e-5


def _feat_ref(x, w1, b1, w2, b2, r):
    p = {"fc1": {"kernel": w1, "bias": b1}, "fc2": {"kernel": w2, "bias": b2}}
    return A.adapt_features(p, x, r)


def _seq_ref(x, w1, b1, w2, b2, ls, lb):
    p = {"down": {"kernel": w1, "bias": b1},
         "up": {"kernel": w2, "bias": b2},
         "ln": {"scale": ls, "bias": lb}}
    return A.seq_adapter(p, x)


@pytest.mark.parametrize("n,d,k", [(8, 64, 16), (300, 128, 32)])
def test_feature_adapter_fused_forward(n, d, k):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    x = jax.random.normal(ks[0], (n, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, k)) * 0.1
    b1 = jax.random.normal(ks[2], (k,)) * 0.1
    w2 = jax.random.normal(ks[3], (k, d)) * 0.1
    b2 = jax.random.normal(ks[4], (d,)) * 0.1
    got = feature_adapter_blend_fused(x, w1, b1, w2, b2, 0.2)
    want = _feat_ref(x, w1, b1, w2, b2, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_feature_adapter_fused_grads():
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    n, d, k = 70, 64, 16  # non-multiple of tile: exercises padding
    x = jax.random.normal(ks[0], (n, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, k)) * 0.1
    b1 = jax.random.normal(ks[2], (k,)) * 0.1
    w2 = jax.random.normal(ks[3], (k, d)) * 0.1
    b2 = jax.random.normal(ks[4], (d,)) * 0.1
    t = jax.random.normal(ks[5], (n, d))

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(feature_adapter_blend_fused(x, w1, b1, w2, b2, 0.2)
                       * t)

    def loss_ref(x, w1, b1, w2, b2):
        return jnp.sum(_feat_ref(x, w1, b1, w2, b2, 0.2) * t)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2,
                                                            b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, name in zip(g_fused, g_ref, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=name)


@pytest.mark.parametrize("n,d,k", [(8, 64, 16), (260, 64, 32)])
def test_seq_adapter_fused_forward(n, d, k):
    ks = jax.random.split(jax.random.PRNGKey(2), 7)
    x = jax.random.normal(ks[0], (n, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, k)) * 0.1
    b1 = jax.random.normal(ks[2], (k,)) * 0.1
    w2 = jax.random.normal(ks[3], (k, d)) * 0.1
    b2 = jax.random.normal(ks[4], (d,)) * 0.1
    ls = 1.0 + jax.random.normal(ks[5], (d,)) * 0.1
    lb = jax.random.normal(ks[6], (d,)) * 0.1
    got = seq_adapter_fused(x, w1, b1, w2, b2, ls, lb)
    want = _seq_ref(x, w1, b1, w2, b2, ls, lb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_seq_adapter_fused_grads():
    ks = jax.random.split(jax.random.PRNGKey(3), 8)
    n, d, k = 100, 64, 16
    x = jax.random.normal(ks[0], (n, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, k)) * 0.1
    b1 = jax.random.normal(ks[2], (k,)) * 0.1
    w2 = jax.random.normal(ks[3], (k, d)) * 0.1
    b2 = jax.random.normal(ks[4], (d,)) * 0.1
    ls = 1.0 + jax.random.normal(ks[5], (d,)) * 0.1
    lb = jax.random.normal(ks[6], (d,)) * 0.1
    t = jax.random.normal(ks[7], (n, d))

    def loss_fused(*args):
        return jnp.sum(seq_adapter_fused(*args) * t)

    def loss_ref(*args):
        return jnp.sum(_seq_ref(*args) * t)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(
        x, w1, b1, w2, b2, ls, lb)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(
        x, w1, b1, w2, b2, ls, lb)
    for a, b, name in zip(g_fused, g_ref,
                          "x w1 b1 w2 b2 ln_scale ln_bias".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4,
                                   err_msg=name)


def _pnmlp_ref(x, w1, b1, w2, b2, ls, lb):
    mlp_p = {"fc1": {"kernel": w1, "bias": b1},
             "fc2": {"kernel": w2, "bias": b2}}
    return x + L.mlp(mlp_p, L.layer_norm({"scale": ls, "bias": lb}, x),
                     act="gelu")


def _pnmlp_args(seed, n, d, k):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (n, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, k)) * 0.1
    b1 = jax.random.normal(ks[2], (k,)) * 0.1
    w2 = jax.random.normal(ks[3], (k, d)) * 0.1
    b2 = jax.random.normal(ks[4], (d,)) * 0.1
    ls = 1.0 + jax.random.normal(ks[5], (d,)) * 0.1
    lb = jax.random.normal(ks[6], (d,)) * 0.1
    return x, w1, b1, w2, b2, ls, lb


# (300, 64, 1024) exercises the 2-D grid: rows pad to 2 tiles, hidden
# splits into 512-column chunks with cross-chunk accumulation
@pytest.mark.parametrize("n,d,k", [(8, 64, 32), (300, 64, 1024)])
def test_prenorm_mlp_fused_forward(n, d, k):
    args = _pnmlp_args(11, n, d, k)
    got = prenorm_mlp_fused(*args)
    want = _pnmlp_ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("n,d,k", [(100, 64, 16), (300, 64, 1024)])
def test_prenorm_mlp_fused_grads(n, d, k):
    args = _pnmlp_args(12, n, d, k)
    t = jax.random.normal(jax.random.PRNGKey(99), (n, args[0].shape[1]))

    def loss_fused(*a):
        return jnp.sum(prenorm_mlp_fused(*a) * t)

    def loss_ref(*a):
        return jnp.sum(_pnmlp_ref(*a) * t)

    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    for a, b, name in zip(g_fused, g_ref,
                          "x w1 b1 w2 b2 ln_scale ln_bias".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=name)


def test_cross_modal_adapter_fused_parity():
    """cross_modal_adapter impl='fused' (both Pallas kernels through the
    interpreter, incl. the block-diagonal shared-kv pack) == impl='jnp'
    — forward AND gradients wrt every adapter param and the text."""
    rng = jax.random.PRNGKey(5)
    p = A.init_cross_modal_adapter(rng, text_dim=64, image_dim=96,
                                   hidden=64, num_heads=4)
    text = jax.random.normal(jax.random.PRNGKey(6), (3, 7, 64))
    image = jax.random.normal(jax.random.PRNGKey(7), (1, 5, 96))
    got = A.cross_modal_adapter(p, text, image, num_heads=4, impl="fused")
    want = A.cross_modal_adapter(p, text, image, num_heads=4, impl="jnp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    t = jax.random.normal(jax.random.PRNGKey(8), got.shape)

    def loss(impl):
        def f(params, txt):
            out = A.cross_modal_adapter(params, txt, image, num_heads=4,
                                        impl=impl)
            return jnp.sum(out * t)
        return f

    gp_f, gt_f = jax.grad(loss("fused"), argnums=(0, 1))(p, text)
    gp_r, gt_r = jax.grad(loss("jnp"), argnums=(0, 1))(p, text)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r),
                               atol=2e-4, err_msg="d/dtext")
    flat_f = jax.tree_util.tree_flatten_with_path(gp_f)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(gp_r)[0]
    for (path, a), (_, b) in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_contrastive_loss_fused_parity():
    """Fused forward + analytic fused backward vs the XLA composition."""
    from vlm_clip_tpu.models.model_m import contrastive_loss
    from vlm_clip_tpu.ops.contrastive import contrastive_loss_fused

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    B, D = 48, 64
    txt = jax.random.normal(ks[0], (B, D), jnp.float32)
    img = jax.random.normal(ks[1], (B, D), jnp.float32)
    ls = jnp.float32(2.0)

    ref_loss = contrastive_loss(txt, img, ls)[0]
    got_loss = contrastive_loss_fused(txt, img, ls)
    np.testing.assert_allclose(float(got_loss), float(ref_loss), atol=1e-5)

    g_ref = jax.grad(lambda t, i, s: contrastive_loss(t, i, s)[0],
                     argnums=(0, 1, 2))(txt, img, ls)
    g_got = jax.grad(contrastive_loss_fused, argnums=(0, 1, 2))(txt, img,
                                                                ls)
    for a, b, name in zip(g_got, g_ref, ("txt", "img", "logit_scale")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   err_msg=name)


def test_contrastive_loss_fused_large_batch_fallback():
    from vlm_clip_tpu.models.model_m import contrastive_loss
    from vlm_clip_tpu.ops.contrastive import (MAX_FUSED_B,
                                              contrastive_loss_fused)

    B = MAX_FUSED_B + 8
    ks = jax.random.split(jax.random.PRNGKey(6), 2)
    txt = jax.random.normal(ks[0], (B, 16), jnp.float32)
    img = jax.random.normal(ks[1], (B, 16), jnp.float32)
    ls = jnp.float32(1.0)
    np.testing.assert_allclose(
        float(contrastive_loss_fused(txt, img, ls)),
        float(contrastive_loss(txt, img, ls)[0]), atol=1e-5)


def test_feature_adapter_fused_dropout():
    """In-kernel dropout: deterministic per seed, correct scaling, grads
    consistent with the recomputed mask (finite-difference check)."""
    from vlm_clip_tpu.ops.fused_adapter import feature_adapter_blend_fused

    ks = jax.random.split(jax.random.PRNGKey(7), 5)
    n, d, k = 64, 64, 32
    x = jax.random.normal(ks[0], (n, d), jnp.float32)
    w1 = jax.random.normal(ks[1], (d, k)) * 0.1
    b1 = jnp.zeros((k,))
    w2 = jax.random.normal(ks[2], (k, d)) * 0.1
    b2 = jnp.zeros((d,))
    seed = jnp.int32(123)

    y1 = feature_adapter_blend_fused(x, w1, b1, w2, b2, 0.3, 0.5, seed)
    y2 = feature_adapter_blend_fused(x, w1, b1, w2, b2, 0.3, 0.5, seed)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    y3 = feature_adapter_blend_fused(x, w1, b1, w2, b2, 0.3, 0.5,
                                     jnp.int32(999))
    assert not np.allclose(np.asarray(y1), np.asarray(y3))
    y0 = feature_adapter_blend_fused(x, w1, b1, w2, b2, 0.3, 0.0, seed)
    assert not np.allclose(np.asarray(y0), np.asarray(y1))

    # grads flow and the fwd/bwd masks agree: finite-difference on one
    # weight coordinate must match the analytic grad
    t = jax.random.normal(ks[3], (n, d))

    def loss(w1v):
        return jnp.sum(feature_adapter_blend_fused(
            x, w1v, b1, w2, b2, 0.3, 0.5, seed) * t)

    g = jax.grad(loss)(w1)
    eps = 1e-3
    delta = jnp.zeros_like(w1).at[3, 5].set(eps)
    fd = (loss(w1 + delta) - loss(w1 - delta)) / (2 * eps)
    np.testing.assert_allclose(float(fd), float(g[3, 5]), rtol=2e-2,
                               atol=1e-3)


def test_int4_pallas_matmul_matches_dequant():
    from vlm_clip_tpu.ops.quant import (dequantize_weight,
                                        quant_matmul_pallas_int4,
                                        quantize_weight)

    ks = jax.random.split(jax.random.PRNGKey(9), 2)
    K, N_, M = 96, 40, 5  # ragged: exercises quantize-time pre-padding
    w = jax.random.normal(ks[0], (K, N_), jnp.float32)
    q = quantize_weight(w, bits=4)
    assert q.qweight.shape[0] % 1024 == 0 and q.qweight.shape[1] % 1024 == 0
    assert (q.logical_in, q.logical_out) == (K, N_)
    x = jax.random.normal(ks[1], (M, K), jnp.float32)
    ref = x @ dequantize_weight(q)
    assert ref.shape == (M, N_)
    got = quant_matmul_pallas_int4(x, q.qweight, q.scale,
                                   out_features=N_, in_features=K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    with pytest.raises(ValueError, match="tile-aligned"):
        quant_matmul_pallas_int4(x, q.qweight[:, :40], q.scale)


def test_int4_xla_gemv_matches_dequant():
    """The fused-XLA row-pair GEMV (narrow-N decode route) must equal
    the dequantized matmul bit-for-bit at fp32."""
    from vlm_clip_tpu.ops.quant import (_int4_gemv_xla, dequantize_weight,
                                        quantize_weight)

    ks = jax.random.split(jax.random.PRNGKey(12), 2)
    K, N_ = 130, 70
    w = jax.random.normal(ks[0], (K, N_), jnp.float32)
    q = quantize_weight(w, bits=4)
    for M in (3, 64):  # GEMV and the mid-M (large decode batch) route
        x = jax.random.normal(ks[1], (M, K), jnp.float32)
        ref = x @ dequantize_weight(q)
        got = _int4_gemv_xla(x, q)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_int4_rowpair_gemm_mid_m_band_matches_dequant():
    """The fused-XLA row-pair route now owns the whole 32 < M <= 1024
    quant_matmul band (speculative verify / chunked prefill M; a bf16
    nibble-plane alternative measured slightly slower at every band
    point and was removed — BENCH.md round-4 mid-M table). Pin its
    parity at a band-interior M with ragged K/N."""
    from vlm_clip_tpu.ops.quant import (_int4_gemv_xla,
                                        dequantize_weight,
                                        quantize_weight)

    ks = jax.random.split(jax.random.PRNGKey(21), 2)
    K, N_, M = 130, 70, 320
    w = jax.random.normal(ks[0], (K, N_), jnp.float32)
    q = quantize_weight(w, bits=4)
    x = jax.random.normal(ks[1], (M, K), jnp.float32)
    got = _int4_gemv_xla(x, q)
    assert got.shape == (M, N_)
    ref = x @ dequantize_weight(q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# NF4 (blockwise NormalFloat-4 + double quantization) — independent
# numpy oracle implementing the bitsandbytes semantics from scratch
# (reference model_v.py:46-51 quantizes the VLM with bnb NF4 + DQ).
# ---------------------------------------------------------------------------

_NF4_ORACLE_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367,
    -0.39491748809814453, -0.28444138169288635, -0.18477343022823334,
    -0.09105003625154495, 0.0, 0.07958029955625534, 0.16093020141124725,
    0.24611230194568634, 0.33791524171829224, 0.44070982933044434,
    0.5626170039176941, 0.7229568362236023, 1.0], dtype=np.float32)


def _nf4_oracle_roundtrip(w: np.ndarray, block=64, dq_group=256):
    """Quantize-dequantize [in, out] with blockwise NF4 + double-quant
    absmax, pure numpy (nearest code, ties up; absmax mean offset +
    blockwise-256 symmetric int8 second level)."""
    K, N = w.shape
    pad = (-K) % block
    wp = np.pad(w.astype(np.float32), ((0, pad), (0, 0)))
    wb = wp.reshape(-1, block, N)
    absmax = np.abs(wb).max(axis=1)                     # [nblk, N]
    safe = np.where(absmax > 0, absmax, 1.0)
    scaled = wb / safe[:, None, :]
    mids = (_NF4_ORACLE_CODE[1:] + _NF4_ORACLE_CODE[:-1]) / 2
    idx = (scaled[..., None] >= mids).sum(-1)           # nearest, ties up
    # double-quantize absmax
    flat = absmax.reshape(-1)
    offset = flat.mean(dtype=np.float32)
    centered = flat - offset
    gpad = (-len(centered)) % dq_group
    cg = np.pad(centered, (0, gpad)).reshape(-1, dq_group)
    amax2 = np.abs(cg).max(axis=1)
    scale2 = np.where(amax2 > 0, amax2 / 127.0, 1.0).astype(np.float32)
    aq = np.clip(np.round(cg / scale2[:, None]), -127, 127)
    adec = (aq * scale2[:, None]).reshape(-1)[:len(flat)] + offset
    vals = _NF4_ORACLE_CODE[idx] * adec.reshape(absmax.shape)[:, None, :]
    return vals.reshape(wp.shape)[:K], idx.reshape(wp.shape[0], N)[:K]


def test_nf4_matches_numpy_oracle():
    """quantize_nf4/dequantize_nf4 must reproduce the oracle exactly:
    identical code indices AND identical dequantized values (both sides
    compute in fp32 with the same rounding rules)."""
    from vlm_clip_tpu.ops.nf4 import dequantize_nf4, quantize_nf4

    rng = np.random.default_rng(3)
    K, N_ = 200, 24  # ragged K: exercises block padding
    w = (rng.normal(size=(K, N_)) * 0.04).astype(np.float32)
    q = quantize_nf4(jnp.asarray(w))
    assert (q.in_features, q.out_features) == (K, N_)
    ref_w, ref_idx = _nf4_oracle_roundtrip(w)
    # indices: unpack the row-pair nibbles
    qw = np.asarray(q.qweight)
    got_idx = np.stack([qw & 0xF, qw >> 4], axis=1).reshape(-1, N_)[:K]
    np.testing.assert_array_equal(got_idx, ref_idx)
    got_w = np.asarray(dequantize_nf4(q))
    np.testing.assert_allclose(got_w, ref_w, atol=1e-6, rtol=1e-6)


def test_nf4_matmul_and_bias():
    from vlm_clip_tpu.ops.nf4 import (dequantize_nf4, nf4_matmul,
                                      quantize_nf4)

    rng = np.random.default_rng(5)
    K, N_, M = 128, 48, 9
    w = (rng.normal(size=(K, N_)) * 0.04).astype(np.float32)
    b = rng.normal(size=(N_,)).astype(np.float32)
    q = quantize_nf4(jnp.asarray(w), bias=jnp.asarray(b))
    x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
    ref = np.asarray(x) @ np.asarray(dequantize_nf4(q)) + b
    got = np.asarray(nf4_matmul(x, q))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_nf4_fused_route_matches_materialize():
    """The fused row-pair route (select-tree codebook dequant in the
    dot operands) must match dequantize_nf4 + dot on every shape class
    it serves: unpadded K, block-padded K, 3-D inputs, and the M cutoff
    boundary; the select tree itself must reproduce the codebook
    exactly."""
    from vlm_clip_tpu.ops import nf4 as NF

    code = np.asarray(
        NF._code_select_tree(jnp.arange(16, dtype=jnp.uint8)))
    np.testing.assert_array_equal(code, NF.NF4_CODE)

    rng = np.random.default_rng(7)
    for K, N_, M in ((128, 48, 1), (100, 33, 5), (192, 64, 24)):
        w = (rng.normal(size=(K, N_)) * 0.04).astype(np.float32)
        q = NF.quantize_nf4(jnp.asarray(w))
        x = jnp.asarray(rng.normal(size=(M, K)).astype(np.float32))
        ref = np.asarray(x) @ np.asarray(NF.dequantize_nf4(q))
        got = np.asarray(NF._nf4_matmul_fused(x, q))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)

    # 3-D input goes through the fused route via the public API
    w = (rng.normal(size=(128, 40)) * 0.04).astype(np.float32)
    q = NF.quantize_nf4(jnp.asarray(w))
    x3 = jnp.asarray(rng.normal(size=(2, 3, 128)).astype(np.float32))
    ref = np.asarray(x3) @ np.asarray(NF.dequantize_nf4(q))
    np.testing.assert_allclose(np.asarray(NF.nf4_matmul(x3, q)), ref,
                               atol=1e-4, rtol=1e-4)

    # above the cutoff the materialize route serves, same numbers
    xl = jnp.asarray(
        rng.normal(size=(NF._NF4_FUSED_MAX_M + 8, 128)).astype(np.float32))
    ref = np.asarray(xl) @ np.asarray(NF.dequantize_nf4(q))
    np.testing.assert_allclose(np.asarray(NF.nf4_matmul(xl, q)), ref,
                               atol=1e-4, rtol=1e-4)


def test_nf4_beats_symmetric_int4_on_gaussian_weights():
    """The quality rationale for the preset: on normally-distributed
    weights (what trained linear layers look like), blockwise NF4's
    reconstruction RMSE must be well below per-channel symmetric
    int4's — the codebook is matched to the weight distribution
    (QLoRA §3). This pins the 'different error characteristics' gap
    called out for the symmetric quantizer."""
    from vlm_clip_tpu.ops.nf4 import dequantize_nf4, quantize_nf4
    from vlm_clip_tpu.ops.quant import dequantize_weight, quantize_weight

    rng = np.random.default_rng(7)
    w = (rng.normal(size=(512, 64)) * 0.02).astype(np.float32)
    err_nf4 = np.asarray(dequantize_nf4(quantize_nf4(jnp.asarray(w)))) - w
    err_i4 = np.asarray(
        dequantize_weight(quantize_weight(jnp.asarray(w), bits=4))) - w
    rmse_nf4 = float(np.sqrt((err_nf4 ** 2).mean()))
    rmse_i4 = float(np.sqrt((err_i4 ** 2).mean()))
    assert rmse_nf4 < 0.8 * rmse_i4, (rmse_nf4, rmse_i4)


def test_nf4_stacked_layers_and_qwen_preset():
    """vmapped NF4 quantization (scanned layer stacks) slices per layer
    correctly, and quantize_qwen_params(bits='nf4') produces a model
    whose logits track the fp model."""
    from vlm_clip_tpu.ops.nf4 import NF4Linear, dequantize_nf4, quantize_nf4
    from vlm_clip_tpu.vlm.qwen_convert import quantize_qwen_params
    from vlm_clip_tpu.vlm.qwen_model import (QwenTextConfig, init_text,
                                             text_forward)

    w = jax.random.normal(jax.random.PRNGKey(1), (3, 128, 40),
                          jnp.float32) * 0.05
    q = jax.vmap(quantize_nf4)(w)
    assert isinstance(q, NF4Linear)
    layer1 = jax.tree.map(lambda a: a[1], q)
    single = quantize_nf4(w[1])
    np.testing.assert_array_equal(np.asarray(layer1.qweight),
                                  np.asarray(single.qweight))
    np.testing.assert_allclose(np.asarray(dequantize_nf4(layer1)),
                               np.asarray(dequantize_nf4(single)),
                               atol=1e-7)

    tcfg = QwenTextConfig(hidden_size=64, intermediate_size=128,
                          num_layers=2, num_heads=4, num_kv_heads=2,
                          head_dim=16, vocab_size=97,
                          rope_theta=10_000.0, mrope_section=(4, 2, 2))
    params = init_text(jax.random.PRNGKey(2), tcfg)
    qparams = quantize_qwen_params({"text": params}, bits="nf4")["text"]
    ids = jax.random.randint(jax.random.PRNGKey(3), (2, 7), 0, 97)
    pos = jnp.broadcast_to(jnp.arange(7)[None, None], (3, 2, 7))
    emb = params["embed_tokens"][ids]
    mask = jnp.where(jnp.tril(jnp.ones((7, 7), bool))[None, None],
                     0.0, -3.4e38)
    ref, _ = text_forward(params, emb, pos, tcfg, mask)
    got, _ = text_forward(qparams, emb, pos, tcfg, mask)
    err_nf4 = float(jnp.mean(jnp.abs(got - ref)))
    assert err_nf4 < 0.5 * float(jnp.mean(jnp.abs(ref)))
    # and end-to-end NF4 logit error must not exceed symmetric int4's
    # (the per-weight RMSE win should survive the network)
    i4params = quantize_qwen_params({"text": params}, bits=4)["text"]
    got_i4, _ = text_forward(i4params, emb, pos, tcfg, mask)
    err_i4 = float(jnp.mean(jnp.abs(got_i4 - ref)))
    assert err_nf4 < err_i4, (err_nf4, err_i4)


def test_quantized_linear_stacked_keeps_logical_dims():
    """vmapped quantization (scanned layer stacks) must carry the
    logical in/out features through the pytree aux, and per-layer scan
    slices must still dequantize to the logical shape."""
    from vlm_clip_tpu.ops.quant import dequantize_weight, quantize_weight

    w = jax.random.normal(jax.random.PRNGKey(1), (3, 96, 40), jnp.float32)
    q = jax.vmap(lambda k: quantize_weight(k, 4))(w)
    assert (q.in_features, q.out_features) == (96, 40)
    layer0 = jax.tree.map(lambda a: a[0], q)
    assert (layer0.logical_in, layer0.logical_out) == (96, 40)
    deq = dequantize_weight(layer0)
    assert deq.shape == (96, 40)
    # stacked quantization == per-layer quantization, exactly
    single = quantize_weight(w[0], 4)
    np.testing.assert_array_equal(np.asarray(layer0.qweight),
                                  np.asarray(single.qweight))
    np.testing.assert_array_equal(np.asarray(layer0.scale),
                                  np.asarray(single.scale))
    # and the roundtrip stays within the int4 step (scale = amax/7)
    step = np.asarray(single.scale).max()
    assert float(jnp.max(jnp.abs(deq - w[0]))) <= 0.5 * step + 1e-6


def test_fused_attention_matches_xla():
    """Whole-sequence Pallas attention == XLA path (no mask, [T,T]
    causal, and [B,1,T,T] padding masks), plus full-FT backward via the
    custom VJP."""
    from vlm_clip_tpu.ops.attention import _xla_attention, fused_attention

    rng = np.random.default_rng(11)
    B, h, T, d = 5, 3, 13, 8  # ragged B exercises the batch-tile pad
    q, k, v = (jnp.asarray(rng.normal(size=(B, h, T, d)).astype(
        np.float32)) for _ in range(3))
    scale = d ** -0.5
    causal = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0,
                       -3.4028235e38).astype(jnp.float32)
    padmask = jnp.where(
        jnp.asarray(rng.random((B, 1, T, T)) > 0.2), 0.0, -3.4028235e38
    ).astype(jnp.float32)
    # always allow self-attention so no row is fully masked
    eye = jnp.eye(T, dtype=bool)[None, None]
    padmask = jnp.where(eye, 0.0, padmask)
    # [1,1,T,T] batch-broadcast mask: exactly what clip._text_mask emits
    # when attention_mask=None — regression for the silent mis-read of
    # out-of-range mask blocks before the broadcast-to-B fix
    bcast = causal[None, None]
    for mask in (None, causal, padmask, bcast):
        want = _xla_attention(q, k, v, scale, mask)
        got = fused_attention(q, k, v, scale, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-5)

    # broadcast-mask backward: cotangent must keep the [1,1,T,T] shape
    gb = jax.grad(lambda m: jnp.sum(
        fused_attention(q, k, v, scale, m) ** 2))(bcast)
    gx = jax.grad(lambda m: jnp.sum(
        _xla_attention(q, k, v, scale, m) ** 2))(bcast)
    assert gb.shape == bcast.shape
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gx),
                               atol=2e-4, rtol=1e-4)

    # backward (full fine-tune path): custom VJP vs autodiff of XLA ref
    def loss_fused(q, k, v):
        return jnp.sum(fused_attention(q, k, v, scale, causal) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale, causal) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)


def test_mha_fused_toggle_equivalence():
    """models/layers.py:mha with the global fused toggle == XLA mha."""
    from vlm_clip_tpu.models.layers import init_mha, mha
    from vlm_clip_tpu.ops.attention import set_fused_attention

    rng = jax.random.PRNGKey(4)
    p = init_mha(rng, 32, 4)
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 11, 32))
    causal = jnp.where(jnp.tril(jnp.ones((11, 11), bool)), 0.0,
                       -3.4028235e38).astype(jnp.float32)
    ref = mha(p, x, x, 4, causal)
    try:
        set_fused_attention(True)
        got = mha(p, x, x, 4, causal)
    finally:
        set_fused_attention(False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
