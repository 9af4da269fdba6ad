"""Streaming fused decode-attention: kernel parity + canonical routing.

`mask=None` dispatches the canonical decode mask (cache cols < depth
+ causal fresh triangle — what vlm/engine.py and qwen.py
decode_step_inner used to build as ``cols <= lengths``) to
ops/decode_attention.py. The default route is the jnp reference; the
Pallas kernel is opt-in (measured negative, see module docstring) but
stays parity-tested here. These tests pin three layers:

1. the jnp reference == the old explicit-mask `_gqa_attention_cached`
   (the canonical semantics are exactly what callers constructed);
2. the Pallas kernel (interpret mode) == the jnp reference, across
   T=1/T>1, per-row depths incl. 0/full, int8 scales, dtypes, and
   chunk boundaries (S not a multiple of chunk);
3. text_forward(mask=None) == text_forward(explicit cols<=depth mask)
   end-to-end through a layer stack.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlm_clip_tpu.ops.decode_attention import (decode_attention,
                                               decode_attention_pallas,
                                               decode_attention_reference)
from vlm_clip_tpu.vlm.qwen_model import _gqa_attention_cached


def _rand_case(key, B, T, h, kv, d, S, dtype=jnp.float32, quant=False):
    ks = jax.random.split(key, 8)
    q = jax.random.normal(ks[0], (B, T, h, d), dtype)
    k_old = jax.random.normal(ks[1], (B, S, kv, d), dtype)
    v_old = jax.random.normal(ks[2], (B, S, kv, d), dtype)
    k_cur = jax.random.normal(ks[3], (B, T, kv, d), dtype)
    v_cur = jax.random.normal(ks[4], (B, T, kv, d), dtype)
    depths = jax.random.randint(ks[5], (B,), 0, S + 1 - T)
    if quant:
        k_scale = jax.random.uniform(ks[6], (B, S, kv), jnp.float32,
                                     0.005, 0.02)
        v_scale = jax.random.uniform(ks[7], (B, S, kv), jnp.float32,
                                     0.005, 0.02)
        k_old = jax.random.randint(ks[1], (B, S, kv, d), -127, 128
                                   ).astype(jnp.int8)
        v_old = jax.random.randint(ks[2], (B, S, kv, d), -127, 128
                                   ).astype(jnp.int8)
    else:
        k_scale = v_scale = None
    return q, k_old, v_old, k_cur, v_cur, depths, k_scale, v_scale


def _explicit_mask(depths, T, S):
    """The mask every decode caller used to construct: admit
    ``cols <= depth`` (the stale cut then excludes col == depth)."""
    cols = jnp.arange(S)
    return jnp.where(cols[None] <= depths[:, None], 0.0,
                     -3.4028235e38)[:, None, None, :]


def test_reference_matches_old_explicit_mask_route():
    """Canonical semantics == the old cols<=depth explicit-mask path
    through _gqa_attention_cached, for T=1 and a T>1 verify block."""
    for T in (1, 3):
        case = _rand_case(jax.random.PRNGKey(T), B=4, T=T, h=4, kv=2,
                          d=16, S=40)
        q, k_old, v_old, k_cur, v_cur, depths, _, _ = case
        ref = decode_attention_reference(q, k_old, v_old, k_cur, v_cur,
                                         depths)
        old = _gqa_attention_cached(q, k_old, v_old, k_cur, v_cur,
                                    _explicit_mask(depths, T, 40),
                                    depths, 4, 2)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(old),
                                   atol=1e-5, rtol=1e-5)


def test_reference_matches_old_route_int8_scales():
    case = _rand_case(jax.random.PRNGKey(9), B=3, T=2, h=4, kv=2, d=16,
                      S=40, quant=True)
    q, k_old, v_old, k_cur, v_cur, depths, ks_, vs_ = case
    ref = decode_attention_reference(q, k_old, v_old, k_cur, v_cur,
                                     depths, ks_, vs_)
    old = _gqa_attention_cached(q, k_old, v_old, k_cur, v_cur,
                                _explicit_mask(depths, 2, 40), depths,
                                4, 2, k_scale=ks_, v_scale=vs_)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(old),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("T,quant", [(1, False), (1, True),
                                     (5, False), (5, True)])
def test_kernel_matches_reference(T, quant):
    """Pallas kernel (interpreter) == jnp reference, fp32."""
    case = _rand_case(jax.random.PRNGKey(10 + T), B=3, T=T, h=8, kv=2,
                      d=32, S=96, quant=quant)
    q, k_old, v_old, k_cur, v_cur, depths, ks_, vs_ = case
    # force depth extremes into the batch: an empty-cache row (fresh
    # block only) and a full-depth row
    depths = depths.at[0].set(0).at[1].set(96 - T)
    ref = decode_attention_reference(q, k_old, v_old, k_cur, v_cur,
                                     depths, ks_, vs_)
    got = decode_attention_pallas(q, k_old, v_old, k_cur, v_cur, depths,
                                  ks_, vs_, chunk=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_ragged_final_chunk_and_bf16():
    """S not a multiple of chunk (out-of-bounds block padding must be
    fully masked) + bf16 inputs (the decode dtype)."""
    case = _rand_case(jax.random.PRNGKey(3), B=2, T=1, h=8, kv=2, d=32,
                      S=80, dtype=jnp.bfloat16)
    q, k_old, v_old, k_cur, v_cur, depths, _, _ = case
    depths = jnp.array([80, 37], jnp.int32)
    ref = decode_attention_reference(q, k_old, v_old, k_cur, v_cur,
                                     depths)
    got = decode_attention_pallas(q, k_old, v_old, k_cur, v_cur, depths,
                                  chunk=64, interpret=True)
    assert bool(jnp.all(jnp.isfinite(got.astype(jnp.float32))))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_kernel_ragged_final_chunk_quantized():
    """Ragged S + int8 scales: the scale block's out-of-bounds padding
    is NaN in the interpreter — the v-scale fold must not leak it
    through the zeroed probs (0 * NaN = NaN). Regression: real-TPU
    NaNs at S=768/chunk=512 quantized (round 4)."""
    case = _rand_case(jax.random.PRNGKey(6), B=2, T=5, h=8, kv=2, d=32,
                      S=80, quant=True)
    q, k_old, v_old, k_cur, v_cur, depths, ks_, vs_ = case
    depths = jnp.array([75, 37], jnp.int32)
    ref = decode_attention_reference(q, k_old, v_old, k_cur, v_cur,
                                     depths, ks_, vs_)
    got = decode_attention_pallas(q, k_old, v_old, k_cur, v_cur, depths,
                                  ks_, vs_, chunk=64, interpret=True)
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_head_dim_128():
    """The real-model head dim (the only one the TPU route accepts)."""
    case = _rand_case(jax.random.PRNGKey(4), B=2, T=2, h=16, kv=2,
                      d=128, S=64, quant=True)
    q, k_old, v_old, k_cur, v_cur, depths, ks_, vs_ = case
    ref = decode_attention_reference(q, k_old, v_old, k_cur, v_cur,
                                     depths, ks_, vs_)
    got = decode_attention_pallas(q, k_old, v_old, k_cur, v_cur, depths,
                                  ks_, vs_, chunk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dispatcher_cpu_uses_reference():
    case = _rand_case(jax.random.PRNGKey(5), B=2, T=1, h=4, kv=2, d=16,
                      S=32)
    q, k_old, v_old, k_cur, v_cur, depths, _, _ = case
    got = decode_attention(q, k_old, v_old, k_cur, v_cur, depths)
    ref = decode_attention_reference(q, k_old, v_old, k_cur, v_cur,
                                     depths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref))


def test_text_forward_mask_none_matches_explicit():
    """End-to-end canonical routing: text_forward(mask=None) ==
    text_forward(explicit cols<=depth mask) through a 2-layer stack,
    per-row depths (the engine contract)."""
    from vlm_clip_tpu.vlm.qwen_model import (QwenTextConfig,
                                             init_kv_cache, init_text,
                                             text_forward)

    tcfg = QwenTextConfig(hidden_size=64, intermediate_size=128,
                          num_layers=2, num_heads=4, num_kv_heads=2,
                          head_dim=16, vocab_size=97,
                          rope_theta=10_000.0, mrope_section=(4, 2, 2))
    params = init_text(jax.random.PRNGKey(0), tcfg)
    B, S = 3, 48
    cache = init_kv_cache(tcfg, B, S)
    # pre-fill rows with random KV at assorted depths
    k0 = jax.random.normal(jax.random.PRNGKey(1), cache.k.shape,
                           cache.k.dtype)
    cache = cache._replace(k=k0, v=k0 * 0.5)
    depths = jnp.array([0, 7, 31], jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 64))
    pos3 = jnp.broadcast_to(depths[None, :, None], (3, B, 1))

    explicit = _explicit_mask(depths, 1, S)
    ref_logits, ref_cache = text_forward(params, emb, pos3, tcfg,
                                         explicit, cache, depths)
    got_logits, got_cache = text_forward(params, emb, pos3, tcfg,
                                         None, cache, depths)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(ref_logits),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_cache.k),
                               np.asarray(ref_cache.k),
                               atol=1e-6, rtol=1e-6)


def test_text_forward_mask_none_scalar_dense_route():
    """Scalar cache_index + tiny cache = the dense write-then-attend
    route; mask=None must build the canonical cols <= index + t mask."""
    from vlm_clip_tpu.vlm.qwen_model import (QwenTextConfig,
                                             init_kv_cache, init_text,
                                             text_forward)

    tcfg = QwenTextConfig(hidden_size=64, intermediate_size=128,
                          num_layers=2, num_heads=4, num_kv_heads=2,
                          head_dim=16, vocab_size=97,
                          rope_theta=10_000.0, mrope_section=(4, 2, 2))
    params = init_text(jax.random.PRNGKey(0), tcfg)
    B, S, idx = 2, 32, 9
    cache = init_kv_cache(tcfg, B, S)
    k0 = jax.random.normal(jax.random.PRNGKey(1), cache.k.shape,
                           cache.k.dtype)
    cache = cache._replace(k=k0, v=k0 * 0.5, length=jnp.int32(idx))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, 1, 64))
    pos3 = jnp.full((3, B, 1), idx, jnp.int32)

    cols = jnp.arange(S)
    explicit = jnp.where((cols <= idx)[None, None, None], 0.0,
                         -3.4028235e38)
    ref_logits, _ = text_forward(params, emb, pos3, tcfg, explicit,
                                 cache, jnp.int32(idx))
    got_logits, _ = text_forward(params, emb, pos3, tcfg, None,
                                 cache, jnp.int32(idx))
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(ref_logits),
                               atol=1e-5, rtol=1e-5)


def test_enabled_pallas_path_on_tpu():
    """The compiled (non-interpret) kernel path behind
    VLM_CLIP_DECODE_ATTN_PALLAS=1 — skipped on the hermetic CPU mesh;
    cli/check_decode_attn.py runs the full matrix on the real chip so
    the documented opt-in cannot rot (VERDICT r4 #8)."""
    if jax.default_backend() != "tpu":
        pytest.skip("compiled kernel path needs the TPU backend")
    from vlm_clip_tpu.ops import decode_attention as DA

    case = _rand_case(jax.random.PRNGKey(3), B=4, T=1, h=8, kv=2, d=128,
                      S=256, dtype=jnp.bfloat16)
    q, k_old, v_old, k_cur, v_cur, depths, _, _ = case
    got = np.asarray(DA.decode_attention_pallas(
        q, k_old, v_old, k_cur, v_cur, depths)).astype(np.float32)
    ref = np.asarray(DA.decode_attention_reference(
        q, k_old, v_old, k_cur, v_cur, depths)).astype(np.float32)
    assert np.abs(got - ref).max() < 6e-2
