"""Qwen2.5-VL in functional JAX: text decoder + windowed vision tower.

From-scratch TPU port of the reference's VLM backend (model_v.py:43-142
loads HF ``Qwen2_5_VLForConditionalGeneration`` 4-bit via bitsandbytes).
Architecture (validated against the HF implementation at fp32 tolerance
by tests/test_qwen.py):

- text: pre-RMSNorm decoder, GQA attention (kv heads < q heads) with
  biasless o-proj / biased qkv, SwiGLU MLP, M-RoPE (3-axis rotary with
  per-axis channel sections), optional tied lm head;
- vision: 3D-conv patch embed (temporal 2 x 14 x 14), RMSNorm pre-norm
  blocks, 2D rotary, **window attention** with full-attention blocks at
  ``fullatt_block_indexes``, 2x2 spatial merger MLP to the text width;
- weights may be fp32/bf16 pytrees or weight-only int8/int4
  (ops/quant.py) — the NF4 replacement;
- decode: donated jitted single-token step over a preallocated KV cache
  (static shapes; the cache rides in HBM and is updated in place via
  donation).

TPU-first choices vs the HF graph: layers stacked + scanned (per-layer
KV cache is the scanned ys axis), window attention realized as one
additive block-diagonal mask (precomputed on host per grid, static for a
fixed image resolution policy) instead of python-loop per-window splits.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vlm_clip_tpu.ops.decode_attention import decode_attention
from vlm_clip_tpu.ops.nf4 import NF4Linear, nf4_matmul
from vlm_clip_tpu.ops.quant import QuantizedLinear, quant_matmul

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class QwenTextConfig:
    hidden_size: int = 2048
    intermediate_size: int = 11008
    num_layers: int = 36
    num_heads: int = 16
    num_kv_heads: int = 2
    head_dim: int = 128
    vocab_size: int = 151936
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    mrope_section: Tuple[int, int, int] = (16, 24, 24)
    tie_word_embeddings: bool = True


@dataclasses.dataclass(frozen=True)
class QwenVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 3420
    out_hidden_size: int = 2048
    depth: int = 32
    num_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    rms_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size ** 2


@dataclasses.dataclass(frozen=True)
class QwenVLConfig:
    text: QwenTextConfig = dataclasses.field(default_factory=QwenTextConfig)
    vision: QwenVisionConfig = dataclasses.field(
        default_factory=QwenVisionConfig)
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    eos_token_id: int = 151645  # <|im_end|>


def qwen25vl_3b() -> QwenVLConfig:
    """Qwen2.5-VL-3B-Instruct dims (the reference's checkpoint,
    config.py:9)."""
    return QwenVLConfig()


def qwen25vl_7b() -> QwenVLConfig:
    """Qwen2.5-VL-7B-Instruct dims (HF config). Serving HBM at int8:
    ~8.3 GB text weights + ~0.7 GB vision -> fits ONE 16 GB v5e chip
    with ~5 GB for KV (64 slots x 2k ctx int8 = 2.1 GB); TP=2 halves
    the weight stream for latency. See BENCH.md round 4 (large-model
    serving arithmetic)."""
    return QwenVLConfig(
        text=QwenTextConfig(
            hidden_size=3584, intermediate_size=18944, num_layers=28,
            num_heads=28, num_kv_heads=4, head_dim=128,
            tie_word_embeddings=False),
        vision=QwenVisionConfig(out_hidden_size=3584))


def qwen25vl_72b() -> QwenVLConfig:
    """Qwen2.5-VL-72B-Instruct dims (HF config). Serving HBM at int8:
    ~72 GB text weights -> needs >= TP=8 v5e chips (9+ GB/chip) or
    int4 (~36 GB, TP=4); the engine's mesh= TP and the PP generator
    both apply. See BENCH.md round 4."""
    return QwenVLConfig(
        text=QwenTextConfig(
            hidden_size=8192, intermediate_size=29568, num_layers=80,
            num_heads=64, num_kv_heads=8, head_dim=128,
            tie_word_embeddings=False),
        vision=QwenVisionConfig(out_hidden_size=8192))


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def linear(p, x: jnp.ndarray, out_dtype=None) -> jnp.ndarray:
    """fp {'kernel'[,'bias']} or QuantizedLinear. ``out_dtype``
    overrides the x.dtype output cast (the LM head passes float32 so
    logits never round through bf16 on the way to sampling)."""
    if isinstance(p, (QuantizedLinear, NF4Linear)):
        shape = x.shape
        mm = nf4_matmul if isinstance(p, NF4Linear) else quant_matmul
        y = mm(x.reshape(-1, shape[-1]), p, out_dtype=out_dtype)
        return y.reshape(*shape[:-1], -1)
    y = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(jnp.float32)
    return y.astype(out_dtype or x.dtype)


def rms_norm(p, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * p["scale"].astype(jnp.float32)).astype(x.dtype)


def swiglu_mlp(p, x: jnp.ndarray) -> jnp.ndarray:
    if "gateup" in p:  # decode-fused layout: one wide GEMV
        gu = linear(p["gateup"], x)
        g, u = jnp.split(gu, 2, axis=-1)
        return linear(p["down"], jax.nn.silu(g) * u)
    return linear(p["down"], jax.nn.silu(linear(p["gate"], x))
                  * linear(p["up"], x))


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def mrope_cos_sin(position_ids: jnp.ndarray, head_dim: int, theta: float,
                  mrope_section: Tuple[int, int, int]
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """position_ids [3, B, T] -> (cos, sin) [B, T, head_dim] with the
    temporal/height/width channel sections interleaved (HF
    apply_multimodal_rotary_pos_emb semantics)."""
    half = head_dim // 2
    if sum(mrope_section) != half:
        # out-of-range sections silently slice empty arrays and yield a
        # non-rotation embedding of coincidentally correct shape
        raise ValueError(f"mrope_section {mrope_section} must sum to "
                         f"head_dim/2 = {half}")
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32)
                                / half))
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # 3BTH/2
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [3, B, T, head_dim]
    cos, sin = jnp.cos(emb), jnp.sin(emb)
    sections = list(mrope_section) * 2
    starts = np.cumsum([0] + sections[:-1])
    cos_parts = [cos[i % 3, ..., s:s + n]
                 for i, (s, n) in enumerate(zip(starts, sections))]
    sin_parts = [sin[i % 3, ..., s:s + n]
                 for i, (s, n) in enumerate(zip(starts, sections))]
    return (jnp.concatenate(cos_parts, axis=-1),
            jnp.concatenate(sin_parts, axis=-1))


def apply_rope(q, k, cos, sin):
    """q [B,T,h,d], cos/sin [B,T,d] -> rotated (fp32 internally)."""
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    qe = q32 * c + _rotate_half(q32) * s
    ke = k32 * c + _rotate_half(k32) * s
    return qe.astype(q.dtype), ke.astype(k.dtype)


# ---------------------------------------------------------------------------
# text decoder
# ---------------------------------------------------------------------------

class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, maxlen, kv_heads, head_dim]
    v: jnp.ndarray
    length: jnp.ndarray  # [] int32 — tokens filled
    # int8 cache (init_kv_cache(quantized=True)): k/v are int8 and these
    # hold the per-(layer, row, kv-head) symmetric scales [L, B, S, kv].
    # None (the default) = unquantized cache; None is a static pytree
    # leaf, so jitted decode loops carry either layout unchanged.
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None


def init_kv_cache(cfg: QwenTextConfig, batch: int, max_len: int,
                  dtype=jnp.bfloat16, quantized: bool = False) -> KVCache:
    shape = (cfg.num_layers, batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    if quantized:
        # int8 rows + per-row-per-head scales: halves the decode-step
        # cache read (the measured B>=32 decode bottleneck — KV streams
        # at ~535 GB/s near the HBM floor, BENCH.md round 2); the
        # convert*scale dequant fuses into the attention einsum's
        # operand load exactly like the int8 weight GEMMs (~600 GB/s).
        return KVCache(jnp.zeros(shape, jnp.int8),
                       jnp.zeros(shape, jnp.int8),
                       jnp.zeros((), jnp.int32),
                       jnp.ones(shape[:-1], jnp.float32),
                       jnp.ones(shape[:-1], jnp.float32))
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype),
                   jnp.zeros((), jnp.int32))


def quantize_kv_rows(rows: jnp.ndarray):
    """[..., d] -> (int8 rows, fp32 scales [...]): symmetric per-row
    absmax/127 quantization (post-rope keys / values)."""
    r32 = rows.astype(jnp.float32)
    amax = jnp.max(jnp.abs(r32), axis=-1)
    scale = jnp.where(amax > 0.0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(r32 / scale[..., None]), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def dequantize_kv(rows_i8: jnp.ndarray, scale: jnp.ndarray, dtype):
    """Lazy int8 -> ``dtype`` dequant; under jit the convert+scale fuses
    into the consuming einsum's operand load (never materialized)."""
    return (rows_i8.astype(jnp.float32)
            * scale[..., None]).astype(dtype)


def _gqa_attention(q, k, v, mask, num_heads, num_kv_heads,
                   k_scale=None, v_scale=None):
    """q [B,T,h,d]; k,v [B,S,kv,d]; mask additive [B|1,1,T,S].

    Grouped einsum — NO ``jnp.repeat`` of K/V to full head count: the
    repeat materialized rep× the KV cache in HBM every decode step
    (at B=16, maxlen=512, rep=8 that is ~2.4 GB/step across the 36
    layers and dominated batched decode; measured in BENCH.md round 2).

    int8 cache (``k_scale``/``v_scale`` [B,S,kv] set): k/v stream as
    int8 with a PURE convert in the dot operand (the producer pattern
    XLA fuses into the operand load, like the int8 weight GEMMs), and
    the scales fold ALGEBRAICALLY outside the dots — k scales into the
    scores (per-source-column multiply), v scales into the probs before
    the PV einsum. Dequantizing k/v ahead of the einsum instead defeats
    the fusion and materializes a full-size cache copy per step
    (measured -18% at B=64, BENCH.md round 3).
    """
    B, T, h, d = q.shape
    rep = h // num_kv_heads
    qg = q.reshape(B, T, num_kv_heads, rep, d)
    scores = jnp.einsum("btkrd,bskd->bkrts", qg, k.astype(q.dtype),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    if k_scale is not None:
        # [B,S,kv] -> [B,kv,1,1,S] over scores [b,k,r,t,s]
        scores = scores * jnp.transpose(
            k_scale, (0, 2, 1))[:, :, None, None, :]
    if mask is not None:
        # [B|1, 1, T, S] -> broadcast over (kv, rep)
        scores = scores + mask.astype(jnp.float32)[:, :, None]
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    if v_scale is not None:
        probs = probs * jnp.transpose(
            v_scale, (0, 2, 1))[:, :, None, None, :]
    out = jnp.einsum("bkrts,bskd->btkrd", probs.astype(q.dtype),
                     v.astype(q.dtype),
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(B, T, h * d)


# Below this per-layer cache size (bytes of ONE of k/v), decode uses the
# dense write-then-attend route: the slice copy it forces costs ~bytes*4
# of HBM traffic (r+w, both arrays) — under ~13 us at 2 MB/600 GB/s —
# while the split-column route's extra per-layer small ops cost ~8 us
# regardless of size (B=1 measured 4.94 vs 5.22 ms/token). Above it the
# copy dominates (B=64/S=512 decode was 13.6 ms/step vs 8.3 split).
_DENSE_CACHE_ROUTE_MAX_BYTES = 2 * 1024 * 1024


def _gqa_attention_cached(q, k_old, v_old, k_cur, v_cur, mask,
                          cache_index, num_heads, num_kv_heads,
                          k_scale=None, v_scale=None):
    """Cached attention WITHOUT writing the current rows first.

    q [B,T,h,d]; k_old/v_old [B,S,kv,d] are the cache rows as of BEFORE
    this call (rows >= cache_index stale); k_cur/v_cur [B,T,kv,d] are
    the current tokens' keys/values. ``mask`` is the caller's full-cache
    additive mask [B|1,1,T,S] whose columns [cache_index, cache_index+T)
    address the current tokens.

    Scores are computed over S + T columns: the S cache columns with the
    current-token positions re-masked out (they hold stale rows), plus T
    fresh columns for the current tokens using the corresponding slice
    of the caller's mask. The attended set and values are exactly those
    of write-then-attend, so the result is bit-identical up to fp
    reduction order — but the full [L,B,S,kv,d] cache never has to be
    rebuilt per step (the scan-ys rebuild cost ~2x the cache's HBM
    traffic every decode step; BENCH.md round 2 "decode step memory
    accounting").

    ``cache_index`` may be a per-row vector [B] (continuous-batching
    decode: every slot sits at its own depth). The stale-row cutoff
    then broadcasts per row. With T == 1 the self column is trivially
    admitted; with T > 1 (speculative verification: the fresh block is
    [x0, draft...] at rows depth..depth+T-1) the fresh columns get a
    causal triangle, so fresh position i attends cache cols < depth_b
    plus fresh cols <= i — exactly the vanilla step-by-step attended
    set for each position.

    ``mask=None`` = the CANONICAL decode mask (cache cols < depth_b +
    causal fresh triangle — exactly what every decode caller used to
    construct as ``cols <= lengths``): dispatches to
    ops/decode_attention.py, which builds the mask from depths inside
    jit (XLA batched-GEMM route by default; the streaming Pallas
    kernel there is a measured negative result, opt-in only).
    """
    B, T, h, d = q.shape
    if mask is None:
        depths = cache_index if jnp.ndim(cache_index) == 1 \
            else jnp.broadcast_to(cache_index, (B,))
        return decode_attention(q, k_old, v_old, k_cur, v_cur, depths,
                                k_scale, v_scale)
    S = k_old.shape[1]
    rep = h // num_kv_heads
    qg = q.reshape(B, T, num_kv_heads, rep, d)
    cols = jax.lax.broadcasted_iota(jnp.int32, (S,), 0)
    neg = jnp.float32(-3.4028235e38)
    if jnp.ndim(cache_index) == 1:  # per-row depths
        cut = cache_index[:, None, None, None]
        mask_past = jnp.where(cols[None, None, None] >= cut,
                              neg, mask.astype(jnp.float32))
        tri = jnp.tril(jnp.ones((T, T), bool))
        mask_self = jnp.where(tri, 0.0, neg)[None, None]
        mask_self = jnp.broadcast_to(mask_self, (B, 1, T, T))
    else:
        mask_past = jnp.where(cols[None, None, None] >= cache_index,
                              neg, mask.astype(jnp.float32))
        mask_self = jax.lax.dynamic_slice_in_dim(
            mask.astype(jnp.float32), cache_index, T, axis=3)
    s_past = jnp.einsum("btkrd,bskd->bkrts", qg, k_old.astype(q.dtype),
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    if k_scale is not None:  # int8 cache: fold k scales into the scores
        s_past = s_past * jnp.transpose(
            k_scale, (0, 2, 1))[:, :, None, None, :]
    s_past = s_past + mask_past[:, :, None]
    s_self = jnp.einsum("btkrd,bskd->bkrts", qg, k_cur,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    s_self = s_self + mask_self[:, :, None]
    s = jnp.concatenate([s_past, s_self], axis=-1)
    probs = jax.nn.softmax(s, axis=-1)
    p_past = probs[..., :S]
    if v_scale is not None:  # fold v scales into the probs
        p_past = p_past * jnp.transpose(
            v_scale, (0, 2, 1))[:, :, None, None, :]
    p_past = p_past.astype(q.dtype)
    p_self = probs[..., S:].astype(q.dtype)
    out = jnp.einsum("bkrts,bskd->btkrd", p_past, v_old.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("bkrts,bskd->btkrd", p_self, v_cur,
                           preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(B, T, h * d)


def text_decoder_layer(p, x, cos, sin, mask, cfg: QwenTextConfig,
                       cache_kv: Optional[Tuple] = None,
                       cache_index: Optional[jnp.ndarray] = None):
    """Returns (x, (k_rows, v_rows)).

    With a cache, the returned rows are the CURRENT tokens' [B,T,kv,d]
    keys/values (cast to the cache dtype) — the caller writes them at
    ``cache_index`` (text_forward does one dynamic_update_slice on the
    stacked cache AFTER the layer scan, which XLA performs in place on
    the donated/carried buffer). Attention attends to the old cache rows
    plus the fresh rows via _gqa_attention_cached; the layer itself
    never rebuilds the full cache (the old write-then-attend contract
    made the scan stack a fresh full-size cache every decode step —
    ~2x the cache's HBM traffic, measured in BENCH.md round 2)."""
    B, T, _ = x.shape
    h = rms_norm(p["ln1"], x, cfg.rms_norm_eps)
    nq = cfg.num_heads * cfg.head_dim
    nkv = cfg.num_kv_heads * cfg.head_dim
    if "qkv" in p["attn"]:
        # decode-fused layout (quantize_qwen_params(fuse_decode=True)):
        # one GEMV instead of three — per-call overhead dominates
        # narrow-N decode GEMVs (measured ~9-15 us each, BENCH.md r2)
        qkv = linear(p["attn"]["qkv"], h)
        q, k, v = jnp.split(qkv, (nq, nq + nkv), axis=-1)
    else:
        q = linear(p["attn"]["q"], h)
        k = linear(p["attn"]["k"], h)
        v = linear(p["attn"]["v"], h)
    q = q.reshape(B, T, cfg.num_heads, cfg.head_dim)
    k = k.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    v = v.reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    q, k = apply_rope(q, k, cos, sin)
    if cache_kv is not None:
        # [B, maxlen, kv, d] — rows >= cache_index stale
        ck, cv, cks, cvs = cache_kv
        quant = cks is not None
        if quant:
            k_rows, k_sc = quantize_kv_rows(k)
            v_rows, v_sc = quantize_kv_rows(v)
            # attention sees the ROUND-TRIPPED current rows — identical
            # numerics to reading them back from the cache next step
            k_cur = dequantize_kv(k_rows, k_sc, q.dtype)
            v_cur = dequantize_kv(v_rows, v_sc, q.dtype)
        else:
            # cache-dtype round trip BEFORE attention: identical
            # numerics to the old write-then-read path (the cache may
            # be bf16 while q is fp32 in tests)
            k_rows = k.astype(ck.dtype)
            v_rows = v.astype(cv.dtype)
            k_sc = v_sc = None
            k_cur = k_rows.astype(q.dtype)
            v_cur = v_rows.astype(q.dtype)
        if jnp.ndim(cache_index) == 0 and \
                ck.size * ck.dtype.itemsize <= _DENSE_CACHE_ROUTE_MAX_BYTES:
            # Tiny cache (B=1/small-B serving): write-then-attend. The
            # per-layer slice copy this forces is well under the ~8 us
            # of extra per-layer small ops (second einsum, concat,
            # mask slice) the split route costs — measured: B=1 8h4
            # decode 4.94 ms/token dense vs 5.22 split.
            ck2 = jax.lax.dynamic_update_slice(ck, k_rows,
                                               (0, cache_index, 0, 0))
            cv2 = jax.lax.dynamic_update_slice(cv, v_rows,
                                               (0, cache_index, 0, 0))
            if quant:
                cks2 = jax.lax.dynamic_update_slice(
                    cks, k_sc, (0, cache_index, 0))
                cvs2 = jax.lax.dynamic_update_slice(
                    cvs, v_sc, (0, cache_index, 0))
            else:
                cks2 = cvs2 = None
            if mask is None:
                # canonical decode mask on the write-then-attend cache:
                # fresh row t sits at col cache_index + t and attends
                # cols <= cache_index + t
                cols2 = jnp.arange(ck.shape[1])
                dmask = jnp.where(
                    cols2[None, :] <= cache_index + jnp.arange(T)[:, None],
                    0.0, -3.4028235e38)[None, None]
            else:
                dmask = mask
            attn = _gqa_attention(q, ck2, cv2, dmask,
                                  cfg.num_heads, cfg.num_kv_heads,
                                  k_scale=cks2, v_scale=cvs2)
        else:
            attn = _gqa_attention_cached(
                q, ck, cv, k_cur, v_cur, mask,
                cache_index, cfg.num_heads, cfg.num_kv_heads,
                k_scale=cks, v_scale=cvs)
        new_cache = (k_rows, v_rows, k_sc, v_sc)
    else:
        new_cache = (k, v, None, None)
        attn = _gqa_attention(q, k, v, mask, cfg.num_heads,
                              cfg.num_kv_heads)
    x = x + linear(p["attn"]["o"], attn)
    x = x + swiglu_mlp(p["mlp"], rms_norm(p["ln2"], x, cfg.rms_norm_eps))
    return x, new_cache


def text_forward(params: Params, embeds: jnp.ndarray,
                 position_ids: jnp.ndarray, cfg: QwenTextConfig,
                 mask: Optional[jnp.ndarray] = None,
                 cache: Optional[KVCache] = None,
                 cache_index: Optional[jnp.ndarray] = None,
                 last_only: bool = False,
                 last_index: Optional[jnp.ndarray] = None,
                 kv_read_span: Optional[int] = None
                 ) -> Tuple[jnp.ndarray, Optional[KVCache]]:
    """embeds [B, T, H] -> (logits [B, T, V], updated cache).

    ``position_ids`` [3, B, T]. With a cache, ``mask`` must cover the full
    cache length [B|1, 1, T, maxlen] — or be ``None`` for the CANONICAL
    decode mask (attend cache cols < depth, causal fresh triangle;
    identical to the ``cols <= lengths`` masks the decode loops used to
    build), constructed from the depths inside jit
    (ops/decode_attention.py).

    ``cache_index`` is the row every layer's fresh K/V lands at: a
    scalar (all rows at the same depth — the generate() paths), or a
    per-row vector [B] with T == 1 (continuous-batching decode,
    vlm/engine.py: each slot writes at its own depth and the mask rows
    admit ``cols <= depth_b``).

    ``last_only``: compute head logits for the final position only
    (returns [B, 1, V]) — prefill needs just the next-token logits, and
    the 152k-vocab head over all T positions is ~170 MB of wasted
    logits (plus, for an int4 untied head, a full fp32 weight
    materialization on the M>32 dequant route).

    ``last_index`` (traced scalar, implies ``last_only``): position of
    the "last" token when the sequence is tail-padded to a bucketed
    length — the padded prefill path (exact HF dynamic resolution)
    needs logits at the final REAL position, not at T-1.

    ``kv_read_span`` (static int, vector ``cache_index`` only):
    attention READS only cache columns ``< kv_read_span`` — the engine
    passes a host-computed bucket over max(active depth) + chunk steps,
    so a 768-row cache with ~400-deep slots streams ~half the KV bytes
    per step (decode is cache-streaming-bound, BENCH.md r2). Row WRITES
    still target the full cache. The caller guarantees every row that
    any live slot attends sits below the span; deeper stale rows belong
    to done/free slots whose outputs are discarded.
    """
    cos, sin = mrope_cos_sin(position_ids, cfg.head_dim, cfg.rope_theta,
                             cfg.mrope_section)
    x = embeds

    if cache is None:
        def body(h, lp):
            h, _ = text_decoder_layer(lp, h, cos, sin, mask, cfg)
            return h, None

        x, _ = jax.lax.scan(body, x, params["layers"])
        new_cache = None
    else:
        quant = cache.k_scale is not None
        xs = (params["layers"], cache.k, cache.v) \
            + ((cache.k_scale, cache.v_scale) if quant else ())

        span = kv_read_span
        if span is not None and (jnp.ndim(cache_index) != 1
                                 or span > cache.k.shape[2]):
            raise ValueError("kv_read_span requires a per-row vector "
                             "cache_index and span <= max_len")
        rmask = mask if span is None or mask is None \
            else mask[..., :span]

        def body(h, inputs):
            lp, ck, cv = inputs[:3]
            cks, cvs = inputs[3:] if quant else (None, None)
            if span is not None and span < ck.shape[1]:
                ck, cv = ck[:, :span], cv[:, :span]
                if quant:
                    cks, cvs = cks[:, :span], cvs[:, :span]
            h, rows = text_decoder_layer(lp, h, cos, sin, rmask, cfg,
                                         (ck, cv, cks, cvs), cache_index)
            return h, rows if quant else rows[:2]

        # ys are just the current rows [L, B, T, kv, d]; ONE row write
        # on the full stacked cache afterwards. Inside the jitted decode
        # loop the cache is a donated while-carry, so XLA performs the
        # dynamic_update_slice in place — the old contract (each layer
        # returns its full updated cache, scan stacks them) allocated
        # and wrote a fresh full-size cache every step.
        x, rows = jax.lax.scan(body, x, xs)
        nk, nv = rows[:2]
        if jnp.ndim(cache_index) == 1:
            # per-row depths (continuous batching): scatter each slot's
            # fresh rows at its own cache depth — T rows land at
            # depth_b..depth_b+T-1 (T > 1 = speculative verification
            # blocks; rejected draft rows sit above the slot's accepted
            # length and are overwritten before they're ever attended).
            # cache.length is meaningless across heterogeneous slots —
            # left untouched; the engine tracks per-slot lengths itself.
            T = nk.shape[2]
            bidx = jnp.arange(nk.shape[1])[:, None]
            idx = cache_index[:, None] + jnp.arange(T)[None]
            new_k = cache.k.at[:, bidx, idx].set(nk)
            new_v = cache.v.at[:, bidx, idx].set(nv)
            if quant:
                nks, nvs = rows[2:]
                new_ks = cache.k_scale.at[:, bidx, idx].set(nks)
                new_vs = cache.v_scale.at[:, bidx, idx].set(nvs)
                new_cache = KVCache(new_k, new_v, cache.length,
                                    new_ks, new_vs)
            else:
                new_cache = KVCache(new_k, new_v, cache.length)
        else:
            new_k = jax.lax.dynamic_update_slice(
                cache.k, nk, (0, 0, cache_index, 0, 0))
            new_v = jax.lax.dynamic_update_slice(
                cache.v, nv, (0, 0, cache_index, 0, 0))
            if quant:
                nks, nvs = rows[2:]
                new_ks = jax.lax.dynamic_update_slice(
                    cache.k_scale, nks, (0, 0, cache_index, 0))
                new_vs = jax.lax.dynamic_update_slice(
                    cache.v_scale, nvs, (0, 0, cache_index, 0))
                new_cache = KVCache(new_k, new_v,
                                    cache.length + x.shape[1],
                                    new_ks, new_vs)
            else:
                new_cache = KVCache(new_k, new_v,
                                    cache.length + x.shape[1])

    if last_index is not None:
        x = jax.lax.dynamic_slice_in_dim(x, last_index, 1, axis=1)
    elif last_only:
        x = x[:, -1:]
    x = rms_norm(params["final_norm"], x, cfg.rms_norm_eps)
    if cfg.tie_word_embeddings:
        head = params["embed_tokens"].astype(x.dtype).T
        logits = jnp.dot(x, head, preferred_element_type=jnp.float32)
    else:
        # fp32 out like the tied branch: a bf16 round-trip here shifts
        # top-p cutoff membership vs the HF-parity sampling chain
        logits = linear(params["lm_head"], x, out_dtype=jnp.float32)
    return logits.astype(jnp.float32), new_cache


# ---------------------------------------------------------------------------
# vision tower
# ---------------------------------------------------------------------------

def _vision_attention(q, k, v, mask, scale):
    """Dense masked attention, q/k/v [S, h, d]. ``mask=None`` means
    full (unmasked) attention — the full-attention blocks' additive
    mask is identically zero, so materializing it is pure HBM waste."""
    scores = jnp.einsum("thd,shd->hts", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        scores = scores + mask.astype(jnp.float32)[None]
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("hts,shd->thd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def _vision_attention_windowed(q, k, v, window: int, scale):
    """Block-diagonal attention as a BATCHED dense attention over
    contiguous uniform windows (q/k/v [S, h, d], S % window == 0).

    Equivalent to :func:`_vision_attention` with the block-diagonal
    additive mask when every window has ``window`` patches (rows are
    already window-permuted — qwen_process.vision_inputs_from_patches),
    but computes S*window instead of S*S scores: at 448² (S=1024,
    window=64) that is 16× fewer attention FLOPs and a 16× smaller
    softmax, with no mask read at all."""
    S, h, d = q.shape
    nw = S // window
    qw = q.reshape(nw, window, h, d)
    kw = k.reshape(nw, window, h, d)
    vw = v.reshape(nw, window, h, d)
    scores = jnp.einsum("wthd,wshd->whts", qw, kw,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("whts,wshd->wthd", probs.astype(v.dtype), vw,
                     preferred_element_type=jnp.float32)
    return out.reshape(S, h, d).astype(v.dtype)


def vision_block(p, x, cos, sin, mask, cfg: QwenVisionConfig,
                 window: Optional[int] = None):
    """x [S, H] (sequence-major, batchless like the HF tower).
    ``window``: static uniform window length — use the batched
    block-diagonal attention instead of ``mask``."""
    h = rms_norm(p["ln1"], x, cfg.rms_norm_eps)
    S = x.shape[0]
    qkv = linear(p["attn"]["qkv"], h).reshape(S, 3, cfg.num_heads,
                                              cfg.head_dim)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
    q, k = apply_rope(q[None], k[None], cos[None], sin[None])
    q, k = q[0], k[0]
    scale = cfg.head_dim ** -0.5
    if window is not None:
        attn = _vision_attention_windowed(q, k, v, window, scale)
    else:
        attn = _vision_attention(q, k, v, mask, scale)
    x = x + linear(p["attn"]["proj"], attn.reshape(S, -1))
    x = x + swiglu_mlp(p["mlp"], rms_norm(p["ln2"], x, cfg.rms_norm_eps))
    return x


def vision_forward(params: Params, patches: jnp.ndarray,
                   rot_pos_emb: jnp.ndarray, window_mask: jnp.ndarray,
                   full_mask: jnp.ndarray, cfg: QwenVisionConfig,
                   uniform_window: Optional[int] = None) -> jnp.ndarray:
    """patches [S, C*t*P*P] ALREADY window-permuted (host does the
    window_index shuffle, vlm/qwen_process.py); rot_pos_emb [S, head_dim/2]
    likewise permuted. Masks are additive [S, S]. Returns merged vision
    embeds [S/4, out_hidden] in window order (host un-permutes).

    ``uniform_window`` (static): when every window holds that many
    patches (VisionInputs.uniform_window — true for 448² and any grid
    with h, w divisible by 8), windowed blocks run the 16×-cheaper
    batched block-diagonal attention and full blocks run unmasked;
    neither mask array is read. Equivalence is tested against the
    masked path (tests/test_qwen.py)."""
    if not jnp.issubdtype(patches.dtype, jnp.floating):
        patches = patches.astype(jnp.float32)  # raw uint8 patch path
    pe = params["patch_embed"]
    x = jnp.dot(patches.astype(jnp.float32),
                pe["kernel"].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    if "bias" in pe:  # normalization-folded uint8 patch path
        x = x + pe["bias"].astype(jnp.float32)
    x = x.astype(patches.dtype) if patches.dtype != jnp.float32 else x
    emb = jnp.concatenate([rot_pos_emb, rot_pos_emb], axis=-1)
    cos, sin = jnp.cos(emb), jnp.sin(emb)

    is_full = np.zeros((cfg.depth,), bool)
    for i in cfg.fullatt_block_indexes:
        is_full[i] = True

    if uniform_window is not None:
        def body(h, inputs):
            lp, full_flag = inputs
            return jax.lax.cond(
                full_flag,
                lambda hh: vision_block(lp, hh, cos, sin, None, cfg),
                lambda hh: vision_block(lp, hh, cos, sin, None, cfg,
                                        window=uniform_window),
                h), None
    else:
        def body(h, inputs):
            lp, full_flag = inputs
            m = jnp.where(full_flag, full_mask, window_mask)
            return vision_block(lp, h, cos, sin, m, cfg), None

    x, _ = jax.lax.scan(body, x, (params["blocks"], jnp.asarray(is_full)))

    # 2x2 spatial merger (Qwen2_5_VLPatchMerger)
    x = rms_norm(params["merger"]["ln_q"], x, cfg.rms_norm_eps)
    x = x.reshape(-1, cfg.merge_unit * cfg.hidden_size)
    h = jax.nn.gelu(linear(params["merger"]["fc1"], x), approximate=False)
    return linear(params["merger"]["fc2"], h)


# ---------------------------------------------------------------------------
# init (random, for hermetic tests)
# ---------------------------------------------------------------------------

def _init_linear(rng, din, dout, bias=True, dtype=jnp.float32):
    p = {"kernel": (jax.random.normal(rng, (din, dout)) * din ** -0.5
                    ).astype(dtype)}
    if bias:
        p["bias"] = jnp.zeros((dout,), dtype)
    return p


def init_text(rng, cfg: QwenTextConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 8)
    H, hd = cfg.hidden_size, cfg.head_dim

    def layer(k):
        k = jax.random.split(k, 8)
        return {
            "attn": {
                "q": _init_linear(k[0], H, cfg.num_heads * hd, True, dtype),
                "k": _init_linear(k[1], H, cfg.num_kv_heads * hd, True,
                                  dtype),
                "v": _init_linear(k[2], H, cfg.num_kv_heads * hd, True,
                                  dtype),
                "o": _init_linear(k[3], cfg.num_heads * hd, H, False,
                                  dtype),
            },
            "mlp": {
                "gate": _init_linear(k[4], H, cfg.intermediate_size, False,
                                     dtype),
                "up": _init_linear(k[5], H, cfg.intermediate_size, False,
                                   dtype),
                "down": _init_linear(k[6], cfg.intermediate_size, H, False,
                                     dtype),
            },
            "ln1": {"scale": jnp.ones((H,), dtype)},
            "ln2": {"scale": jnp.ones((H,), dtype)},
        }

    layers = [layer(k) for k in jax.random.split(ks[0], cfg.num_layers)]
    params = {
        "embed_tokens": (jax.random.normal(
            ks[1], (cfg.vocab_size, H)) * 0.02).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": {"scale": jnp.ones((H,), dtype)},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _init_linear(ks[2], H, cfg.vocab_size, False,
                                         dtype)
    return params


def init_vision(rng, cfg: QwenVisionConfig, dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 6)
    H = cfg.hidden_size
    in_dim = 3 * cfg.temporal_patch_size * cfg.patch_size ** 2

    def block(k):
        k = jax.random.split(k, 6)
        return {
            "attn": {"qkv": _init_linear(k[0], H, 3 * H, True, dtype),
                     "proj": _init_linear(k[1], H, H, True, dtype)},
            "mlp": {"gate": _init_linear(k[2], H, cfg.intermediate_size,
                                         True, dtype),
                    "up": _init_linear(k[3], H, cfg.intermediate_size,
                                       True, dtype),
                    "down": _init_linear(k[4], cfg.intermediate_size, H,
                                         True, dtype)},
            "ln1": {"scale": jnp.ones((H,), dtype)},
            "ln2": {"scale": jnp.ones((H,), dtype)},
        }

    blocks = [block(k) for k in jax.random.split(ks[0], cfg.depth)]
    merged = cfg.merge_unit * H
    return {
        "patch_embed": {"kernel": (jax.random.normal(
            ks[1], (in_dim, H)) * in_dim ** -0.5).astype(dtype)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln_q": {"scale": jnp.ones((H,), dtype)},
            "fc1": _init_linear(ks[2], merged, merged, True, dtype),
            "fc2": _init_linear(ks[3], merged, cfg.out_hidden_size, True,
                                dtype),
        },
    }
