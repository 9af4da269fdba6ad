"""The adapter zoo — every trainable-module family in the reference.

All adapters are functional (init_* -> params pytree, apply function). The
fused Pallas implementations of the hot paths live in ops/; these jnp
versions are the semantic definition, the Pallas kernels are tested against
them.

Families (reference contracts, cited file:line into /root/reference):

1. Feature bottleneck adapter (pipelines T and V):
   ``fc2(relu(fc1(x)))`` on pooled/projected features; V adds Dropout(0.1)
   between relu and fc2 (model_t.py:13-33, model_v.py:18-39). Used with a
   residual ratio blend ``r*adapter(x) + (1-r)*x`` then L2 renorm
   (model_t.py:163-169, model_v.py:278-285).

2. Sequence (Houlsby) adapter (pipeline M):
   ``LN(x + up(gelu(down(x))))`` over the full [B, T, H] last_hidden_state
   (adapter/clip_adapter.py:4-23, 131-150).

3. Cross-modal attention adapter (pipeline M, SharedMHSAttentionAdapter,
   adapter/clip_adapter.py:69-128): project text (512->H) and image
   (768->H); pre-norm MHA with text as query, image as key/value; residual
   is the *normed* projected text (the reference overwrites hidden_states
   with norm2 output before adding — a quirk we reproduce); then pre-norm
   4xH GELU MLP with residual. Stacked x shared_adapter_layers
   (model_m.py:54-61).

4. peclip alt set (adapter/peclip.py:6-48, imported nowhere in the
   reference but part of the public surface): TextualAdapter (bottleneck +
   GELU + plain residual, no LN), ContextAdapter / SharedAdapter
   (self-MHA + LN(attn + x)).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from vlm_clip_tpu.models import layers as L

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# 1. feature bottleneck adapter (T/V)
# ---------------------------------------------------------------------------

def init_feature_adapter(rng, dim: int, bottleneck: int,
                         dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    # kaiming-uniform-flavored init like torch nn.Linear defaults
    b1 = (1.0 / dim) ** 0.5
    b2 = (1.0 / bottleneck) ** 0.5
    return {
        "fc1": {"kernel": jax.random.uniform(k1, (dim, bottleneck), dtype,
                                             -b1, b1),
                "bias": jnp.zeros((bottleneck,), dtype)},
        "fc2": {"kernel": jax.random.uniform(k2, (bottleneck, dim), dtype,
                                             -b2, b2),
                "bias": jnp.zeros((dim,), dtype)},
    }


def feature_adapter(p: Params, x: jnp.ndarray, *, dropout: float = 0.0,
                    rng: Optional[jax.Array] = None,
                    deterministic: bool = True) -> jnp.ndarray:
    """fc2(dropout(relu(fc1(x)))). Dropout active only when not deterministic."""
    h = jax.nn.relu(L.linear(p["fc1"], x))
    if dropout > 0.0 and not deterministic:
        if rng is None:
            raise ValueError("dropout requires an rng key")
        keep = jax.random.bernoulli(rng, 1.0 - dropout, h.shape)
        h = jnp.where(keep, h / (1.0 - dropout), 0.0).astype(h.dtype)
    return L.linear(p["fc2"], h)


def residual_blend(adapted: jnp.ndarray, original: jnp.ndarray,
                   ratio: float) -> jnp.ndarray:
    """r*adapted + (1-r)*original, then L2 renorm (model_t.py:166-169)."""
    mixed = ratio * adapted.astype(jnp.float32) \
        + (1.0 - ratio) * original.astype(jnp.float32)
    return L.l2_normalize(mixed).astype(original.dtype)


def adapt_features(p: Params, x: jnp.ndarray, ratio: float, *,
                   dropout: float = 0.0, rng: Optional[jax.Array] = None,
                   deterministic: bool = True,
                   impl: str = "auto") -> jnp.ndarray:
    """The full T/V feature-branch op: adapter -> ratio blend -> renorm.

    ``impl``: 'auto' uses the fused Pallas kernel on TPU whenever dropout
    is inactive (ops/fused_adapter.py — single-pass, fp32-internal, same
    semantics); 'jnp' forces the reference composition; 'fused' forces the
    kernel (interpreter off-TPU).
    """
    dropout_active = dropout > 0.0 and not deterministic
    if impl != "jnp" and x.ndim == 2:
        from vlm_clip_tpu.ops import fused_adapter as F
        from vlm_clip_tpu.ops import fused_sharded as FS

        if FS.current() is not None and FS.rows_shardable(x.shape[0]) \
                and (not dropout_active or rng is not None):
            # multi-chip: the same kernels per shard via shard_map
            mesh, axis = FS.current()
            seed = (jax.random.randint(rng, (), 0, 2**31 - 1)
                    if dropout_active else None)
            return FS.feature_adapter_blend_fused(
                x, p["fc1"]["kernel"], p["fc1"]["bias"],
                p["fc2"]["kernel"], p["fc2"]["bias"], ratio,
                dropout if dropout_active else 0.0, seed, mesh, axis)
        if impl == "fused" or F.fused_enabled():
            if not dropout_active:
                return F.feature_adapter_blend_fused(
                    x, p["fc1"]["kernel"], p["fc1"]["bias"],
                    p["fc2"]["kernel"], p["fc2"]["bias"], ratio)
            if rng is not None:
                # in-kernel counter-based dropout (mask realization
                # differs from the jnp bernoulli path; same distribution)
                seed = jax.random.randint(rng, (), 0, 2**31 - 1)
                return F.feature_adapter_blend_fused(
                    x, p["fc1"]["kernel"], p["fc1"]["bias"],
                    p["fc2"]["kernel"], p["fc2"]["bias"], ratio,
                    dropout, seed)
    return residual_blend(
        feature_adapter(p, x, dropout=dropout, rng=rng,
                        deterministic=deterministic),
        x, ratio)


# ---------------------------------------------------------------------------
# 2. sequence (Houlsby) adapter (M)
# ---------------------------------------------------------------------------

def init_seq_adapter(rng, hidden: int, adapter_size: int,
                     dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    b1 = (1.0 / hidden) ** 0.5
    b2 = (1.0 / adapter_size) ** 0.5
    return {
        "down": {"kernel": jax.random.uniform(k1, (hidden, adapter_size),
                                              dtype, -b1, b1),
                 "bias": jnp.zeros((adapter_size,), dtype)},
        "up": {"kernel": jax.random.uniform(k2, (adapter_size, hidden),
                                            dtype, -b2, b2),
               "bias": jnp.zeros((hidden,), dtype)},
        "ln": L.init_layernorm(hidden, dtype),
    }


def seq_adapter(p: Params, x: jnp.ndarray, eps: float = 1e-5,
                impl: str = "auto") -> jnp.ndarray:
    """LN(x + up(gelu(down(x)))) over [B, T, H] (clip_adapter.py:17-23).

    On TPU dispatches to the fused Pallas kernel (1.9x fwd / 3.1x bwd vs
    the unfused graph at ViT-B/16 train shapes); 'jnp' forces the
    reference composition.
    """
    if impl != "jnp":
        from vlm_clip_tpu.ops import fused_adapter as F
        from vlm_clip_tpu.ops import fused_sharded as FS

        shape = x.shape
        rows = 1
        for s in shape[:-1]:
            rows *= s
        if FS.current() is not None and FS.rows_shardable(shape[0]):
            # multi-chip: rows shard over the LEADING (batch) axis —
            # the flattened [B*T, H] view keeps batch-major order, so
            # P(axis) on rows == P(axis) on batch
            mesh, axis = FS.current()
            y = FS.seq_adapter_fused(
                x.reshape(rows, shape[-1]), p["down"]["kernel"],
                p["down"]["bias"], p["up"]["kernel"], p["up"]["bias"],
                p["ln"]["scale"], p["ln"]["bias"], eps, mesh, axis)
            return y.reshape(shape)
        if impl == "fused" or F.fused_enabled():
            y = F.seq_adapter_fused(
                x.reshape(-1, shape[-1]), p["down"]["kernel"],
                p["down"]["bias"], p["up"]["kernel"], p["up"]["bias"],
                p["ln"]["scale"], p["ln"]["bias"], eps)
            return y.reshape(shape)
    h = L.linear(p["up"], L.gelu_exact(L.linear(p["down"], x)))
    return L.layer_norm(p["ln"], x + h, eps)


# ---------------------------------------------------------------------------
# 3. cross-modal attention adapter (M)
# ---------------------------------------------------------------------------

def init_cross_modal_adapter(rng, text_dim: int = 512, image_dim: int = 768,
                             hidden: int = 512, num_heads: int = 8,
                             dtype=jnp.float32) -> Params:
    ks = jax.random.split(rng, 5)
    return {
        "text_proj": L.init_linear(ks[0], text_dim, hidden, dtype=dtype),
        "image_proj": L.init_linear(ks[1], image_dim, hidden, dtype=dtype),
        "attn": L.init_mha(ks[2], hidden, num_heads, dtype=dtype),
        "norm1": L.init_layernorm(hidden, dtype),  # over image side
        "norm2": L.init_layernorm(hidden, dtype),  # over text side
        "norm3": L.init_layernorm(hidden, dtype),  # pre-MLP
        "mlp": init_mlp_gelu(ks[3], hidden, dtype),
    }


def init_mlp_gelu(rng, hidden: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    b1 = (1.0 / hidden) ** 0.5
    b2 = (1.0 / (4 * hidden)) ** 0.5
    return {
        "fc1": {"kernel": jax.random.uniform(k1, (hidden, 4 * hidden), dtype,
                                             -b1, b1),
                "bias": jnp.zeros((4 * hidden,), dtype)},
        "fc2": {"kernel": jax.random.uniform(k2, (4 * hidden, hidden), dtype,
                                             -b2, b2),
                "bias": jnp.zeros((hidden,), dtype)},
    }


def cross_modal_adapter(p: Params, text: jnp.ndarray, image: jnp.ndarray,
                        num_heads: int = 8, eps: float = 1e-5,
                        impl: str = "auto") -> jnp.ndarray:
    """SharedMHSAttentionAdapter forward (clip_adapter.py:99-128).

    Note the reference quirk: the residual for the attention block is the
    *normed* projected text (norm2 output), not the un-normed projection.

    ``image`` may have batch dim 1 while text has batch N: the image-side
    projection + norm then run ONCE and broadcast into attention. This is
    the hot case — pipeline M feeds the constant vision position-embedding
    table as the image (model_m.py:95-100), so per-element projection
    would be pure duplicated work.
    """
    if impl != "jnp":
        from vlm_clip_tpu.ops import fused_adapter as F
        from vlm_clip_tpu.ops import fused_sharded as FS

        Tk = image.shape[1]
        if FS.current() is not None and image.shape[0] == 1 \
                and Tk <= F.ATTN_SEG_MAX \
                and FS.rows_shardable(text.shape[0]):
            # multi-chip: text rows shard over batch; the batch-shared
            # packed kv (built once from the pseudo-image) rides the
            # replicated-operand path with psum'd grads
            mesh, axis = FS.current()
            kbd, vbd = _pack_shared_kv_blockdiag(p, image, num_heads,
                                                 eps, F.attn_seg(Tk))
            B_, T_ = text.shape[:2]
            ap = p["attn"]
            h2 = FS.cross_attn_block_fused(
                text.reshape(B_ * T_, -1),
                p["text_proj"]["kernel"], p["text_proj"]["bias"],
                p["norm2"]["scale"], p["norm2"]["bias"],
                ap["q"]["kernel"], ap["q"]["bias"], kbd, vbd,
                ap["out"]["kernel"], ap["out"]["bias"], num_heads, Tk,
                eps, mesh, axis)
            mp = p["mlp"]
            out2 = FS.prenorm_mlp_fused(
                h2, mp["fc1"]["kernel"], mp["fc1"]["bias"],
                mp["fc2"]["kernel"], mp["fc2"]["bias"],
                p["norm3"]["scale"], p["norm3"]["bias"], eps, mesh, axis)
            return out2.reshape(B_, T_, -1)
        if (impl == "fused" or F.fused_enabled()) \
                and image.shape[0] == 1 and Tk <= F.ATTN_SEG_MAX:
            # Two Pallas kernels per layer (in-kernel remat, nothing
            # stashed to HBM for backward):
            # 1. attention half — text proj + pre-norm + MHA against the
            #    batch-shared kv packed block-diagonally (all dense
            #    [R, H] x [H, *] matmuls, no head loop);
            # 2. pre-norm MLP half — the [B, T, 4H] hidden never exists.
            kbd, vbd = _pack_shared_kv_blockdiag(p, image, num_heads,
                                                 eps, F.attn_seg(Tk))
            B_, T_ = text.shape[:2]
            ap = p["attn"]
            h2 = F.cross_attn_block_fused(
                text.reshape(B_ * T_, -1),
                p["text_proj"]["kernel"], p["text_proj"]["bias"],
                p["norm2"]["scale"], p["norm2"]["bias"],
                ap["q"]["kernel"], ap["q"]["bias"], kbd, vbd,
                ap["out"]["kernel"], ap["out"]["bias"], num_heads, Tk,
                eps)
            mp = p["mlp"]
            out2 = F.prenorm_mlp_fused(
                h2, mp["fc1"]["kernel"], mp["fc1"]["bias"],
                mp["fc2"]["kernel"], mp["fc2"]["bias"],
                p["norm3"]["scale"], p["norm3"]["bias"], eps)
            return out2.reshape(B_, T_, -1)
    t = L.linear(p["text_proj"], text)
    im = L.linear(p["image_proj"], image)
    # kv stays at batch 1: L.mha projects k/v once and broadcasts inside
    # the attention einsums (round 3: broadcasting the kv TENSOR here
    # made the k/v projections + their backward do N x redundant work —
    # the adapter scans were memory-bound on the copies)
    kv = L.layer_norm(p["norm1"], im, eps)
    q = L.layer_norm(p["norm2"], t, eps)
    attn = L.mha(p["attn"], q, kv, num_heads, fused=False)
    h = q + attn
    out = h + L.mlp(p["mlp"], L.layer_norm(p["norm3"], h, eps), act="gelu")
    return out


def _pack_shared_kv_blockdiag(p: Params, image: jnp.ndarray,
                              num_heads: int, eps: float, seg: int):
    """kv side of the fused cross-modal attention: project + norm the
    [1, Tk, image_dim] shared pseudo-image ONCE (tiny, stays in XLA),
    then pack per-head K^T / V into block-diagonal [H, heads*seg] /
    [heads*seg, H] mats so the kernel's attention is two dense matmuls.
    Differentiable — grads flow back to image_proj/norm1/k/v through the
    pack."""
    im = L.linear(p["image_proj"], image)
    kv = L.layer_norm(p["norm1"], im, eps)
    k = L.linear(p["attn"]["k"], kv)[0]  # [Tk, H]
    v = L.linear(p["attn"]["v"], kv)[0]
    Tk, H = k.shape
    hd = H // num_heads
    pad = seg - Tk
    kT = jnp.transpose(k.reshape(Tk, num_heads, hd), (1, 2, 0))
    kT = jnp.pad(kT, ((0, 0), (0, 0), (0, pad)))  # [heads, hd, seg]
    vp = jnp.transpose(v.reshape(Tk, num_heads, hd), (1, 0, 2))
    vp = jnp.pad(vp, ((0, 0), (0, pad), (0, 0)))  # [heads, seg, hd]
    from jax.scipy.linalg import block_diag

    kbd = block_diag(*[kT[h] for h in range(num_heads)])
    vbd = block_diag(*[vp[h] for h in range(num_heads)])
    return kbd, vbd


# ---------------------------------------------------------------------------
# 4. peclip alternates
# ---------------------------------------------------------------------------

def init_textual_adapter(rng, dim: int, hidden: int,
                         dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    b1 = (1.0 / dim) ** 0.5
    b2 = (1.0 / hidden) ** 0.5
    return {
        "down": {"kernel": jax.random.uniform(k1, (dim, hidden), dtype,
                                              -b1, b1),
                 "bias": jnp.zeros((hidden,), dtype)},
        "up": {"kernel": jax.random.uniform(k2, (hidden, dim), dtype,
                                            -b2, b2),
               "bias": jnp.zeros((dim,), dtype)},
    }


def textual_adapter(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Bottleneck + GELU + plain residual, no LN (peclip.py:6-18)."""
    return x + L.linear(p["up"], L.gelu_exact(L.linear(p["down"], x)))


def init_self_attn_adapter(rng, dim: int, num_heads: int,
                           dtype=jnp.float32) -> Params:
    k1, _ = jax.random.split(rng)
    return {"attn": L.init_mha(k1, dim, num_heads, dtype=dtype),
            "ln": L.init_layernorm(dim, dtype)}


def self_attn_adapter(p: Params, x: jnp.ndarray, num_heads: int,
                      eps: float = 1e-5) -> jnp.ndarray:
    """Self-MHA + LN(attn + x) (peclip.py ContextAdapter/SharedAdapter)."""
    attn = L.mha(p["attn"], x, x, num_heads, fused=False)
    return L.layer_norm(p["ln"], attn + x, eps)
