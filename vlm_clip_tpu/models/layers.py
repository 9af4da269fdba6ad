"""Functional NN primitives on parameter pytrees.

Pure functions over nested-dict params — no module framework. Matmuls use
``preferred_element_type=float32`` so the MXU accumulates in fp32 even when
activations are bf16; LayerNorm statistics and softmax run fp32.

Parameter conventions:
- linear kernels are ``[in, out]`` (JAX convention; transposed from torch);
- layernorm params are ``{'scale', 'bias'}``;
- encoder layers are stacked on a leading layer axis and scanned.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp


Params = Dict[str, Any]

NEG_INF = -3.4028235e38  # finfo(f32).min, matches HF mask fill


# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------

def init_linear(rng, in_dim: int, out_dim: int, std: Optional[float] = None,
                dtype=jnp.float32) -> Params:
    if std is None:
        std = in_dim ** -0.5
    kr, _ = jax.random.split(rng)
    return {
        "kernel": (jax.random.normal(kr, (in_dim, out_dim)) * std).astype(dtype),
        "bias": jnp.zeros((out_dim,), dtype),
    }


def init_layernorm(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    return (y + p["bias"].astype(jnp.float32)).astype(x.dtype)


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5,
               stable_dtype=jnp.float32) -> jnp.ndarray:
    """LayerNorm with statistics in ``stable_dtype`` (fp32 default; bf16
    under the FAST policy trades ~1e-3 feature accuracy for ~16% tower
    time — only safe because the towers are frozen feature extractors)."""
    xs = x.astype(stable_dtype)
    mean = jnp.mean(xs, axis=-1, keepdims=True)
    d = xs - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    y = d * jax.lax.rsqrt(var + jnp.asarray(eps, stable_dtype))
    y = y * p["scale"].astype(stable_dtype) + p["bias"].astype(stable_dtype)
    return y.astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    # CLIP's activation: x * sigmoid(1.702 x)
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {"quick_gelu": quick_gelu, "gelu": gelu_exact,
               "relu": jax.nn.relu}


def mha(p: Params, q_in: jnp.ndarray, kv_in: jnp.ndarray, num_heads: int,
        mask: Optional[jnp.ndarray] = None,
        stable_dtype=jnp.float32,
        fused: Optional[bool] = None) -> jnp.ndarray:
    """Multi-head attention. q_in [B,Tq,H], kv_in [B,Tk,H].

    ``mask`` is an additive bias broadcastable to [B, heads, Tq, Tk]
    (0 where attended, NEG_INF where blocked). Softmax runs in
    ``stable_dtype`` (fp32 default; max-subtracted bf16 under FAST).

    ``fused=None`` defers to the global toggle (ops/attention.py) —
    meant for the FROZEN towers; trainable call sites (adapters) pass
    ``fused=False`` because the fused kernel's backward is a full XLA
    recompute, slower than autodiff of the plain path.
    """
    B, Tq, H = q_in.shape
    hd = H // num_heads
    scale = hd ** -0.5
    q = linear(p["q"], q_in).reshape(B, Tq, num_heads, hd)
    k = linear(p["k"], kv_in).reshape(kv_in.shape[0], -1, num_heads, hd)
    v = linear(p["v"], kv_in).reshape(kv_in.shape[0], -1, num_heads, hd)
    if B == k.shape[0] and Tq == k.shape[1] and fused is not False:
        from vlm_clip_tpu.ops import attention as fa

        if (fused or fa.fused_attention_enabled()) \
                and fa.supports(mask, Tq):
            out = fa.fused_attention(q.transpose(0, 2, 1, 3),
                                     k.transpose(0, 2, 1, 3),
                                     v.transpose(0, 2, 1, 3), scale, mask)
            out = out.transpose(0, 2, 1, 3).reshape(B, Tq, H)
            return linear(p["out"], out)
    # Shared kv (kv batch 1, q batch N): keep k/v at batch 1 and let the
    # einsums broadcast. The cross-modal adapters feed a CONSTANT
    # pseudo-image (model_m.py:95-100 quirk) — broadcasting before the
    # projections made k/v (and their backward) do N x redundant work;
    # profiled at B=96 the adapter scans were memory-bound on the
    # broadcast copies (~580 GB/s moving 1.8 GB/step, BENCH.md round 3).
    kv_spec = "khd" if k.shape[0] == 1 and B != 1 else "bkhd"
    if kv_spec == "khd":
        k, v = k[0], v[0]
    if stable_dtype == jnp.float32:
        scores = jnp.einsum(f"bqhd,{kv_spec}->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        if mask is not None:
            scores = scores + mask.astype(jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1)
    else:
        q = q * scale
        scores = jnp.einsum(f"bqhd,{kv_spec}->bhqk", q, k,
                            preferred_element_type=stable_dtype)
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jnp.einsum(f"bhqk,{kv_spec}->bqhd", probs.astype(q_in.dtype), v,
                     preferred_element_type=jnp.float32).astype(q_in.dtype)
    out = out.reshape(B, Tq, H)
    return linear(p["out"], out)


def init_mha(rng, dim: int, num_heads: int, kv_dim: Optional[int] = None,
             dtype=jnp.float32) -> Params:
    del num_heads
    kv_dim = kv_dim or dim
    ks = jax.random.split(rng, 4)
    return {
        "q": init_linear(ks[0], dim, dim, dtype=dtype),
        "k": init_linear(ks[1], kv_dim, dim, dtype=dtype),
        "v": init_linear(ks[2], kv_dim, dim, dtype=dtype),
        "out": init_linear(ks[3], dim, dim, dtype=dtype),
    }


def mlp(p: Params, x: jnp.ndarray, act: str = "quick_gelu") -> jnp.ndarray:
    h = linear(p["fc1"], x)
    h = ACTIVATIONS[act](h)
    return linear(p["fc2"], h)


def init_mlp(rng, dim: int, hidden: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    return {"fc1": init_linear(k1, dim, hidden, dtype=dtype),
            "fc2": init_linear(k2, hidden, dim, dtype=dtype)}


# ---------------------------------------------------------------------------
# pre-norm transformer encoder layer (CLIP style) + scanned stack
# ---------------------------------------------------------------------------

def encoder_layer(p: Params, x: jnp.ndarray, num_heads: int, eps: float,
                  act: str, mask: Optional[jnp.ndarray] = None,
                  stable_dtype=jnp.float32) -> jnp.ndarray:
    h = layer_norm(p["ln1"], x, eps, stable_dtype)
    x = x + mha(p["attn"], h, h, num_heads, mask, stable_dtype)
    x = x + mlp(p["mlp"], layer_norm(p["ln2"], x, eps, stable_dtype), act)
    return x


def init_encoder_layer(rng, dim: int, hidden: int, num_heads: int,
                       dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "attn": init_mha(k1, dim, num_heads, dtype=dtype),
        "mlp": init_mlp(k2, dim, hidden, dtype=dtype),
        "ln1": init_layernorm(dim, dtype),
        "ln2": init_layernorm(dim, dtype),
    }


def init_encoder_stack(rng, num_layers: int, dim: int, hidden: int,
                       num_heads: int, dtype=jnp.float32) -> Params:
    """Stacked layer params with a leading layer axis (for lax.scan)."""
    keys = jax.random.split(rng, num_layers)
    per_layer = [init_encoder_layer(k, dim, hidden, num_heads, dtype)
                 for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)


def encoder_stack(p: Params, x: jnp.ndarray, num_heads: int, eps: float,
                  act: str, mask: Optional[jnp.ndarray] = None,
                  remat: bool = False,
                  stable_dtype=jnp.float32) -> jnp.ndarray:
    """Run the scanned encoder. ``p`` holds stacked per-layer params.

    The scan stays ROLLED. ``unroll=True`` was tried for the headline
    train step (the rolled loop's uniform carry layouts cost ~1.2
    ms/step of relayout copies in the profile) but the end-to-end A/B
    was not stable across sessions: +4% in one, **-4%** in the next
    (both in-process A/B/A, BENCH.md round 3) — XLA's fusion/layout
    choices for the unrolled form are luck, not a win, and the rolled
    scan also keeps compile time bounded.
    """

    def body(h, lp):
        return encoder_layer(lp, h, num_heads, eps, act, mask,
                             stable_dtype), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = jax.lax.scan(body, x, p)
    return x


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 0.0) -> jnp.ndarray:
    """L2 normalization in fp32 (matches torch `x / x.norm(dim=-1)`)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.linalg.norm(x32, axis=axis, keepdims=True)
    return (x32 / (norm + eps)).astype(x.dtype)
