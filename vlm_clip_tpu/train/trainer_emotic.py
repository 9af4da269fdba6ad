"""EMOTIC multi-label training: adapter + VAD head over frozen CLIP.

The reference ships EMOTIC loaders and the .mat converter but its
training harness is external (SURVEY.md §3.5; reference dataset/emotic.py
feeds no in-repo trainer). The driver's parity gate is "EMOTIC eval mAP"
(BASELINE.json), so this module completes the loop the reference left
open, reusing its label contract: 26-category one-hot (mat2py.py:144-153)
+ continuous VAD / 10 (emotic.py:57-60).

Design mirrors pipeline T (train/trainer_t.py): the frozen tower runs
ONCE over the dataset (encode-once), then every epoch is pure adapter
math — a T-style visual adapter alpha-blended onto the pooled features
scores the 26 category-text embeddings (sigmoid BCE, the standard EMOTIC
discrete loss), and a small linear head regresses VAD (L2, weighted).
The trained adapter plugs straight into eval/emotic.py's
``evaluate_emotic(adapter_params=...)``.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vlm_clip_tpu.models import adapters as A
from vlm_clip_tpu.models import layers as L

log = logging.getLogger(__name__)


def init_emotic_head(rng, feat_dim: int, bottleneck: int = 192,
                     with_vad: bool = True) -> Dict:
    """{'visual': feature adapter, 'vad': {'kernel','bias'}?}."""
    k1, k2 = jax.random.split(rng)
    params = {"visual": A.init_feature_adapter(k1, feat_dim, bottleneck)}
    if with_vad:
        params["vad"] = {
            "kernel": (jax.random.normal(k2, (feat_dim, 3))
                       * feat_dim ** -0.5).astype(jnp.float32),
            "bias": jnp.full((3,), 0.5, jnp.float32),  # VAD/10 midpoint
        }
    return params


def emotic_forward(params: Dict, feats_norm: jnp.ndarray,
                   category_emb: jnp.ndarray, alpha: float,
                   scale: float) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """(category logits [B, 26], vad prediction [B, 3] or None)."""
    adapted = A.adapt_features(params["visual"], feats_norm, alpha)
    logits = scale * jnp.dot(adapted, category_emb.T,
                             preferred_element_type=jnp.float32)
    vad = None
    if "vad" in params:
        vad = (jnp.dot(adapted, params["vad"]["kernel"],
                       preferred_element_type=jnp.float32)
               + params["vad"]["bias"])
    return logits, vad


def emotic_loss_fn(params: Dict, feats_norm: jnp.ndarray,
                   cat_labels: jnp.ndarray, vad_labels: jnp.ndarray,
                   valid: jnp.ndarray, category_emb: jnp.ndarray,
                   alpha: float, scale: float,
                   vad_weight: float) -> jnp.ndarray:
    """Masked mean(BCE over 26 categories) + vad_weight * mean L2(VAD)."""
    logits, vad = emotic_forward(params, feats_norm, category_emb, alpha,
                                 scale)
    bce = optax.sigmoid_binary_cross_entropy(logits, cat_labels)  # [B, 26]
    w = valid.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)
    loss = (bce.mean(axis=-1) * w).sum() / denom
    if vad is not None and vad_weight > 0:
        l2 = jnp.square(vad - vad_labels).mean(axis=-1)
        loss = loss + vad_weight * (l2 * w).sum() / denom
    return loss


def make_emotic_train_step(tx: optax.GradientTransformation, alpha: float,
                           scale: float, vad_weight: float):
    @functools.partial(jax.jit, donate_argnames=("params", "opt_state"))
    def step(params, opt_state, feats, cats, vad, valid, category_emb):
        loss, grads = jax.value_and_grad(emotic_loss_fn)(
            params, feats, cats, vad, valid, category_emb, alpha, scale,
            vad_weight)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def encode_all_contexts(clip_params, cfg, dataset, batch_size: int = 64,
                        policy=None) -> jnp.ndarray:
    """Frozen-tower features for every context image, once ([N, P])."""
    from vlm_clip_tpu.core.dtypes import BF16
    from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
    from vlm_clip_tpu.models import clip as C

    policy = policy or BF16
    fwd = C.jitted_image_features(cfg, policy)
    out = []
    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = range(start, min(start + batch_size, n))
        ctx = np.stack([dataset[i][0] for i in idx])
        if ctx.shape[0] < batch_size:  # fixed shapes: pad the tail batch
            reps = batch_size - ctx.shape[0]
            ctx = np.concatenate([ctx, np.repeat(ctx[-1:], reps, 0)])
        px = normalize_batch_tpu(jnp.asarray(ctx))
        feats = fwd(clip_params, px)
        out.append(np.asarray(feats, np.float32)[:len(idx)])
    feats = jnp.asarray(np.concatenate(out))
    return L.l2_normalize(feats).astype(jnp.float32)


def save_emotic_head(path: str, params: Dict) -> None:
    """Flat-npz export of the EMOTIC adapter + VAD head (mirrors the
    reference's torch.save state-dict style with a dependency-free
    format)."""
    import os

    import numpy as np

    def flatten(node, prefix=""):
        for k, v in node.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                yield from flatten(v, key)
            else:
                yield key, np.asarray(v)

    flat = dict(flatten(params))
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(path, **flat)


def load_emotic_head(path: str) -> Dict:
    import numpy as np

    out: Dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(z[key])
    return out


def train_emotic(clip_params, cfg, tokenizer, dataset,
                 num_epochs: int = 5, batch_size: int = 32,
                 learning_rate: float = 3e-4, alpha: float = 0.2,
                 bottleneck: int = 192, vad_weight: float = 0.5,
                 scale: float = 100.0, with_vad: bool = True,
                 seed: int = 0, policy=None
                 ) -> Tuple[Dict, List[float]]:
    """Encode-once EMOTIC training over an EmoticPreDataset-style
    dataset (items: (context_u8, body_u8, cat_onehot, vad)).

    Returns (params, per-epoch losses); params['visual'] feeds
    ``evaluate_emotic(adapter_params=params, alpha=alpha)``.
    """
    from vlm_clip_tpu.eval.emotic import encode_category_embeddings

    category_emb = encode_category_embeddings(clip_params, cfg, tokenizer,
                                              policy)
    feats = encode_all_contexts(clip_params, cfg, dataset, policy=policy)
    n = len(dataset)
    cats = jnp.asarray(np.stack([dataset[i][2] for i in range(n)]))
    vads = jnp.asarray(np.stack([dataset[i][3] for i in range(n)]))

    params = init_emotic_head(jax.random.PRNGKey(seed), feats.shape[1],
                              bottleneck, with_vad)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)
    step = make_emotic_train_step(tx, alpha, scale, vad_weight)

    rng = np.random.default_rng(seed)
    losses: List[float] = []
    for epoch in range(num_epochs):
        t0 = time.time()
        order = rng.permutation(n)
        epoch_losses = []
        for start in range(0, n, batch_size):
            idx = order[start:start + batch_size]
            valid = np.ones((batch_size,), bool)
            if len(idx) < batch_size:  # pad + mask the ragged tail
                valid[len(idx):] = False
                idx = np.concatenate(
                    [idx, np.full(batch_size - len(idx), idx[-1])])
            ji = jnp.asarray(idx)
            params, opt_state, loss = step(
                params, opt_state, jnp.take(feats, ji, 0),
                jnp.take(cats, ji, 0), jnp.take(vads, ji, 0),
                jnp.asarray(valid), category_emb)
            epoch_losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(epoch_losses)))
        losses.append(mean_loss)
        log.info("emotic epoch %d/%d loss %.4f (%.1fs)", epoch + 1,
                 num_epochs, mean_loss, time.time() - t0)
    return params, losses
