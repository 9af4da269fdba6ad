"""Pipeline-T training loop: adapter-only CE over cached image features.

Reference contract: CLIPAdapter.train (model_t.py:131-211) — Adam over the
two adapters, CE loss vs class labels, temperature read once, per-epoch
class-embedding refresh. TPU-native design:

- jitted train step with donated (params, opt_state) — zero-copy updates;
- the frozen tower's pooled features are computed ONCE (first epoch) and
  cached on device ([N, P] fp32 ~ a few MB), so epochs 2..E run pure
  adapter math: two [B,P]x[P,K] matmuls per step. This is the
  "encode-once, adapt-many" structure SURVEY.md §3.3 identifies; frozen
  towers make it observationally identical to the reference's per-epoch
  recompute.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import optax

from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
from vlm_clip_tpu.models import model_t as T

log = logging.getLogger(__name__)


def make_t_train_step(tx: optax.GradientTransformation, alpha: float,
                      beta: float):
    """Jitted, donated train step closed over the optimizer + ratios."""

    @functools.partial(jax.jit,
                       donate_argnames=("adapter_params", "opt_state"))
    def step(adapter_params, opt_state, feats, labels, mean_emb, scale):
        loss, grads = jax.value_and_grad(T.t_loss_fn)(
            adapter_params, feats, labels, mean_emb, alpha, beta, scale)
        updates, opt_state = tx.update(grads, opt_state, adapter_params)
        adapter_params = optax.apply_updates(adapter_params, updates)
        return adapter_params, opt_state, loss

    return step


def train_t_adapters(model: "T.CLIPAdapterT", train_loader,
                     num_epochs: int = 5, learning_rate: float = 3e-4,
                     cache_image_features: bool = True
                     ) -> Tuple[dict, List[float]]:
    """Returns (trained adapter_params, per-epoch mean losses)."""
    tx = optax.adam(learning_rate)
    params = model.adapter_params
    opt_state = tx.init(params)
    scale = jnp.float32(model.temperature)
    step = make_t_train_step(tx, model.alpha, model.beta)

    feature_cache: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    losses: List[float] = []
    for epoch in range(num_epochs):
        t0 = time.time()
        epoch_losses = []
        if cache_image_features and feature_cache and epoch > 0:
            batches = feature_cache
        else:
            batches = None
        if batches is None:
            new_cache = []
            for batch in train_loader:
                px = normalize_batch_tpu(jnp.asarray(batch.images))
                feats = model.encode_images(px)
                labels = jnp.asarray(batch.labels)
                if cache_image_features:
                    new_cache.append((feats, labels))
                params, opt_state, loss = step(
                    params, opt_state, feats, labels, model.bank.mean,
                    scale)
                epoch_losses.append(loss)
            if cache_image_features:
                feature_cache = new_cache
        else:
            for feats, labels in batches:
                params, opt_state, loss = step(
                    params, opt_state, feats, labels, model.bank.mean,
                    scale)
                epoch_losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(epoch_losses)))
        losses.append(mean_loss)
        log.info("epoch %d/%d loss %.4f (%.1fs)", epoch + 1, num_epochs,
                 mean_loss, time.time() - t0)
        # per-epoch class-embedding refresh for eval (model_t.py:204)
        model.adapter_params = params
        model.update_emotion_embeddings()
    return params, losses
