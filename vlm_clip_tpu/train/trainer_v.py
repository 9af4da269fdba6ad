"""Pipeline-V training loop (reference main.py:55-100).

Adam over the three adapters, CE loss vs class labels, dropout active
(deterministic=False, explicit PRNG keys), per-epoch refresh of the
adapted class embeddings. Same encode-once feature caching as the T
trainer — the frozen tower and the cached context features never need
recomputation after epoch 1.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import List

import jax
import jax.numpy as jnp
import optax

from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
from vlm_clip_tpu.models import model_v as V
from vlm_clip_tpu.train.trainer_t import FeatureCache

log = logging.getLogger(__name__)


def make_v_train_step(tx: optax.GradientTransformation, alpha: float,
                      beta: float, gamma: float, dropout: float):
    @functools.partial(jax.jit,
                       donate_argnames=("adapter_params", "opt_state"))
    def step(adapter_params, opt_state, feats, ctx, labels, emotion_emb,
             logit_scale, rng):
        loss, grads = jax.value_and_grad(V.v_loss_fn)(
            adapter_params, feats, ctx, labels, emotion_emb, logit_scale,
            rng, alpha, beta, gamma, dropout)
        updates, opt_state = tx.update(grads, opt_state, adapter_params)
        adapter_params = optax.apply_updates(adapter_params, updates)
        return adapter_params, opt_state, loss

    return step


def train_model(model: "V.EnhancedCLIPAdapterV", train_loader,
                num_epochs: int = 5, learning_rate: float = 3e-4,
                seed: int = 0,
                cache_image_features: bool = True) -> List[float]:
    """Returns per-epoch mean losses; updates model.adapter_params and the
    adapted class embeddings in place (reference train_model contract)."""
    if model.emotion_embedding_tensor is None:
        model.encode_emotion_descriptions()
    tx = optax.adam(learning_rate)
    params = model.adapter_params
    opt_state = tx.init(params)
    step = make_v_train_step(tx, model.alpha, model.beta, model.gamma,
                             model.dropout)
    rng = jax.random.PRNGKey(seed)
    scale = model.clip_params["logit_scale"]

    cache = FeatureCache(len(train_loader.dataset), model.feature_dim) \
        if cache_image_features and hasattr(train_loader, "dataset") \
        else None
    losses: List[float] = []
    for epoch in range(num_epochs):
        t0 = time.time()
        epoch_losses = []
        for batch in train_loader:
            def compute(b=batch):
                px = normalize_batch_tpu(jnp.asarray(b.images))
                return model.encode_images(px)

            feats = cache.lookup_or_compute(batch.indices, compute) \
                if cache is not None else compute()
            ctx = None if batch.context_features is None \
                else jnp.asarray(batch.context_features)
            labels = jnp.asarray(batch.labels)
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(
                params, opt_state, feats, ctx, labels,
                model.emotion_embedding_tensor, scale, sub)
            epoch_losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(epoch_losses)))
        losses.append(mean_loss)
        msg = (f"Epoch {epoch + 1}/{num_epochs} - Average Training Loss: "
               f"{mean_loss:.4f}")
        print(msg)
        log.info("%s (%.1fs)", msg, time.time() - t0)
        model.adapter_params = params
        model.update_emotion_embeddings()  # per-epoch refresh (main.py:97)
    print("Training complete.")
    return losses
