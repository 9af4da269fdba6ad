"""Pipeline-T training loop: adapter-only CE over cached image features.

Reference contract: CLIPAdapter.train (model_t.py:131-211) — Adam over the
two adapters, CE loss vs class labels, temperature read once, per-epoch
class-embedding refresh. TPU-native design:

- jitted train step with donated (params, opt_state) — zero-copy updates;
- the frozen tower's pooled features are computed ONCE per sample and
  cached on device ([N, P] fp32, a few MB), keyed by dataset index — so
  later epochs gather cached rows for whatever fresh shuffle the loader
  produces. Epoch composition/order is EXACTLY the reference's (fresh
  shuffle every epoch); only the redundant frozen-tower recompute is gone
  (pinned by tests/test_pipeline_t.py::test_feature_cache_equivalence).
"""

from __future__ import annotations

import functools
import logging
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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


class FeatureCache:
    """Per-sample frozen-feature cache keyed by dataset index.

    The [N, P] store stays on device; writes go through a DONATED jitted
    scatter so XLA updates the buffer in place — an eager ``.at[].set``
    would allocate a fresh [N, P] copy per batch (O(N^2/B) HBM traffic
    over the first epoch: ~640 GB at N=100k, P=512, B=32). Gather is
    jitted too (eager dispatch costs a tunnel RTT per op on this image).
    """

    def __init__(self, n: int, dim: int):
        self.feats = jnp.zeros((n, dim), jnp.float32)
        self.have = np.zeros((n,), bool)

        @functools.partial(jax.jit, donate_argnames=("feats",))
        def scatter(feats, idx, new):
            return feats.at[idx].set(new.astype(feats.dtype))

        self._scatter = scatter
        self._gather = jax.jit(lambda feats, idx: jnp.take(feats, idx,
                                                           axis=0))

    def lookup_or_compute(self, indices: Optional[np.ndarray], compute):
        """Returns features for the batch; computes+stores on any miss."""
        if indices is None:
            return compute()
        idx = np.asarray(indices)
        if self.have[idx].all():
            return self._gather(self.feats, jnp.asarray(idx))
        feats = compute()
        self.feats = self._scatter(self.feats, jnp.asarray(idx), feats)
        self.have[idx] = True
        return feats


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
            labels = jnp.asarray(batch.labels)
            params, opt_state, loss = step(
                params, opt_state, feats, labels, model.bank.mean, scale)
            epoch_losses.append(loss)
        mean_loss = float(jnp.mean(jnp.stack(epoch_losses)))
        losses.append(mean_loss)
        log.info("epoch %d/%d loss %.4f (%.1fs)", epoch + 1, num_epochs,
                 mean_loss, time.time() - t0)
        # per-epoch class-embedding refresh for eval (model_t.py:204)
        model.adapter_params = params
        model.update_emotion_embeddings()
    return params, losses
