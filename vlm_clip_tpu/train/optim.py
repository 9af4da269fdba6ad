"""Optimizer factories (optax) mirroring the reference's recipes.

- Pipeline T/V: plain Adam(lr) over adapters only (model_t.py:138-143,
  main.py:60).
- Pipeline M: AdamW(lr, weight_decay) + linear warmup->linear decay
  schedule + global-norm grad clipping (trainer.py:46-62, 95).
- "cosine" covers the BASELINE.json full-fine-tune config (AdamW+cosine).

Adapter-only selection is a pytree mask (optax.masked), the functional
replacement for the reference's name-substring filter (trainer.py:40-43).
"""

from __future__ import annotations

from typing import Any, Optional

import optax

from vlm_clip_tpu.core.config import TrainConfig


def make_schedule(cfg: TrainConfig, total_steps: int):
    if cfg.schedule == "constant":
        return cfg.learning_rate
    if cfg.schedule == "linear":
        # linear warmup then linear decay to 0 (HF
        # get_linear_schedule_with_warmup semantics, trainer.py:58-62)
        warmup = optax.linear_schedule(0.0, cfg.learning_rate,
                                       max(cfg.warmup_steps, 1))
        decay = optax.linear_schedule(
            cfg.learning_rate, 0.0,
            max(total_steps - cfg.warmup_steps, 1))
        return optax.join_schedules([warmup, decay], [cfg.warmup_steps])
    if cfg.schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.warmup_steps,
            max(total_steps, cfg.warmup_steps + 1))
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def make_optimizer(cfg: TrainConfig, total_steps: int = 0,
                   trainable_mask: Optional[Any] = None
                   ) -> optax.GradientTransformation:
    """Build the optimizer chain for a TrainConfig.

    ``trainable_mask`` is a pytree of bools mirroring the params; False
    leaves get zero updates (frozen). Gradients for frozen subtrees should
    also be avoided upstream (stop_gradient / separate param args) — the
    mask is the safety net that guarantees no frozen param ever moves.
    """
    sched = make_schedule(cfg, total_steps)
    if cfg.weight_decay > 0.0:
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    else:
        opt = optax.adam(sched)
    parts = []
    if cfg.max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(cfg.max_grad_norm))
    parts.append(opt)
    chain = optax.chain(*parts)
    if trainable_mask is not None:
        chain = optax.masked(chain, trainable_mask)
    return chain
