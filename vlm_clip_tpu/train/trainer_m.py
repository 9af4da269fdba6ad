"""Pipeline-M trainer (reference CLIPAdapterTrainer, trainer.py:11-167).

Policies preserved: AdamW(lr, weight_decay) over adapters only, linear
warmup -> linear decay schedule, global-norm grad clipping, per-epoch mean
train loss, best-val + periodic epoch + final adapter checkpoints in the
reference's file format ("best_adapter", "adapter_epoch_{n}",
"final_adapter", trainer.py:109-124).

TPU-native: one donated jit step (train/steps.py), fixed-shape batches,
optional full fine-tune (freeze_clip=False) in the same loop.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp

from vlm_clip_tpu.core.config import AdapterConfig, CLIPConfig, TrainConfig
from vlm_clip_tpu.core.dtypes import BF16, DTypePolicy
from vlm_clip_tpu.data.preprocess import normalize_batch_tpu
from vlm_clip_tpu.train import checkpoint as ckpt
from vlm_clip_tpu.train.optim import make_optimizer
from vlm_clip_tpu.train.steps import (init_train_state,
                                      make_m_eval_step, make_m_train_step)

log = logging.getLogger(__name__)


def _device_batch(batch) -> Dict[str, jnp.ndarray]:
    return {
        "input_ids": jnp.asarray(batch.input_ids),
        "attention_mask": jnp.asarray(batch.attention_mask),
        "pixel_values": normalize_batch_tpu(jnp.asarray(batch.images)),
    }


class CLIPAdapterTrainer:
    """Reference-API trainer over the jitted M pipeline."""

    def __init__(self, clip_params, cfg: CLIPConfig, acfg: AdapterConfig,
                 train_dataloader, val_dataloader=None,
                 learning_rate: float = 5e-5, weight_decay: float = 0.01,
                 warmup_steps: int = 0, max_grad_norm: float = 1.0,
                 output_dir: str = "./clip_adapter_checkpoints",
                 num_epochs_hint: int = 10, freeze_clip: bool = True,
                 schedule: str = "linear", device_prefetch: int = 0,
                 policy: DTypePolicy = BF16, seed: int = 0,
                 zero1_mesh=None):
        self.cfg = cfg
        self.acfg = acfg
        self.train_dataloader = train_dataloader
        self.val_dataloader = val_dataloader
        self.output_dir = output_dir
        self.freeze_clip = freeze_clip
        self.device_prefetch = device_prefetch
        self._async_saver = None  # lazy AsyncTrainStateSaver
        os.makedirs(output_dir, exist_ok=True)

        total_steps = len(train_dataloader) * num_epochs_hint
        tcfg = TrainConfig(learning_rate=learning_rate,
                           weight_decay=weight_decay,
                           warmup_steps=warmup_steps,
                           max_grad_norm=max_grad_norm, schedule=schedule)
        self.tx = make_optimizer(tcfg, total_steps)
        self.state = init_train_state(jax.random.PRNGKey(seed), cfg, acfg,
                                      self.tx, clip_params=clip_params,
                                      freeze_clip=freeze_clip)
        if zero1_mesh is not None:
            # ZeRO-1: Adam moments sharded over the data axis (matters
            # most for --full-finetune, where moments are 2x the tower)
            from vlm_clip_tpu.parallel.sharding import zero1_place

            self.state = self.state._replace(
                opt_state=zero1_place(self.state.opt_state, zero1_mesh))
        self._step = make_m_train_step(cfg, acfg, self.tx, policy,
                                       freeze_clip=freeze_clip,
                                       zero1_mesh=zero1_mesh)
        self._eval_step = make_m_eval_step(cfg, acfg, policy)
        self.history: List[Dict[str, float]] = []

    def train(self, num_epochs: int, save_every: int = 1,
              eval_every: int = 1) -> List[Dict[str, float]]:
        best_val_loss = float("inf")
        for epoch in range(num_epochs):
            t0 = time.time()
            losses = []
            if self.device_prefetch > 0:
                # overlap H2D transfer with compute (double buffering)
                from vlm_clip_tpu.data.device_prefetch import \
                    prefetch_to_device

                batches = prefetch_to_device(
                    self.train_dataloader, size=self.device_prefetch,
                    transform=_device_batch)
            else:
                batches = (_device_batch(b) for b in self.train_dataloader)
            for batch in batches:
                self.state, metrics = self._step(self.state, batch)
                losses.append(metrics.loss)
            avg = float(jnp.mean(jnp.stack(losses)))
            rec = {"epoch": epoch + 1, "train_loss": avg,
                   "seconds": time.time() - t0}
            log.info("Epoch %d - Average training loss: %.4f (%.1fs)",
                     epoch + 1, avg, rec["seconds"])

            if self.val_dataloader is not None \
                    and (epoch + 1) % eval_every == 0:
                val_loss = self.evaluate()
                rec["val_loss"] = val_loss
                log.info("Epoch %d - Validation loss: %.4f", epoch + 1,
                         val_loss)
                if val_loss < best_val_loss:
                    best_val_loss = val_loss
                    self.save_model(os.path.join(self.output_dir,
                                                 "best_adapter"))
            if (epoch + 1) % save_every == 0:
                self.save_model(os.path.join(
                    self.output_dir, f"adapter_epoch_{epoch + 1}"))
            self.history.append(rec)
        self.save_model(os.path.join(self.output_dir, "final_adapter"))
        return self.history

    def evaluate(self) -> float:
        assert self.val_dataloader is not None, \
            "Validation dataloader is required for evaluation"
        losses = []
        for batch in self.val_dataloader:
            losses.append(self._eval_step(self.state.adapter_params,
                                          self.state.clip_params,
                                          _device_batch(batch)))
        return float(jnp.mean(jnp.stack(losses)))

    # -- checkpoint API (reference save_model/load_model + full resume) ---
    def save_model(self, path: str) -> None:
        # reference-format export is a plain host write -> primary-only
        # under multi-process (params are replicated; orbax full-state
        # saves below stay collective)
        from vlm_clip_tpu.parallel.distributed import is_primary

        if is_primary():
            ckpt.save_adapter_weights(path, self.state.adapter_params)

    def load_model(self, path: str) -> None:
        params = ckpt.load_adapter_weights(path, self.acfg)
        self.state = self.state._replace(adapter_params=params)

    def save_full_state(self, path: str, wait: bool = True) -> None:
        """Orbax full-state save. ``wait=False`` schedules an ASYNC save
        (orbax background threads do the D2H + writes while training
        continues — seconds per save for large full-fine-tune states);
        a later save or :meth:`finish_saves` joins it."""
        if wait:
            ckpt.save_train_state(path, self.state)
            return
        if self._async_saver is None:
            self._async_saver = ckpt.AsyncTrainStateSaver()
        self._async_saver.save(path, self.state)

    def finish_saves(self) -> None:
        """Block until any in-flight async save has fully written."""
        if self._async_saver is not None:
            self._async_saver.wait()

    def restore_full_state(self, path: str) -> None:
        self.finish_saves()
        self.state = ckpt.restore_train_state(path, self.state)
