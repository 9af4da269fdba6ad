"""Jitted training steps (pipeline M contrastive; adapter-only or full FT).

The reference's hot loop (trainer.py:75-99: forward, backward, clip,
AdamW, schedule) becomes one donated jit step. Parallelism: inputs and
features carry ``P('data', ...)`` sharding constraints; because both
feature matrices are batch-sharded, the BxB contrastive logit matrix makes
XLA insert an all_gather of the embeddings over the ``data`` axis (ICI) —
the global-batch loss the reference computes single-device
(model_m.py:152-163), scaled across chips.

Two autodiff graphs (SURVEY.md §5 hard part 5):
- ``freeze_clip=True`` (adapter-only, trainer.py:40-43): grads flow only
  into the adapter params arg; the towers are a stop-gradient input, so
  XLA never materializes tower backward.
- ``freeze_clip=False`` (full fine-tune, model_m.py:72-75): clip params
  join the trainable pytree.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from vlm_clip_tpu.core.config import AdapterConfig, CLIPConfig
from vlm_clip_tpu.core.dtypes import BF16, DTypePolicy
from vlm_clip_tpu.models import model_m as M
from vlm_clip_tpu.parallel.mesh import DATA_AXIS

Params = Dict[str, Any]


class TrainState(NamedTuple):
    adapter_params: Params
    clip_params: Params
    opt_state: Any
    step: jnp.ndarray


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    grad_norm: jnp.ndarray


def _constrain_data(x):
    """Shard leading (batch) dim over the data axis when a mesh is active."""
    if x is None:
        return None
    try:
        return jax.lax.with_sharding_constraint(
            x, P(DATA_AXIS, *([None] * (x.ndim - 1))))
    except (ValueError, RuntimeError):
        return x  # no mesh context: single-device jit


def _pixels_on_device(px, policy: DTypePolicy, image_size: int):
    """Accept either preprocessed [B, 3, S, S] float batches or raw
    [B, H, W, 3] uint8 batches (the pixel-cache/native-loader output):
    uint8 is rescaled + CLIP-normalized on device, where XLA fuses the
    affine into the patch-embed prologue — the host never touches fp32
    images and H2D traffic drops 4x. uint8 at a different spatial size
    (e.g. the 100^2 RAF-DB source resolution) is additionally resized
    on the TPU (ops/image.py), cutting H2D a further (S/H)^2."""
    if px.dtype == jnp.uint8:
        if px.shape[1] != image_size or px.shape[2] != image_size:
            from vlm_clip_tpu.ops.image import resize_normalize_tpu

            return resize_normalize_tpu(
                px, image_size, dtype=policy.compute_dtype)
        from vlm_clip_tpu.data.preprocess import normalize_batch_tpu

        return normalize_batch_tpu(px, dtype=policy.compute_dtype)
    return px


def make_m_train_step(cfg: CLIPConfig, acfg: AdapterConfig,
                      tx: optax.GradientTransformation,
                      policy: DTypePolicy = BF16,
                      freeze_clip: bool = True,
                      remat: bool = False,
                      fused_loss: bool = False,
                      zero1_mesh: Optional[Any] = None) -> Callable:
    """Build the donated jit train step: (state, batch) -> (state, metrics).

    batch = dict(input_ids, attention_mask, pixel_values).
    ``fused_loss=True`` routes the contrastive head through the Pallas
    kernel (ops/contrastive.py) — single-device only (under DP the XLA
    path owns the cross-shard all_gather).

    ``zero1_mesh``: shard the optimizer state (and the gradients
    feeding it) over the mesh's data axis — ZeRO-1. GSPMD then
    reduce-scatters grads, updates moment SHARDS, and all-gathers only
    the parameter updates; each device stores 1/data of the AdamW
    moments (the full-fine-tune case: 2×428M fp32 moments for ViT-L/14
    shrink to 1/data per chip). Numerics are equivalence-tested against
    the unsharded step (tests/test_sharding.py). Place the initial
    state with parallel.sharding.zero1_place so it is sharded at REST,
    not just inside the step. Assumes TRAINABLE params are replicated
    (true for every trainer here: TP rules shard only the frozen
    towers) — trainables are re-constrained to replicated after the
    update, which would fight a TP sharding on trainable leaves.
    """
    if zero1_mesh is not None:
        from vlm_clip_tpu.parallel.sharding import zero1_specs

        def _z(tree):
            return jax.tree.map(
                jax.lax.with_sharding_constraint, tree,
                zero1_specs(tree, zero1_mesh))
    else:
        def _z(tree):
            return tree

    def loss_fn(trainable, static_clip, batch):
        if freeze_clip:
            adapter_params = trainable
            clip_params = static_clip
        else:
            adapter_params = trainable["adapters"]
            clip_params = trainable["clip"]
        ids = _constrain_data(batch["input_ids"])
        mask = _constrain_data(batch.get("attention_mask"))
        px = _pixels_on_device(_constrain_data(batch["pixel_values"]),
                               policy, cfg.vision.image_size)
        if fused_loss:
            from vlm_clip_tpu.ops.contrastive import contrastive_loss_fused

            txt = M.m_get_text_features(clip_params, adapter_params, ids,
                                        mask, cfg, acfg, policy, remat)
            img = M.m_get_image_features(clip_params, adapter_params, px,
                                         cfg, acfg, policy, remat)
            return contrastive_loss_fused(txt, img,
                                          clip_params["logit_scale"])
        out = M.m_forward(clip_params, adapter_params, ids, mask, px, cfg,
                          acfg, policy, return_loss=True, remat=remat)
        return out.loss

    # Donate only the trainable leaves + opt state: the frozen tower params
    # are read-only (donating them would invalidate the caller's buffers
    # for zero gain).
    @functools.partial(jax.jit, donate_argnames=("trainable", "opt_state"))
    def _jit_step(trainable, opt_state, static_clip, batch):
        loss, grads = jax.value_and_grad(loss_fn)(trainable, static_clip,
                                                  batch)
        gnorm = optax.global_norm(grads)
        # ZeRO-1: grads arrive at the optimizer sharded over `data`
        # (reduce_scatter instead of all_reduce) and moments stay
        # sharded; only the updates are gathered back to replicated.
        grads = _z(grads)
        opt_state = _z(opt_state)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        opt_state = _z(opt_state)
        trainable = optax.apply_updates(trainable, updates)
        if zero1_mesh is not None:
            # keep params replicated at rest (the all_gather point) so
            # the state layout is stable step over step
            trainable = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, P()),
                trainable)
        return trainable, opt_state, StepMetrics(loss=loss, grad_norm=gnorm)

    def step(state: TrainState, batch) -> Tuple[TrainState, StepMetrics]:
        if freeze_clip:
            trainable, opt_state, metrics = _jit_step(
                state.adapter_params, state.opt_state, state.clip_params,
                batch)
            new_state = TrainState(trainable, state.clip_params, opt_state,
                                   state.step + 1)
        else:
            trainable = {"adapters": state.adapter_params,
                         "clip": state.clip_params}
            trainable, opt_state, metrics = _jit_step(
                trainable, state.opt_state, None, batch)
            new_state = TrainState(trainable["adapters"], trainable["clip"],
                                   opt_state, state.step + 1)
        return new_state, metrics

    return step


def make_m_eval_step(cfg: CLIPConfig, acfg: AdapterConfig,
                     policy: DTypePolicy = BF16) -> Callable:
    """Jitted validation loss (trainer.py:126-145 equivalent)."""

    @jax.jit
    def eval_step(adapter_params, clip_params, batch):
        out = M.m_forward(clip_params, adapter_params,
                          _constrain_data(batch["input_ids"]),
                          _constrain_data(batch.get("attention_mask")),
                          _pixels_on_device(
                              _constrain_data(batch["pixel_values"]),
                              policy, cfg.vision.image_size),
                          cfg, acfg, policy, return_loss=True)
        return out.loss

    return eval_step


def init_train_state(rng, cfg: CLIPConfig, acfg: AdapterConfig,
                     tx: optax.GradientTransformation,
                     clip_params: Optional[Params] = None,
                     freeze_clip: bool = True) -> TrainState:
    from vlm_clip_tpu.models.clip import init_clip

    k1, k2 = jax.random.split(rng)
    if clip_params is None:
        clip_params = init_clip(k1, cfg)
    adapter_params = M.init_m_adapters(k2, cfg, acfg)
    if freeze_clip:
        opt_state = tx.init(adapter_params)
    else:
        opt_state = tx.init({"adapters": adapter_params,
                             "clip": clip_params})
    return TrainState(adapter_params, clip_params, opt_state,
                      jnp.zeros((), jnp.int32))
