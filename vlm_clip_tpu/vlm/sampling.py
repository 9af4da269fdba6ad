"""Token sampling for Qwen generation: HF-parity logits processors.

The reference calls HF ``generate()`` (model_v.py:109), which pulls the
checkpoint's ``generation_config.json`` — for Qwen2.5-VL-Instruct that
enables sampling (temperature/top-p/top-k/repetition-penalty), so greedy
alone does not reproduce the reference's context distribution. This
module mirrors the HF logits-processor chain exactly, in the HF order:
repetition penalty -> temperature -> top-k -> top-p -> categorical.

Everything here is jit-safe: ``warp_logits`` is traced inside the
device-side decode loop (vlm/qwen.py) with a static ``SamplingConfig``.
Parity is proven against the transformers processors in
tests/test_qwen.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

NEG_INF = float("-inf")


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Static (hashable) sampling spec; a jit static_argname.

    Field semantics match HF ``GenerationConfig``: with
    ``do_sample=False`` the warpers (temperature/top-k/top-p) are
    ignored and decoding is argmax; ``repetition_penalty`` applies in
    both modes (it is a processor, not a warper).
    ``extra_eos`` holds additional stop ids beyond the model's primary
    eos (HF allows ``eos_token_id`` lists).
    """

    do_sample: bool = False
    temperature: float = 1.0
    top_k: int = 0          # 0 disables
    top_p: float = 1.0      # 1.0 disables
    repetition_penalty: float = 1.0
    extra_eos: Tuple[int, ...] = ()

    @property
    def needs_presence(self) -> bool:
        return self.repetition_penalty != 1.0


GREEDY = SamplingConfig()


def load_generation_config(weights_dir: str,
                           primary_eos: Optional[int] = None
                           ) -> SamplingConfig:
    """Build a SamplingConfig from ``generation_config.json`` like HF
    ``generate()`` does (model_v.py:109 relies on this implicitly).

    Missing file or fields fall back to HF defaults (greedy). Any eos
    ids in the file beyond ``primary_eos`` land in ``extra_eos``.
    """
    path = os.path.join(weights_dir, "generation_config.json")
    if not os.path.isfile(path):
        return GREEDY
    with open(path, encoding="utf-8") as f:
        gc = json.load(f)
    eos = gc.get("eos_token_id", [])
    if isinstance(eos, int):
        eos = [eos]
    extra = tuple(e for e in eos if e != primary_eos)
    return SamplingConfig(
        do_sample=bool(gc.get("do_sample", False)),
        temperature=float(gc.get("temperature", 1.0)),
        # HF GenerationConfig defaults top_k to 50 — a checkpoint that
        # OMITS the field samples through TopKLogitsWarper(50); only an
        # explicit 0/null disables it
        top_k=int(gc.get("top_k", 50) or 0),
        top_p=float(gc.get("top_p", 1.0)),
        repetition_penalty=float(gc.get("repetition_penalty", 1.0)),
        extra_eos=extra,
    )


def warp_logits(logits, presence, scfg: SamplingConfig):
    """Apply the HF processor chain to fp32 logits [B, V].

    ``presence`` is a [B, V] bool mask of tokens already seen (prompt +
    generated) — only consulted when ``repetition_penalty != 1``.
    Mirrors transformers' RepetitionPenaltyLogitsProcessor,
    TemperatureLogitsWarper, TopKLogitsWarper, TopPLogitsWarper
    (including ascending-sort cumulative semantics and
    min_tokens_to_keep=1).
    """
    import jax
    import jax.numpy as jnp

    if scfg.repetition_penalty != 1.0:
        p = scfg.repetition_penalty
        penalized = jnp.where(logits > 0, logits / p, logits * p)
        logits = jnp.where(presence, penalized, logits)
    if not scfg.do_sample:
        return logits
    if scfg.temperature != 1.0:
        logits = logits / scfg.temperature
    if scfg.top_k and scfg.top_k > 0:
        k = min(scfg.top_k, logits.shape[-1])
        kth = jax.lax.top_k(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)
    if scfg.top_p < 1.0:
        sorted_idx = jnp.argsort(logits, axis=-1)  # ascending, like HF
        sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove_sorted = cum <= (1.0 - scfg.top_p)
        # min_tokens_to_keep=1: never drop the max (last in ascending)
        remove_sorted = remove_sorted.at[..., -1:].set(False)
        inv = jnp.argsort(sorted_idx, axis=-1)
        remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
        logits = jnp.where(remove, NEG_INF, logits)
    return logits


def sample_token(logits, presence, key, scfg: SamplingConfig):
    """One decode-step token choice [B] int32 from fp32 logits [B, V]."""
    import jax
    import jax.numpy as jnp

    logits = warp_logits(logits, presence, scfg)
    if scfg.do_sample:
        return jax.random.categorical(key, logits, axis=-1).astype(
            jnp.int32)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)
