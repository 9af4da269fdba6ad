"""Qwen2.5-VL generation glue: tokenizer, device-side decode, extractor.

The end-to-end TPU replacement for the reference's
``VLMContextExtractor`` (model_v.py:43-142): describe a face image with
Qwen2.5-VL, embed the description with CLIP. Generation runs as a jitted
prefill followed by ONE jitted ``lax.while_loop`` over a static KV cache
(eos detection and HF-parity sampling on device; one host sync per
generation); weights can be fp32/bf16 or weight-only int8/int4
(vlm/qwen_convert.py).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional

import numpy as np

from vlm_clip_tpu.vlm.extractor import VLM_PROMPT, ClipTextEncoderMixin
from vlm_clip_tpu.vlm.sampling import (GREEDY, SamplingConfig,
                                       load_generation_config,
                                       sample_token)
from vlm_clip_tpu.vlm.qwen_model import (KVCache, QwenVLConfig,
                                         init_kv_cache, text_forward,
                                         vision_forward)
from vlm_clip_tpu.vlm.qwen_process import (VisionInputs, build_prompt_ids,
                                           prepare_vision_inputs,
                                           rope_index_single)

# GPT-2-family pretokenizer (re-module approximation of Qwen's \p classes)
_QWEN_PAT = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[^\W\d_]+| ?\d{1,3}| ?[^\s\w]+[\r\n]*"
    r"|\s*[\r\n]+|\s+(?!\S)|\s+",
    re.IGNORECASE,
)


class QwenBPETokenizer:
    """Byte-level BPE from an HF ``tokenizer.json`` (Qwen2 family)."""

    def __init__(self, tokenizer_json: str):
        from vlm_clip_tpu.data.tokenizer import bytes_to_unicode

        with open(tokenizer_json, encoding="utf-8") as f:
            data = json.load(f)
        model = data["model"]
        self.encoder: Dict[str, int] = model["vocab"]
        merges = [tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
                  for m in model["merges"]]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {c: b for b, c in self.byte_encoder.items()}
        self.special: Dict[str, int] = {
            t["content"]: t["id"] for t in data.get("added_tokens", [])}
        self.decoder = {v: k for k, v in self.encoder.items()}
        self.decoder.update({v: k for k, v in self.special.items()})
        self._cache: Dict[str, List[str]] = {}
        self._special_pat = re.compile(
            "(" + "|".join(re.escape(s) for s in sorted(
                self.special, key=len, reverse=True)) + ")") \
            if self.special else None

    def _bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token)
        while len(word) > 1:
            pairs = {(word[i], word[i + 1]) for i in range(len(word) - 1)}
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 31))
            if bigram not in self.bpe_ranks:
                break
            a, b = bigram
            out: List[str] = []
            i = 0
            while i < len(word):
                if i < len(word) - 1 and word[i] == a and word[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            word = tuple(out)
        res = list(word)
        self._cache[token] = res
        return res

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        chunks = self._special_pat.split(text) if self._special_pat \
            else [text]
        for chunk in chunks:
            if not chunk:
                continue
            if chunk in self.special:
                ids.append(self.special[chunk])
                continue
            for tok in _QWEN_PAT.findall(chunk):
                mapped = "".join(self.byte_encoder[b]
                                 for b in tok.encode("utf-8"))
                ids.extend(self.encoder[t] for t in self._bpe(mapped))
        return ids

    def decode(self, ids, skip_special: bool = True) -> str:
        parts: List[str] = []
        for i in ids:
            tok = self.decoder.get(int(i), "")
            if skip_special and tok in self.special:
                continue
            parts.append(tok)
        text = "".join(parts)
        raw = bytearray(self.byte_decoder[c] for c in text
                        if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace")


class QwenVLGenerator:
    """Device-side decoding over the JAX Qwen2.5-VL.

    The whole generation loop (eos detection, sampling, KV-cache update)
    runs inside ONE jitted ``lax.while_loop`` — the host syncs exactly
    once per generation, not per token. This replaces the reference's HF
    ``generate(**inputs, max_new_tokens=200)`` call (model_v.py:108-118),
    including its sampling semantics via ``SamplingConfig``
    (vlm/sampling.py mirrors the HF logits-processor chain).

    KV-cache indexing contract: prefill writes rows ``0..T-1``; the
    decode step for the token at sequence position ``T+s`` writes row
    ``length0+s`` and attends to columns ``<= length0+s`` (prefix plus
    itself). tests/test_qwen.py proves cached decode equals
    an uncached full-forward rollout.
    """

    def __init__(self, params: Dict, cfg: QwenVLConfig,
                 max_len: int = 1536, dtype=None, kv_bits: int = 16):
        import functools

        import jax
        import jax.numpy as jnp

        self.params = params
        self.cfg = cfg
        self.max_len = max_len
        self.dtype = dtype or jnp.bfloat16
        if kv_bits not in (8, 16):
            raise ValueError(f"kv_bits must be 8 or 16, got {kv_bits}")
        # int8 KV cache: halves the per-step cache read that bounds
        # batched decode (BENCH.md round 3); per-row absmax scales,
        # dequant fused into the attention einsums
        self.kv_quantized = kv_bits == 8

        tcfg = cfg.text

        @jax.jit
        def prefill(params, embeds, position_ids, cache, t_last):
            """``t_last``: index of the final REAL prompt position —
            T-1 normally; < T-1 when the prompt is tail-padded to a
            bucketed length (exact-HF-resolution path). Pad rows write
            garbage K/V at rows > t_last, but the causal mask keeps
            real queries off them and the decode loop overwrites them
            row by row (its mask admits only cols <= written length)."""
            T = embeds.shape[1]
            causal = jnp.tril(jnp.ones((T, T), bool))
            allowed = jnp.concatenate(
                [causal, jnp.zeros((T, cache.k.shape[2] - T), bool)],
                axis=1)
            mask = jnp.where(allowed[None, None], 0.0, -3.4028235e38)
            logits, cache = text_forward(params, embeds, position_ids,
                                         tcfg, mask, cache, jnp.int32(0),
                                         last_index=t_last)
            return logits[:, -1], cache

        @functools.partial(jax.jit, static_argnames=("uw",),
                           donate_argnames=("cache",))
        def embed_prefill(params, patches, rope, wmask, fmask, rev, ids,
                          img_slots, pos3, cache, t_last, uw=None):
            """Vision tower + embed scatter + prefill in ONE dispatch.

            The per-image path used to be ~6 host dispatches (vision,
            un-permute gather, embed lookup, scatter, cast, prefill);
            through the ~28 ms-RTT axon tunnel those round trips cost
            more than the compute. patches [B, S, D] — raw uint8 when
            the patch embed is normalization-folded
            (fold_qwen_patch_normalization).
            """
            B = patches.shape[0]
            vis = jax.vmap(
                lambda pt: vision_forward(
                    params["vision"], pt.astype(self.dtype), rope,
                    wmask, fmask, cfg.vision, uniform_window=uw))(patches)
            vis = vis[:, rev]                              # [B, n_vis, H]
            embeds = params["text"]["embed_tokens"][ids]   # [T, H]
            embeds = jnp.broadcast_to(embeds, (B,) + embeds.shape)
            embeds = embeds.at[:, img_slots].set(
                vis.astype(embeds.dtype))
            return prefill(params["text"],
                           embeds.astype(self.dtype), pos3, cache, t_last)

        def decode_step_inner(params, tokens, pos, cache, length):
            """tokens [B] at sequence rope position ``pos`` (scalar),
            written at cache row ``length`` (= tokens already cached)."""
            emb = params["embed_tokens"][tokens][:, None]  # [B, 1, H]
            position_ids = jnp.broadcast_to(pos, (3,))[:, None, None]
            # mask=None = the canonical decode mask (cache cols <=
            # length), built inside text_forward from the depth instead
            # of materialized here per step
            logits, cache = text_forward(params, emb.astype(self.dtype),
                                         position_ids, tcfg, None, cache,
                                         length)
            return logits[:, -1], cache  # fp32 [B, V]

        @functools.partial(jax.jit,
                           static_argnames=("max_new", "scfg"),
                           donate_argnames=("cache",))
        def decode_loop(params, logits0, pos_start, cache, length0,
                        presence, key, max_new, scfg):
            """Full generation after prefill, on device.

            Returns (buf [B, max_new] int32, n_out [B] int32, cache).
            Row b's generation is buf[b, :n_out[b]] — eos excluded,
            mirroring the reference's echo-trim (model_v.py:113-118).
            """
            B = logits0.shape[0]
            stops = (cfg.eos_token_id,) + tuple(scfg.extra_eos)

            def is_stop(tokens):
                hit = tokens == jnp.int32(stops[0])
                for e in stops[1:]:
                    hit = hit | (tokens == jnp.int32(e))
                return hit

            key, sub = jax.random.split(key)
            tok0 = sample_token(logits0, presence, sub, scfg)
            buf0 = jnp.full((B, max_new), cfg.eos_token_id, jnp.int32)
            state = (jnp.int32(0), tok0, jnp.zeros((B,), bool), buf0,
                     jnp.zeros((B,), jnp.int32), cache, presence, key)

            def cond(c):
                step, _, done, *_ = c
                return (step < max_new) & jnp.logical_not(done.all())

            def body(c):
                step, tokens, done, buf, n_out, cache, presence, key = c
                done = done | is_stop(tokens)
                buf = buf.at[:, step].set(
                    jnp.where(done, jnp.int32(cfg.eos_token_id), tokens))
                n_out = n_out + jnp.logical_not(done)
                if scfg.needs_presence:
                    presence = presence.at[jnp.arange(B), tokens].set(True)

                # Skip the model forward when this was the last token to
                # record (step budget spent or every row done): the old
                # unconditional form paid one full extra decode step per
                # generation whose logits were discarded — ~9% of decode
                # for short (eos at ~10 tokens) generations. lax.cond
                # stays a true conditional here (XLA only converts
                # trivially cheap branches to selects, not a 36-layer
                # scan).
                def fwd(cache, key, tokens):
                    logits, cache = decode_step_inner(
                        params, tokens, pos_start + step, cache,
                        length0 + step)
                    key, sub = jax.random.split(key)
                    return sample_token(logits, presence, sub,
                                        scfg), cache, key

                def skip(cache, key, tokens):
                    return tokens, cache, key

                need_more = (step + 1 < max_new) & \
                    jnp.logical_not(done.all())
                tokens, cache, key = jax.lax.cond(need_more, fwd, skip,
                                                  cache, key, tokens)
                return (step + 1, tokens, done, buf, n_out, cache,
                        presence, key)

            state = jax.lax.while_loop(cond, body, state)
            return state[3], state[4], state[5]

        @functools.partial(jax.jit, static_argnames=("uw",))
        def run_vision(vparams, patches, rope, wmask, fmask, uw=None):
            return vision_forward(vparams, patches.astype(self.dtype),
                                  rope, wmask, fmask, cfg.vision,
                                  uniform_window=uw)

        @functools.partial(jax.jit, donate_argnames=("big",))
        def merge_cache(big, sub, offset):
            """Write a prefill chunk's KV rows (and scales, when the
            cache is int8) into the full-batch cache at batch offset
            (traced scalar — one compile for all chunks). Donated: XLA
            updates the big cache in place."""
            k = jax.lax.dynamic_update_slice(big.k, sub.k,
                                             (0, offset, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(big.v, sub.v,
                                             (0, offset, 0, 0, 0))
            if big.k_scale is None:
                return KVCache(k, v, big.length)
            ks = jax.lax.dynamic_update_slice(big.k_scale, sub.k_scale,
                                              (0, offset, 0, 0))
            vs = jax.lax.dynamic_update_slice(big.v_scale, sub.v_scale,
                                              (0, offset, 0, 0))
            return KVCache(k, v, big.length, ks, vs)

        self._embed_prefill = embed_prefill
        self._merge_cache = merge_cache
        self._decode_loop = decode_loop
        self._run_vision = run_vision
        # set True (with a normalization-folded patch embed) to have
        # generate()/generate_batch() ship raw uint8 patches
        self.u8_patches = False

    @staticmethod
    def _mask_args(vision: VisionInputs):
        """Device mask operands for vision_forward: 1×1 dummies on the
        uniform-window fast path (the masks are never read there —
        skipping them saves 8 MB of H2D per 448² image)."""
        import jax.numpy as jnp

        if vision.uniform_window is not None:
            z = jnp.zeros((1, 1), jnp.float32)
            return z, z
        return (jnp.asarray(vision.window_mask),
                jnp.asarray(vision.full_mask))

    def embed_sequence(self, ids: np.ndarray, vision: VisionInputs):
        """Text embeds with vision embeds scattered over image-pad slots."""
        import jax.numpy as jnp

        wmask, fmask = self._mask_args(vision)
        vis = self._run_vision(self.params["vision"],
                               jnp.asarray(vision.patches),
                               jnp.asarray(vision.rot_pos_emb),
                               wmask, fmask,
                               uw=vision.uniform_window)
        vis = vis[jnp.asarray(vision.reverse_index)]
        embeds = self.params["text"]["embed_tokens"][jnp.asarray(ids)]
        img_slots = np.nonzero(ids == self.cfg.image_token_id)[0]
        embeds = embeds.at[jnp.asarray(img_slots)].set(
            vis.astype(embeds.dtype))
        return embeds[None].astype(self.dtype)

    def _run_decode_loop(self, logits, cache, T: int, delta: int,
                         max_new_tokens: int,
                         sampling: Optional[SamplingConfig],
                         seed: int, prompt_ids) -> List[List[int]]:
        """Shared tail of both generate paths: device loop + one fetch."""
        import jax
        import jax.numpy as jnp

        if T + max_new_tokens > self.max_len:
            # dynamic_update_slice would silently clamp past the last
            # cache row (stale/garbage attention, wrong text, no error)
            raise ValueError(
                f"prompt ({T} tokens) + max_new_tokens "
                f"({max_new_tokens}) exceeds the KV cache max_len "
                f"({self.max_len}); raise QwenVLGenerator(max_len=...) "
                f"or shorten the generation")
        scfg = sampling or GREEDY
        B = logits.shape[0]
        if scfg.needs_presence:
            presence = jnp.zeros((B, self.cfg.text.vocab_size), bool)
            presence = presence.at[:, jnp.asarray(np.unique(
                prompt_ids))].set(True)
        else:
            presence = jnp.zeros((B, 1), bool)
        buf, n_out, _ = self._decode_loop(
            self.params["text"], logits, jnp.int32(T + delta), cache,
            jnp.int32(T), presence, jax.random.PRNGKey(seed),
            max_new_tokens, scfg)
        buf = np.asarray(buf)
        n_out = np.asarray(n_out)
        return [buf[b, :n_out[b]].tolist() for b in range(B)]

    def generate(self, image, prompt_text: str, tokenizer,
                 max_new_tokens: int = 200,
                 fixed_resolution: Optional[int] = 448,
                 sampling: Optional[SamplingConfig] = None,
                 seed: int = 0,
                 resolution_buckets=None,
                 pad_to_ladder=None,
                 min_pixels: Optional[int] = None,
                 max_pixels: Optional[int] = None) -> List[int]:
        """``pad_to_ladder`` (with ``fixed_resolution=None``): exact HF
        smart_resize grid per image — token counts identical to the HF
        processor (reference config.py:10-11 honored per image) — with
        the patch sequence tail-padded to a ladder rung and the prompt
        padded to a multiple of 64, so compile count stays bounded by
        (#rungs × #text buckets) instead of one per unique image size.
        See qwen_process.default_patch_ladder."""
        budget = {}
        if min_pixels is not None:
            budget["min_pixels"] = min_pixels
        if max_pixels is not None:
            budget["max_pixels"] = max_pixels
        vision = prepare_vision_inputs(image, self.cfg.vision,
                                       fixed_resolution=fixed_resolution,
                                       resolution_buckets=resolution_buckets,
                                       raw_uint8=self.u8_patches,
                                       pad_to_ladder=pad_to_ladder,
                                       **budget)
        ids = build_prompt_ids(tokenizer, prompt_text,
                               vision.num_vision_tokens, self.cfg)
        pad_text_to = -(-len(ids) // 64) * 64 \
            if pad_to_ladder is not None else None
        return self.generate_from_ids(ids, vision, max_new_tokens,
                                      sampling=sampling, seed=seed,
                                      pad_text_to=pad_text_to)

    def generate_batch(self, images, prompt_text: str, tokenizer,
                       max_new_tokens: int = 200,
                       fixed_resolution: Optional[int] = 448,
                       sampling: Optional[SamplingConfig] = None,
                       seed: int = 0,
                       prefill_chunk: Optional[int] = None
                       ) -> List[List[int]]:
        """Batched greedy decode over multiple images with one shared
        prompt. All images use the fixed resolution, so the sequence
        layout (and hence positions/masks) is identical across rows and
        decode streams share every weight fetch — decode is
        weight-streaming-bound, so throughput scales ~linearly with B.
        """
        import jax.numpy as jnp

        visions = [prepare_vision_inputs(img, self.cfg.vision,
                                         fixed_resolution=fixed_resolution,
                                         raw_uint8=self.u8_patches)
                   for img in images]
        v0 = visions[0]
        ids = build_prompt_ids(tokenizer, prompt_text,
                               v0.num_vision_tokens, self.cfg)
        return self.generate_batch_from_ids(ids, visions, max_new_tokens,
                                            sampling=sampling, seed=seed,
                                            prefill_chunk=prefill_chunk)

    def generate_batch_from_ids(self, ids: np.ndarray,
                                visions: List[VisionInputs],
                                max_new_tokens: int = 200,
                                sampling: Optional[SamplingConfig] = None,
                                seed: int = 0,
                                prefill_chunk: Optional[int] = None,
                                pad_text_to: Optional[int] = None
                                ) -> List[List[int]]:
        """``prefill_chunk``: run the vision tower + prefill in
        sub-batches of this many rows feeding ONE full-batch decode
        loop. Decode is weight-streaming-bound (bigger B is nearly free
        throughput) while prefill/vision ACTIVATIONS scale with B and
        are what OOMs first (B=128 at 448² needs ~19 GB, BENCH.md r3) —
        chunking caps activation memory at the chunk size without
        giving up decode batch. Token output is identical: each chunk's
        KV rows are written into the full-batch cache at its batch
        offset (one traced-offset compile for all chunks).

        ``pad_text_to``: tail-pad the shared prompt to a bucketed
        length (exact-HF-resolution batches: with ladder-padded vision
        inputs and a bucketed prompt, every grid at the same rung
        shares ONE compile).
        """
        import jax.numpy as jnp

        B = len(visions)
        v0 = visions[0]
        for i, v in enumerate(visions[1:], 1):
            if v.grid != v0.grid or v.patches.shape != v0.patches.shape:
                raise ValueError(
                    f"generate_batch requires one shared sequence layout; "
                    f"vision input {i} has grid {v.grid} vs {v0.grid} — "
                    f"pass fixed_resolution (or bucket by grid) for "
                    f"mixed-resolution batches")
        pos, delta = rope_index_single(ids, v0.grid, self.cfg)
        patches = np.stack([v.patches for v in visions])
        wmask, fmask = self._mask_args(v0)
        T = len(ids)
        img_slots = np.nonzero(ids == self.cfg.image_token_id)[0]
        rev_np, img_slots = self._pad_slots(v0, img_slots)
        ids_p, pos_p = (self._pad_text(ids, np.asarray(pos), pad_text_to)
                        if pad_text_to else (ids, np.asarray(pos)))
        if len(ids_p) > self.max_len:
            raise ValueError(
                f"padded prompt ({len(ids_p)} tokens) exceeds the KV "
                f"cache max_len ({self.max_len})")
        T_p = len(ids_p)
        rev = jnp.asarray(rev_np)
        jids = jnp.asarray(ids_p)
        jslots = jnp.asarray(img_slots)
        jrope = jnp.asarray(v0.rot_pos_emb)

        def run_prefill(chunk_patches, n_rows):
            cache = init_kv_cache(self.cfg.text, n_rows, self.max_len,
                                  self.dtype, self.kv_quantized)
            pos3 = np.broadcast_to(pos_p[:, None, :], (3, n_rows, T_p))
            return self._embed_prefill(
                self.params, jnp.asarray(chunk_patches), jrope, wmask,
                fmask, rev, jids, jslots, jnp.asarray(pos3), cache,
                jnp.int32(T - 1), uw=v0.uniform_window)

        if prefill_chunk is None or prefill_chunk >= B:
            # one dispatch: batched vision tower + embed scatter + prefill
            logits, cache = run_prefill(patches, B)
        else:
            cache = init_kv_cache(self.cfg.text, B, self.max_len,
                                  self.dtype, self.kv_quantized)
            logit_parts = []
            for off in range(0, B, prefill_chunk):
                sub = patches[off:off + prefill_chunk]
                logits_c, sub_cache = run_prefill(sub, len(sub))
                cache = self._merge_cache(cache, sub_cache,
                                          jnp.int32(off))
                logit_parts.append(logits_c)
            cache = cache._replace(length=cache.length + T)
            logits = jnp.concatenate(logit_parts, axis=0)
        return self._run_decode_loop(logits, cache, T, delta,
                                     max_new_tokens, sampling, seed, ids)

    @staticmethod
    def _pad_slots(vision: VisionInputs, img_slots: np.ndarray):
        """Fixed-shape (rev, img_slots) for a tail-padded patch
        sequence: pad both with their LAST entry, so the duplicate
        scatter writes carry the identical (real) value — no masked
        text slot is ever needed and write order cannot matter."""
        n_cap = len(vision.patches) * len(vision.reverse_index) \
            // max(1, (vision.valid_len or len(vision.patches)))
        rev = vision.reverse_index
        if len(rev) < n_cap:
            rev = np.concatenate(
                [rev, np.full(n_cap - len(rev), rev[-1], rev.dtype)])
            img_slots = np.concatenate(
                [img_slots, np.full(n_cap - len(img_slots),
                                    img_slots[-1], img_slots.dtype)])
        return rev, img_slots

    @staticmethod
    def _pad_text(ids: np.ndarray, pos: np.ndarray, pad_text_to: int):
        """Tail-pad prompt ids/positions to a bucketed length. Pad
        positions just continue the arange — their K/V are causally
        invisible to real tokens and the decode loop overwrites them."""
        T = len(ids)
        if pad_text_to < T:
            raise ValueError(f"pad_text_to={pad_text_to} < prompt "
                             f"length {T}")
        pad = pad_text_to - T
        if pad == 0:
            return ids, pos
        ids_p = np.concatenate([ids, np.full(pad, 0, ids.dtype)])
        pos_p = np.concatenate(
            [pos, pos[:, -1:] + 1 + np.arange(pad)[None]], axis=1)
        return ids_p, pos_p

    def generate_from_ids(self, ids: np.ndarray, vision: VisionInputs,
                          max_new_tokens: int = 200,
                          sampling: Optional[SamplingConfig] = None,
                          seed: int = 0,
                          pad_text_to: Optional[int] = None) -> List[int]:
        import jax.numpy as jnp

        pos, delta = rope_index_single(ids, vision.grid, self.cfg)
        wmask, fmask = self._mask_args(vision)
        T = len(ids)
        ids_p, pos_p = (self._pad_text(ids, np.asarray(pos), pad_text_to)
                        if pad_text_to else (ids, np.asarray(pos)))
        if len(ids_p) > self.max_len:
            raise ValueError(
                f"padded prompt ({len(ids_p)} tokens) exceeds the KV "
                f"cache max_len ({self.max_len})")
        cache = init_kv_cache(self.cfg.text, 1, self.max_len, self.dtype,
                              self.kv_quantized)
        img_slots = np.nonzero(ids == self.cfg.image_token_id)[0]
        rev, img_slots = self._pad_slots(vision, img_slots)
        logits, cache = self._embed_prefill(
            self.params, jnp.asarray(vision.patches)[None],
            jnp.asarray(vision.rot_pos_emb), wmask, fmask,
            jnp.asarray(rev), jnp.asarray(ids_p),
            jnp.asarray(img_slots),
            jnp.asarray(pos_p[:, None, :]), cache, jnp.int32(T - 1),
            uw=vision.uniform_window)
        return self._run_decode_loop(logits, cache, T, delta,
                                     max_new_tokens, sampling, seed,
                                     ids)[0]


class QwenVLContextExtractor(ClipTextEncoderMixin):
    """The reference VLMContextExtractor contract on the JAX Qwen port.

    Requires local weights (safetensors dir or converted pickle) and a
    Qwen tokenizer.json. Raises at construction when assets are missing —
    use StubContextExtractor or CachedContextExtractor instead then.
    """

    def __init__(self, clip_params, clip_cfg, clip_tokenizer,
                 weights_path: Optional[str] = None,
                 quant_bits=8, policy=None,
                 max_new_tokens: int = 200,
                 fixed_resolution: Optional[int] = 448,
                 sampling: Optional[SamplingConfig] = None,
                 seed: int = 0,
                 max_len: int = 768,
                 pad_to_ladder=None,
                 prefill_chunk: Optional[int] = None,
                 min_pixels: Optional[int] = None,
                 max_pixels: Optional[int] = None,
                 kv_bits: int = 16):
        super().__init__(clip_params, clip_cfg, clip_tokenizer, policy)
        if not weights_path or not os.path.isdir(weights_path):
            raise FileNotFoundError(
                "Qwen2.5-VL weights not found (expected a directory with "
                "safetensors + tokenizer.json); pass weights_path or use "
                "the stub/cache context backends")
        from vlm_clip_tpu.vlm.qwen_convert import (
            MIXED_DECODE_BITS, convert_qwen_vl,
            fold_qwen_patch_normalization, quantize_qwen_params)
        from vlm_clip_tpu.vlm.qwen_model import qwen25vl_3b

        sd = load_safetensors_dir(weights_path)
        self.qwen_cfg = qwen25vl_3b()
        params = convert_qwen_vl(sd, self.qwen_cfg)
        # ship raw uint8 patches (4x smaller H2D); numerically folds the
        # processor's normalize into the patch embed
        params["vision"] = fold_qwen_patch_normalization(
            params["vision"], self.qwen_cfg.vision)
        if quant_bits in ("mixed", "8h4"):
            # Both presets untie the head into int4 (the tied bf16
            # embedding head streams 0.62 GB/token, the single largest
            # decode tensor). Measured B=1 shipped-loop (BENCH.md r2):
            # - "8h4"  (int8 layers):      4.94 ms/token, ~3.6 GB — speed
            # - "mixed" (int4 gate/up):    6.07 ms/token, ~2.4 GB — memory
            import dataclasses as _dc

            layer_bits = MIXED_DECODE_BITS if quant_bits == "mixed" else 8
            params = quantize_qwen_params(params, layer_bits,
                                          head_bits=4, fuse_decode=True)
            self.qwen_cfg = _dc.replace(
                self.qwen_cfg, text=_dc.replace(
                    self.qwen_cfg.text, tie_word_embeddings=False))
        elif quant_bits:
            # single-chip extractor: fused qkv/gateup decode GEMVs
            params = quantize_qwen_params(params, quant_bits,
                                          fuse_decode=True)
        # Right-sized KV cache: the extraction prompt (chat template +
        # 256 vision tokens at 448² + VLM_PROMPT) plus max_new_tokens=200
        # is ~520 rows; 768 leaves headroom while keeping the per-row KV
        # footprint small enough that B=64 batched extraction fits in
        # 16 GB HBM (the old 1536 default OOM'd at B=64: 16.4/15.75 GB;
        # B=64 at 512 rows measured 39.7k contexts/hour, BENCH.md r3).
        self.generator = QwenVLGenerator(params, self.qwen_cfg,
                                         max_len=max_len, kv_bits=kv_bits)
        self.generator.u8_patches = True
        tok_json = os.path.join(weights_path, "tokenizer.json")
        self.qwen_tokenizer = QwenBPETokenizer(tok_json)
        self.max_new_tokens = max_new_tokens
        self.fixed_resolution = fixed_resolution
        # exact-HF dynamic resolution under bounded compiles: pass
        # fixed_resolution=None, pad_to_ladder=default_patch_ladder(cfg)
        self.pad_to_ladder = pad_to_ladder
        # cap vision/prefill activation memory in batched extraction
        # (B=128 OOMs at ~19 GB without it, BENCH.md r3)
        self.prefill_chunk = prefill_chunk
        # per-image pixel budget (reference config.py:10-11); None =
        # the HF/reference defaults (qwen_process.VLM_DEFAULT_*)
        self.min_pixels = min_pixels
        self.max_pixels = max_pixels
        # Like HF generate(): defaults come from the checkpoint's
        # generation_config.json (model_v.py:109) unless overridden.
        self.sampling = sampling if sampling is not None else \
            load_generation_config(weights_path, self.qwen_cfg.eos_token_id)
        self.seed = seed
        self._n_generated = 0

    def _pixel_budget(self) -> Dict[str, int]:
        budget = {}
        if self.min_pixels is not None:
            budget["min_pixels"] = self.min_pixels
        if self.max_pixels is not None:
            budget["max_pixels"] = self.max_pixels
        return budget

    def extract_context_from_image(self, image) -> Optional[str]:
        try:
            # distinct sampling key per image, deterministic per run
            self._n_generated += 1
            ids = self.generator.generate(
                image, VLM_PROMPT, self.qwen_tokenizer,
                max_new_tokens=self.max_new_tokens,
                fixed_resolution=self.fixed_resolution,
                sampling=self.sampling,
                seed=self.seed + self._n_generated,
                pad_to_ladder=self.pad_to_ladder,
                **self._pixel_budget())
            text = self.qwen_tokenizer.decode(ids).strip()
            return text if text else None
        except Exception as e:  # None-on-error (model_v.py:124-126)
            print(f"Error processing image for VLM context: {e}")
            return None

    def extract_contexts_batch(self, images) -> List[Optional[str]]:
        """Batched extraction: shared prompt layout, one decode loop
        per batch. Decode is weight-streaming-bound, so throughput
        scales ~linearly with batch size (B=8 measured 3.1× the
        per-image rate end-to-end, BENCH.md). Rows that fail fall back
        to per-image extraction (None-on-error).

        Dynamic resolution (fixed_resolution=None): WITHOUT a patch
        ladder, rows cannot share a layout and the per-image path is
        used. WITH ``pad_to_ladder``, images are grouped by grid (one
        generate_batch call per group, outputs reassembled in input
        order); ladder padding + bucketed prompts keep compiles bounded
        by (#rungs × #text buckets) even across many distinct grids."""
        if self.fixed_resolution is None:
            if self.pad_to_ladder is None:
                return [self.extract_context_from_image(im)
                        for im in images]
            return self._extract_batch_dynamic(list(images))
        try:
            self._n_generated += 1
            id_lists = self.generator.generate_batch(
                list(images), VLM_PROMPT, self.qwen_tokenizer,
                max_new_tokens=self.max_new_tokens,
                fixed_resolution=self.fixed_resolution,
                sampling=self.sampling,
                seed=self.seed + self._n_generated,
                prefill_chunk=self.prefill_chunk)
            return [self._decode_or_none(ids) for ids in id_lists]
        except Exception as e:
            print(f"Batched VLM context extraction failed ({e}); "
                  f"falling back to per-image")
            return [self.extract_context_from_image(im) for im in images]

    def _decode_or_none(self, ids) -> Optional[str]:
        text = self.qwen_tokenizer.decode(ids).strip()
        return text if text else None

    def _extract_batch_dynamic(self, images) -> List[Optional[str]]:
        """Exact-HF-resolution batching: group by smart_resize grid."""
        vins: List[Optional[VisionInputs]] = []
        for im in images:
            try:
                vins.append(prepare_vision_inputs(
                    im, self.qwen_cfg.vision,
                    fixed_resolution=None,
                    raw_uint8=self.generator.u8_patches,
                    pad_to_ladder=self.pad_to_ladder,
                    **self._pixel_budget()))
            except Exception as e:
                print(f"Error processing image for VLM context: {e}")
                vins.append(None)
        groups: Dict[tuple, List[int]] = {}
        for i, v in enumerate(vins):
            if v is not None:
                groups.setdefault(
                    (v.grid, v.patches.shape[0]), []).append(i)
        out: List[Optional[str]] = [None] * len(images)
        for (grid, _), idxs in groups.items():
            gvins = [vins[i] for i in idxs]
            ids = build_prompt_ids(self.qwen_tokenizer, VLM_PROMPT,
                                   gvins[0].num_vision_tokens,
                                   self.qwen_cfg)
            try:
                self._n_generated += 1
                id_lists = self.generator.generate_batch_from_ids(
                    ids, gvins, max_new_tokens=self.max_new_tokens,
                    sampling=self.sampling,
                    seed=self.seed + self._n_generated,
                    prefill_chunk=self.prefill_chunk,
                    pad_text_to=-(-len(ids) // 64) * 64)
                for i, toks in zip(idxs, id_lists):
                    out[i] = self._decode_or_none(toks)
            except Exception as e:
                print(f"Batched VLM context extraction failed for grid "
                      f"{grid} ({e}); falling back to per-image")
                for i in idxs:
                    out[i] = self.extract_context_from_image(images[i])
        return out


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """All tensors from every .safetensors shard in a directory."""
    from safetensors.numpy import load_file

    out: Dict[str, np.ndarray] = {}
    for fname in sorted(os.listdir(path)):
        if fname.endswith(".safetensors"):
            out.update(load_file(os.path.join(path, fname)))
    if not out:
        raise FileNotFoundError(f"no .safetensors files under {path}")
    return out
