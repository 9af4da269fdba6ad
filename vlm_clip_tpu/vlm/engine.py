"""Continuous-batching generation engine for the JAX Qwen2.5-VL.

The reference serves VLM context extraction one ``generate()`` call at a
time (model_v.py:108-118): a fixed batch runs until its LAST row
finishes, so every early-finishing row idles while stragglers decode —
and new work waits for the whole batch to drain. This engine keeps a
fixed pool of ``n_slots`` decode rows live on device (fixed shapes —
XLA compiles exactly one step function) and treats each row as an
independent slot, vLLM-style:

- the host syncs ONCE per decode chunk (a [n, k] token block plus four
  [n] state vectors — one tunnel RTT per chunk, not per token, extending
  the round-2 while_loop design to heterogeneous rows); the chunk length
  is adaptive by default: a traced trip count picked per dispatch from
  the slots' known remaining budgets (see the class docstring);
- rows that hit EOS / their token budget are harvested and their slots
  immediately re-prefilled from the request queue (grouped into
  ``refill_chunks``-sized sub-batches that share one vision+prefill
  dispatch, exactly like ``generate_batch_from_ids(prefill_chunk=...)``);
- decode state is PER ROW: each slot writes its fresh KV at its own
  cache depth and its attention mask admits ``cols <= depth`` — the
  per-row ``cache_index`` route in qwen_model.text_forward.

Output parity: a request's tokens are identical to
``QwenVLGenerator.generate_from_ids`` under GREEDY (same prefill, same
per-step attended set, same eos-trim contract) — proven in
tests/test_engine.py. Under sampled configs the chains differ only by
RNG stream assignment (one engine key vs one key per generate call).

Scheduling is deliberately host-side and synchronous: TPU decode is
weight-streaming-bound, so the only decisions that matter — when to
refill, how large a prefill group — happen at chunk granularity, and a
Python loop at 6 Hz is nowhere near the bottleneck. Wasted work is
bounded: a finished-but-unharvested row decodes garbage for at most the
remainder of its chunk (its outputs are masked from recording).
"""

from __future__ import annotations

import collections
import functools
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import speculative as _spec
from .qwen_model import KVCache, init_kv_cache, text_forward
from .qwen_process import VisionInputs, rope_index_single
from .sampling import GREEDY, SamplingConfig, sample_token

_NEG = 3.4028235e38


def _is_stop(tokens, stops):
    hit = tokens == jnp.int32(stops[0])
    for e in stops[1:]:
        hit = hit | (tokens == jnp.int32(e))
    return hit


# ---------------------------------------------------------------------------
# Module-level jitted kernels. These live OUTSIDE the engine class so the
# in-process jit cache is shared across engine instances: per-instance
# ``jax.jit`` objects made by every fresh engine (tests, benches,
# restarts) re-deserialize multi-second executables from the persistent
# cache on their first chunk — measured as a fixed ~9 s of phantom
# "decode" per engine lifetime at 3B shapes (BENCH.md round 3). All
# config enters via hashable statics (frozen dataclasses/tuples/ints).
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit, static_argnames=("k_steps", "scfg", "span", "tcfg", "stops",
                              "eos", "dtype"),
    # donate only the big buffers: the [n] state vectors are harvest
    # outputs under pipelined dispatch (fetched one chunk late, AFTER
    # they have been fed to the next chunk) so they must survive reuse
    donate_argnames=("cache", "presence"))
def _engine_steps(params, cache, tokens, pos, lengths, done, remaining,
                  presence, key, k_dyn, *, k_steps, scfg, span, tcfg,
                  stops, eos, dtype):
    """Up to ``k_steps`` decode steps over every slot; done/free rows
    compute garbage (discarded) — the price of one static shape.

    ``k_steps`` (static) is only the token-buffer CAP; the actual trip
    count is ``k_dyn`` (a traced int32 in a While) — so the adaptive
    scheduler varies the chunk length per dispatch with ONE compiled
    program per KV-span bucket, not one per length. The While also
    exits as soon as EVERY slot is done (EOS/budget/free) — a chunk
    that overshoots its last live slot costs nothing on device.

    Per-step contract mirrors the single-batch decode loop (qwen.py
    decode_loop): the current token is recorded first (eos/budget
    checked), then forwarded — its KV row lands at depth ``lengths``
    and it attends ``cols <= lengths``, exactly decode_step_inner's
    write/mask indexing.

    ``span`` (static): host-computed KV read bucket — every live slot's
    depth stays < span for the whole chunk, so attention streams only
    cache cols < span (one cached compile per bucket).
    """
    n = tokens.shape[0]
    buf0 = jnp.full((n, k_steps), eos, jnp.int32)

    def body(i, st):
        (cache, tokens, pos, lengths, done, remaining, presence,
         key, buf) = st
        done = done | _is_stop(tokens, stops) | (remaining <= 0)
        buf = buf.at[:, i].set(
            jnp.where(done, jnp.int32(eos), tokens))
        rec = jnp.logical_not(done)
        if scfg.needs_presence:
            presence = presence.at[jnp.arange(n), tokens].set(True)
        remaining = remaining - rec

        emb = params["embed_tokens"][tokens][:, None]
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, n, 1))
        # mask=None = canonical decode mask (cache cols < lengths +
        # self): routes the streaming fused decode-attention kernel
        logits, cache = text_forward(
            params, emb.astype(dtype), pos3, tcfg, None,
            cache, lengths, kv_read_span=span)
        key, sub = jax.random.split(key)
        nxt = sample_token(logits[:, -1], presence, sub, scfg)
        tokens = jnp.where(done, tokens, nxt)
        pos = pos + rec
        lengths = lengths + rec
        return (cache, tokens, pos, lengths, done, remaining,
                presence, key, buf)

    st = (cache, tokens, pos, lengths, done, remaining, presence,
          key, buf0)

    # While with a traced bound + all-done early exit (st[4] is done;
    # it lags the last emitted token by one step, so at most one
    # garbage iteration runs per chunk after the last slot finishes)
    def _cond(c):
        return (c[0] < k_dyn) & jnp.logical_not(jnp.all(c[1][4]))

    _, st = jax.lax.while_loop(
        _cond, lambda c: (c[0] + 1, body(c[0], c[1])),
        (jnp.int32(0), st))
    return st


@functools.partial(
    jax.jit, static_argnames=("k_rounds", "spec_k", "span", "scfg",
                              "tcfg", "stops", "eos", "dtype"),
    donate_argnames=("cache", "hist", "presence"))
def _engine_spec_steps(params, cache, tokens, pos, lengths, done,
                       remaining, hist, gen_count, presence, key,
                       k_dyn, *, k_rounds, spec_k, span, scfg, tcfg,
                       stops, eos, dtype):
    """Up to ``k_rounds`` speculative verify rounds over every slot;
    the actual trip count is the traced ``k_dyn`` (see _engine_steps).

    Each round mirrors one vanilla step — record the carried token,
    forward, carry the sample — except the forward consumes
    [carried, draft_1..draft_K] (T = K+1, per-row depths; KV rows for
    the whole block land at lengths..lengths+K) and accepted draft
    tokens are recorded too: ``a`` accepted drafts emit a+1 tokens for
    one weight-streaming pass. Lossless in BOTH decode modes —
    token-identical under greedy, distribution-identical under the HF
    sampled chain incl. repetition penalty (vlm/speculative.py
    `verify_round` docstring; tests/test_speculative.py).

    ``hist`` [n, H+1] carries each slot's token window — the prompt
    (seeded at install) plus generated tokens — across chunks for the
    n-gram lookup (col H is a scatter scrap column for masked writes).
    Returns buf [n, k_rounds*(K+1)] packed per row — the harvest
    contract (lengths delta) is unchanged.
    """
    n = tokens.shape[0]
    K = spec_k
    cap = k_rounds * (K + 1)
    H = hist.shape[1] - 1
    buf0 = jnp.full((n, cap + 1), eos, jnp.int32)  # last col = scrap
    bidx = jnp.arange(n)
    pdim = presence.shape[1]  # scatter index == pdim drops (OOB)

    def body(_, st):
        (cache, tokens, pos, lengths, done, remaining, hist,
         gen_count, presence, key, buf, bufcnt) = st
        done = done | _is_stop(tokens, stops) | (remaining <= 0)
        rec = jnp.logical_not(done)

        # record the carried token
        buf = buf.at[bidx, jnp.where(rec, jnp.minimum(bufcnt, cap),
                                     cap)].set(tokens)
        hist = hist.at[bidx, jnp.where(rec, jnp.minimum(gen_count, H),
                                       H)].set(tokens)
        bufcnt = bufcnt + rec
        gen_count = gen_count + rec
        remaining = remaining - rec

        draft = _spec.ngram_draft(hist[:, :H], gen_count, K)
        inp = jnp.concatenate([tokens[:, None], draft], axis=1)
        emb = params["embed_tokens"][inp]
        pos3 = jnp.broadcast_to(pos[None, :, None], (3, n, 1)) \
            + jnp.arange(K + 1)[None, None]
        # mask=None = canonical decode mask (cache cols < lengths +
        # causal fresh triangle over the verify block)
        logits, cache = text_forward(
            params, emb.astype(dtype), pos3, tcfg, None, cache,
            lengths, kv_read_span=span)

        key, sub = jax.random.split(key)
        a, cand = _spec.verify_round(draft, logits, tokens, presence,
                                     sub, scfg, stops)
        m = jnp.where(rec, jnp.minimum(a, jnp.maximum(remaining, 0)), 0)
        if scfg.needs_presence:
            # persist: x0 (recorded this round) + the accepted drafts;
            # the carried token is recorded at the top of next round
            presence = presence.at[bidx, tokens].set(True)
        for j in range(K):  # static K, tiny scatters
            w = j < m
            buf = buf.at[bidx, jnp.where(w, jnp.minimum(bufcnt + j, cap),
                                         cap)].set(draft[:, j])
            hist = hist.at[bidx,
                           jnp.where(w, jnp.minimum(gen_count + j, H),
                                     H)].set(draft[:, j])
            if scfg.needs_presence:
                presence = presence.at[
                    bidx, jnp.where(w, draft[:, j], pdim)].set(True)
        bufcnt = bufcnt + m
        gen_count = gen_count + m
        remaining = remaining - m

        newtok = jnp.take_along_axis(cand, m[:, None], axis=1)[:, 0]
        tokens = jnp.where(rec, newtok, tokens)
        adv = jnp.where(rec, 1 + m, 0)
        pos = pos + adv
        lengths = lengths + adv
        return (cache, tokens, pos, lengths, done, remaining, hist,
                gen_count, presence, key, buf, bufcnt)

    st = (cache, tokens, pos, lengths, done, remaining, hist, gen_count,
          presence, key, buf0, jnp.zeros((n,), jnp.int32))

    def _cond(c):
        return (c[0] < k_dyn) & jnp.logical_not(jnp.all(c[1][4]))

    _, st = jax.lax.while_loop(
        _cond, lambda c: (c[0] + 1, body(c[0], c[1])),
        (jnp.int32(0), st))
    return st[:10] + (st[10][:, :cap],)


@functools.partial(
    jax.jit, static_argnames=("scfg",),
    donate_argnames=("cache", "presence"))
def _engine_place(cache, sub_cache, logits0, slots, tokens, pos, lengths,
                  done, remaining, presence, prows, pos0, len0, rem0,
                  key, scfg):
    """Install a prefilled group into its slots: scatter the sub-batch
    KV rows at the slot indices, sample each row's first token from its
    prefill logits, reset per-slot state."""
    k = cache.k.at[:, slots].set(sub_cache.k)
    v = cache.v.at[:, slots].set(sub_cache.v)
    if cache.k_scale is not None:
        ks = cache.k_scale.at[:, slots].set(sub_cache.k_scale)
        vs = cache.v_scale.at[:, slots].set(sub_cache.v_scale)
        cache = KVCache(k, v, cache.length, ks, vs)
    else:
        cache = KVCache(k, v, cache.length)
    presence = presence.at[slots].set(prows)
    key, sub = jax.random.split(key)
    tok0 = sample_token(logits0, presence[slots], sub, scfg)
    tokens = tokens.at[slots].set(tok0)
    pos = pos.at[slots].set(pos0)
    lengths = lengths.at[slots].set(len0)
    done = done.at[slots].set(False)
    remaining = remaining.at[slots].set(rem0)
    return (cache, tokens, pos, lengths, done, remaining,
            presence, key)


class _Pending:
    __slots__ = ("req_id", "ids", "vision", "max_new", "pad_text_to",
                 "group_key", "stream")

    def __init__(self, req_id, ids, vision, max_new, pad_text_to,
                 stream=False):
        self.req_id = req_id
        self.ids = ids
        self.vision = vision
        self.max_new = max_new
        self.pad_text_to = pad_text_to
        self.stream = stream
        # requests sharing a layout (same prompt bytes, same patch
        # shapes/grid) can share one batched vision+prefill dispatch
        self.group_key = (ids.tobytes(), vision.grid,
                          vision.patches.shape, pad_text_to)


class ContinuousBatchingEngine:
    """Slot-based continuous batching over a ``QwenVLGenerator``.

    ``n_slots``: decode rows resident on device (one KV cache of
    [L, n_slots, max_len, kv, d]). ``sync_steps``: MINIMUM decode steps
    per host sync (the fixed chunk length when ``adaptive=False``).
    ``refill_chunks``: descending prefill group sizes; each size is one
    (cached) compile of the vision+prefill dispatch.

    Adaptive chunking (default): the host knows every slot's remaining
    token budget exactly (install sets it, every harvest refreshes it),
    so each dispatch picks its own chunk length — sync when the
    EARLIEST-finishing slot can free (min remaining, so a waiting queue
    refills promptly with zero budget-driven garbage decode), or when
    nothing is queued, the LATEST (max remaining — syncs exist only to
    harvest). Clamped to [sync_steps, chunk_max]. The trip count is a
    traced operand of the step jits, so every length shares one
    compiled program per KV-span bucket; token streams are unchanged
    (chunk boundaries don't enter the math — parity-tested).
    """

    def __init__(self, gen, n_slots: int = 32, sync_steps: int = 16,
                 sampling: Optional[SamplingConfig] = None,
                 seed: int = 0,
                 refill_chunks: Tuple[int, ...] = (8, 4, 2, 1),
                 profile: bool = False, spec_k: int = 0,
                 mesh=None, pipeline: bool = True,
                 adaptive: bool = True,
                 chunk_max: Optional[int] = None):
        self.gen = gen
        self.cfg = gen.cfg
        self.n_slots = n_slots
        self.sync_steps = sync_steps
        self.adaptive = bool(adaptive)
        self.chunk_max = max(int(chunk_max) if chunk_max
                             else 8 * sync_steps, sync_steps)
        # static token-buffer cap of the step jits (the traced trip
        # count k_dyn varies per dispatch underneath it)
        self._cap = self.chunk_max if self.adaptive else sync_steps
        # --- tensor / data parallelism -------------------------------------
        # ``mesh``: a jax.sharding.Mesh with 'model' and/or 'data' axes.
        # The generator's weights (text + vision, fp or quantized) are
        # sharded IN PLACE by the Megatron-style qwen_param_rules —
        # qkv/gate/up on the output dim, o/down on the input dim, the
        # untied lm head on the vocab dim — so every engine dispatch
        # (vision+prefill, decode steps, spec verify) runs as one GSPMD
        # program with XLA-inserted collectives riding ICI. This is the
        # rebuild of the reference's multi-GPU ``device_map="auto"``
        # placement (model_v.py:55) without its per-layer host hops.
        #
        # Slot state placement: with a 'data' axis of size D > 1 the
        # SLOT axis of everything per-slot — tokens/pos/lengths/done/
        # remaining/presence/hist and the KV cache's slot dim — is
        # sharded over 'data', so per-chip KV HBM is n_slots/D slots
        # (the lever BENCH.md's 72B arithmetic needs: 64 slots × 335 MB
        # of int8 KV = 21 GB replicated, but 2.6 GB/chip at data=8).
        # Decode is embarrassingly per-slot, so GSPMD runs the step
        # with zero collectives on the data axis (TP's per-layer
        # psums ride 'model' within each data replica); only install's
        # scatter of a replicated prefill group crosses replicas.
        # Without a 'data' axis (or D == 1) slot state is replicated —
        # the pure-TP mode. Token parity with the single-device engine:
        # tests/test_engine.py (TP=2, DP=2, DP×TP=2×2).
        #
        # Deliberately NOT supported: a ('pipe', 'model') mesh. TP×DP
        # covers the whole reference model family by HBM arithmetic
        # (72B int8 = 9 GB/chip at TP=8, inside one ICI domain), while
        # a continuous-batching token ring would turn every refill into
        # a full-ring re-prefill and pay an S-hop latency per token —
        # the measured decision lives in BENCH.md round 5; PP×TP stays
        # on the batch/training paths (parallel/pipeline.py).
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from vlm_clip_tpu.parallel.mesh import DATA_AXIS
            from vlm_clip_tpu.parallel.sharding import (qwen_param_rules,
                                                        shard_params)
            gen.params = shard_params(gen.params, mesh,
                                      rules=qwen_param_rules())
            self._replicate = lambda t: jax.device_put(
                t, NamedSharding(mesh, PartitionSpec()))
            dp = mesh.shape.get(DATA_AXIS, 1)
            if dp > 1:
                if n_slots % dp:
                    raise ValueError(
                        f"n_slots ({n_slots}) must be divisible by the "
                        f"mesh data axis ({dp}) to shard slot state")

                def _slot_shard(t, slot_dim):
                    spec = [None] * t.ndim
                    spec[slot_dim] = DATA_AXIS
                    return jax.device_put(
                        t, NamedSharding(mesh, PartitionSpec(*spec)))
                self._slot_shard = _slot_shard
            else:
                self._slot_shard = lambda t, slot_dim: self._replicate(t)
        else:
            self._replicate = lambda t: t
            self._slot_shard = lambda t, slot_dim: t
        # n-gram speculative decoding: verify K draft tokens per forward
        # (vlm/speculative.py). Lossless in BOTH decode modes: greedy
        # acceptance is token-identical; sampled configs run exact
        # speculative sampling against the point-mass draft (accept
        # w.p. p(draft), resample the residual on rejection) — so the
        # checkpoint's own generation_config (sampling + repetition
        # penalty) composes with spec_k.
        self.spec_k = int(spec_k)
        # opt-in phase attribution: blocks after install/steps dispatches
        # (a device sync each — measurement only, not the serving path)
        self.profile = profile
        # pipelined dispatch (default): chunk N is dispatched BEFORE
        # chunk N-1's results are fetched, so the host sync (5-6 tunnel
        # RTTs, the measured engine-vs-static gap on uniform loads,
        # BENCH.md r3/r4) overlaps chunk N's device execution. Costs:
        # refills land one chunk later (a finished slot decodes garbage
        # for ≤ one extra chunk) and harvest state lags one chunk.
        # Token streams are UNCHANGED per request (scheduling only) —
        # tests pin pipelined == unpipelined output. Off under profile
        # (phase attribution needs synchronous chunks).
        self.pipeline = bool(pipeline) and not profile
        self._pend: Optional[dict] = None
        self.stats = {"install_s": 0.0, "steps_s": 0.0, "sync_s": 0.0,
                      "installs": 0, "steps": 0,
                      # always-on: decode rounds dispatched (spec: one
                      # round = one K+1-token verify forward) — lets
                      # benches derive accepted-drafts/round as
                      # emitted_tokens / rounds - 1 — and chunks
                      # dispatched (each chunk costs one host sync)
                      "rounds": 0, "chunks": 0}
        self.scfg = sampling or GREEDY
        self.refill_chunks = tuple(
            c for c in sorted(set(refill_chunks), reverse=True)
            if c <= n_slots) or (1,)
        self._stops = (self.cfg.eos_token_id,) + tuple(self.scfg.extra_eos)

        # --- device state (slot axis sharded over 'data' when the mesh
        # has one; replicated otherwise) ------------------------------------
        self._key = self._replicate(jax.random.PRNGKey(seed))
        cache0 = init_kv_cache(self.cfg.text, n_slots, gen.max_len,
                               gen.dtype, gen.kv_quantized)
        self.cache = KVCache(*(
            t if t is None else
            (self._replicate(t) if t.ndim == 0 else self._slot_shard(t, 1))
            for t in cache0))
        self.tokens = self._slot_shard(jnp.zeros((n_slots,), jnp.int32), 0)
        self.pos = self._slot_shard(jnp.zeros((n_slots,), jnp.int32), 0)
        self.lengths = self._slot_shard(jnp.zeros((n_slots,), jnp.int32), 0)
        self.done = self._slot_shard(jnp.ones((n_slots,), bool), 0)  # free
        self.remaining = self._slot_shard(
            jnp.zeros((n_slots,), jnp.int32), 0)
        pdim = self.cfg.text.vocab_size if self.scfg.needs_presence else 1
        self.presence = self._slot_shard(
            jnp.zeros((n_slots, pdim), bool), 0)
        if self.spec_k:
            # per-slot generated history for the n-gram lookup
            # (+1 scrap column for masked scatters)
            self.hist = self._slot_shard(
                jnp.zeros((n_slots, gen.max_len + 1), jnp.int32), 0)
            self.gen_count = self._slot_shard(
                jnp.zeros((n_slots,), jnp.int32), 0)

        # --- host state ----------------------------------------------------
        self._queue: "collections.deque[_Pending]" = collections.deque()
        self._slot_req: List[Optional[int]] = [None] * n_slots
        self._slot_stream: List[bool] = [False] * n_slots
        self._slot_toks: List[List[int]] = [[] for _ in range(n_slots)]
        self._lengths_host = np.zeros((n_slots,), np.int64)
        # host mirror of each slot's remaining budget (exact through
        # the last harvest) — drives the adaptive chunk-length policy
        self._remaining_host = np.zeros((n_slots,), np.int64)
        self._next_id = 0
        self._finished: Dict[int, List[int]] = {}

    # ------------------------------------------------------------------
    # host API
    # ------------------------------------------------------------------
    def submit(self, ids: np.ndarray, vision: VisionInputs,
               max_new_tokens: int = 200,
               pad_text_to: Optional[int] = None,
               stream: bool = False) -> int:
        """Queue one request; returns its id (see poll()/flush()).

        ``stream=True`` marks the request as having a streaming consumer
        (partial_tokens): while any streaming request is live, the
        adaptive scheduler caps chunk length at ``sync_steps`` so tokens
        become host-visible at chunk granularity instead of only at the
        earliest harvest the budget math needs. Token streams are
        unchanged (chunk boundaries never enter the math)."""
        T_p = pad_text_to or len(ids)
        if T_p + max_new_tokens > self.gen.max_len:
            raise ValueError(
                f"prompt ({T_p} tokens) + max_new_tokens "
                f"({max_new_tokens}) exceeds the engine KV max_len "
                f"({self.gen.max_len})")
        rid = self._next_id
        self._next_id += 1
        self._queue.append(_Pending(rid, np.asarray(ids), vision,
                                    max_new_tokens, pad_text_to,
                                    stream=stream))
        return rid

    @property
    def pending(self) -> int:
        return len(self._queue) + sum(
            r is not None for r in self._slot_req)

    def poll(self) -> Dict[int, List[int]]:
        """One scheduling round; returns requests finished this round.

        Unpipelined: refill free slots, run one decode chunk, harvest.
        Pipelined (default): dispatch this chunk first (from the state
        the previous poll left), THEN harvest the previous chunk — its
        fetch overlaps this chunk's device execution — then refill.
        """
        if not self.pipeline:
            self._refill()
            if all(r is None for r in self._slot_req):
                out, self._finished = self._finished, {}
                return out
            self._dispatch()
            self._harvest()
            out, self._finished = self._finished, {}
            return out
        if any(r is not None for r in self._slot_req):
            self._dispatch()
        if self._pend is not None:
            self._harvest()
        self._refill()
        out, self._finished = self._finished, {}
        return out

    def flush(self) -> Dict[int, List[int]]:
        """Run until queue and slots drain; returns all results."""
        results: Dict[int, List[int]] = {}
        while self.pending:
            results.update(self.poll())
        return results

    def progress(self) -> Dict[int, int]:
        """Tokens harvested so far per LIVE (installed, unfinished)
        request — zero host syncs (reads the host-side token shadows, so
        the count lags device state by at most the pipelined chunk).
        Finished requests are returned by poll(), not here. Queued
        requests don't appear. Serving-side uses: streaming TTFT
        measurement (cli/bench_engine.py --arrivals) and
        progress/heartbeat endpoints."""
        return {rid: len(self._slot_toks[s])
                for s, rid in enumerate(self._slot_req) if rid is not None}

    def cancel(self, rid: int) -> bool:
        """Abort a request (serving-side client disconnect). Queued:
        dropped before install. Live: the slot is freed for the next
        refill and — when the slot state is process-local — its device
        row is stopped at the next chunk's first step (done=True,
        remaining=0; the same masked-garbage contract as a finished-but
        -unharvested row). Under multi-process DP the device update is
        skipped (a single-process eager op on a non-addressable array
        would deadlock the other hosts): the row decodes garbage until
        refilled or its budget drains — bounded, outputs discarded.
        Returns True if the request was found; a cancelled request is
        never reported by poll()."""
        for p in self._queue:
            if p.req_id == rid:
                self._queue.remove(p)
                return True
        for s, r in enumerate(self._slot_req):
            if r == rid:
                self._slot_req[s] = None
                self._slot_stream[s] = False
                self._slot_toks[s] = []
                self._remaining_host[s] = 0
                if getattr(self.done, "is_fully_addressable", True):
                    self.done = self.done.at[s].set(True)
                    self.remaining = self.remaining.at[s].set(0)
                return True
        return False

    def partial_tokens(self, rid: int) -> Optional[List[int]]:
        """Copy of the harvested-so-far tokens of a LIVE request, or
        None when ``rid`` is not installed in a slot (still queued, or
        already finished and returned by poll). Token values are final
        once harvested — the decode chunks append only — so streaming
        consumers (cli/serve_vlm.py ``stream=1``) can ship deltas."""
        for s, r in enumerate(self._slot_req):
            if r == rid:
                return list(self._slot_toks[s])
        return None

    # ------------------------------------------------------------------
    def _free_slots(self) -> List[int]:
        return [i for i, r in enumerate(self._slot_req) if r is None]

    def _refill(self):
        free = self._free_slots()
        while self._queue and free:
            # group the queue head with same-layout requests behind it
            head = self._queue[0]
            group = [head]
            cap = min(len(free), max(
                (c for c in self.refill_chunks if c <= len(free)),
                default=1))
            for p in list(self._queue)[1:]:
                if len(group) >= cap:
                    break
                if p.group_key == head.group_key:
                    group.append(p)
            # largest refill chunk that fits the group
            size = next((c for c in self.refill_chunks
                         if c <= len(group)), 1)
            group = group[:size]
            for p in group:
                self._queue.remove(p)
            self._install(group, free[:size])
            free = free[size:]

    def _install(self, group: List[_Pending], slots: List[int]):
        """One batched vision+prefill for a same-layout group, scattered
        into ``slots``. Mirrors generate_batch_from_ids's prep
        (qwen.py:461-511) with the merge going to slot indices."""
        gen = self.gen
        cfg = self.cfg
        t0 = time.perf_counter() if self.profile else 0.0
        head = group[0]
        ids, v0 = head.ids, head.vision
        pos, delta = rope_index_single(ids, v0.grid, cfg)
        patches = np.stack([p.vision.patches for p in group])
        wmask, fmask = gen._mask_args(v0)
        T = len(ids)
        img_slots = np.nonzero(ids == cfg.image_token_id)[0]
        rev_np, img_slots = gen._pad_slots(v0, img_slots)
        ids_p, pos_p = (gen._pad_text(ids, np.asarray(pos),
                                      head.pad_text_to)
                        if head.pad_text_to else (ids, np.asarray(pos)))
        T_p = len(ids_p)
        c = len(group)
        sub_cache = self._replicate(
            init_kv_cache(cfg.text, c, gen.max_len, gen.dtype,
                          gen.kv_quantized))
        pos3 = np.broadcast_to(pos_p[:, None, :], (3, c, T_p))
        logits0, sub_cache = gen._embed_prefill(
            gen.params, jnp.asarray(patches), jnp.asarray(v0.rot_pos_emb),
            wmask, fmask, jnp.asarray(rev_np), jnp.asarray(ids_p),
            jnp.asarray(img_slots), jnp.asarray(pos3), sub_cache,
            jnp.int32(T - 1), uw=v0.uniform_window)

        pdim = self.presence.shape[1]
        prow = np.zeros((pdim,), bool)
        if self.scfg.needs_presence:
            prow[np.unique(ids)] = True
        prows = np.broadcast_to(prow, (c, pdim))

        (self.cache, self.tokens, self.pos, self.lengths, self.done,
         self.remaining, self.presence, self._key) = _engine_place(
            self.cache, sub_cache, logits0, jnp.asarray(slots, jnp.int32),
            self.tokens, self.pos, self.lengths, self.done,
            self.remaining, self.presence, jnp.asarray(prows),
            jnp.full((c,), T + delta, jnp.int32),
            jnp.full((c,), T, jnp.int32),
            jnp.asarray([p.max_new for p in group], jnp.int32),
            self._key, scfg=self.scfg)
        if self.spec_k:
            # Seed the n-gram window with the PROMPT tokens (prompt
            # lookup proper, VERDICT r4 #7): drafts continue matches
            # found anywhere in prompt+history, not just the generated
            # tail — re-description/OCR-style loads repeat prompt
            # phrases long before they repeat their own output. The
            # group shares one prompt (group_key includes the prompt
            # bytes), so one seed row broadcasts over the group.
            # gen_count semantics: VALID tokens in hist (prompt +
            # generated), the append offset for recorded tokens.
            sl = jnp.asarray(slots, jnp.int32)
            H = self.hist.shape[1] - 1
            seed = np.zeros((H + 1,), np.int32)
            npids = np.asarray(ids[:H], np.int32)
            seed[:len(npids)] = npids
            self.hist = self.hist.at[sl].set(jnp.asarray(seed))
            self.gen_count = self.gen_count.at[sl].set(
                jnp.int32(len(npids)))
        if self.profile:
            # block_until_ready is a no-op through the axon tunnel; a
            # value fetch really syncs
            self._fetch(self.tokens)
            self.stats["install_s"] += time.perf_counter() - t0
            self.stats["installs"] += len(group)
        for p, s in zip(group, slots):
            self._slot_req[s] = p.req_id
            self._slot_stream[s] = p.stream
            self._slot_toks[s] = []
            self._lengths_host[s] = T
            self._remaining_host[s] = p.max_new

    def _kv_span(self, k_next: int) -> int:
        """KV read bucket for the next chunk: max active depth plus the
        in-flight + next-chunk growth, rounded up to 128 (one cached
        steps-compile per bucket, <= max_len/128 total). Under pipelined
        dispatch the host depths lag the in-flight chunk, so its length
        is part of the margin."""
        deepest = max((int(self._lengths_host[s])
                       for s, r in enumerate(self._slot_req)
                       if r is not None), default=0)
        inflight = self._pend["k"] if self._pend is not None else 0
        need = deepest + (inflight + k_next) * (1 + self.spec_k)
        return min(self.gen.max_len, -(-need // 128) * 128)

    def _next_chunk(self) -> int:
        """Chunk length for the next dispatch (see class docstring).
        Remaining budgets are exact through the last harvest; the
        in-flight chunk (pipelined dispatch) is subtracted since those
        steps are already committed."""
        if not self.adaptive:
            return self.sync_steps
        inflight = self._pend["k"] if self._pend is not None else 0
        rem = [int(self._remaining_host[s]) - inflight
               for s, r in enumerate(self._slot_req) if r is not None]
        tgt = (min(rem) if self._queue else max(rem)) if rem else 0
        if any(self._slot_stream[s]
               for s, r in enumerate(self._slot_req) if r is not None):
            # a streaming consumer is live: deliver at chunk granularity
            tgt = min(tgt, self.sync_steps)
        return max(self.sync_steps, min(self.chunk_max, tgt))

    def _dispatch(self):
        """Dispatch one decode chunk (async) and snapshot the handles +
        slot assignment for its later harvest."""
        t0 = time.perf_counter() if self.profile else 0.0
        k = self._next_chunk()
        span = self._kv_span(k)
        self.stats["rounds"] += k
        self.stats["chunks"] += 1
        if self.spec_k:
            (self.cache, self.tokens, self.pos, self.lengths, self.done,
             self.remaining, self.hist, self.gen_count, self.presence,
             self._key, buf) = \
                _engine_spec_steps(
                    self.gen.params["text"], self.cache, self.tokens,
                    self.pos, self.lengths, self.done, self.remaining,
                    self.hist, self.gen_count, self.presence, self._key,
                    k, k_rounds=self._cap,
                    spec_k=self.spec_k, span=span,
                    scfg=self.scfg, tcfg=self.cfg.text,
                    stops=self._stops,
                    eos=self.cfg.eos_token_id, dtype=self.gen.dtype)
        else:
            (self.cache, self.tokens, self.pos, self.lengths, self.done,
             self.remaining, self.presence, self._key, buf) = \
                _engine_steps(
                    self.gen.params["text"], self.cache, self.tokens,
                    self.pos, self.lengths, self.done, self.remaining,
                    self.presence, self._key, k, k_steps=self._cap,
                    scfg=self.scfg, span=span,
                    tcfg=self.cfg.text, stops=self._stops,
                    eos=self.cfg.eos_token_id, dtype=self.gen.dtype)

        if self.profile:
            self._fetch(buf)  # value fetch = real sync (axon tunnel)
            self.stats["steps_s"] += time.perf_counter() - t0
            self.stats["steps"] += k
        # snapshot: the chunk's output handles + the slot assignment and
        # host depths AS OF DISPATCH. Slots refilled after this dispatch
        # must not be attributed this chunk's rows (their rows hold the
        # PREVIOUS request's frozen state) — the harvest checks the
        # snapshot rid is still current.
        self._pend = {
            "buf": buf, "lengths": self.lengths, "done": self.done,
            "remaining": self.remaining, "tokens": self.tokens,
            "slot_req": list(self._slot_req), "k": k,
        }

    def _fetch(self, t):
        """Host value of a possibly slot-sharded device array. Under
        multi-PROCESS DP the slot shards live on different hosts, so a
        direct np.asarray raises (not fully addressable): reshard to
        replicated first — one on-device all-gather over 'data', the
        same bytes every host needs anyway. Single-process arrays
        (even multi-device sharded ones) fetch directly."""
        if getattr(t, "is_fully_addressable", True):
            return np.asarray(t)
        from jax.sharding import NamedSharding, PartitionSpec
        return np.asarray(jax.jit(
            lambda x: x,
            out_shardings=NamedSharding(self.mesh, PartitionSpec()))(t))

    def _harvest(self):
        """Fetch the pending chunk's results and record/finish rows.
        The ONE host sync; under pipelined dispatch it overlaps the
        next chunk's device execution."""
        pend, self._pend = self._pend, None
        t0 = time.perf_counter() if self.profile else 0.0
        buf_h = self._fetch(pend["buf"])
        lengths_h = self._fetch(pend["lengths"])
        done_h = self._fetch(pend["done"])
        remaining_h = self._fetch(pend["remaining"])
        tokens_h = self._fetch(pend["tokens"])
        stop_h = np.isin(tokens_h, np.asarray(self._stops))

        if self.profile:
            self.stats["sync_s"] += time.perf_counter() - t0
        for s, rid in enumerate(pend["slot_req"]):
            if rid is None or self._slot_req[s] != rid:
                continue  # freed/refilled since dispatch
            # _lengths_host tracks the depth through the last HARVESTED
            # chunk for this slot, so the delta is exactly this chunk's
            # emissions — buf rows are chunk-local from col 0
            rec = int(lengths_h[s] - self._lengths_host[s])
            self._lengths_host[s] = lengths_h[s]
            self._remaining_host[s] = remaining_h[s]
            if rec:
                self._slot_toks[s].extend(buf_h[s, :rec].tolist())
            if done_h[s] or stop_h[s] or remaining_h[s] <= 0:
                self._finished[rid] = self._slot_toks[s]
                self._slot_req[s] = None
                self._slot_stream[s] = False
                self._slot_toks[s] = []
