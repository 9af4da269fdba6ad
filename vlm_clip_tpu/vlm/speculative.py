"""N-gram (prompt-lookup) speculative decoding primitives.

TPU decode at serving batch sizes is weight-streaming-bound: one
forward over T=K+1 positions per row streams the same ~3 GB of
quantized weights as T=1, so every draft token the model agrees with
is nearly free throughput. The draft source is the cheapest one that
needs no second model: the row's prompt + its OWN generated text as
one concatenated window — the most recent previous occurrence of the
row's trailing n-gram anywhere in that window, continued for K tokens
(vLLM's "prompt lookup"/ngram speculator; the engine seeds the window
with the prompt at install, so re-description/OCR-style loads draft
from prompt phrases before the output ever repeats itself).
Descriptive VLM context generations (the reference's workload,
model_v.py:108-118) reuse phrases often enough for this to pay; when
it doesn't match, the fallback draft repeats the last token, and a
wrong draft costs only the already-amortized verify positions.

Exactness, both decode modes (`verify_round`):

- GREEDY: acceptance keeps a draft token iff it equals the model's own
  greedy choice given the accepted prefix, so the emitted stream is
  TOKEN-IDENTICAL to vanilla greedy decode (tests/test_speculative.py
  proves it against the engine and the one-shot loop).
- SAMPLED: the n-gram draft is a POINT MASS q = delta(d), so standard
  speculative sampling (Leviathan et al.) degenerates to: accept d
  with probability p(d); on rejection sample from the residual
  norm(p - min(p, q)) = p with d's mass removed. Emitted marginal:
  P[emit y] = p(d)*[y==d] + (1-p(d)) * p(y)*[y!=d]/(1-p(d)) = p(y) —
  exactly the vanilla sampling distribution, position by position
  (induction over the accepted prefix gives chain-level equality).
  ``p`` here is the FULL HF-warped distribution (repetition penalty
  with presence evolved over the in-block emitted tokens, temperature,
  top-k, top-p) — so the checkpoint's own sampled generation config
  (reference model_v.py:108-118 via generation_config.json) runs with
  speculation enabled. Monte-Carlo distribution-equality is pinned by
  tests/test_speculative.py::test_verify_round_sampled_marginal_*.

Everything here is fixed-shape and in-graph (no host round trips):
the lookup is a [B, H, n] window compare + argmax, the acceptance a
prefix-product — both trivially small next to one decoder step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sampling import NEG_INF, SamplingConfig, warp_logits


def ngram_draft(hist: jnp.ndarray, gen_count: jnp.ndarray, k: int,
                n: int = 2) -> jnp.ndarray:
    """Per-row K-token draft from the row's token window.

    hist [B, H] int32 — the row's window (the engine seeds it with the
    prompt, then appends generated tokens), row b valid at cols
    ``< gen_count[b]`` (cols beyond hold stale garbage; they are never
    selected as a match and only enter a draft via the overlap tail,
    where acceptance filters them).
    gen_count [B] int32 — valid tokens in the window (incl. the one
    the trailing n-gram ends on).

    Returns draft [B, k] int32. Strategy: find the LATEST j such that
    ``hist[j:j+n] == hist[g-n:g]`` with the window ending strictly
    before the trailing n-gram (j + n < g), and propose
    ``hist[j+n : j+n+k]``. No match (or fewer than n+1 tokens yet):
    repeat the last token (catches digit runs / "..." degenerations).
    Draft positions that would read at or beyond g fall back to the
    last token as well.
    """
    B, H = hist.shape
    pos = jnp.arange(H)
    g = gen_count[:, None]                                   # [B, 1]

    # trailing n-gram per row: hist[g-n : g]
    tidx = jnp.clip(g - n + jnp.arange(n)[None], 0, H - 1)   # [B, n]
    tail = jnp.take_along_axis(hist, tidx, axis=1)           # [B, n]

    widx = pos[:, None] + jnp.arange(n)[None]                # [H, n]
    win = hist[:, jnp.clip(widx, 0, H - 1)]                  # [B, H, n]
    match = (win == tail[:, None, :]).all(-1)                # [B, H]
    # window must end strictly before the trailing n-gram ends
    match = match & ((pos[None] + n) < g)
    found = match.any(-1)
    best = jnp.argmax(match * (pos[None] + 1), axis=-1)      # latest j

    didx = best[:, None] + n + jnp.arange(k)[None]           # [B, k]
    draft = jnp.take_along_axis(hist, jnp.clip(didx, 0, H - 1), axis=1)

    last = jnp.take_along_axis(hist, jnp.clip(g - 1, 0, H - 1), axis=1)
    usable = found[:, None] & (g >= n) & (didx < g)
    return jnp.where(usable, draft, last)


def accept_greedy(draft: jnp.ndarray, preds: jnp.ndarray,
                  stops) -> jnp.ndarray:
    """Longest accepted prefix under greedy verification.

    draft [B, K]; preds [B, K+1] where ``preds[:, i]`` is the model's
    greedy token after consuming (x0, draft[:, :i]). Returns a [B]
    int32 in [0, K]: ``draft[:, :a]`` is token-identical to what
    vanilla greedy would have produced (``preds[:, i] == draft[:, i]``
    for i < a), and ``preds[:, a]`` is the model's correction /
    continuation. A stop token anywhere in the accepted prefix caps it
    THERE (the stop becomes the correction slot's carried token via
    ``preds[:, a]`` — callers re-check stops before recording).
    """
    K = draft.shape[1]
    ok = draft == preds[:, :K]                               # [B, K]
    a = jnp.cumprod(ok.astype(jnp.int32), axis=1).sum(axis=1)
    # cap the acceptance at the first emitted stop: emitting past a
    # stop would record tokens vanilla greedy never produces
    hit = jnp.zeros(draft.shape, bool)
    for e in stops:
        hit = hit | (preds[:, :K] == jnp.int32(e))
    first_stop = jnp.argmax(hit, axis=1)
    any_stop = hit.any(axis=1)
    return jnp.where(any_stop, jnp.minimum(a, first_stop), a)


def verify_round(draft, logits, x0, presence, key,
                 scfg: SamplingConfig, stops):
    """One lossless verification round, greedy OR sampled.

    draft [B, K] point-mass proposals; logits [B, K+1, V] fp32 raw model
    logits, position i = the distribution after consuming
    ``(x0, draft[:, :i])``; x0 [B] the carried token recorded this round
    (it enters the presence set before position 0's distribution,
    matching the vanilla record-then-sample order, engine.py
    `_engine_steps`); presence [B, V] (or [B, 1] when the config doesn't
    need it) NOT yet including x0; key consumed only when sampling.

    Returns ``(a [B] int32, cand [B, K+1] int32)``: the chain emits
    ``draft[:, :m]`` (m = a, possibly budget-capped by the caller) and
    carries ``cand[:, m]`` into the next round, where

    - ``a`` = accepted-prefix length, already capped at the first
      accepted stop token (the stop carries, it is never emitted);
    - ``cand[:, j]`` for j < K = the carried token if the chain ends at
      j: the model's correction where position j rejected (greedy:
      its argmax; sampled: a residual sample from p_j with draft_j's
      mass removed), or draft_j where it accepted (the stop-cap /
      budget-cap carry);
    - ``cand[:, K]`` = the continuation after a full accept (greedy:
      argmax; sampled: a plain sample from p_K).

    Greedy reduces exactly to `accept_greedy` + ``preds`` gathering
    (rejected => argmax != draft, accepted => argmax == draft).
    """
    B, K = draft.shape
    bidx = jnp.arange(B)

    if not scfg.needs_presence and not scfg.do_sample:
        # pure-greedy fast path: one argmax, no warping
        preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return accept_greedy(draft, preds, stops), preds

    if scfg.needs_presence:
        # evolve the repetition-penalty presence over the block: the
        # distribution at position i is conditioned on having emitted
        # x0 and draft[:, :i]
        pres = presence.at[bidx, x0].set(True)
        warps = []
        for i in range(K + 1):
            warps.append(warp_logits(logits[:, i], pres, scfg))
            if i < K:
                pres = pres.at[bidx, draft[:, i]].set(True)
        warped = jnp.stack(warps, axis=1)                # [B, K+1, V]
    else:
        warped = warp_logits(logits, presence[:, :, None], scfg)

    if not scfg.do_sample:
        preds = jnp.argmax(warped, axis=-1).astype(jnp.int32)
        return accept_greedy(draft, preds, stops), preds

    key_u, key_r = jax.random.split(key)
    probs = jax.nn.softmax(warped[:, :K], axis=-1)
    pd = jnp.take_along_axis(probs, draft[..., None],
                             axis=-1)[..., 0]            # [B, K] p_i(d_i)
    u = jax.random.uniform(key_u, (B, K))
    acc = u < pd    # accept w.p. p(d): q is a point mass, min(1, p/q)=p
    a = jnp.cumprod(acc.astype(jnp.int32), axis=1).sum(axis=1)
    # stop cap: an ACCEPTED stop ends the chain there and carries
    hit = jnp.zeros((B, K), bool)
    for e in stops:
        hit = hit | (draft == jnp.int32(e))
    first_stop = jnp.argmax(hit, axis=1)
    a = jnp.where(hit.any(axis=1), jnp.minimum(a, first_stop), a)

    # residual sampling: p with the draft's mass removed (renormalized
    # by the categorical itself); a fully-masked row (p(d)=1) can only
    # be selected with probability 0, any index it returns is unused
    res = warped[:, :K].at[bidx[:, None], jnp.arange(K)[None],
                           draft].set(NEG_INF)
    cand_logits = jnp.concatenate([res, warped[:, K:]], axis=1)
    cand = jax.random.categorical(key_r, cand_logits,
                                  axis=-1).astype(jnp.int32)
    cand = jnp.concatenate(
        [jnp.where(acc, draft, cand[:, :K]), cand[:, K:]], axis=1)
    return a, cand
