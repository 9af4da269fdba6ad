"""N-gram (prompt-lookup) speculative decoding primitives.

TPU decode at serving batch sizes is weight-streaming-bound: one
forward over T=K+1 positions per row streams the same ~3 GB of
quantized weights as T=1, so every draft token the model agrees with
is nearly free throughput. The draft source is the cheapest one that
needs no second model: the row's OWN generated text — the most recent
previous occurrence of the row's trailing n-gram, continued for K
tokens (vLLM's "prompt lookup"/ngram speculator). Descriptive VLM
context generations (the reference's workload, model_v.py:108-118)
repeat phrases ("the person's expression ...") often enough for this
to pay; when it doesn't match, the fallback draft repeats the last
token, and a wrong draft costs only the already-amortized verify
positions.

Greedy-exactness: acceptance keeps a draft token iff it equals the
model's own greedy choice given the accepted prefix, so the emitted
stream is TOKEN-IDENTICAL to vanilla greedy decode (tests/
test_speculative.py proves it against the engine and the one-shot
loop). Sampled configs are not supported — proper lossless
speculative sampling needs rejection sampling against the draft
distribution; out of scope while the n-gram draft has no distribution.

Everything here is fixed-shape and in-graph (no host round trips):
the lookup is a [B, H, n] window compare + argmax, the acceptance a
prefix-product — both trivially small next to one decoder step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ngram_draft(hist: jnp.ndarray, gen_count: jnp.ndarray, k: int,
                n: int = 2) -> jnp.ndarray:
    """Per-row K-token draft from the row's own generated history.

    hist [B, H] int32 — generated tokens, row b valid at cols
    ``< gen_count[b]`` (cols beyond hold stale garbage; they are never
    selected as a match and only enter a draft via the overlap tail,
    where acceptance filters them).
    gen_count [B] int32 — tokens generated so far (incl. the one the
    trailing n-gram ends on).

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
