"""N-gram speculative decoding: losslessness and lookup units.

The whole correctness story of vlm/speculative.py is that the engine
with ``spec_k > 0`` is LOSSLESS — token-identical to vanilla greedy
decode (with or without the repetition penalty), and distribution-
identical to vanilla sampling under the full HF warper chain. The
drafts only change how many forwards it takes, never the output law.
These tests prove greedy parity against both the vanilla engine and
the one-shot ``generate_from_ids`` across refills, early stops, budget
clipping and the int8 KV cache; pin sampled exactness by Monte-Carlo
on `verify_round`; and unit-test the in-graph lookup/acceptance
primitives.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vlm_clip_tpu.vlm import qwen_model as QM
from vlm_clip_tpu.vlm.engine import ContinuousBatchingEngine
from vlm_clip_tpu.vlm.qwen import QwenVLGenerator
from vlm_clip_tpu.vlm.sampling import SamplingConfig, warp_logits
from vlm_clip_tpu.vlm.speculative import (accept_greedy, ngram_draft,
                                          verify_round)

from test_engine import VOCAB, EOS, _requests, fixture, tiny_cfgs  # noqa: F401


# ---------------------------------------------------------------------------
# units
# ---------------------------------------------------------------------------

def test_ngram_draft_finds_latest_repeat():
    #        0   1   2   3   4   5   6   7
    hist = [[10, 11, 12, 13, 10, 11, 20, 0],    # ..10,11 again at j=4
            [7,  7,  7,  7,  7,  7,  7,  7]]    # degenerate run
    hist = jnp.asarray(np.pad(np.asarray(hist), ((0, 0), (0, 8))))
    g = jnp.asarray([6, 4])
    d = np.asarray(ngram_draft(hist, g, k=3, n=2))
    # row 0: trailing 2-gram = (10, 11) at 4..5; latest earlier match is
    # j=0 (j=4 is the trailing occurrence itself) -> draft = hist[2:5]
    assert d[0].tolist() == [12, 13, 10]
    # row 1: trailing (7,7) matches j=1 latest (ends at 2 < g-? ...)
    # any j works; the continuation is all 7s either way
    assert d[1].tolist() == [7, 7, 7]


def test_ngram_draft_fallback_repeats_last():
    hist = jnp.asarray(np.arange(32, dtype=np.int32)[None].repeat(2, 0))
    g = jnp.asarray([8, 1])
    d = np.asarray(ngram_draft(hist, g, k=4, n=2))
    # row 0: strictly increasing -> no repeat -> repeat last token (7)
    assert d[0].tolist() == [7, 7, 7, 7]
    # row 1: not even n+1 tokens -> last token (0)
    assert d[1].tolist() == [0, 0, 0, 0]


def test_ngram_draft_does_not_read_past_gen_count():
    # the repeat continuation runs past g: tokens at >= g must not leak
    hist = np.zeros((1, 16), np.int32)
    hist[0, :6] = [5, 6, 9, 5, 6, 9]
    hist[0, 6:] = 99                     # garbage beyond g
    d = np.asarray(ngram_draft(jnp.asarray(hist), jnp.asarray([6]),
                               k=4, n=2))
    # trailing (6,9) matches j=1 -> draft = hist[3:7] but col 6 >= g
    assert d[0].tolist() == [5, 6, 9, 9]  # 99 replaced by last token 9


def test_accept_greedy_prefix_and_stop_cap():
    draft = jnp.asarray([[4, 5, 6, 7],
                         [4, 5, 6, 7],
                         [4, 9, 6, 7]])
    preds = jnp.asarray([[4, 5, 6, 7, 8],     # all accepted
                         [4, EOS, 6, 7, 8],   # stop at 1 caps there
                         [4, 5, 6, 7, 8]])    # mismatch at 1
    a = np.asarray(accept_greedy(draft, preds, (EOS,)))
    assert a.tolist() == [4, 1, 1]


# ---------------------------------------------------------------------------
# greedy exactness end to end
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("spec_k", [2, 4])
def test_spec_engine_matches_vanilla(fixture, spec_k):
    """Staggered budgets through 2 slots with refills: spec_k engine ==
    one-shot greedy for every request."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 5)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    budgets = [4, 9, 5, 8, 3]
    want = [gen.generate_from_ids(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]

    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=3,
                                   spec_k=spec_k, refill_chunks=(2, 1))
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    got = eng.flush()
    for rid, w in zip(rids, want):
        assert got[rid] == w, (rid, got[rid], w)


def test_spec_engine_int8_kv_matches_vanilla_int8(fixture):
    cfg, params = fixture
    ids, visions = _requests(cfg, 3, seed=5)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32,
                          kv_bits=8)
    budgets = [6, 4, 7]
    want = [gen.generate_from_ids(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                   spec_k=3, refill_chunks=(2, 1))
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    got = eng.flush()
    for rid, w in zip(rids, want):
        assert got[rid] == w


def test_spec_engine_budget_exact(fixture):
    """A tight budget must clip mid-acceptance: exactly max_new tokens
    (or fewer on eos), matching the vanilla engine."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 2, seed=3)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    for m in (1, 2, 5):
        want = [gen.generate_from_ids(ids, v, max_new_tokens=m)
                for v in visions]
        eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=4,
                                       spec_k=4, refill_chunks=(2, 1))
        rids = [eng.submit(ids, v, max_new_tokens=m) for v in visions]
        got = eng.flush()
        for rid, w in zip(rids, want):
            assert got[rid] == w
            assert len(got[rid]) <= m


# ---------------------------------------------------------------------------
# lossless speculative SAMPLING (round 4): verify_round
# ---------------------------------------------------------------------------

def _mc_marginal(scfg, draft_tok, key_seed=0, rows=20000, V=8):
    """Monte-Carlo marginal of the FIRST emitted token under
    verify_round: rows parallel trials share one logits row and one
    draft; emitted_0 = draft_0 if accepted else cand_0 (the residual
    sample). Returns (empirical [V], target p_0 [V])."""
    import jax

    K = 2
    rng = np.random.default_rng(3)
    row = jnp.asarray(rng.normal(size=(K + 1, V)) * 2.0, jnp.float32)
    logits = jnp.broadcast_to(row, (rows, K + 1, V))
    draft = jnp.broadcast_to(
        jnp.asarray(draft_tok, jnp.int32)[None], (rows, K))
    x0 = jnp.zeros((rows,), jnp.int32)
    presence = jnp.zeros((rows, V if scfg.needs_presence else 1), bool)
    a, cand = verify_round(draft, logits, x0, presence,
                           jax.random.PRNGKey(key_seed), scfg,
                           stops=(V + 5,))
    emitted0 = np.where(np.asarray(a) >= 1, draft_tok[0],
                        np.asarray(cand[:, 0]))
    emp = np.bincount(emitted0, minlength=V) / rows
    pres0 = presence.at[jnp.arange(rows), x0].set(True) \
        if scfg.needs_presence else presence
    target = np.asarray(jax.nn.softmax(
        warp_logits(logits[:1, 0], pres0[:1], scfg), axis=-1))[0]
    return emp, target


def test_verify_round_sampled_marginal_plain():
    """Emitted-token marginal == softmax(logits/T): the accept-w.p.-
    p(draft) + residual-resample mechanism is exact (20k trials)."""
    scfg = SamplingConfig(do_sample=True, temperature=0.8)
    emp, target = _mc_marginal(scfg, draft_tok=[3, 1])
    np.testing.assert_allclose(emp, target, atol=0.015)


def test_verify_round_sampled_marginal_warped():
    """Same with the full HF warper chain active (top-k, top-p,
    repetition penalty with x0 in the presence set)."""
    scfg = SamplingConfig(do_sample=True, temperature=1.3, top_k=5,
                          top_p=0.9, repetition_penalty=1.25)
    emp, target = _mc_marginal(scfg, draft_tok=[2, 4], key_seed=7)
    np.testing.assert_allclose(emp, target, atol=0.015)
    # a top-k/top-p-masked draft must never be accepted
    masked = int(np.argsort(target)[0])
    if target[masked] == 0.0:
        emp2, t2 = _mc_marginal(scfg, draft_tok=[masked, 1], key_seed=9)
        assert emp2[masked] == 0.0 and t2[masked] == 0.0


def test_verify_round_greedy_matches_accept_greedy():
    """The greedy route of verify_round == accept_greedy + preds,
    with and without the repetition penalty."""
    import jax

    rng = np.random.default_rng(5)
    B, K, V = 16, 3, 11
    logits = jnp.asarray(rng.normal(size=(B, K + 1, V)), jnp.float32)
    draft = jnp.asarray(rng.integers(0, V, (B, K)), jnp.int32)
    x0 = jnp.asarray(rng.integers(0, V, (B,)), jnp.int32)
    stops = (V - 1,)
    for scfg in (SamplingConfig(),
                 SamplingConfig(repetition_penalty=1.4)):
        presence = jnp.zeros((B, V if scfg.needs_presence else 1), bool)
        a, cand = verify_round(draft, logits, x0, presence,
                               jax.random.PRNGKey(0), scfg, stops)
        if scfg.needs_presence:
            pres = presence.at[jnp.arange(B), x0].set(True)
            preds = []
            for i in range(K + 1):
                preds.append(jnp.argmax(
                    warp_logits(logits[:, i], pres, scfg), -1))
                if i < K:
                    pres = pres.at[jnp.arange(B), draft[:, i]].set(True)
            preds = jnp.stack(preds, 1).astype(jnp.int32)
        else:
            preds = jnp.argmax(logits, -1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(cand), np.asarray(preds))
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(accept_greedy(draft, preds, stops)))


def test_spec_engine_penalty_greedy_matches_vanilla(fixture):
    """Greedy + repetition penalty (the checkpoint's processor) with
    spec_k: token-identical to the vanilla engine — the presence set
    must evolve across the verify block exactly as step-by-step."""
    cfg, params = fixture
    scfg = SamplingConfig(repetition_penalty=1.3)
    ids, visions = _requests(cfg, 3, seed=8)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    want_eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=3,
                                        sampling=scfg,
                                        refill_chunks=(2, 1))
    want_ids = [want_eng.submit(ids, v, max_new_tokens=14)
                for v in visions]
    want = want_eng.flush()
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=3,
                                   sampling=scfg, spec_k=3,
                                   refill_chunks=(2, 1))
    rids = [eng.submit(ids, v, max_new_tokens=14) for v in visions]
    got = eng.flush()
    for rid, wid in zip(rids, want_ids):
        assert got[rid] == want[wid]


def test_spec_engine_sampled_checkpoint_config(fixture):
    """The checkpoint-default-style SAMPLED config (do_sample +
    temperature + top-k/p + repetition penalty) runs with spec_k > 0 —
    the round-3 refusal is gone — and respects budgets/stops; plus a
    frequency check: the first emitted token's empirical distribution
    matches the vanilla engine's across seeds."""
    cfg, params = fixture
    scfg = SamplingConfig(do_sample=True, temperature=1.2, top_k=6,
                          top_p=0.95, repetition_penalty=1.05)
    ids, visions = _requests(cfg, 1, seed=4)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)

    firsts = {True: [], False: []}
    for spec in (False, True):
        for seed in range(60):
            eng = ContinuousBatchingEngine(
                gen, n_slots=1, sync_steps=2, sampling=scfg, seed=seed,
                spec_k=2 if spec else 0)
            rid = eng.submit(ids, visions[0], max_new_tokens=4)
            out = eng.flush()[rid]
            assert len(out) <= 4
            assert all(0 <= t < VOCAB for t in out)
            if out:
                firsts[spec].append(out[0])
    f_v = np.bincount(firsts[False], minlength=VOCAB) / len(firsts[False])
    f_s = np.bincount(firsts[True], minlength=VOCAB) / len(firsts[True])
    # 60 seeds each: loose total-variation bound, deterministic given
    # the fixed seeds (catches gross distribution skew, not 1% biases —
    # exactness is pinned by the Monte-Carlo verify_round tests above)
    assert 0.5 * np.abs(f_v - f_s).sum() < 0.30, (f_v, f_s)


def test_spec_engine_seeds_hist_with_prompt(fixture):
    """Install seeds each slot's n-gram window with the PROMPT tokens
    (prompt lookup proper, VERDICT r4 #7): gen_count starts at the
    prompt length and hist[:T] holds the prompt ids, so the first
    drafts can continue prompt phrases."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 2, seed=41)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                   spec_k=2, refill_chunks=(2, 1))
    for v in visions:
        eng.submit(ids, v, max_new_tokens=4)
    eng._refill()           # install without decoding
    T = len(ids)
    gc = np.asarray(eng.gen_count)
    assert (gc[:2] == T).all(), gc
    h = np.asarray(eng.hist)
    for s in range(2):
        assert h[s, :T].tolist() == list(ids), s


def test_spec_engine_prompt_lookup_matches_vanilla(fixture):
    """A prompt whose tail n-gram repeats inside the prompt produces
    prompt-sourced drafts; the output must STILL be token-identical to
    the vanilla engine (losslessness is draft-source-independent)."""
    cfg, params = fixture
    _, visions = _requests(cfg, 3, seed=42)
    n_vis = 16
    # trailing text repeats an earlier prompt phrase => prompt match
    ids = np.asarray([1, 2, 249] + [250] * n_vis
                     + [5, 6, 7, 8, 9, 5, 6, 7], np.int64)
    gen_v = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    ref = ContinuousBatchingEngine(gen_v, n_slots=2, sync_steps=3,
                                   refill_chunks=(2, 1))
    rv = [ref.submit(ids, v, max_new_tokens=6) for v in visions]
    want = ref.flush()

    gen_s = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen_s, n_slots=2, sync_steps=3,
                                   spec_k=3, refill_chunks=(2, 1))
    rs = [eng.submit(ids, v, max_new_tokens=6) for v in visions]
    got = eng.flush()
    for a, b in zip(rs, rv):
        assert got[a] == want[b], (got[a], want[b])
