"""N-gram speculative decoding: greedy-exactness and lookup units.

The whole correctness story of vlm/speculative.py is that the engine
with ``spec_k > 0`` emits TOKEN-IDENTICAL streams to vanilla greedy
decode — the drafts only change how many forwards it takes, never the
tokens. These tests prove that against both the vanilla engine and the
one-shot ``generate_from_ids`` across refills, early stops, budget
clipping and the int8 KV cache, plus unit-test the in-graph lookup and
acceptance primitives.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vlm_clip_tpu.vlm import qwen_model as QM
from vlm_clip_tpu.vlm.engine import ContinuousBatchingEngine
from vlm_clip_tpu.vlm.qwen import QwenVLGenerator
from vlm_clip_tpu.vlm.sampling import SamplingConfig
from vlm_clip_tpu.vlm.speculative import accept_greedy, ngram_draft

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


def test_spec_requires_deterministic_sampling(fixture):
    cfg, params = fixture
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    with pytest.raises(ValueError, match="deterministic"):
        ContinuousBatchingEngine(
            gen, n_slots=2, spec_k=4,
            sampling=SamplingConfig(do_sample=True, temperature=0.7))
    with pytest.raises(ValueError, match="deterministic"):
        ContinuousBatchingEngine(
            gen, n_slots=2, spec_k=4,
            sampling=SamplingConfig(repetition_penalty=1.05))
