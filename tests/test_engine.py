"""Continuous-batching engine vs the one-shot generate paths.

The engine (vlm/engine.py) must produce token-identical output to
``QwenVLGenerator.generate_from_ids`` for every request under
deterministic decoding (greedy, greedy+repetition-penalty), across
slot reuse, staggered budgets, early stop and grouped refills — the
per-request semantics of the reference's per-image ``generate()``
(model_v.py:108-118) with vLLM-style slot scheduling underneath.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vlm_clip_tpu.vlm import qwen_model as QM
from vlm_clip_tpu.vlm import qwen_process as QP
from vlm_clip_tpu.vlm.engine import ContinuousBatchingEngine
from vlm_clip_tpu.vlm.qwen import QwenVLGenerator
from vlm_clip_tpu.vlm.sampling import SamplingConfig

VOCAB = 256
IMG_TOK = 250
VIS_START = 249
EOS = 251


def tiny_cfgs():
    text = QM.QwenTextConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, vocab_size=VOCAB,
        mrope_section=(2, 3, 3), tie_word_embeddings=True)
    vision = QM.QwenVisionConfig(
        hidden_size=32, intermediate_size=64, out_hidden_size=64, depth=3,
        num_heads=4, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=16, fullatt_block_indexes=(1,))
    return QM.QwenVLConfig(text=text, vision=vision,
                           image_token_id=IMG_TOK,
                           vision_start_token_id=VIS_START,
                           eos_token_id=EOS)


@pytest.fixture(scope="module")
def fixture():
    import jax

    cfg = tiny_cfgs()
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    params = {"text": QM.init_text(k1, cfg.text),
              "vision": QM.init_vision(k2, cfg.vision)}
    return cfg, params


def _requests(cfg, n, seed=11):
    """n same-layout requests over distinct synthetic images."""
    vcfg = cfg.vision
    rng = np.random.default_rng(seed)
    in_dim = 3 * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    grid = (1, 8, 8)
    visions = [QP.vision_inputs_from_patches(
        rng.normal(size=(64, in_dim)).astype(np.float32), grid, vcfg)
        for _ in range(n)]
    n_vis = 64 // 4
    ids = np.asarray([1, 2, VIS_START] + [IMG_TOK] * n_vis + [3, 4, 5],
                     np.int64)
    return ids, visions


def test_engine_matches_generate_greedy(fixture):
    """5 requests, 2 slots, staggered budgets: every request's tokens
    equal its one-shot generate_from_ids output; slots are reused."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 5)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)

    budgets = [4, 7, 5, 6, 3]
    want = [gen.generate_from_ids(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]

    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=3,
                                   refill_chunks=(2, 1))
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    got = eng.flush()
    assert sorted(got) == sorted(rids)
    for rid, w in zip(rids, want):
        assert got[rid] == w, (rid, got[rid], w)


def test_engine_early_stop_and_refill(fixture):
    """extra_eos set to a token the greedy chain emits: the engine must
    trim exactly where generate does and refill the freed slot."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 4, seed=23)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)

    probe = gen.generate_from_ids(ids, visions[0], max_new_tokens=8)
    assert len(probe) >= 3
    # stop on a token whose FIRST occurrence is mid-generation
    cut = next(i for i in range(1, len(probe))
               if probe[i] not in probe[:i])
    scfg = SamplingConfig(extra_eos=(probe[cut],))

    want = [gen.generate_from_ids(ids, v, max_new_tokens=8, sampling=scfg)
            for v in visions]
    assert len(want[0]) == cut  # sanity: the stop actually triggers

    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=4,
                                   sampling=scfg, refill_chunks=(2, 1))
    rids = [eng.submit(ids, v, max_new_tokens=8) for v in visions]
    got = eng.flush()
    for rid, w in zip(rids, want):
        assert got[rid] == w, (rid, got[rid], w)


def test_engine_repetition_penalty_parity(fixture):
    """Greedy + repetition penalty is deterministic: the engine's
    presence table (seeded from the prompt ids, reset per refill) must
    reproduce generate_from_ids exactly."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 3, seed=5)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    scfg = SamplingConfig(repetition_penalty=1.3)

    want = [gen.generate_from_ids(ids, v, max_new_tokens=6, sampling=scfg)
            for v in visions]
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                   sampling=scfg, refill_chunks=(1,))
    rids = [eng.submit(ids, v, max_new_tokens=6) for v in visions]
    got = eng.flush()
    for rid, w in zip(rids, want):
        assert got[rid] == w, (rid, got[rid], w)


def test_engine_int8_kv_matches_generate_int8(fixture):
    """Engine on the int8 KV cache: per-row scatter carries the scale
    planes; tokens match the one-shot int8 path exactly (identical
    quantization math, different write indexing)."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 3, seed=31)
    gen8 = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32,
                           kv_bits=8)
    want = [gen8.generate_from_ids(ids, v, max_new_tokens=5)
            for v in visions]
    eng = ContinuousBatchingEngine(gen8, n_slots=2, sync_steps=3,
                                   refill_chunks=(2, 1))
    rids = [eng.submit(ids, v, max_new_tokens=5) for v in visions]
    got = eng.flush()
    for rid, w in zip(rids, want):
        assert got[rid] == w, (rid, got[rid], w)


def test_engine_grouped_refill_batches_prefill(fixture):
    """8 same-layout requests, 4 slots, refill chunk 4: results match
    singles and the grouped install path (one batched vision+prefill
    per chunk) is exercised."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 8, seed=41)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    want = [gen.generate_from_ids(ids, v, max_new_tokens=4)
            for v in visions]
    eng = ContinuousBatchingEngine(gen, n_slots=4, sync_steps=5,
                                   refill_chunks=(4, 2, 1))
    rids = [eng.submit(ids, v, max_new_tokens=4) for v in visions]
    got = eng.flush()
    for rid, w in zip(rids, want):
        assert got[rid] == w, (rid, got[rid], w)


def test_engine_mixed_layout_queue(fixture):
    """Two different prompt layouts in one queue: group keys keep the
    batched refill within a layout; both still finish correctly."""
    cfg, params = fixture
    ids_a, vis_a = _requests(cfg, 2, seed=3)
    ids_b = np.concatenate([ids_a, np.asarray([9, 8, 7], np.int64)])
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    want_a = [gen.generate_from_ids(ids_a, v, max_new_tokens=4)
              for v in vis_a]
    want_b = [gen.generate_from_ids(ids_b, v, max_new_tokens=4)
              for v in vis_a]
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=3,
                                   refill_chunks=(2, 1))
    r = [eng.submit(ids_a, vis_a[0], 4), eng.submit(ids_b, vis_a[0], 4),
         eng.submit(ids_a, vis_a[1], 4), eng.submit(ids_b, vis_a[1], 4)]
    got = eng.flush()
    assert got[r[0]] == want_a[0] and got[r[2]] == want_a[1]
    assert got[r[1]] == want_b[0] and got[r[3]] == want_b[1]


def test_engine_submit_overflow_raises(fixture):
    cfg, params = fixture
    ids, visions = _requests(cfg, 1)
    gen = QwenVLGenerator(params, cfg, max_len=64, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen, n_slots=1)
    with pytest.raises(ValueError, match="max_len"):
        eng.submit(ids, visions[0], max_new_tokens=64)


# ---------------------------------------------------------------------------
# tensor parallelism (round 4): the engine under a ('model',) mesh
# ---------------------------------------------------------------------------

def _tp_mesh(n):
    import jax

    from vlm_clip_tpu.parallel.mesh import MeshConfig, create_mesh
    return create_mesh(MeshConfig(data=1, model=n), jax.devices()[:n])


def test_engine_tp2_matches_single_device(fixture):
    """Engine on a model=2 mesh (weights TP-sharded, slot state
    replicated): token-identical to the unsharded engine across slot
    reuse and staggered budgets — the multi-device serving surface the
    reference gets from device_map='auto' (model_v.py:55)."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 4, seed=31)
    budgets = [5, 3, 6, 4]

    gen_ref = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    ref_eng = ContinuousBatchingEngine(gen_ref, n_slots=2, sync_steps=3,
                                       refill_chunks=(2, 1))
    ref_ids = [ref_eng.submit(ids, v, max_new_tokens=m)
               for v, m in zip(visions, budgets)]
    want = ref_eng.flush()

    gen_tp = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen_tp, n_slots=2, sync_steps=3,
                                   refill_chunks=(2, 1),
                                   mesh=_tp_mesh(2))
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    got = eng.flush()
    for rid, wid in zip(rids, ref_ids):
        assert got[rid] == want[wid], (got[rid], want[wid])


def test_engine_tp2_speculative_sampled(fixture):
    """spec_k + the sampled checkpoint-style config + TP compose: the
    verify forward (T=K+1) and the warper chain run as one GSPMD
    program; outputs stay valid and within budget."""
    cfg, params = fixture
    scfg = SamplingConfig(do_sample=True, temperature=1.1, top_k=8,
                          top_p=0.95, repetition_penalty=1.05)
    ids, visions = _requests(cfg, 2, seed=12)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                   sampling=scfg, spec_k=2,
                                   refill_chunks=(2, 1),
                                   mesh=_tp_mesh(2))
    rids = [eng.submit(ids, v, max_new_tokens=6) for v in visions]
    got = eng.flush()
    for rid in rids:
        assert 0 < len(got[rid]) <= 6
        assert all(0 <= t < VOCAB for t in got[rid])


def test_engine_tp2_nf4_matches_single_device(fixture):
    """NF4 weights under the TP engine (VERDICT r4 #2): shard_params
    places NF4Linear leaves coherently (qweight + absmax_q on the out
    dim where the rule shards it, dq_scale/dq_offset replicated) and
    the fused select-tree matmul partitions under GSPMD —
    token-identical to the same NF4 weights unsharded. The reference
    composes exactly these two features (bitsandbytes NF4 +
    device_map='auto', model_v.py:46-55)."""
    from vlm_clip_tpu.ops.nf4 import NF4Linear
    from vlm_clip_tpu.vlm import qwen_convert as QC

    cfg, params = fixture
    qn = QC.quantize_qwen_params(params, "nf4")
    assert isinstance(qn["text"]["layers"]["mlp"]["gate"], NF4Linear)
    ids, visions = _requests(cfg, 4, seed=33)
    budgets = [5, 3, 6, 4]

    gen_ref = QwenVLGenerator(qn, cfg, max_len=96, dtype=jnp.float32)
    ref_eng = ContinuousBatchingEngine(gen_ref, n_slots=2, sync_steps=3,
                                       refill_chunks=(2, 1))
    ref_ids = [ref_eng.submit(ids, v, max_new_tokens=m)
               for v, m in zip(visions, budgets)]
    want = ref_eng.flush()

    gen_tp = QwenVLGenerator(qn, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen_tp, n_slots=2, sync_steps=3,
                                   refill_chunks=(2, 1),
                                   mesh=_tp_mesh(2))
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    got = eng.flush()
    for rid, wid in zip(rids, ref_ids):
        assert got[rid] == want[wid], (got[rid], want[wid])


def _dp_mesh(data, model=1):
    import jax

    from vlm_clip_tpu.parallel.mesh import MeshConfig, create_mesh
    return create_mesh(MeshConfig(data=data, model=model),
                       jax.devices()[:data * model])


def test_engine_dp2_matches_single_device(fixture):
    """Engine on a data=2 mesh: the SLOT axis of every state array and
    the KV cache shards over 'data' (per-chip KV = n_slots/D slots —
    the 72B-serving lever from BENCH.md's arithmetic), and tokens stay
    identical to the unsharded engine across slot reuse and staggered
    budgets. Decode is per-slot, so the data axis carries zero
    collectives; only install's replicated-group scatter crosses it."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 5, seed=33)
    budgets = [5, 3, 6, 4, 2]

    gen_ref = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    ref_eng = ContinuousBatchingEngine(gen_ref, n_slots=2, sync_steps=3,
                                       refill_chunks=(2, 1))
    ref_ids = [ref_eng.submit(ids, v, max_new_tokens=m)
               for v, m in zip(visions, budgets)]
    want = ref_eng.flush()

    gen_dp = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen_dp, n_slots=2, sync_steps=3,
                                   refill_chunks=(2, 1),
                                   mesh=_dp_mesh(2))
    from vlm_clip_tpu.parallel.mesh import DATA_AXIS
    assert DATA_AXIS in eng.cache.k.sharding.spec  # slots really shard
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    got = eng.flush()
    for rid, wid in zip(rids, ref_ids):
        assert got[rid] == want[wid], (got[rid], want[wid])


def test_engine_dp2_tp2_matches_single_device(fixture):
    """DP×TP composition on a 2×2 mesh: weights shard over 'model'
    (Megatron rules), slots shard over 'data' — one GSPMD program per
    dispatch with TP psums local to each data replica. Token parity vs
    the single-device engine, 6 requests through 4 slots."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 6, seed=34)
    budgets = [5, 3, 6, 4, 2, 5]

    gen_ref = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    ref_eng = ContinuousBatchingEngine(gen_ref, n_slots=4, sync_steps=3,
                                       refill_chunks=(4, 2, 1))
    ref_ids = [ref_eng.submit(ids, v, max_new_tokens=m)
               for v, m in zip(visions, budgets)]
    want = ref_eng.flush()

    gen_dp = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen_dp, n_slots=4, sync_steps=3,
                                   refill_chunks=(4, 2, 1),
                                   mesh=_dp_mesh(2, 2))
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    got = eng.flush()
    for rid, wid in zip(rids, ref_ids):
        assert got[rid] == want[wid], (got[rid], want[wid])


def test_engine_dp_rejects_indivisible_slots(fixture):
    """n_slots must be divisible by the data axis (each replica owns an
    equal slot shard)."""
    cfg, params = fixture
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    with pytest.raises(ValueError, match="data axis"):
        ContinuousBatchingEngine(gen, n_slots=3, mesh=_dp_mesh(2))


def test_engine_dp2_speculative_sampled(fixture):
    """spec_k + sampled config + slot-sharded state compose: hist /
    gen_count / presence shard over 'data' alongside the KV cache."""
    cfg, params = fixture
    scfg = SamplingConfig(do_sample=True, temperature=1.1, top_k=8,
                          top_p=0.95, repetition_penalty=1.05)
    ids, visions = _requests(cfg, 2, seed=13)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                   sampling=scfg, spec_k=2,
                                   refill_chunks=(2, 1),
                                   mesh=_dp_mesh(2))
    rids = [eng.submit(ids, v, max_new_tokens=6) for v in visions]
    got = eng.flush()
    for rid in rids:
        assert 0 < len(got[rid]) <= 6
        assert all(0 <= t < VOCAB for t in got[rid])


def test_lm_head_tp_rules():
    """The untied lm head must shard on the vocab dim (fp and
    quantized), the tied embedding stays replicated."""
    import jax
    from jax.sharding import PartitionSpec as P

    from vlm_clip_tpu.ops.quant import quantize_weight
    from vlm_clip_tpu.parallel.sharding import (partition_specs,
                                                qwen_param_rules)

    head = np.asarray(
        jax.random.normal(jax.random.PRNGKey(0), (64, 256)), np.float32)
    tree = {"text": {"lm_head": quantize_weight(jnp.asarray(head), 8),
                     "embed_tokens": jnp.zeros((256, 64))}}
    specs = partition_specs(tree, rules=qwen_param_rules())
    assert specs["text"]["lm_head"].qweight == P(None, "model")
    assert specs["text"]["lm_head"].scale == P("model")
    assert specs["text"]["embed_tokens"] == P()


def test_engine_pipelined_matches_unpipelined(fixture):
    """Pipelined dispatch (chunk N dispatched before chunk N-1's
    harvest) must not change any request's tokens — only scheduling.
    Covers refill-during-flight (5 requests through 2 slots) and the
    tail drain."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 5, seed=41)
    budgets = [4, 7, 5, 6, 3]
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)

    outs = {}
    for pipe in (False, True):
        eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=3,
                                       refill_chunks=(2, 1),
                                       pipeline=pipe)
        rids = [eng.submit(ids, v, max_new_tokens=m)
                for v, m in zip(visions, budgets)]
        got = eng.flush()
        assert sorted(got) == sorted(rids)
        outs[pipe] = [got[r] for r in rids]
    assert outs[True] == outs[False]


def test_engine_pipelined_speculative(fixture):
    """Pipelined dispatch composes with spec_k (greedy): tokens equal
    the one-shot generate output."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 3, seed=2)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    want = [gen.generate_from_ids(ids, v, max_new_tokens=6)
            for v in visions]
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                   spec_k=3, refill_chunks=(2, 1),
                                   pipeline=True)
    rids = [eng.submit(ids, v, max_new_tokens=6) for v in visions]
    got = eng.flush()
    for rid, w in zip(rids, want):
        assert got[rid] == w

def test_engine_adaptive_chunks_match_fixed(fixture):
    """Adaptive chunk lengths (remaining-budget-driven, dynamic trip
    count) must not change any request's tokens — only scheduling —
    while dispatching fewer chunks (= host syncs) than the fixed
    sync_steps loop on a staggered-budget load."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 5, seed=17)
    budgets = [4, 12, 5, 9, 3]
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)

    outs, chunks = {}, {}
    for adaptive in (False, True):
        eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                       refill_chunks=(2, 1),
                                       adaptive=adaptive, chunk_max=16)
        rids = [eng.submit(ids, v, max_new_tokens=m)
                for v, m in zip(visions, budgets)]
        got = eng.flush()
        assert sorted(got) == sorted(rids)
        outs[adaptive] = [got[r] for r in rids]
        chunks[adaptive] = eng.stats["chunks"]
    assert outs[True] == outs[False]
    assert chunks[True] < chunks[False], chunks


def test_engine_adaptive_speculative(fixture):
    """Adaptive chunking composes with spec_k (greedy): tokens equal
    the one-shot generate output across refills."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 3, seed=31)
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    want = [gen.generate_from_ids(ids, v, max_new_tokens=7)
            for v in visions]
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                   spec_k=2, refill_chunks=(2, 1),
                                   adaptive=True, chunk_max=8)
    rids = [eng.submit(ids, v, max_new_tokens=7) for v in visions]
    got = eng.flush()
    for rid, w in zip(rids, want):
        assert got[rid] == w


def test_engine_progress_streaming_visibility(fixture):
    """progress() exposes per-live-request harvested token counts (the
    TTFT probe of the streaming-arrival bench, cli/bench_engine.py
    --arrivals): counts are monotone per request, never exceed the final
    output, and finished requests drop out of the map."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 4, seed=57)
    budgets = [6, 3, 7, 4]
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                   refill_chunks=(2, 1))
    assert eng.progress() == {}  # nothing installed
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    last = {}
    saw_partial = False
    finished = {}
    while eng.pending:
        finished.update(eng.poll())
        prog = eng.progress()
        for rid, cnt in prog.items():
            assert rid in rids and rid not in finished
            assert cnt >= last.get(rid, 0)  # monotone
            last[rid] = cnt
            saw_partial |= 0 < cnt < budgets[rids.index(rid)]
    assert eng.progress() == {}  # drained
    assert sorted(finished) == sorted(rids)
    assert saw_partial  # sync_steps < budget => mid-flight visibility
    for rid, cnt in last.items():
        assert cnt <= len(finished[rid])


def test_engine_stream_flag_composes_with_spec(fixture):
    """stream=True only touches scheduling (chunk-length cap at
    sync_steps): tokens must be identical with and without it, both
    vanilla and under spec_k, across refills."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 4, seed=63)
    budgets = [6, 8, 5, 7]
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    for spec_k in (0, 2):
        outs = {}
        for stream in (False, True):
            eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                           refill_chunks=(2, 1),
                                           spec_k=spec_k)
            rids = [eng.submit(ids, v, max_new_tokens=m, stream=stream)
                    for v, m in zip(visions, budgets)]
            got = eng.flush()
            outs[stream] = [got[r] for r in rids]
        assert outs[True] == outs[False], spec_k


def test_engine_cancel_queued_and_live(fixture):
    """cancel(): a queued request is dropped before install; a live
    request frees its slot (refilled by the next queued request) and is
    never reported by poll(); surviving requests keep exact one-shot
    parity."""
    cfg, params = fixture
    ids, visions = _requests(cfg, 5, seed=71)
    budgets = [9, 9, 6, 5, 4]
    gen = QwenVLGenerator(params, cfg, max_len=96, dtype=jnp.float32)
    want = [gen.generate_from_ids(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]

    eng = ContinuousBatchingEngine(gen, n_slots=2, sync_steps=2,
                                   refill_chunks=(2, 1))
    rids = [eng.submit(ids, v, max_new_tokens=m)
            for v, m in zip(visions, budgets)]
    # rids[4] is still queued: cancelled before it ever installs
    assert eng.cancel(rids[4])
    got = eng.poll()          # first chunk: rids[0], rids[1] live
    assert not got
    assert eng.cancel(rids[1])     # live cancel frees slot 1
    assert not eng.cancel(rids[1])  # idempotent: already gone
    out = dict(got)
    out.update(eng.flush())
    assert rids[1] not in out and rids[4] not in out
    for i in (0, 2, 3):
        assert out[rids[i]] == want[i], i
