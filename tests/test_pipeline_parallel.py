"""Pipeline parallelism (parallel/pipeline.py) vs single-device decode.

Runs on the 8-device virtual CPU mesh (tests/conftest.py). The oracle is
an uncached full-forward greedy rollout per sequence — the same oracle
that guards the single-device KV-cache loop (test_qwen.py), so agreement
here proves the stage-sharded prefill, the stage-local KV caches, AND the
token ring all compose to the exact single-device semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import vlm_clip_tpu.vlm.qwen_model as QM
from vlm_clip_tpu.parallel.pipeline import (PipelineGenerator,
                                            create_pipe_mesh, split_stages)
from vlm_clip_tpu.vlm.sampling import SamplingConfig

EOS = 7  # arbitrary small id so random logits can plausibly emit it


def tiny_text_cfg(num_layers=4):
    return QM.QwenTextConfig(
        hidden_size=32, intermediate_size=64, num_layers=num_layers,
        num_heads=4, num_kv_heads=2, head_dim=8, vocab_size=97,
        rope_theta=10_000.0, mrope_section=(2, 1, 1),
        tie_word_embeddings=True)


def greedy_oracle(params, cfg, ids_row, max_new, eos):
    """Uncached growing-sequence greedy rollout with the decode_loop's
    buf/n_out semantics (eos excluded, generation stops at eos)."""
    embeds = params["embed_tokens"][jnp.asarray(ids_row)][None]
    T0 = embeds.shape[1]
    pos = jnp.broadcast_to(jnp.arange(T0)[None, None], (3, 1, T0))
    out = []
    for step in range(max_new):
        T = embeds.shape[1]
        mask = jnp.where(jnp.tril(jnp.ones((T, T), bool))[None, None],
                         0.0, -3.4028235e38)
        logits, _ = QM.text_forward(params, embeds, pos, cfg, mask)
        tok = int(np.asarray(logits[0, -1]).argmax())
        if tok == eos:
            break
        out.append(tok)
        new_emb = params["embed_tokens"][tok][None, None]
        embeds = jnp.concatenate(
            [embeds, new_emb.astype(embeds.dtype)], axis=1)
        pos = jnp.concatenate(
            [pos, jnp.full((3, 1, 1), T0 + step, pos.dtype)], axis=2)
    return out


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_text_cfg()
    params = QM.init_text(jax.random.PRNGKey(3), cfg)
    mesh = create_pipe_mesh(4)
    gen = PipelineGenerator.from_params(params, cfg, mesh, EOS,
                                        max_len=64, dtype=jnp.float32)
    return cfg, params, gen


def test_split_stages_shapes():
    cfg = tiny_text_cfg(num_layers=4)
    params = QM.init_text(jax.random.PRNGKey(0), cfg)
    staged = split_stages(params, 2)
    q = staged["layers"]["attn"]["q"]["kernel"]
    assert q.shape[:2] == (2, 2)
    np.testing.assert_array_equal(
        np.asarray(q).reshape(4, *q.shape[2:]),
        np.asarray(params["layers"]["attn"]["q"]["kernel"]))
    with pytest.raises(ValueError):
        split_stages(params, 3)


def test_pipelined_greedy_matches_oracle(setup):
    """4-stage pipeline, 4 microbatches x 2 rows: every one of the 8
    sequences must reproduce the uncached single-device rollout."""
    cfg, params, gen = setup
    rng = np.random.default_rng(11)
    M, mb, T, max_new = 4, 2, 6, 8
    ids = rng.integers(8, cfg.vocab_size, size=(M, mb, T)).astype(np.int32)

    got = gen.generate_text(ids, max_new_tokens=max_new)
    want = [greedy_oracle(params, cfg, ids[m, b], max_new, EOS)
            for m in range(M) for b in range(mb)]
    assert got == want, (got, want)
    flat = [t for row in got for t in row]
    assert len(set(flat)) > 1, "degenerate rollout cannot catch bugs"


def test_pipelined_eos_semantics(setup):
    """Pick an eos id that the rollout actually emits mid-stream and
    check the pipelined buf/n_out trim matches the oracle's early stop."""
    cfg, params, _ = setup
    rng = np.random.default_rng(4)
    ids = rng.integers(8, cfg.vocab_size, size=(4, 1, 5)).astype(np.int32)
    probe = greedy_oracle(params, cfg, ids[0, 0], 8, eos=-1)
    assert len(probe) == 8
    # an id whose FIRST occurrence is mid-stream -> a real early stop
    eos = next(t for t in probe if 0 < probe.index(t) < 7)
    cut = probe.index(eos)
    mesh = create_pipe_mesh(4)
    gen = PipelineGenerator.from_params(params, cfg, mesh, eos,
                                        max_len=64, dtype=jnp.float32)
    got = gen.generate_text(ids, max_new_tokens=8)
    want = [greedy_oracle(params, cfg, ids[m, 0], 8, eos)
            for m in range(4)]
    assert got == want, (got, want)
    assert len(got[0]) == cut and 0 < cut < 8


def test_pipelined_sampling_valid(setup):
    """Sampled mode (temperature/top-k/top-p) stays in-vocab and respects
    the max_new cap. (Warp parity itself is proven in test_qwen.py; the
    PP key stream is documented as distinct from the single-device one.)"""
    cfg, params, gen = setup
    rng = np.random.default_rng(2)
    ids = rng.integers(8, cfg.vocab_size, size=(4, 2, 5)).astype(np.int32)
    scfg = SamplingConfig(do_sample=True, temperature=0.8, top_k=20,
                          top_p=0.9)
    got = gen.generate_text(ids, max_new_tokens=6, sampling=scfg, seed=5)
    assert len(got) == 8
    for row in got:
        assert len(row) <= 6
        assert all(0 <= t < cfg.vocab_size for t in row)
    # determinism under a fixed seed
    again = gen.generate_text(ids, max_new_tokens=6, sampling=scfg, seed=5)
    assert got == again


def test_pipeline_rejects_bad_shapes(setup):
    cfg, params, gen = setup
    ids = np.zeros((2, 1, 4), np.int32)  # M=2 != S=4
    with pytest.raises(ValueError, match="n_micro"):
        gen.generate_text(ids, max_new_tokens=2)
    ids = np.zeros((4, 1, 60), np.int32)  # 60 + 8 + 1 > max_len=64
    with pytest.raises(ValueError, match="scratch"):
        gen.generate_text(ids, max_new_tokens=8)
    # repetition penalty needs the prompt ids to seed presence
    embeds = jnp.zeros((4, 1, 4, cfg.hidden_size), jnp.float32)
    pos3 = jnp.zeros((3, 4, 1, 4), jnp.int32)
    with pytest.raises(ValueError, match="prompt_ids"):
        gen.generate_from_embeds(
            embeds, pos3, jnp.full((4,), 4, jnp.int32), 2,
            sampling=SamplingConfig(repetition_penalty=1.2))


def greedy_oracle_penalty(params, cfg, ids_row, max_new, eos,
                          penalty: float):
    """Uncached greedy rollout with the HF repetition-penalty processor
    (presence = prompt + generated, updated BEFORE each sample) — the
    same semantics as the single-device decode loop."""
    seen = set(int(t) for t in np.asarray(ids_row).ravel())
    embeds = params["embed_tokens"][jnp.asarray(ids_row)][None]
    T0 = embeds.shape[1]
    pos = jnp.broadcast_to(jnp.arange(T0)[None, None], (3, 1, T0))
    out = []
    for step in range(max_new):
        T = embeds.shape[1]
        mask = jnp.where(jnp.tril(jnp.ones((T, T), bool))[None, None],
                         0.0, -3.4028235e38)
        logits, _ = QM.text_forward(params, embeds, pos, cfg, mask)
        row = np.asarray(logits[0, -1], np.float32).copy()
        for t in seen:
            row[t] = row[t] / penalty if row[t] > 0 else row[t] * penalty
        tok = int(row.argmax())
        if tok == eos:
            break
        out.append(tok)
        seen.add(tok)
        new_emb = params["embed_tokens"][tok][None, None]
        embeds = jnp.concatenate(
            [embeds, new_emb.astype(embeds.dtype)], axis=1)
        pos = jnp.concatenate(
            [pos, jnp.full((3, 1, 1), T0 + step, pos.dtype)], axis=2)
    return out


def test_pp_repetition_penalty_matches_oracle(setup):
    """The checkpoint-default sampling shape (repetition_penalty != 1,
    greedy) under PP: the last stage's presence table must reproduce the
    single-device penalty semantics token-for-token. A penalty strong
    enough to visibly change the stream guards against a silently
    ignored table."""
    cfg, params, gen = setup
    rng = np.random.default_rng(11)
    M, mb, T, max_new = 4, 2, 6, 8
    ids = rng.integers(8, cfg.vocab_size, size=(M, mb, T)).astype(np.int32)
    scfg = SamplingConfig(repetition_penalty=5.0)

    got = gen.generate_text(ids, max_new_tokens=max_new, sampling=scfg)
    want = [greedy_oracle_penalty(params, cfg, ids[m, b], max_new, EOS,
                                  5.0)
            for m in range(M) for b in range(mb)]
    assert got == want, (got, want)
    # and the penalty actually changed something vs plain greedy
    plain = gen.generate_text(ids, max_new_tokens=max_new)
    assert got != plain, "penalty 5.0 changed nothing — table unused?"


def test_pp_tp_composed_matches_oracle():
    """PP x TP: 4 stages x 2-way tensor parallelism on the 8-device CPU
    mesh (('pipe','model')), TP rules sharding within stages via GSPMD
    (VERDICT r2 #2). Tokens must match the single-device rollout."""
    from vlm_clip_tpu.parallel.sharding import qwen_param_rules

    cfg = tiny_text_cfg()
    params = QM.init_text(jax.random.PRNGKey(3), cfg)
    mesh = create_pipe_mesh(4, model=2)
    assert dict(mesh.shape) == {"pipe": 4, "model": 2}
    gen = PipelineGenerator.from_params(params, cfg, mesh, EOS,
                                        max_len=64, dtype=jnp.float32,
                                        tp_rules=qwen_param_rules())
    # TP placement sanity: q kernel sharded over model on its output dim
    q = gen.params["layers"]["attn"]["q"]["kernel"]
    spec = q.sharding.spec
    assert spec[0] == "pipe" and "model" in tuple(spec), spec

    rng = np.random.default_rng(11)
    M, mb, T, max_new = 4, 2, 6, 8
    ids = rng.integers(8, cfg.vocab_size, size=(M, mb, T)).astype(np.int32)
    got = gen.generate_text(ids, max_new_tokens=max_new)
    want = [greedy_oracle(params, cfg, ids[m, b], max_new, EOS)
            for m in range(M) for b in range(mb)]
    assert got == want, (got, want)


def test_pp_tp_quantized_matches_oracle():
    """PP x TP with int8 stage layers + untied int4 head: the
    QuantizedLinear leaves must pick up composed ('pipe', ..., 'model')
    specs in shard_staged and still reproduce the single-device rollout."""
    import dataclasses

    from vlm_clip_tpu.ops.quant import QuantizedLinear
    from vlm_clip_tpu.parallel.sharding import qwen_param_rules
    from vlm_clip_tpu.vlm import qwen_convert as QC

    cfg = tiny_text_cfg()
    params = QM.init_text(jax.random.PRNGKey(3), cfg)
    qtext = QC.quantize_qwen_params({"text": params}, 8,
                                    head_bits=4)["text"]
    qcfg = dataclasses.replace(cfg, tie_word_embeddings=False)
    mesh = create_pipe_mesh(4, model=2)
    gen = PipelineGenerator.from_params(qtext, qcfg, mesh, EOS,
                                        max_len=64, dtype=jnp.float32,
                                        tp_rules=qwen_param_rules())
    gate = gen.params["layers"]["mlp"]["gate"]
    assert isinstance(gate, QuantizedLinear)
    assert "model" in tuple(gate.qweight.sharding.spec), \
        gate.qweight.sharding.spec

    rng = np.random.default_rng(11)
    M, mb, T, max_new = 4, 1, 6, 8
    ids = rng.integers(8, cfg.vocab_size, size=(M, mb, T)).astype(np.int32)
    got = gen.generate_text(ids, max_new_tokens=max_new)
    want = [greedy_oracle(qtext, qcfg, ids[m, 0], max_new, EOS)
            for m in range(M)]
    assert got == want, (got, want)


def test_pp_vlm_embeds_end_to_end():
    """The documented-but-never-exercised contract (VERDICT r2 #3 of
    'missing'): vision embeds from ``QwenVLGenerator.embed_sequence``
    feed ``PipelineGenerator.generate_from_embeds`` — one pipelined
    multimodal context extraction per microbatch — and must match the
    single-device ``generate_from_ids`` token-for-token, INCLUDING the
    checkpoint-default sampling shape (repetition_penalty, greedy)."""
    from vlm_clip_tpu.vlm import qwen_process as QP
    from vlm_clip_tpu.vlm.qwen import QwenVLGenerator

    IMG, VSTART, VEOS = 250, 249, 251
    text = QM.QwenTextConfig(
        hidden_size=64, intermediate_size=128, num_layers=4, num_heads=4,
        num_kv_heads=2, head_dim=16, vocab_size=256,
        mrope_section=(2, 3, 3), tie_word_embeddings=True)
    vision = QM.QwenVisionConfig(
        hidden_size=32, intermediate_size=64, out_hidden_size=64, depth=3,
        num_heads=4, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=16, fullatt_block_indexes=(1,))
    cfg = QM.QwenVLConfig(text=text, vision=vision, image_token_id=IMG,
                          vision_start_token_id=VSTART, eos_token_id=VEOS)
    params = {"text": QM.init_text(jax.random.PRNGKey(0), text),
              "vision": QM.init_vision(jax.random.PRNGKey(1), vision)}
    gen = QwenVLGenerator(params, cfg, max_len=64, dtype=jnp.float32)

    grid = (1, 8, 8)
    in_dim = 3 * vision.temporal_patch_size * vision.patch_size ** 2
    rng = np.random.default_rng(7)
    n_vis = 64 // vision.spatial_merge_size ** 2
    ids = np.asarray([1, 2, VSTART] + [IMG] * n_vis + [3, 4, 5], np.int64)
    T = len(ids)
    scfg = SamplingConfig(repetition_penalty=1.05)
    M, max_new = 4, 6

    vins, singles, embeds = [], [], []
    for m in range(M):
        patches = rng.normal(size=(64, in_dim)).astype(np.float32)
        vin = QP.vision_inputs_from_patches(patches, grid, cfg.vision)
        vins.append(vin)
        singles.append(gen.generate_from_ids(
            ids, vin, max_new_tokens=max_new, sampling=scfg))
        embeds.append(np.asarray(gen.embed_sequence(ids, vin))[0])
    embeds = np.stack(embeds)[:, None]  # [M, mb=1, T, H]
    assert embeds.shape == (M, 1, T, text.hidden_size)

    pos, delta = QP.rope_index_single(ids, grid, cfg)
    pos3 = np.broadcast_to(np.asarray(pos)[:, None, None, :],
                           (3, M, 1, T))
    pos_start = np.full((M,), T + delta, np.int32)

    mesh = create_pipe_mesh(4)
    pgen = PipelineGenerator.from_params(params["text"], text, mesh,
                                         VEOS, max_len=64,
                                         dtype=jnp.float32)
    buf, n_out = pgen.generate_from_embeds(
        embeds, pos3, pos_start, max_new_tokens=max_new, sampling=scfg,
        prompt_ids=np.broadcast_to(ids, (M, 1, T)))
    got = [buf[m, 0, :n_out[m, 0]].tolist() for m in range(M)]
    assert got == singles, (got, singles)


def test_pipelined_quantized_head_matches_oracle():
    """Quantized stage layers + untied int4 lm head (the mixed/8h4
    decode presets) through the 4-stage pipeline: head_logits must
    dispatch the QuantizedLinear head (crashed on ['kernel'] before)
    and reproduce the single-device quantized rollout."""
    import dataclasses

    from vlm_clip_tpu.vlm import qwen_convert as QC

    cfg = tiny_text_cfg()
    params = QM.init_text(jax.random.PRNGKey(3), cfg)
    qtext = QC.quantize_qwen_params({"text": params}, 8,
                                    head_bits=4)["text"]
    qcfg = dataclasses.replace(cfg, tie_word_embeddings=False)

    rng = np.random.default_rng(11)
    M, mb, T, max_new = 4, 1, 6, 8
    ids = rng.integers(8, cfg.vocab_size, size=(M, mb, T)).astype(np.int32)

    mesh = create_pipe_mesh(4)
    gen = PipelineGenerator.from_params(qtext, qcfg, mesh, EOS,
                                        max_len=64, dtype=jnp.float32)
    got = gen.generate_text(ids, max_new_tokens=max_new)
    want = [greedy_oracle(qtext, qcfg, ids[m, 0], max_new, EOS)
            for m in range(M)]
    assert got == want, (got, want)
    flat = [t for row in got for t in row]
    assert len(set(flat)) > 1, "degenerate rollout cannot catch bugs"
