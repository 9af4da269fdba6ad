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
    with pytest.raises(NotImplementedError):
        gen.generate_text(np.zeros((4, 1, 4), np.int32), max_new_tokens=2,
                          sampling=SamplingConfig(repetition_penalty=1.2))


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
