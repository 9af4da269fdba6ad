"""Qwen2.5-VL JAX port vs the HF implementation (hermetic tiny models).

Covers: text decoder logits (M-RoPE, GQA), windowed vision tower,
full image+text greedy generation, KV-cache decode consistency, and the
weight-only quantization path.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vlm_clip_tpu.vlm import qwen_convert as QC  # noqa: E402
from vlm_clip_tpu.vlm import qwen_model as QM  # noqa: E402
from vlm_clip_tpu.vlm import qwen_process as QP  # noqa: E402

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
def hf_model():
    from transformers import (Qwen2_5_VLConfig,
                              Qwen2_5_VLForConditionalGeneration,
                              Qwen2_5_VLTextConfig)
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import \
        Qwen2_5_VLVisionConfig

    torch.manual_seed(0)
    tc = Qwen2_5_VLTextConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        vocab_size=VOCAB, tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        rope_theta=1000000.0, rms_norm_eps=1e-6)
    vc = Qwen2_5_VLVisionConfig(
        hidden_size=32, intermediate_size=64, out_hidden_size=64, depth=3,
        num_heads=4, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=16, fullatt_block_indexes=[1],
        hidden_act="silu")
    cfg = Qwen2_5_VLConfig(text_config=tc.to_dict(),
                           vision_config=vc.to_dict(),
                           image_token_id=IMG_TOK,
                           vision_start_token_id=VIS_START,
                           vision_end_token_id=VIS_START,
                           eos_token_id=EOS, bos_token_id=0)
    model = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    return model


@pytest.fixture(scope="module")
def converted(hf_model):
    cfg = tiny_cfgs()
    params = QC.convert_qwen_vl(hf_model.state_dict(), cfg)
    return cfg, params


def test_text_forward_parity(hf_model, converted):
    cfg, params = converted
    rng = np.random.default_rng(0)
    ids = rng.integers(1, 200, (1, 9))
    with torch.no_grad():
        out = hf_model(input_ids=torch.from_numpy(ids),
                       attention_mask=torch.ones(1, 9, dtype=torch.long))
        hf_logits = out.logits.numpy()
    pos = np.broadcast_to(np.arange(9), (3, 1, 9))
    embeds = params["text"]["embed_tokens"][jnp.asarray(ids)]
    T = 9
    causal = jnp.tril(jnp.ones((T, T), bool))
    mask = jnp.where(causal[None, None], 0.0, -3.4028235e38)
    logits, _ = QM.text_forward(params["text"], embeds, jnp.asarray(pos),
                                cfg.text, mask)
    np.testing.assert_allclose(np.asarray(logits), hf_logits, atol=2e-4,
                               rtol=1e-3)


def test_vision_forward_parity(hf_model, converted):
    cfg, params = converted
    vcfg = cfg.vision
    grid = (1, 8, 8)
    S = 64
    in_dim = 3 * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    rng = np.random.default_rng(1)
    patches = rng.normal(size=(S, in_dim)).astype(np.float32)
    with torch.no_grad():
        hf_out = hf_model.model.visual(
            torch.from_numpy(patches),
            grid_thw=torch.tensor([list(grid)])).numpy()
    vin = QP.vision_inputs_from_patches(patches, grid, vcfg)
    ours = QM.vision_forward(params["vision"],
                             jnp.asarray(vin.patches),
                             jnp.asarray(vin.rot_pos_emb),
                             jnp.asarray(vin.window_mask),
                             jnp.asarray(vin.full_mask), vcfg)
    ours = np.asarray(ours)[vin.reverse_index]
    np.testing.assert_allclose(ours, hf_out, atol=2e-4, rtol=1e-3)


def test_generate_parity(hf_model, converted):
    """Greedy image+text generation matches HF token-for-token."""
    from vlm_clip_tpu.vlm.qwen import QwenVLGenerator

    cfg, params = converted
    vcfg = cfg.vision
    grid = (1, 8, 8)
    in_dim = 3 * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    rng = np.random.default_rng(2)
    patches = rng.normal(size=(64, in_dim)).astype(np.float32)
    n_vis = 64 // 4
    ids = np.asarray([1, 2, VIS_START] + [IMG_TOK] * n_vis
                     + [3, 4, 5], np.int64)

    with torch.no_grad():
        hf_out = hf_model.generate(
            input_ids=torch.from_numpy(ids[None]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long),
            pixel_values=torch.from_numpy(patches),
            image_grid_thw=torch.tensor([list(grid)]),
            max_new_tokens=6, do_sample=False)
        hf_new = hf_out[0, len(ids):].tolist()

    gen = QwenVLGenerator(params, cfg, max_len=128, dtype=jnp.float32)
    vin = QP.vision_inputs_from_patches(patches, grid, vcfg)
    ours = gen.generate_from_ids(ids, vin, max_new_tokens=6)
    # HF stops at eos too; compare up to the shorter length
    n = min(len(ours), len(hf_new))
    assert n >= 1
    assert ours[:n] == hf_new[:n], (ours, hf_new)


def test_rope_index_matches_hf(hf_model, converted):
    cfg, _ = converted
    grid = (1, 8, 8)
    n_vis = 16
    ids = np.asarray([1, 2, VIS_START] + [IMG_TOK] * n_vis + [3, 4],
                     np.int64)
    pos, delta = QP.rope_index_single(ids, grid, cfg)
    with torch.no_grad():
        hf_pos, hf_delta = hf_model.model.get_rope_index(
            torch.from_numpy(ids[None]),
            image_grid_thw=torch.tensor([list(grid)]),
            attention_mask=torch.ones(1, len(ids), dtype=torch.long))
    np.testing.assert_array_equal(pos, hf_pos[:, 0].numpy())
    assert delta == int(hf_delta[0])


def test_quantized_path_close(converted):
    cfg, params = converted
    qparams = QC.quantize_qwen_params(params, bits=8)
    rng = np.random.default_rng(3)
    ids = rng.integers(1, 200, (1, 7))
    pos = np.broadcast_to(np.arange(7), (3, 1, 7))
    embeds = params["text"]["embed_tokens"][jnp.asarray(ids)]
    mask = jnp.where(jnp.tril(jnp.ones((7, 7), bool))[None, None], 0.0,
                     -3.4028235e38)
    full, _ = QM.text_forward(params["text"], embeds, jnp.asarray(pos),
                              cfg.text, mask)
    quant, _ = QM.text_forward(qparams["text"], embeds, jnp.asarray(pos),
                               cfg.text, mask)
    # int8 weight-only: same argmax on nearly every position
    agree = (np.asarray(full).argmax(-1) == np.asarray(quant).argmax(-1))
    assert agree.mean() >= 0.85
    # int4 runs and stays finite
    q4 = QC.quantize_qwen_params(params, bits=4)
    out4, _ = QM.text_forward(q4["text"], embeds, jnp.asarray(pos),
                              cfg.text, mask)
    assert np.isfinite(np.asarray(out4)).all()


def test_generate_batch_matches_single(converted):
    """Batched greedy decode rows == independent single-image decodes."""
    from vlm_clip_tpu.vlm.qwen import QwenVLGenerator

    cfg, params = converted
    vcfg = cfg.vision
    grid = (1, 8, 8)
    in_dim = 3 * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    rng = np.random.default_rng(11)
    n_vis = 64 // 4
    ids = np.asarray([1, 2, VIS_START] + [IMG_TOK] * n_vis + [3, 4, 5],
                     np.int64)
    gen = QwenVLGenerator(params, cfg, max_len=128, dtype=jnp.float32)
    visions = []
    singles = []
    for b in range(3):
        patches = rng.normal(size=(64, in_dim)).astype(np.float32)
        vin = QP.vision_inputs_from_patches(patches, grid, cfg.vision)
        visions.append(vin)
        singles.append(gen.generate_from_ids(ids, vin, max_new_tokens=5))
    batched = gen.generate_batch_from_ids(ids, visions, max_new_tokens=5)
    assert batched == singles, (batched, singles)
