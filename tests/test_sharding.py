"""Multi-chip semantics on the 8-device virtual CPU mesh.

Checks the things that actually go wrong in SPMD ports: TP-sharded
forward == single-device forward, DP-sharded global contrastive loss ==
unsharded loss, and the full sharded train step matching the unsharded
step numerically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from vlm_clip_tpu.core.config import AdapterConfig
from vlm_clip_tpu.core.dtypes import FP32
from vlm_clip_tpu.models import model_m as M
from vlm_clip_tpu.models.clip import get_image_features, init_clip
from vlm_clip_tpu.parallel.mesh import (DATA_AXIS, MeshConfig, create_mesh,
                                        with_mesh)
from vlm_clip_tpu.parallel.sharding import shard_params
from vlm_clip_tpu.train.steps import init_train_state, make_m_train_step

from helpers import tiny_clip_config

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_clip_config()
    acfg = AdapterConfig(text_adapter_size=16, vision_adapter_size=16,
                         shared_adapter_layers=2, shared_num_heads=4)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 999, (B, 10))),
        "attention_mask": jnp.ones((B, 10), jnp.int32),
        "pixel_values": jnp.asarray(rng.normal(size=(B, 3, 32, 32)),
                                    jnp.float32),
    }
    return cfg, acfg, params, batch


def test_tp_forward_matches_single_device(setup):
    cfg, _, params, batch = setup
    ref = get_image_features(params, batch["pixel_values"], cfg, FP32)
    mesh = create_mesh(MeshConfig(data=2, model=4), jax.devices()[:8])
    with with_mesh(mesh):
        sp = shard_params(params, mesh)
        px = jax.device_put(batch["pixel_values"],
                            NamedSharding(mesh, P(DATA_AXIS)))
        out = jax.jit(lambda p, x: get_image_features(p, x, cfg, FP32))(
            sp, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=1e-4)


def test_dp_contrastive_loss_matches_unsharded(setup):
    cfg, acfg, params, batch = setup
    adapters = M.init_m_adapters(jax.random.PRNGKey(1), cfg, acfg)
    ref = M.m_forward(params, adapters, batch["input_ids"],
                      batch["attention_mask"], batch["pixel_values"], cfg,
                      acfg, FP32).loss
    mesh = create_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])
    with with_mesh(mesh):
        sp = shard_params(params, mesh)
        sa = jax.device_put(adapters, NamedSharding(mesh, P()))

        def put(x):
            return jax.device_put(x, NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))

        loss = jax.jit(lambda p, a, i, m, px: M.m_forward(
            p, a, i, m, px, cfg, acfg, FP32).loss)(
            sp, sa, put(batch["input_ids"]), put(batch["attention_mask"]),
            put(batch["pixel_values"]))
    # the global BxB logit matrix must be identical across shardings
    np.testing.assert_allclose(float(loss), float(ref), atol=1e-5)


def test_sharded_train_step_matches_unsharded(setup):
    cfg, acfg, params, batch = setup
    # SGD so parameter deltas stay proportional to gradients; Adam's
    # step-1 normalization amplifies reduction-order noise to ~lr scale.
    tx = optax.sgd(0.1)

    def fresh_state():
        return init_train_state(jax.random.PRNGKey(2), cfg, acfg, tx,
                                clip_params=jax.tree.map(jnp.array, params))

    step = make_m_train_step(cfg, acfg, tx, FP32)
    s_ref, m_ref = step(fresh_state(), batch)

    mesh = create_mesh(MeshConfig(data=4, model=2), jax.devices()[:8])
    with with_mesh(mesh):
        state = fresh_state()
        state = state._replace(
            clip_params=shard_params(state.clip_params, mesh),
            adapter_params=jax.device_put(state.adapter_params,
                                          NamedSharding(mesh, P())),
            opt_state=jax.device_put(state.opt_state,
                                     NamedSharding(mesh, P())))

        def put(x):
            return jax.device_put(x, NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))

        sharded_batch = {k: put(v) for k, v in batch.items()}
        step_sh = make_m_train_step(cfg, acfg, tx, FP32)
        s_sh, m_sh = step_sh(state, sharded_batch)

    np.testing.assert_allclose(float(m_sh.loss), float(m_ref.loss),
                               atol=1e-5)
    # updated adapter params agree across shardings
    ref_leaves = jax.tree.leaves(s_ref.adapter_params)
    sh_leaves = jax.tree.leaves(s_sh.adapter_params)
    for a, b in zip(ref_leaves, sh_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_orbax_full_resume(tmp_path, setup):
    cfg, acfg, params, batch = setup
    from vlm_clip_tpu.train import checkpoint as ckpt

    tx = optax.adam(1e-3)
    state = init_train_state(jax.random.PRNGKey(3), cfg, acfg, tx,
                             clip_params=jax.tree.map(jnp.array, params))
    step = make_m_train_step(cfg, acfg, tx, FP32)
    state, _ = step(state, batch)
    ckpt.save_train_state(str(tmp_path / "ck"), state)
    # continue two more steps from memory
    s_mem, _ = step(state, batch)
    s_mem, _ = step(s_mem, batch)
    # restore and replay
    restored = ckpt.restore_train_state(
        str(tmp_path / "ck"),
        init_train_state(jax.random.PRNGKey(9), cfg, acfg, tx,
                         clip_params=jax.tree.map(jnp.array, params)))
    assert int(restored.step) == 1
    s_res, _ = step(restored, batch)
    s_res, _ = step(s_res, batch)
    for a, b in zip(jax.tree.leaves(s_mem.adapter_params),
                    jax.tree.leaves(s_res.adapter_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_qwen_tp_decode_matches_single_device():
    """TP-sharded Qwen text forward == single-device (tiny cfg, CPU mesh)."""
    from vlm_clip_tpu.parallel.sharding import qwen_param_rules
    from vlm_clip_tpu.vlm import qwen_model as QM

    tc = QM.QwenTextConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=8,
        num_kv_heads=4, head_dim=16, vocab_size=512,
        mrope_section=(2, 3, 3))
    params = QM.init_text(jax.random.PRNGKey(0), tc)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 500, (1, 9)))
    pos = jnp.broadcast_to(jnp.arange(9), (3, 1, 9))
    embeds = params["embed_tokens"][ids]
    causal = jnp.tril(jnp.ones((9, 9), bool))
    mask = jnp.where(causal[None, None], 0.0, -3.4028235e38)

    ref, _ = QM.text_forward(params, embeds, pos, tc, mask)

    mesh = create_mesh(MeshConfig(data=2, model=4), jax.devices()[:8])
    with with_mesh(mesh):
        sp = shard_params(params, mesh, rules=qwen_param_rules())
        out, _ = jax.jit(lambda p, e: QM.text_forward(p, e, pos, tc,
                                                      mask))(sp, embeds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=1e-3)


def test_quantized_qwen_params_get_tp_specs():
    """QuantizedLinear leaves must match the TP rules (qweight/scale
    named keys), not silently fall through to replication — and the
    sharded quantized forward must equal the single-device one."""
    from vlm_clip_tpu.parallel.sharding import (partition_specs,
                                                qwen_param_rules)
    from vlm_clip_tpu.vlm import qwen_convert as QC
    from vlm_clip_tpu.vlm import qwen_model as QM

    tc = QM.QwenTextConfig(
        hidden_size=64, intermediate_size=128, num_layers=2, num_heads=8,
        num_kv_heads=4, head_dim=16, vocab_size=512,
        mrope_section=(2, 3, 3))
    params = {"text": QM.init_text(jax.random.PRNGKey(1), tc)}
    qparams = QC.quantize_qwen_params(params, bits=8)["text"]

    specs = partition_specs(qparams, rules=qwen_param_rules())
    attn = specs["layers"]["attn"]
    assert attn["q"].qweight == P(None, None, "model"), attn["q"].qweight
    assert attn["q"].scale == P(None, "model")
    assert attn["o"].qweight == P(None, "model", None)
    assert attn["o"].scale == P(None)
    mlp = specs["layers"]["mlp"]
    assert mlp["gate"].qweight == P(None, None, "model")
    assert mlp["down"].qweight == P(None, "model", None)

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(1, 500, (1, 7)))
    pos = jnp.broadcast_to(jnp.arange(7), (3, 1, 7))
    embeds = qparams["embed_tokens"][ids]
    mask = jnp.where(jnp.tril(jnp.ones((7, 7), bool))[None, None], 0.0,
                     -3.4028235e38)
    ref, _ = QM.text_forward(qparams, embeds, pos, tc, mask)
    mesh = create_mesh(MeshConfig(data=2, model=4), jax.devices()[:8])
    with with_mesh(mesh):
        sp = shard_params(qparams, mesh, rules=qwen_param_rules())
        out, _ = jax.jit(lambda p, e: QM.text_forward(p, e, pos, tc,
                                                      mask))(sp, embeds)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_qwen_vision_tp_matches_single_device():
    """TP-sharded Qwen vision tower (windowed attention) == unsharded.
    qkv stays replicated (fused q|k|v output dim can't shard cleanly);
    the MLP pair and proj carry the model axis."""
    from vlm_clip_tpu.parallel.sharding import (qwen_param_rules,
                                                shard_params)
    from vlm_clip_tpu.vlm import qwen_model as QM
    from vlm_clip_tpu.vlm import qwen_process as QP

    vcfg = QM.QwenVisionConfig(
        hidden_size=32, intermediate_size=64, out_hidden_size=64, depth=3,
        num_heads=4, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, window_size=16, fullatt_block_indexes=(1,))
    params = QM.init_vision(jax.random.PRNGKey(2), vcfg)
    rng = np.random.default_rng(1)
    in_dim = 3 * vcfg.temporal_patch_size * vcfg.patch_size ** 2
    patches = rng.normal(size=(64, in_dim)).astype(np.float32)
    vin = QP.vision_inputs_from_patches(patches, (1, 8, 8), vcfg)
    args = (jnp.asarray(vin.patches), jnp.asarray(vin.rot_pos_emb),
            jnp.asarray(vin.window_mask), jnp.asarray(vin.full_mask))

    ref = QM.vision_forward(params, *args, vcfg)
    mesh = create_mesh(MeshConfig(data=2, model=4), jax.devices()[:8])
    with with_mesh(mesh):
        sp = shard_params(params, mesh, rules=qwen_param_rules())
        out = jax.jit(lambda p, *a: QM.vision_forward(p, *a, vcfg))(
            sp, *args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=1e-3)


def test_int4_tp_sharding_disables_pallas_route():
    """shard_params over a model>1 mesh must set pallas_ok=False on the
    int4 QuantizedLinear nodes whose qweight actually got partitioned —
    GSPMD cannot partition pallas_call, so TP decode must take the
    pure-XLA int4 formulations. The flag is PER NODE: replicated nodes
    (and other models in the process) keep the Pallas route, and the
    process-global toggle is untouched."""
    from vlm_clip_tpu.ops import quant as Q
    from vlm_clip_tpu.parallel.sharding import qwen_param_rules, shard_params
    from vlm_clip_tpu.vlm import qwen_convert as QC
    from vlm_clip_tpu.vlm import qwen_model as QM

    tc = QM.QwenTextConfig(
        hidden_size=64, intermediate_size=2048, num_layers=2, num_heads=8,
        num_kv_heads=4, head_dim=16, vocab_size=512,
        mrope_section=(2, 3, 3))
    params = {"text": QM.init_text(jax.random.PRNGKey(2), tc)}
    qparams = QC.quantize_qwen_params(params, bits=4)["text"]
    mesh = create_mesh(MeshConfig(data=4, model=2), jax.devices()[:8])
    sharded = shard_params(qparams, mesh, rules=qwen_param_rules())
    gate = sharded["layers"]["mlp"]["gate"]
    assert isinstance(gate, Q.QuantizedLinear) and not gate.pallas_ok
    # attn/o shards its INPUT dim; qweight is still partitioned -> off
    assert not sharded["layers"]["attn"]["o"].pallas_ok
    assert Q._INT4_PALLAS_ENABLED  # process-global toggle untouched
    # an unsharded model in the same process keeps its Pallas route
    assert qparams["layers"]["mlp"]["gate"].pallas_ok


def test_zero1_state_sharding_matches_unsharded(setup):
    """ZeRO-1 (zero1_mesh): sharded-moment Adam step == unsharded
    step, and the moments are ACTUALLY sharded over `data` at rest.

    eps=1e-2: plain Adam's step-1 update is ~sign(g)*lr, so reduction-
    order noise on near-zero grads flips whole updates (same reason the
    DP test uses SGD); a large eps keeps the mu/nu state machinery
    fully exercised while making updates smooth in g."""
    cfg, acfg, params, batch = setup
    tx = optax.adam(1e-3, eps=1e-2)

    def fresh_state():
        return init_train_state(jax.random.PRNGKey(5), cfg, acfg, tx,
                                clip_params=jax.tree.map(jnp.array, params))

    step = make_m_train_step(cfg, acfg, tx, FP32)
    s_ref, m_ref = step(fresh_state(), batch)
    s_ref, m_ref2 = step(s_ref, batch)

    from vlm_clip_tpu.parallel.sharding import zero1_place, zero1_specs

    mesh = create_mesh(MeshConfig(data=4, model=2), jax.devices()[:8])
    with with_mesh(mesh):
        state = fresh_state()
        state = state._replace(
            clip_params=shard_params(state.clip_params, mesh),
            adapter_params=jax.device_put(state.adapter_params,
                                          NamedSharding(mesh, P())),
            opt_state=zero1_place(state.opt_state, mesh))

        def put(x):
            return jax.device_put(x, NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))

        sharded_batch = {k: put(v) for k, v in batch.items()}
        step_z = make_m_train_step(cfg, acfg, tx, FP32, zero1_mesh=mesh)
        s_z, m_z = step_z(state, sharded_batch)
        s_z, m_z2 = step_z(s_z, sharded_batch)

    np.testing.assert_allclose(float(m_z.loss), float(m_ref.loss),
                               atol=1e-5)
    np.testing.assert_allclose(float(m_z2.loss), float(m_ref2.loss),
                               atol=2e-4)
    for a, b in zip(jax.tree.leaves(s_ref.adapter_params),
                    jax.tree.leaves(s_z.adapter_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-4)
    # moments stay sharded over `data` at rest (ZeRO-1's memory claim):
    # every leaf with a dim divisible by data=4 must carry that spec
    specs = zero1_specs(s_z.opt_state, mesh)
    n_sharded = 0
    for leaf, spec in zip(jax.tree.leaves(s_z.opt_state),
                          jax.tree.leaves(specs, is_leaf=lambda s:
                                          isinstance(s, P))):
        if any(ax is not None for ax in spec):
            def _norm(s):  # JAX drops trailing Nones in stored specs
                t = tuple(s)
                while t and t[-1] is None:
                    t = t[:-1]
                return t
            assert _norm(leaf.sharding.spec) == _norm(spec), (
                leaf.shape, spec, leaf.sharding)
            n_sharded += 1
    assert n_sharded >= 4  # adam mu+nu over several adapter leaves


def test_orbax_async_save_matches_sync(tmp_path, setup):
    """AsyncTrainStateSaver writes the identical on-disk state: training
    continues while orbax's background threads do the D2H + writes, and
    restore_train_state reads it back leaf-for-leaf equal to a
    synchronous save of the same state."""
    cfg, acfg, params, batch = setup
    from vlm_clip_tpu.train import checkpoint as ckpt

    tx = optax.adam(1e-3)
    state = init_train_state(jax.random.PRNGKey(4), cfg, acfg, tx,
                             clip_params=jax.tree.map(jnp.array, params))
    step = make_m_train_step(cfg, acfg, tx, FP32)
    state, _ = step(state, batch)

    saver = ckpt.AsyncTrainStateSaver()
    saver.save(str(tmp_path / "async_ck"), state)
    # training continues while the save is in flight
    cont, _ = step(state, batch)
    saver.wait()
    ckpt.save_train_state(str(tmp_path / "sync_ck"), state)

    template = init_train_state(jax.random.PRNGKey(5), cfg, acfg, tx,
                                clip_params=jax.tree.map(jnp.array, params))
    r_async = ckpt.restore_train_state(str(tmp_path / "async_ck"), template)
    r_sync = ckpt.restore_train_state(str(tmp_path / "sync_ck"), template)
    for a, b in zip(jax.tree.leaves(r_async._asdict()),
                    jax.tree.leaves(r_sync._asdict())):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the in-flight save captured the pre-continue state, not `cont`
    assert int(r_async.step) == 1 and int(cont.step) == 2
    saver.close()


def test_nf4_shard_params_layout():
    """NF4Linear placement (VERDICT r4 #2): out-dim-sharded rules put
    qweight AND absmax_q on the model axis; dq_scale/dq_offset always
    replicate (their groups run over the flattened absmax, no coherent
    per-dim shard); in-dim-sharded rules (mlp.down) shard qweight only."""
    from vlm_clip_tpu.ops.nf4 import quantize_nf4
    from vlm_clip_tpu.parallel.mesh import MODEL_AXIS
    from vlm_clip_tpu.parallel.sharding import qwen_param_rules

    mesh = create_mesh(MeshConfig(data=1, model=2), jax.devices()[:2])
    k = jax.random.PRNGKey(0)
    # stacked per-layer leaves (the quantize_qwen_params layout)
    gate = jax.vmap(quantize_nf4)(jax.random.normal(k, (2, 128, 256)))
    down = jax.vmap(quantize_nf4)(jax.random.normal(k, (2, 256, 128)))
    head = quantize_nf4(jax.random.normal(k, (128, 256)))
    tree = {"text": {"layers": {"mlp": {"gate": gate, "down": down}},
                     "lm_head": head}}
    sp = shard_params(tree, mesh, rules=qwen_param_rules())

    g = sp["text"]["layers"]["mlp"]["gate"]
    assert g.qweight.sharding.spec == P(None, None, MODEL_AXIS)
    assert g.absmax_q.sharding.spec == P(None, None, MODEL_AXIS)
    assert g.dq_scale.sharding.spec == P()
    assert g.dq_offset.sharding.spec == P()

    d = sp["text"]["layers"]["mlp"]["down"]
    assert d.qweight.sharding.spec == P(None, MODEL_AXIS, None)
    assert d.absmax_q.sharding.spec == P()   # in-dim rule: replicate

    h = sp["text"]["lm_head"]                # 2-D untied head
    assert h.qweight.sharding.spec == P(None, MODEL_AXIS)
    assert h.absmax_q.sharding.spec == P(None, MODEL_AXIS)
    assert h.dq_scale.sharding.spec == P()
    # fused matmul on the sharded head == dense reference
    from vlm_clip_tpu.ops.nf4 import dequantize_nf4, nf4_matmul
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 128))
    got = np.asarray(nf4_matmul(x, h))
    ref = np.asarray(x @ dequantize_nf4(head, jnp.float32))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)
