"""shard_map'd fused adapter kernels vs the jnp composition (8-dev mesh).

The single-device Pallas kernels are already parity-tested
(test_fused_ops.py); here the SHARDED dispatch must match the unsharded
jnp path — forward and every gradient — with x row-sharded over 'data'
and weights replicated (psum'd weight grads). Kernels run through the
Pallas interpreter on the CPU mesh (same code path, exact math).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from vlm_clip_tpu.models import adapters as A
from vlm_clip_tpu.ops import fused_sharded as FS


@pytest.fixture()
def mesh():
    devs = np.array(jax.devices()[:8])
    with Mesh(devs, ("data",)) as m:
        yield m
    FS.disable()


def _shard(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def test_seq_adapter_sharded_parity(mesh):
    rng = np.random.default_rng(0)
    B, T, H, K = 16, 4, 32, 8
    x = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
    p = A.init_seq_adapter(jax.random.PRNGKey(1), H, K)

    def loss_jnp(p, x):
        return jnp.sum(A.seq_adapter(p, x, impl="jnp") ** 2)

    def loss_sh(p, x):
        y = FS.seq_adapter_fused(
            x.reshape(-1, H), p["down"]["kernel"], p["down"]["bias"],
            p["up"]["kernel"], p["up"]["bias"], p["ln"]["scale"],
            p["ln"]["bias"], 1e-5, mesh, "data")
        return jnp.sum(y ** 2)

    xs = _shard(mesh, x)
    want, (gwp, gwx) = jax.value_and_grad(loss_jnp, (0, 1))(p, x)
    got, (gsp, gsx) = jax.jit(jax.value_and_grad(loss_sh, (0, 1)))(p, xs)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gsx).reshape(B, T, H),
                               np.asarray(gwx), rtol=2e-4, atol=2e-5)
    for k in ("down", "up", "ln"):
        for kk, g in gsp[k].items():
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(gwp[k][kk]),
                rtol=2e-4, atol=2e-5, err_msg=f"{k}/{kk}")


def test_feature_blend_sharded_parity(mesh):
    rng = np.random.default_rng(2)
    N, D, K = 32, 64, 16
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    p = A.init_feature_adapter(jax.random.PRNGKey(3), D, K)

    def loss_jnp(p, x):
        return jnp.sum(A.adapt_features(p, x, 0.2, impl="jnp") ** 2)

    def loss_sh(p, x):
        y = FS.feature_adapter_blend_fused(
            x, p["fc1"]["kernel"], p["fc1"]["bias"],
            p["fc2"]["kernel"], p["fc2"]["bias"], 0.2, 0.0, None,
            mesh, "data")
        return jnp.sum(y ** 2)

    xs = _shard(mesh, x)
    want, (gwp, gwx) = jax.value_and_grad(loss_jnp, (0, 1))(p, x)
    got, (gsp, gsx) = jax.jit(jax.value_and_grad(loss_sh, (0, 1)))(p, xs)
    np.testing.assert_allclose(got, want, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(gsx), np.asarray(gwx),
                               rtol=2e-4, atol=2e-5)
    for k in ("fc1", "fc2"):
        for kk, g in gsp[k].items():
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(gwp[k][kk]),
                rtol=2e-4, atol=2e-5, err_msg=f"{k}/{kk}")


def test_cross_modal_adapter_sharded_parity(mesh):
    """Full adapter through the enable() dispatch: both fused halves
    (attention block + pre-norm MLP) sharded, vs impl='jnp'."""
    rng = np.random.default_rng(4)
    B, T, Dt, Di, H = 16, 3, 48, 40, 32
    text = jnp.asarray(rng.normal(size=(B, T, Dt)), jnp.float32)
    image = jnp.asarray(rng.normal(size=(1, 5, Di)), jnp.float32)
    p = A.init_cross_modal_adapter(jax.random.PRNGKey(5), Dt, Di, H,
                                   num_heads=4)

    def loss_jnp(p, text):
        return jnp.sum(A.cross_modal_adapter(p, text, image,
                                             num_heads=4,
                                             impl="jnp") ** 2)

    FS.enable(mesh, "data")

    def loss_sh(p, text):
        return jnp.sum(A.cross_modal_adapter(p, text, image,
                                             num_heads=4) ** 2)

    ts = _shard(mesh, text)
    want, (gwp, gwx) = jax.value_and_grad(loss_jnp, (0, 1))(p, text)
    got, (gsp, gsx) = jax.jit(jax.value_and_grad(loss_sh, (0, 1)))(p, ts)
    FS.disable()
    np.testing.assert_allclose(got, want, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gsx), np.asarray(gwx),
                               rtol=3e-4, atol=3e-5)
    flat_w = jax.tree_util.tree_flatten_with_path(gwp)[0]
    flat_s = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_flatten_with_path(gsp)[0]}
    for path, g in flat_w:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            np.asarray(flat_s[key]), np.asarray(g),
            rtol=3e-4, atol=3e-5, err_msg=key)


def test_enable_validates_axis(mesh):
    with pytest.raises(ValueError, match="not in mesh"):
        FS.enable(mesh, "nope")
    assert FS.current() is None
    FS.enable(mesh, "data")
    assert FS.current() == (mesh, "data")
    assert FS.rows_shardable(16) and not FS.rows_shardable(9)
    FS.disable()
    assert FS.current() is None


def test_m_train_step_with_sharded_fused_kernels():
    """Full DP train step with enable(): the Pallas kernels run
    per-shard over the data axis and the step matches the unsharded
    jnp-path step — loss and updated adapter params."""
    import optax

    from vlm_clip_tpu.core.config import AdapterConfig
    from vlm_clip_tpu.core.dtypes import FP32
    from vlm_clip_tpu.models.clip import init_clip
    from vlm_clip_tpu.parallel.mesh import (DATA_AXIS, MeshConfig,
                                            create_mesh, with_mesh)
    from vlm_clip_tpu.parallel.sharding import shard_params
    from vlm_clip_tpu.train.steps import (init_train_state,
                                          make_m_train_step)
    from helpers import tiny_clip_config

    mesh = create_mesh(MeshConfig(data=8, model=1), jax.devices()[:8])

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
    tx = optax.sgd(0.1)

    def fresh():
        return init_train_state(jax.random.PRNGKey(2), cfg, acfg, tx,
                                clip_params=jax.tree.map(jnp.array,
                                                         params))

    s_ref, m_ref = make_m_train_step(cfg, acfg, tx, FP32)(fresh(), batch)

    with with_mesh(mesh):
        state = fresh()
        state = state._replace(
            clip_params=shard_params(state.clip_params, mesh),
            adapter_params=jax.device_put(state.adapter_params,
                                          NamedSharding(mesh, P())),
            opt_state=jax.device_put(state.opt_state,
                                     NamedSharding(mesh, P())))

        def put(x):
            return jax.device_put(x, NamedSharding(
                mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))))

        FS.enable(mesh, DATA_AXIS)
        try:
            s_sh, m_sh = make_m_train_step(cfg, acfg, tx, FP32)(
                state, {k: put(v) for k, v in batch.items()})
        finally:
            FS.disable()

    np.testing.assert_allclose(float(m_sh.loss), float(m_ref.loss),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(s_ref.adapter_params),
                    jax.tree.leaves(s_sh.adapter_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)


def test_dropout_sharded_runs_and_decorrelates(mesh):
    """Seeded in-kernel dropout under shard_map: runs, grads finite,
    and the per-shard seed offset decorrelates shards (the sharded
    forward differs from the single-seed unsharded kernel)."""
    from vlm_clip_tpu.ops import fused_adapter as F

    rng = np.random.default_rng(6)
    N, D, K = 32, 64, 16
    x = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    p = A.init_feature_adapter(jax.random.PRNGKey(7), D, K)
    args = (p["fc1"]["kernel"], p["fc1"]["bias"],
            p["fc2"]["kernel"], p["fc2"]["bias"])
    seed = jnp.int32(123)

    def loss(x):
        y = FS.feature_adapter_blend_fused(x, *args, 0.2, 0.5, seed,
                                           mesh, "data")
        return jnp.sum(y ** 2)

    xs = _shard(mesh, x)
    val, gx = jax.jit(jax.value_and_grad(loss))(xs)
    assert np.isfinite(val) and np.all(np.isfinite(np.asarray(gx)))
    y_sh = FS.feature_adapter_blend_fused(xs, *args, 0.2, 0.5, seed,
                                          mesh, "data")
    y_un = F.feature_adapter_blend_fused(x, *args, 0.2, 0.5, seed)
    assert not np.allclose(np.asarray(y_sh), np.asarray(y_un))
