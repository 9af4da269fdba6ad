"""Adapter parity vs independently-built torch oracles (fp32 tolerance)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vlm_clip_tpu.convert import adapters as CA  # noqa: E402
from vlm_clip_tpu.models import adapters as A  # noqa: E402

ATOL = 1e-5


def test_feature_adapter_parity():
    torch.manual_seed(0)
    t = nn.Sequential()
    t.fc1 = nn.Linear(64, 16)
    t.fc2 = nn.Linear(16, 64)
    x = torch.randn(5, 64)
    with torch.no_grad():
        expected = t.fc2(torch.relu(t.fc1(x))).numpy()
    p = CA.feature_adapter_from_torch(t.state_dict())
    got = A.feature_adapter(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)
    # blend + renorm
    blended = A.adapt_features(p, jnp.asarray(x.numpy()), 0.2)
    exp = 0.2 * expected + 0.8 * x.numpy()
    exp = exp / np.linalg.norm(exp, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(blended), exp, atol=ATOL)


def test_feature_adapter_roundtrip():
    p = A.init_feature_adapter(jax.random.PRNGKey(0), 32, 8)
    sd = CA.feature_adapter_to_torch(p)
    p2 = CA.feature_adapter_from_torch(sd)
    for k in ("fc1", "fc2"):
        np.testing.assert_array_equal(np.asarray(p[k]["kernel"]),
                                      np.asarray(p2[k]["kernel"]))


def test_seq_adapter_parity():
    torch.manual_seed(1)

    class SeqAdapter(nn.Module):
        def __init__(self):
            super().__init__()
            self.down_project = nn.Linear(48, 12)
            self.activation = nn.GELU()
            self.up_project = nn.Linear(12, 48)
            self.layer_norm = nn.LayerNorm(48)

        def forward(self, h):
            r = h
            h = self.up_project(self.activation(self.down_project(h)))
            return self.layer_norm(h + r)

    t = SeqAdapter().eval()
    x = torch.randn(2, 7, 48)
    with torch.no_grad():
        expected = t(x).numpy()
    p = CA.seq_adapter_from_torch(t.state_dict())
    got = A.seq_adapter(p, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected, atol=ATOL)


def test_cross_modal_adapter_parity():
    """Against a torch module with the reference's documented quirk
    semantics (clip_adapter.py:99-128): pre-norm MHA, residual from the
    normed text, pre-norm 4x GELU MLP."""
    torch.manual_seed(2)
    H, heads = 32, 4

    class XModal(nn.Module):
        def __init__(self):
            super().__init__()
            self.text_proj = nn.Linear(24, H)
            self.image_proj = nn.Linear(40, H)
            self.cross_attn = nn.MultiheadAttention(H, heads,
                                                    batch_first=True)
            self.norm1 = nn.LayerNorm(H)
            self.norm2 = nn.LayerNorm(H)
            self.norm3 = nn.LayerNorm(H)
            self.mlp = nn.Sequential(nn.Linear(H, 4 * H), nn.GELU(),
                                     nn.Linear(4 * H, H))

        def forward(self, text, image):
            t = self.text_proj(text)
            im = self.image_proj(image)
            kv = self.norm1(im)
            q = self.norm2(t)
            attn, _ = self.cross_attn(q, kv, kv)
            h = q + attn
            return h + self.mlp(self.norm3(h))

    t = XModal().eval()
    text = torch.randn(3, 5, 24)
    image = torch.randn(3, 11, 40)
    with torch.no_grad():
        expected = t(text, image).numpy()
    p = CA.cross_modal_adapter_from_torch(t.state_dict())
    got = A.cross_modal_adapter(p, jnp.asarray(text.numpy()),
                                jnp.asarray(image.numpy()), num_heads=heads)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_peclip_adapters_run():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 6, 32))
    p1 = A.init_textual_adapter(key, 32, 8)
    y1 = A.textual_adapter(p1, x)
    assert y1.shape == x.shape
    p2 = A.init_self_attn_adapter(key, 32, 4)
    y2 = A.self_attn_adapter(p2, x, num_heads=4)
    assert y2.shape == x.shape


def test_feature_adapter_dropout_modes():
    p = A.init_feature_adapter(jax.random.PRNGKey(0), 16, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16))
    det = A.feature_adapter(p, x, dropout=0.5, deterministic=True)
    det2 = A.feature_adapter(p, x, dropout=0.5, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))
    tr = A.feature_adapter(p, x, dropout=0.5, deterministic=False,
                           rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(tr), np.asarray(det))
    with pytest.raises(ValueError):
        A.feature_adapter(p, x, dropout=0.5, deterministic=False)
