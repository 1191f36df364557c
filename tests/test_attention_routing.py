"""Attention implementation routing (models/vit.Attention): huge
sequences must never take the score-materializing XLA path — DA3's
cross-view blocks concatenate ~120k tokens at production dims, which
round-5 TPU compile showed is a 920 GB allocation under 'xla'."""

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import vit


def test_huge_sequence_routes_to_flash(monkeypatch):
    calls = {}

    def fake_flash(qkv5, valid=None, conservative=False):
        calls["shape"] = qkv5.shape
        calls["valid_sum"] = int(jnp.sum(valid))
        b, n, _, h, hd = qkv5.shape
        return jnp.zeros((b, n, h, hd), qkv5.dtype)

    monkeypatch.setattr(vit, "_flash_attention", fake_flash)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    n = vit._XLA_SCORE_TOKEN_LIMIT + 100  # NOT a 512 multiple
    cfg = vit.ViTConfig(embed_dim=64, num_heads=1, depth=1,
                        attention_impl="xla")
    attn = vit.Attention(cfg)
    x = jnp.zeros((1, n, 64), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    out = attn.apply(params, x)

    assert out.shape == (1, n, 64)
    padded = n + ((-n) % 512)
    assert calls["shape"] == (1, padded, 3, 1, 64)
    assert calls["valid_sum"] == n  # pads masked, real tokens kept


def test_normal_sequence_keeps_xla(monkeypatch):
    def boom(*a, **k):
        raise AssertionError("flash must not be used below the limit")

    monkeypatch.setattr(vit, "_flash_attention", boom)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    cfg = vit.ViTConfig(embed_dim=64, num_heads=1, depth=1,
                        attention_impl="xla")
    attn = vit.Attention(cfg)
    x = np.random.default_rng(0).standard_normal((1, 128, 64))
    x = jnp.asarray(x, jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    out = attn.apply(params, x)
    assert np.isfinite(np.asarray(out)).all()
