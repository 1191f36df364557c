"""Streaming (chunked) Wan VAE == full-video VAE, exactly.

The production inspatio chunk (225 frames @ 480x832) cannot hold the
full-video VAE activations on one chip (~17 GB at the stem); the
stream methods carry per-causal-conv frame caches so segment-wise
encode/decode reproduces the full result bit-for-bit in f32 (the
front zero pad and the stride-2 window anchoring are the subtle
parts — covered below)."""

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import wan as wan_mod

CFG = wan_mod.WAN_TINY.vae  # float32 tiny channels


def _video(t, h=16, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (1, t, h, w, 3)), jnp.float32)


def test_encoder_stream_matches_full():
    enc = wan_mod.WanVAEEncoder(CFG)
    x = _video(4 * 10 - 3)  # 37 frames -> 10 latents
    params = enc.init(jax.random.PRNGKey(0), x)
    full = enc.apply(params, x)

    # segments: x4 except the ragged last (the stream contract)
    for segs in [(12, 12, 13), (4, 4, 4, 4, 4, 4, 4, 4, 5), (36, 1),
                 (37,)]:
        cache, outs, s = None, [], 0
        for L in segs:
            z, cache = enc.apply(params, x[:, s:s + L], cache,
                                 method="stream")
            outs.append(z)
            s += L
        got = jnp.concatenate(outs, axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   atol=1e-5, rtol=1e-5, err_msg=str(segs))


def test_decoder_stream_matches_full():
    dec = wan_mod.WanVAEDecoder(CFG)
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((1, 9, 2, 4, CFG.z_ch)),
                    jnp.float32)
    params = dec.init(jax.random.PRNGKey(0), z)
    full = dec.apply(params, z)

    for segs in [(3, 3, 3), (1,) * 9, (4, 5), (9,)]:
        cache, outs, s = None, [], 0
        for L in segs:
            y, cache = dec.apply(params, z[:, s:s + L], cache,
                                 method="stream")
            outs.append(y)
            s += L
        got = jnp.concatenate(outs, axis=1)
        assert got.shape == full.shape, segs
        np.testing.assert_allclose(np.asarray(got), np.asarray(full),
                                   atol=1e-5, rtol=1e-5, err_msg=str(segs))


def test_roundtrip_shapes():
    """Stream encode -> stream decode keeps the 4k-3 frame contract."""
    enc = wan_mod.WanVAEEncoder(CFG)
    dec = wan_mod.WanVAEDecoder(CFG)
    t = 4 * 6 - 3
    x = _video(t, seed=2)
    ep = enc.init(jax.random.PRNGKey(0), x)
    z, _ = enc.apply(ep, x, None, method="stream")
    assert z.shape[1] == (t + 3) // 4
    dp = dec.init(jax.random.PRNGKey(1), z)
    y, _ = dec.apply(dp, z, None, method="stream")
    assert y.shape[1] == t
