"""Depth codec parity: round-trip precision and bit-faithfulness to the
reference formula (reimplemented here in float64 numpy as the oracle)."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import codec


def oracle_encode_uint32(depth, max_depth):
    # reference depth_frames_helper.py:5-11 (float64, truncating)
    depth = np.clip(depth.astype(np.float64), 0.0, max_depth)
    multi = (255**4) / float(max_depth)
    return (multi * depth).astype(np.uint32)


def oracle_pack_bit16(code):
    b = code.view(np.uint8).reshape(code.shape + (4,))
    return np.stack([b[..., 3], b[..., 3], b[..., 2]], axis=-1)  # R, G, B


def test_roundtrip_precision_16bit(rng):
    max_depth = 100.0
    depth = rng.uniform(0.0, max_depth, size=(4, 32, 48)).astype(np.float32)
    rgb = codec.encode_depth_frame(jnp.asarray(depth), max_depth)
    out = np.asarray(codec.decode_depth_frame(rgb, max_depth))
    step = codec.quantization_step(max_depth)
    assert abs(step - 65536 * 100 / 255**4) < 1e-9  # ~1.55 mm
    err = np.abs(out - depth)
    assert err.max() <= step + 1e-6
    assert err.mean() <= step  # MAE well under one step


def test_bit16_packing_matches_reference_oracle(rng):
    max_depth = 100.0
    depth = rng.uniform(0.0, max_depth, size=(64, 64)).astype(np.float32)
    ours = np.asarray(codec.encode_depth_frame(jnp.asarray(depth), max_depth))
    oracle = oracle_pack_bit16(oracle_encode_uint32(depth, max_depth))
    # float32-vs-float64 scaling may differ by 1 code step right at
    # quantization boundaries (~0.4% of uniform samples); the guarantee is
    # <=1 step everywhere, i.e. within the codec's own precision claim.
    exact = (ours == oracle).all(axis=-1)
    assert exact.mean() > 0.99
    hi_ours = ours[..., 0].astype(np.int32) * 256 + ours[..., 2]
    hi_oracle = oracle[..., 0].astype(np.int32) * 256 + oracle[..., 2]
    assert np.abs(hi_ours - hi_oracle).max() <= 1


def test_unpack_is_exact_inverse_of_pack(rng):
    code = rng.integers(0, 2**32, size=(16, 16), dtype=np.uint32)
    for bit16 in (True, False):
        rgb = codec.pack_uint32_to_rgb(jnp.asarray(code), bit16=bit16)
        back = np.asarray(codec.unpack_rgb_to_uint32(rgb, bit16=bit16))
        if bit16:
            assert (back == (code & 0xFFFF0000)).all()
        else:
            assert (back == (code & 0x00FFFFFF)).all()


def test_average_rg_decode_variant(rng):
    # Matches align_3d_points.py:201-205: MSB = floor((R+G)/2).
    rgb = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    got = np.asarray(codec.unpack_rgb_to_uint32(jnp.asarray(rgb),
                                                average_rg=True))
    r = rgb[..., 0].astype(np.uint32)
    g = rgb[..., 1].astype(np.uint32)
    b = rgb[..., 2].astype(np.uint32)
    want = (((r + g) // 2) << 24) | (b << 16)
    assert (got == want).all()


def test_log_codec_roundtrip(rng):
    max_depth = 100.0
    depth = rng.uniform(0.0, max_depth, size=(32, 32)).astype(np.float32)
    code = codec.encode_depth_to_uint32_log(jnp.asarray(depth), max_depth)
    out = np.asarray(codec.decode_uint32_log_to_depth(code, max_depth))
    # log codec: relative precision; near depth d the step is ~(C+d)/A.
    # float32 log1p/expm1 rounding can add ~1 extra step on top of the
    # half-step quantization, so allow 2.5 steps.
    step = (codec.LOG_C + depth) / codec.LOG_A
    assert (np.abs(out - depth) <= 2.5 * step + 1e-4).all()


def test_normalize_depth(rng):
    d = rng.uniform(1.0, 50.0, size=(24, 24)).astype(np.float32)
    d[0, 0] = np.nan
    out = np.asarray(codec.normalize_depth(jnp.asarray(d)))
    assert out.min() >= 0.0 and out.max() <= 1.0
    flat = codec.normalize_depth(jnp.full((8, 8), 3.0))
    assert np.allclose(np.asarray(flat), 0.0)
