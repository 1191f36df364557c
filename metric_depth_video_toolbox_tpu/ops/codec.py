"""The metric-depth video codec — the system's central data contract.

Depth in meters is quantized to uint32 as ``e = depth * 255**4 / max_depth``
and the two most significant bytes are packed into video channels:
byte3 -> R *and* G (duplicated for robustness against chroma compression and
for visibility), byte2 -> B. Stored losslessly (FFV1). At the default
``max_depth = 100`` the quantization step is ``65536*100/255**4`` ~ 1.55 mm.

Behavioral parity targets (reference, for capability checking only):
  - quantization:        depth_frames_helper.py:5-24
  - log variant:         depth_frames_helper.py:26-46  (C=2.0, A=16538.0)
  - byte packing:        depth_frames_helper.py:48-75  (bit16 and 24-bit modes)
  - (R+G)/2 decode:      align_3d_points.py:201-205,
                         convert_metric_depth_video_to_other_format.py:646-652
                         (MSB = floor((R+G)/2) — robustness variant; the
                         plain decoder uses R only. Here both are one flag.)

Unlike the reference (per-frame numpy on host), these are jnp ops over whole
(T, H, W) frame batches resident in HBM, designed so XLA fuses the
quantize + shift/mask chain into the surrounding pipeline (e.g. directly
after a model's output matmul or before a warp). There is deliberately no
Python branching on data — everything is jit/vmap/shard_map safe.

All functions take/return RGB channel order (BGR only exists at the cv2
boundary in ``io.video``).
"""

from __future__ import annotations

import jax.numpy as jnp

# 255**4 = 4228250625 fits in uint32 (< 2**32).
_FULL_SCALE = float(255**4)

# Log-codec constants, chosen by the reference for reasonable resolution at
# max_depth 100 (depth_frames_helper.py:26-29).
LOG_C = 2.0
LOG_A = 16538.0


def encode_depth_to_uint32(depth, max_depth):
    """Quantize metric depth (meters) to the uint32 code space.

    ``e = uint32(clip(depth, 0, max_depth) * 255**4 / max_depth)`` —
    truncating, like the reference's float64 ``astype(np.uint32)``.

    TPUs have no float64, so the code is built in two float32 halves: the
    top 16 bits via ``floor(depth * scale / 2**16)`` (values <= 64519, well
    inside float32's exact-integer range — this is the half the bit16
    packing keeps, so the production contract stays faithful) and the low
    16 bits from the residual.
    """
    depth = jnp.clip(depth.astype(jnp.float32), 0.0, max_depth)
    multi = _FULL_SCALE / float(max_depth)
    hi = jnp.floor(depth * jnp.float32(multi / 65536.0))
    hi = jnp.clip(hi, 0.0, 65535.0)
    lo = jnp.floor((depth * jnp.float32(multi / 65536.0) - hi) * 65536.0)
    lo = jnp.clip(lo, 0.0, 65535.0)
    return (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)


def decode_uint32_to_depth(code, max_depth):
    """Inverse of :func:`encode_depth_to_uint32` (float32 meters)."""
    multi = float(max_depth) / _FULL_SCALE
    return code.astype(jnp.float32) * jnp.float32(multi)


def encode_depth_to_uint32_log(depth, max_depth):
    """Log-scale variant: ``e = round(A * log1p(depth / C))``."""
    depth = jnp.clip(depth.astype(jnp.float32), 0.0, max_depth)
    return jnp.round(LOG_A * jnp.log1p(depth / LOG_C)).astype(jnp.uint32)


def decode_uint32_log_to_depth(code, max_depth):
    """Inverse of the log variant: ``depth = C * expm1(e / A)``."""
    del max_depth  # kept for interface symmetry with the linear codec
    e = code.astype(jnp.float32)
    return (LOG_C * jnp.expm1(e / LOG_A)).astype(jnp.float32)


def pack_uint32_to_rgb(code, bit16=True):
    """Pack uint32 depth codes into an RGB uint8 image.

    bit16 mode (the production contract): R = G = byte3 (MSB), B = byte2.
    24-bit mode: R = byte2, G = byte1, B = byte0 (full low 24 bits).

    Returns uint8 with a trailing channel axis of size 3 appended to
    ``code.shape``.
    """
    code = code.astype(jnp.uint32)
    if bit16:
        msb = ((code >> 24) & 0xFF).astype(jnp.uint8)
        b2 = ((code >> 16) & 0xFF).astype(jnp.uint8)
        return jnp.stack([msb, msb, b2], axis=-1)
    b2 = ((code >> 16) & 0xFF).astype(jnp.uint8)
    b1 = ((code >> 8) & 0xFF).astype(jnp.uint8)
    b0 = (code & 0xFF).astype(jnp.uint8)
    return jnp.stack([b2, b1, b0], axis=-1)


def unpack_rgb_to_uint32(rgb, bit16=True, average_rg=False):
    """Unpack an RGB uint8 image back to uint32 depth codes.

    ``average_rg=True`` reconstructs the MSB as ``floor((R + G) / 2)`` —
    averaging the duplicated channel to suppress chroma-compression noise.
    With lossless FFV1 input both modes are identical.
    """
    rgb = rgb.astype(jnp.uint32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    if bit16:
        msb = jnp.where(average_rg, (r + g) // 2, r)
        return (msb << 24) | (b << 16)
    return (r << 16) | (g << 8) | b


def encode_depth_frame(depth, max_depth, bit16=True, log=False):
    """depth (..., H, W) meters -> RGB uint8 (..., H, W, 3). Fused path."""
    enc = encode_depth_to_uint32_log if log else encode_depth_to_uint32
    return pack_uint32_to_rgb(enc(depth, max_depth), bit16=bit16)


def decode_depth_frame(rgb, max_depth, bit16=True, average_rg=False, log=False):
    """RGB uint8 (..., H, W, 3) -> float32 depth (..., H, W) meters."""
    code = unpack_rgb_to_uint32(rgb, bit16=bit16, average_rg=average_rg)
    dec = decode_uint32_log_to_depth if log else decode_uint32_to_depth
    return dec(code, max_depth)


def quantization_step(max_depth, bit16=True):
    """Size in meters of one representable depth step (~1.55 mm at 100 m)."""
    bits_dropped = 16 if bit16 else 8
    return (2.0**bits_dropped) * float(max_depth) / _FULL_SCALE


def normalize_depth(depth, low_pct=1.0, high_pct=99.0):
    """Percentile-normalize a depth map to [0, 1] for visualization.

    Mirrors reference depth_frames_helper.py:105-123 but stays on device and
    handles non-finite values with masking instead of boolean indexing
    (static shapes for jit).
    """
    d = depth.astype(jnp.float32)
    finite = jnp.isfinite(d)
    safe = jnp.where(finite, d, 0.0)
    # Percentiles over valid values only: use a large sentinel sort trick.
    big = jnp.where(finite, d, jnp.inf)
    small = jnp.where(finite, d, -jnp.inf)
    n_valid = jnp.maximum(finite.sum(), 1)
    flat_hi = jnp.sort(big.reshape(-1))
    flat_lo = jnp.sort(small.reshape(-1))[::-1]  # descending, -inf at end
    lo_idx = jnp.clip((low_pct / 100.0) * (n_valid - 1), 0, flat_hi.size - 1)
    hi_idx = jnp.clip((high_pct / 100.0) * (n_valid - 1), 0, flat_hi.size - 1)
    d_min = flat_hi[lo_idx.astype(jnp.int32)]
    d_max = flat_hi[hi_idx.astype(jnp.int32)]
    rng = d_max - d_min
    out = jnp.clip((safe - d_min) / jnp.maximum(rng, 1e-6), 0.0, 1.0)
    return jnp.where(rng <= 1e-6, jnp.zeros_like(out), out)
