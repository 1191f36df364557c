"""Native C++ host runtime: codec parity with the jnp codec, PLY bytes,
ring buffer semantics (falls back to numpy when the .so isn't built)."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import native
from metric_depth_video_toolbox_tpu.ops import codec


def test_native_encode_matches_device_codec(rng):
    depth = rng.uniform(0, 100, (32, 48)).astype(np.float32)
    a = native.encode_depth_rgb(depth, 100.0)
    b = np.asarray(codec.encode_depth_frame(jnp.asarray(depth), 100.0))
    hi_a = a[..., 0].astype(int) * 256 + a[..., 2]
    hi_b = b[..., 0].astype(int) * 256 + b[..., 2]
    assert np.abs(hi_a - hi_b).max() <= 1  # float rounding at boundaries
    assert (a[..., 0] == a[..., 1]).all()


def test_native_decode_roundtrip(rng):
    depth = rng.uniform(0, 100, (16, 16)).astype(np.float32)
    rgb = native.encode_depth_rgb(depth, 100.0)
    out = native.decode_rgb_depth(rgb, 100.0)
    assert np.abs(out - depth).max() <= 65536 * 100 / 255**4 + 1e-6


def test_ply_bytes_parse(rng, tmp_path):
    from metric_depth_video_toolbox_tpu.io import pointcloud as pcio
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.integers(0, 255, (50, 3)).astype(np.uint8)
    data = native.ply_bytes(pts, cols)
    p = tmp_path / "n.ply"
    p.write_bytes(data)
    back_pts, back_cols = pcio.read_ply(str(p))
    assert np.allclose(back_pts, pts)
    assert (back_cols == cols).all()


def test_ring_buffer_roundtrip():
    ring = native.RingBuffer(64)
    assert ring.push(b"hello") == 5
    assert ring.used == 5
    assert ring.pop(3) == b"hel"
    assert ring.pop(10) == b"lo"
    assert ring.used == 0
    # capacity limit
    big = bytes(range(200)) * 2
    pushed = ring.push(big[:100])
    assert pushed <= 63
