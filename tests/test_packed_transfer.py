"""16-bit tile-bitpack disparity transfer (models/video_depth.py
pack_transfer): the packed fetch must equal the dense fetch up to the
16-bit quantization step, through the REAL window loop."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.models import video_depth as vd


def _fake_apply(params, x):
    """Deterministic smooth 'disparity' from the input frames: mean
    channel intensity blurred by downsampling statistics — enough
    structure for both the stitcher and the bitpack width buckets."""
    d = jnp.mean(x, axis=-1)
    return 0.1 + 0.9 * d * d


def test_pack_transfer_matches_dense():
    rng = np.random.default_rng(0)
    t, h, w = 10, 48, 300  # w deliberately not a TILE multiple
    frames = rng.integers(0, 255, (t, h, w, 3), np.uint8)
    # smooth scene: blocks + gradient (neural-depth-like statistics)
    yy = np.linspace(0, 255, h)[None, :, None, None]
    frames = np.clip(frames * 0.1 + yy * 0.9, 0, 255).astype(np.uint8)

    common = dict(work_hw=(h, w), out_hw=(h, w), window=4, overlap=2)
    dense = vd.infer_video_depth(_fake_apply, {}, frames, **common)
    packed = vd.infer_video_depth(_fake_apply, {}, frames,
                                  pack_transfer=True,
                                  transfer_hw=(h, w), **common)
    assert packed.shape == dense.shape == (t, h, w)
    # per-window quantization step = (max-min)/65535; the stitch
    # multiplies by per-window scale factors close to 1
    span = dense.max() - dense.min()
    assert np.max(np.abs(packed - dense)) < 4 * span / 65535


def test_pack_transfer_constant_disparity():
    """max == min inside a window (the 1e-12 quantization guard)."""
    frames = np.full((4, 32, 256, 3), 128, np.uint8)
    out = vd.infer_video_depth(
        lambda p, x: jnp.full(x.shape[:3], 0.5), {}, frames,
        work_hw=(32, 256), out_hw=(32, 256), window=4, overlap=1,
        pack_transfer=True, transfer_hw=(32, 256))
    assert np.allclose(out, 0.5, atol=1e-6)
