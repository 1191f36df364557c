"""MoGe-mechanism point-map path: affine-invariant point-map head +
focal/z-shift recovery (reference moge_video.py consumes
output['intrinsics'] / output['depth'] / NaN sky from MoGeModel.infer,
whose core is exactly this recovery over the predicted point map)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.pipeline import depth as dstage


def _synthetic_points(h, w, xfov, t0, rng):
    """Ground-truth camera points for a known FOV, z shifted by -t0
    (the affine ambiguity the model leaves to inference)."""
    f = float(geo.normalized_focal_from_xfov(xfov, h, w))
    uv = np.asarray(geo.normalized_uv(h, w))
    z = rng.uniform(2.0, 12.0, (h, w)).astype(np.float32)
    pts = np.stack([uv[..., 0] / f * z, uv[..., 1] / f * z, z - t0],
                   axis=-1)
    return pts.astype(np.float32), f


def test_recover_focal_shift_oracle():
    rng = np.random.default_rng(0)
    pts, f_true = _synthetic_points(48, 64, 60.0, 3.7, rng)
    f, t, rms = jax.jit(geo.recover_focal_shift)(jnp.asarray(pts))
    assert abs(float(f) / f_true - 1.0) < 1e-2
    assert abs(float(t) - 3.7) < 0.05
    assert float(rms) < 1e-3
    xfov = float(geo.xfov_from_normalized_focal(f, 48, 64))
    assert abs(xfov - 60.0) < 0.5


def test_recover_shift_with_fixed_focal():
    rng = np.random.default_rng(1)
    pts, f_true = _synthetic_points(40, 56, 72.0, 1.25, rng)
    f, t, _ = jax.jit(
        lambda p: geo.recover_focal_shift(p, focal=f_true))(
        jnp.asarray(pts))
    assert float(f) == pytest.approx(f_true)
    assert abs(float(t) - 1.25) < 0.02


def test_recover_focal_shift_ignores_masked_sky():
    rng = np.random.default_rng(2)
    pts, f_true = _synthetic_points(48, 64, 55.0, 2.0, rng)
    bad = pts.copy()
    bad[:10] = 1e6  # corrupted sky band
    wts = np.ones((48, 64), np.float32)
    wts[:10] = 0.0
    f, t, _ = jax.jit(geo.recover_focal_shift)(
        jnp.asarray(bad), jnp.asarray(wts))
    assert abs(float(f) / f_true - 1.0) < 1e-2
    assert abs(float(t) - 2.0) < 0.05


def test_recover_focal_shift_scale_invariance():
    """Global scale on the point map scales the shift, not the focal
    (MoGe output is up-to-scale; intrinsics must not depend on it)."""
    rng = np.random.default_rng(3)
    pts, f_true = _synthetic_points(32, 48, 65.0, 4.0, rng)
    f1, t1, _ = jax.jit(geo.recover_focal_shift)(jnp.asarray(pts))
    f2, t2, _ = jax.jit(geo.recover_focal_shift)(jnp.asarray(3.0 * pts))
    assert abs(float(f2) / float(f1) - 1.0) < 1e-2
    assert abs(float(t2) / float(t1) - 3.0) < 0.1


def test_moge_engine_is_pointmap_based():
    eng = dstage.SingleFrameEngine(size="vitt", input_size=28,
                                   data_parallel=False, variant="moge",
                                   max_depth=50.0)
    assert eng.cfg.point_head and eng.cfg.dpt.n_out == 4
    assert eng.cfg.dpt.head_act == "none"
    assert eng.estimates_fov
    frames = np.random.default_rng(4).integers(
        0, 255, (2, 28, 28, 3), np.uint8)
    d, fovs = eng.infer_video(frames, batch=2, return_fov=True)
    assert d.shape == (2, 28, 28)
    assert np.isfinite(d).all() and d.min() >= 0 and d.max() <= 50.0
    # recovered per-frame FOV sidecar values
    assert fovs is not None and fovs.shape == (2,)
    assert np.isfinite(fovs).all() and (fovs > 0).all() and (fovs < 180).all()


def test_moge_engine_fixed_fov_conditioning():
    """--xfov: camera-ray conditioning + fixed-focal (shift-only)
    recovery; the sidecar carries the given FOV (reference passes fov_x
    into MoGeModel.infer)."""
    eng = dstage.SingleFrameEngine(size="vitt", input_size=28,
                                   data_parallel=False, variant="moge",
                                   xfov=60.0, max_depth=50.0)
    assert eng.cfg.point_head and eng.cfg.k_condition
    frames = np.random.default_rng(5).integers(
        0, 255, (1, 28, 28, 3), np.uint8)
    d, fovs = eng.infer_video(frames, batch=1, return_fov=True)
    assert d.shape == (1, 28, 28) and np.isfinite(d).all()
    np.testing.assert_allclose(fovs, 60.0)
