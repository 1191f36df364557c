"""Pallas disparity-sweep kernel (interpret mode on CPU): shift
correctness, occlusion ordering, hole semantics."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import rasterize
from metric_depth_video_toolbox_tpu.ops import warp_pallas


def test_disparity_sweep_constant_depth_shift():
    h, w = 16, 256
    depth = np.full((h, w), 4.0, np.float32)
    color = np.zeros((3, h, w), np.float32)
    color[0] = np.linspace(0, 1, w)[None, :]
    pad_l, pad_r = warp_pallas.pad_widths(w, 128)
    dpad = np.pad(depth, ((0, 0), (pad_l, pad_r)))
    cpad = np.pad(color, ((0, 0), (0, 0), (pad_l, pad_r)))
    # single plane at z=4 with disparity +10.25
    best_z, col, found = warp_pallas.disparity_sweep(
        jnp.asarray(dpad), jnp.asarray(cpad),
        jnp.asarray([10], np.int32), jnp.asarray([0.25], np.float32),
        jnp.asarray([4.0], np.float32), jnp.asarray([0.5], np.float32),
        num_planes=1, pad_left=pad_l, interpret=True)
    found = np.asarray(found)
    col = np.asarray(col)
    # interior pixels: target x samples source x+10.25
    xs = np.arange(0, w - 12)
    expected = (xs + 10.25) / (w - 1)
    assert found[:, : w - 12].all()
    assert np.allclose(col[5, xs, 0], expected, atol=1e-3)
    # beyond the right edge the source is zero padding -> no hit
    assert not found[:, -2:].any()


def test_disparity_sweep_front_plane_wins():
    h, w = 8, 128
    depth = np.full((h, w), 8.0, np.float32)
    depth[:, 40:80] = 2.0
    color = np.ones((3, h, w), np.float32)
    pad_l, pad_r = warp_pallas.pad_widths(w, 128)
    dpad = np.pad(depth, ((0, 0), (pad_l, pad_r)))
    cpad = np.pad(color, ((0, 0), (0, 0), (pad_l, pad_r)))
    # two planes, front first (z=2 then z=8), zero disparity
    best_z, col, found = warp_pallas.disparity_sweep(
        jnp.asarray(dpad), jnp.asarray(cpad),
        jnp.asarray([0, 0], np.int32), jnp.asarray([0.0, 0.0], np.float32),
        jnp.asarray([2.0, 8.0], np.float32),
        jnp.asarray([0.3, 0.3], np.float32),
        num_planes=2, pad_left=pad_l, interpret=True)
    bz = np.asarray(best_z)
    assert np.allclose(bz[:, 45:75], 2.0, atol=0.05)
    assert np.allclose(bz[:, :35], 8.0, atol=0.05)
    assert np.asarray(found).all()


def test_stereo_sweep_warp_identity():
    h, w = 32, 192
    k = geo.camera_matrix_from_fov(w, h, xfov_deg=60.0)
    depth = np.full((h, w), 5.0, np.float32)
    color = np.zeros((h, w, 3), np.float32)
    color[..., 1] = np.linspace(0, 1, h)[:, None]
    res = rasterize.stereo_sweep_warp(
        jnp.asarray(depth), jnp.asarray(color), k, jnp.eye(4),
        num_planes=32, remove_edges=False, neutralize_rotation=False,
        interpret=True)
    mask = np.asarray(res.mask)
    assert mask.mean() > 0.99
    assert np.abs(np.asarray(res.depth)[mask] - 5.0).max() < 0.2
    got = np.asarray(res.color)
    want = np.broadcast_to(color[..., 1], (h, w))
    assert np.abs(got[..., 1][mask] - want[mask]).max() < 0.02


def test_stereo_sweep_warp_eye_shift_disparity():
    h, w = 32, 256
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0))
    depth = np.full((h, w), 4.0, np.float32)
    color = np.zeros((h, w, 3), np.float32)
    color[:, 100:120] = [1.0, 0, 0]
    m = np.eye(4, dtype=np.float32)
    m[0, 3] = 0.2  # points move +x
    res = rasterize.stereo_sweep_warp(
        jnp.asarray(depth), jnp.asarray(color), jnp.asarray(k),
        jnp.asarray(m), num_planes=64, remove_edges=False,
        neutralize_rotation=False, interpret=True)
    col = np.asarray(res.color)
    # expected pixel shift = fx * tx / z
    shift = k[0, 0] * 0.2 / 4.0
    red_cols = np.where(col[16, :, 0] > 0.5)[0]
    assert red_cols.size > 0
    assert abs(red_cols.mean() - (109.5 + shift)) < 1.5
