"""Global bundle adjustment on a synthetic scene with known camera
trajectory: noisy initial poses must converge to the truth."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import solvers
from metric_depth_video_toolbox_tpu.pipeline import slam


def _make_scene(rng, t=8, n=60, w=64, h=48, traj=None):
    k = np.asarray(geo.camera_matrix_from_fov(w, h, xfov_deg=60.0),
                   np.float32)
    world = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                      rng.uniform(5, 12, n)], -1).astype(np.float32)
    track_uv = np.zeros((t, n, 2), np.float32)
    valid = np.ones((t, n), np.float32)
    z_cam = np.zeros((t, n), np.float32)
    rvecs = np.zeros((t, 3), np.float32)
    tvecs = np.zeros((t, 3), np.float32)
    if traj is None:
        # default: camera slides +x and yaws slightly
        traj = lambda fi: (0.05 * fi, 0.004 * fi)
    for fi in range(t):
        cam_x, yaw = traj(fi)
        r = np.asarray(solvers._so3_exp(jnp.asarray([0, yaw, 0.0])))
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = r
        c2w[0, 3] = cam_x
        w2c = np.linalg.inv(c2w)
        rvecs[fi] = slam._log_so3(w2c[:3, :3])
        tvecs[fi] = w2c[:3, 3]
        pc = world @ w2c[:3, :3].T + w2c[:3, 3]
        uv = pc[:, :2] / pc[:, 2:3] * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
        track_uv[fi] = uv
        z_cam[fi] = pc[:, 2]
        valid[fi] = ((uv[:, 0] > 0) & (uv[:, 0] < w)
                     & (uv[:, 1] > 0) & (uv[:, 1] < h)).astype(np.float32)
    first_idx = np.argmax(valid > 0, axis=0)
    anchor_depth = z_cam[first_idx, np.arange(n)].astype(np.float32)
    return k, world, track_uv, valid, rvecs, tvecs, anchor_depth


def test_bundle_adjust_recovers_trajectory(rng):
    k, world, uv, valid, rv_gt, tv_gt, anchor_z = _make_scene(rng)
    # corrupt the initial poses (except frame 0 = gauge)
    rv0 = rv_gt.copy()
    tv0 = tv_gt.copy()
    rv0[1:] += rng.normal(size=rv0[1:].shape).astype(np.float32) * 0.01
    tv0[1:] += rng.normal(size=tv0[1:].shape).astype(np.float32) * 0.05
    rv, tv, fs, logz, res = slam.bundle_adjust(
        jnp.asarray(uv), jnp.asarray(valid), jnp.asarray(anchor_z),
        jnp.asarray(k), jnp.asarray(rv0), jnp.asarray(tv0), iters=8)
    res = float(res)
    assert res < 0.2, f"mean reprojection {res}px"
    tv = np.asarray(tv)
    assert np.abs(tv - tv_gt).max() < 0.03


def test_bundle_adjust_focal_refinement(rng):
    k, world, uv, valid, rv_gt, tv_gt, anchor_z = _make_scene(rng)
    # observations generated with a 5% longer focal than we assume
    k_wrong = k.copy()
    k_wrong[0, 0] /= 1.05
    k_wrong[1, 1] /= 1.05
    rv, tv, fs, logz, res = slam.bundle_adjust(
        jnp.asarray(uv), jnp.asarray(valid), jnp.asarray(anchor_z),
        jnp.asarray(k_wrong), jnp.asarray(rv_gt), jnp.asarray(tv_gt),
        iters=16, optimize_focal=True)
    assert abs(float(fs) - 1.05) < 0.035
    assert float(res) < 0.3


def test_bundle_adjust_at_reference_scale(rng):
    """Schur-complement BA at the reference's track count (512 tracks,
    sam_track_video.py:200) and a CPU-feasible slice of its frame count
    (300 of 1500; the 1500-frame system is the same program with a
    9001-dim reduced solve — the old dense-jacfwd formulation needed
    ~56 GB at that scale and could not run at all)."""
    k, world, uv, valid, rv_gt, tv_gt, anchor_z = _make_scene(
        rng, t=300, n=512, w=128, h=96,
        traj=lambda fi: (1.5 * np.sin(0.05 * fi),
                         0.1 * np.sin(0.03 * fi)))
    uv_noisy = uv + rng.normal(size=uv.shape).astype(np.float32) * 0.3
    rv0 = rv_gt.copy()
    tv0 = tv_gt.copy()
    rv0[1:] += rng.normal(size=rv0[1:].shape).astype(np.float32) * 0.005
    tv0[1:] += rng.normal(size=tv0[1:].shape).astype(np.float32) * 0.03
    rv, tv, fs, logz, res = slam.bundle_adjust(
        jnp.asarray(uv_noisy), jnp.asarray(valid), jnp.asarray(anchor_z),
        jnp.asarray(k), jnp.asarray(rv0), jnp.asarray(tv0), iters=6)
    res = float(res)
    assert res < 0.6, f"mean reprojection {res}px"  # 0.3px noise floor
    tv = np.asarray(tv)
    # initial corruption is ~0.03 everywhere; BA must tighten it to the
    # noise-limited regime (runs ~9 s on one CPU core at this scale)
    err = np.abs(tv - tv_gt)
    assert err.max() < 0.025
    assert np.percentile(err, 99) < 0.016


def test_log_so3_roundtrip(rng):
    w = rng.normal(size=3).astype(np.float32) * 0.3
    r = np.asarray(solvers._so3_exp(jnp.asarray(w)))
    back = slam._log_so3(r)
    assert np.allclose(back, w, atol=1e-4)
