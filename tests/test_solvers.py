"""Solvers: scale/shift, Kabsch, Umeyama, ray intersection, PnP RANSAC —
validated on synthetic rigid motions with known ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import solvers


def _rotmat(rng, scale=1.0):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def test_scale_and_shift_recovers_affine(rng):
    pred = rng.uniform(0.1, 5.0, size=(1000,)).astype(np.float32)
    target = 2.5 * pred + 0.7
    s, o = solvers.scale_and_shift(jnp.asarray(pred), jnp.asarray(target))
    assert np.isclose(float(s), 2.5, atol=1e-4)
    assert np.isclose(float(o), 0.7, atol=1e-3)


def test_scale_and_shift_masked(rng):
    pred = rng.uniform(0.1, 5.0, size=(500,)).astype(np.float32)
    target = 3.0 * pred - 0.2
    target[::5] = 1000.0  # outliers, masked away
    w = np.ones(500, np.float32)
    w[::5] = 0.0
    s, o = solvers.scale_and_shift(jnp.asarray(pred), jnp.asarray(target),
                                   jnp.asarray(w))
    assert np.isclose(float(s), 3.0, atol=1e-3)


def test_scale_and_shift_singular_returns_identity():
    z = jnp.zeros((10,))
    s, o = solvers.scale_and_shift(z, z, z)
    assert float(s) == 1.0 and float(o) == 0.0


def test_least_squares_scale(rng):
    pred = rng.uniform(1.0, 10.0, size=(200,)).astype(np.float32)
    assert np.isclose(float(solvers.least_squares_scale(
        jnp.asarray(1.7 * pred), jnp.asarray(pred))), 1.7, atol=1e-4)


def test_rigid_transform_recovers_motion(rng):
    src = rng.normal(size=(100, 3)).astype(np.float32)
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = _rotmat(rng)
    t_gt[:3, 3] = [0.3, -0.5, 1.2]
    dst = src @ t_gt[:3, :3].T + t_gt[:3, 3]
    t = np.asarray(solvers.rigid_transform(jnp.asarray(src), jnp.asarray(dst)))
    assert np.allclose(t, t_gt, atol=1e-4)


def test_rigid_transform_zero_centroid_rotation_only(rng):
    src = rng.normal(size=(100, 3)).astype(np.float32) + 5.0
    r_gt = _rotmat(rng)
    dst = src @ r_gt.T
    t = np.asarray(solvers.rigid_transform(jnp.asarray(src), jnp.asarray(dst),
                                           zero_centroid=True))
    assert np.allclose(t[:3, :3], r_gt, atol=1e-4)
    assert np.allclose(t[:3, 3], 0.0, atol=1e-5)


def test_rigid_transform_weighted_ignores_outliers(rng):
    src = rng.normal(size=(120, 3)).astype(np.float32)
    t_gt = np.eye(4, dtype=np.float32)
    t_gt[:3, :3] = _rotmat(rng)
    t_gt[:3, 3] = [1.0, 0.0, -2.0]
    dst = src @ t_gt[:3, :3].T + t_gt[:3, 3]
    dst[:20] += rng.normal(size=(20, 3)) * 10  # corrupted
    w = np.ones(120, np.float32)
    w[:20] = 0.0
    t = np.asarray(solvers.rigid_transform(jnp.asarray(src), jnp.asarray(dst),
                                           weights=jnp.asarray(w)))
    assert np.allclose(t, t_gt, atol=1e-4)


def test_umeyama_recovers_sim3(rng):
    src = rng.normal(size=(60, 3)).astype(np.float32)
    r_gt = _rotmat(rng)
    s_gt, t_gt = 1.8, np.array([0.1, 2.0, -0.7], np.float32)
    dst = s_gt * src @ r_gt.T + t_gt
    s, r, t = solvers.umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
    assert np.isclose(float(s), s_gt, atol=1e-4)
    assert np.allclose(np.asarray(r), r_gt, atol=1e-4)
    assert np.allclose(np.asarray(t), t_gt, atol=1e-3)


def test_intersect_rays_converges_to_point(rng):
    target = np.array([1.0, -2.0, 8.0], np.float32)
    origins = rng.normal(size=(30, 3)).astype(np.float32) * 3.0
    dirs = target - origins
    x = np.asarray(solvers.intersect_rays(jnp.asarray(origins),
                                          jnp.asarray(dirs)))
    assert np.allclose(x, target, atol=1e-3)


def test_intersect_rays_with_padding(rng):
    target = np.array([0.5, 0.5, 5.0], np.float32)
    origins = np.zeros((20, 3), np.float32)
    origins[:10] = rng.normal(size=(10, 3))
    dirs = np.ones((20, 3), np.float32)
    dirs[:10] = target - origins[:10]
    valid = np.zeros(20, np.float32)
    valid[:10] = 1.0
    x = np.asarray(solvers.intersect_rays(
        jnp.asarray(origins), jnp.asarray(dirs), valid=jnp.asarray(valid)))
    assert np.allclose(x, target, atol=1e-3)


def test_ray_diversity_weights_prefer_diverse(rng):
    # 10 nearly-parallel rays + 1 orthogonal: orthogonal ray gets more weight.
    dirs = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (11, 1))
    dirs[:10, 0] = rng.normal(size=10) * 0.01
    dirs[10] = [1.0, 0.0, 0.0]
    w = np.asarray(solvers.ray_diversity_weights(jnp.asarray(dirs)))
    assert w[10] > w[:10].max() * 2


def test_pnp_gauss_newton_recovers_pose(rng):
    k = np.asarray(geo.camera_matrix_from_fov(640, 480, xfov_deg=60.0))
    pts3d = rng.uniform(-2, 2, size=(40, 3)).astype(np.float32)
    pts3d[:, 2] += 6.0
    rvec_gt = np.array([0.05, -0.1, 0.02], np.float32)
    tvec_gt = np.array([0.2, -0.1, 0.5], np.float32)
    r = np.asarray(solvers._so3_exp(jnp.asarray(rvec_gt)))
    pc = pts3d @ r.T + tvec_gt
    uv = pc[:, :2] / pc[:, 2:3] * [k[0, 0], k[1, 1]] + [k[0, 2], k[1, 2]]
    rv, tv, msr = solvers.pnp_gauss_newton(
        jnp.asarray(pts3d), jnp.asarray(uv.astype(np.float32)), jnp.asarray(k))
    assert float(msr) < 1e-4
    assert np.allclose(np.asarray(tv), tvec_gt, atol=1e-3)


def test_ransac_pnp_rejects_outliers(rng):
    k = np.asarray(geo.camera_matrix_from_fov(640, 480, xfov_deg=60.0))
    pts3d = rng.uniform(-2, 2, size=(60, 3)).astype(np.float32)
    pts3d[:, 2] += 6.0
    rvec_gt = np.array([0.03, 0.08, -0.01], np.float32)
    tvec_gt = np.array([-0.3, 0.2, 0.4], np.float32)
    r = np.asarray(solvers._so3_exp(jnp.asarray(rvec_gt)))
    pc = pts3d @ r.T + tvec_gt
    uv = (pc[:, :2] / pc[:, 2:3] * [k[0, 0], k[1, 1]]
          + [k[0, 2], k[1, 2]]).astype(np.float32)
    uv[:12] += rng.normal(size=(12, 2)).astype(np.float32) * 80  # outliers
    rv, tv, inl = solvers.ransac_pnp(
        jax.random.PRNGKey(0), jnp.asarray(pts3d), jnp.asarray(uv),
        jnp.asarray(k), num_hypotheses=64)
    inl = np.asarray(inl)
    assert inl[12:].mean() > 0.95 and inl[:12].mean() < 0.3
    assert np.allclose(np.asarray(tv), tvec_gt, atol=5e-2)
