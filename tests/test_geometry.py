"""Geometry core: intrinsics, unprojection/projection, normals, transforms."""

import numpy as np
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.ops import geometry as geo


def test_camera_matrix_from_fov():
    k = np.asarray(geo.camera_matrix_from_fov(1920, 1080, xfov_deg=90.0))
    assert np.isclose(k[0, 0], 1920 / (2 * np.tan(np.pi / 4)))
    assert np.isclose(k[1, 1], k[0, 0])  # square pixels when yfov omitted
    assert np.isclose(k[0, 2], 960) and np.isclose(k[1, 2], 540)
    fx, fy = geo.fov_from_camera_matrix(jnp.asarray(k))
    assert np.isclose(float(fx), 90.0, atol=1e-4)


def test_unproject_project_roundtrip(rng):
    h, w = 24, 32
    k = geo.camera_matrix_from_fov(w, h, xfov_deg=60.0)
    depth = jnp.asarray(rng.uniform(1.0, 10.0, (h, w)).astype(np.float32))
    pts = geo.unproject_depth(depth, k)
    assert pts.shape == (h, w, 3)
    uv, z = geo.project_points(pts.reshape(-1, 3), k)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    assert np.allclose(np.asarray(uv[:, 0]), x.reshape(-1), atol=1e-3)
    assert np.allclose(np.asarray(uv[:, 1]), y.reshape(-1), atol=1e-3)
    assert np.allclose(np.asarray(z), np.asarray(depth).reshape(-1))


def test_of_by_one_grid_scaling():
    x, y = geo.pixel_grid(10, 20, of_by_one=True)
    assert np.isclose(float(x[0, -1]), 19 * 21 / 20)
    assert np.isclose(float(y[-1, 0]), 9 * 11 / 10)


def test_transform_points_matches_homogeneous(rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = _rotmat(rng)
    t[:3, 3] = [0.5, -1.0, 2.0]
    ours = np.asarray(geo.transform_points(jnp.asarray(pts), jnp.asarray(t)))
    hom = np.hstack([pts, np.ones((50, 1), np.float32)]) @ t.T
    assert np.allclose(ours, hom[:, :3], atol=1e-5)


def test_normals_flat_plane_points_at_camera():
    # A fronto-parallel plane must yield normals (0, 0, +1) after the
    # DirectX flip (cross of +x and -y tangents -> -z, flipped to +z).
    h, w = 16, 16
    k = geo.camera_matrix_from_fov(w, h, xfov_deg=60.0)
    n = np.asarray(geo.normals_from_depth(jnp.full((h, w), 5.0), k))
    inner = n[:-1, :-1]  # edge rows/cols replicate
    assert np.allclose(np.abs(inner[..., 2]), 1.0, atol=1e-5)


def test_eye_view_transform_inverse():
    fwd = geo.eye_view_transform(0.032, 0.02)
    rev = geo.eye_view_transform(0.032, 0.02, reverse=True)
    assert np.allclose(np.asarray(fwd @ rev), np.eye(4), atol=1e-6)


def test_convergence_angle():
    a = float(geo.convergence_angle(2.0, 0.064))
    assert np.isclose(a, np.arctan(0.032 / 2.0))


def test_rotation_y_orthonormal():
    r = np.asarray(geo.rotation_y(0.3))
    assert np.allclose(r @ r.T, np.eye(4), atol=1e-6)
    assert np.isclose(np.linalg.det(r[:3, :3]), 1.0)


def test_cv_to_gl_view_identity():
    v = np.asarray(geo.cv_to_gl_view(jnp.eye(4)))
    assert np.allclose(v, np.eye(4), atol=1e-6)


def _rotmat(rng):
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)
