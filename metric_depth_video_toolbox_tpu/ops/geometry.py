"""Camera models and 3D geometry (jnp, fully batched/vmappable).

Capability parity with the reference's numpy geometry core
(depth_map_tools.py), re-expressed as shape-static jnp so whole frame
batches stay in HBM and XLA fuses unproject -> transform -> project chains
into the warp kernels.

Conventions:
  - Pinhole camera, principal point at image center (reference
    depth_map_tools.py:902-934). +Z into the screen (OpenCV camera space).
  - Points are (..., N, 3); transforms are (..., 4, 4) camera-to-world.
  - Depth maps are (..., H, W) float meters.

Reference behavior being matched (file:line, for parity checking only):
  - compute_camera_matrix:        depth_map_tools.py:902-934
  - fov_from_camera_matrix:       depth_map_tools.py:1640-1649
  - create_point_cloud_from_depth depth_map_tools.py:1112-1133 (incl. the
    deliberate `of_by_one` (w+1)/w grid scaling used by the mesh path)
  - calculate_normals:            depth_map_tools.py:20-60 (DirectX Y/Z flip)
  - transform_points:             depth_map_tools.py:977-1004
  - rotation_y/translation/get_cam_view/convergence_angle:
                                  depth_map_tools.py:209-262
"""

from __future__ import annotations

import math

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Camera intrinsics
# ---------------------------------------------------------------------------

def camera_matrix_from_fov(width, height, xfov_deg=None, yfov_deg=None,
                           dtype=jnp.float32):
    """3x3 intrinsics K from horizontal and/or vertical FOV in degrees.

    If only one FOV is given, the other focal length is set equal
    (square pixels). Principal point = image center.
    """
    if xfov_deg is None and yfov_deg is None:
        raise ValueError("need xfov_deg or yfov_deg")
    fx = fy = None
    if xfov_deg is not None:
        fx = width / (2.0 * jnp.tan(jnp.deg2rad(jnp.asarray(xfov_deg, dtype)) / 2.0))
    if yfov_deg is not None:
        fy = height / (2.0 * jnp.tan(jnp.deg2rad(jnp.asarray(yfov_deg, dtype)) / 2.0))
    if fy is None:
        fy = fx
    if fx is None:
        fx = fy
    z = jnp.zeros_like(fx)
    o = jnp.ones_like(fx)
    row0 = jnp.stack([fx, z, o * (width / 2.0)], axis=-1)
    row1 = jnp.stack([z, fy, o * (height / 2.0)], axis=-1)
    row2 = jnp.stack([z, z, o], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2).astype(dtype)


def fov_from_camera_matrix(K):
    """(xfov_deg, yfov_deg) from K, assuming centered principal point."""
    w = K[..., 0, 2] * 2.0
    h = K[..., 1, 2] * 2.0
    fov_x = jnp.rad2deg(2.0 * jnp.arctan2(w, 2.0 * K[..., 0, 0]))
    fov_y = jnp.rad2deg(2.0 * jnp.arctan2(h, 2.0 * K[..., 1, 1]))
    return fov_x, fov_y


def focal_scale_for_master_fov(master_fov_deg, xfov_deg):
    """Depth rescale factor tan(master/2)/tan(xfov/2) used when rendering a
    variable-FOV sequence through one fixed 'master' camera
    (reference stereo_rerender.py:537-541)."""
    m = jnp.tan(jnp.deg2rad(jnp.asarray(master_fov_deg)) / 2.0)
    x = jnp.tan(jnp.deg2rad(jnp.asarray(xfov_deg)) / 2.0)
    return m / x


# ---------------------------------------------------------------------------
# Unprojection / projection
# ---------------------------------------------------------------------------

def pixel_grid(height, width, of_by_one=False, dtype=jnp.float32):
    """(H, W) pixel-center coordinate grids (x, y).

    ``of_by_one=True`` applies the reference's mesh-path compensation —
    scaling coordinates by (W+1)/W, (H+1)/H because a depth-grid mesh fills
    the area *between* vertices (depth_map_tools.py:1117-1122).
    """
    x = jnp.arange(width, dtype=dtype)
    y = jnp.arange(height, dtype=dtype)
    if of_by_one:
        x = x * ((width + 1.0) / width)
        y = y * ((height + 1.0) / height)
    return jnp.meshgrid(x, y)


def unproject_depth(depth, K, of_by_one=False):
    """Depth map (..., H, W) -> camera-space points (..., H, W, 3).

    x3d = (u - cx) z / fx ; y3d = (v - cy) z / fy ; z3d = z.
    """
    h, w = depth.shape[-2], depth.shape[-1]
    x, y = pixel_grid(h, w, of_by_one=of_by_one, dtype=jnp.float32)
    fx = K[..., 0, 0][..., None, None]
    fy = K[..., 1, 1][..., None, None]
    cx = K[..., 0, 2][..., None, None]
    cy = K[..., 1, 2][..., None, None]
    z = depth.astype(jnp.float32)
    x3d = (x - cx) * z / fx
    y3d = (y - cy) * z / fy
    return jnp.stack([x3d, y3d, z], axis=-1)


def project_points(points, K, eps=1e-9):
    """Camera-space points (..., 3) -> pixel coords (..., 2) + depth (...,).

    Pinhole, no distortion (the reference always passes zero distortion to
    cv2.projectPoints, depth_map_tools.py:1057-1069).
    """
    z = points[..., 2]
    safe_z = jnp.where(jnp.abs(z) < eps, eps, z)
    u = points[..., 0] / safe_z * K[..., 0, 0, None] + K[..., 0, 2, None]
    v = points[..., 1] / safe_z * K[..., 1, 1, None] + K[..., 1, 2, None]
    return jnp.stack([u, v], axis=-1), z


def unproject_2d_points(points_2d, depth_at, K):
    """2D pixel coords (..., N, 2) + per-point depth (..., N) -> 3D (..., N, 3)."""
    fx = K[..., 0, 0, None]
    fy = K[..., 1, 1, None]
    cx = K[..., 0, 2, None]
    cy = K[..., 1, 2, None]
    z = depth_at.astype(jnp.float32)
    x3d = (points_2d[..., 0] - cx) * z / fx
    y3d = (points_2d[..., 1] - cy) * z / fy
    return jnp.stack([x3d, y3d, z], axis=-1)


def transform_points(points, transform):
    """(..., N, 3) x (..., 4, 4) homogeneous transform -> (..., N, 3)."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, points) + t[..., None, :]


def transform_depth_map(points_hw3, transform):
    """(..., H, W, 3) image-shaped point maps through a 4x4 transform."""
    rot = transform[..., :3, :3]
    t = transform[..., :3, 3]
    return jnp.einsum("...ij,...hwj->...hwi", rot, points_hw3) + t[..., None, None, :]


# ---------------------------------------------------------------------------
# Normals
# ---------------------------------------------------------------------------

def normals_from_depth(depth, K, directx=True):
    """Per-pixel normals from forward differences of unprojected points.

    Matches the reference's construction (depth_map_tools.py:20-60): the
    Y axis is flipped *before* the cross product ((cy - v)/fy) and the
    result gets a DirectX-style Y/Z flip. Edge rows/cols replicate their
    neighbor (zero difference -> relies on the +eps norm guard).
    """
    h, w = depth.shape[-2], depth.shape[-1]
    x, y = pixel_grid(h, w, dtype=jnp.float32)
    fx = K[..., 0, 0][..., None, None]
    fy = K[..., 1, 1][..., None, None]
    cx = K[..., 0, 2][..., None, None]
    cy = K[..., 1, 2][..., None, None]
    z = depth.astype(jnp.float32)
    px = (x - cx) / fx * z
    py = (cy - y) / fy * z
    p = jnp.stack([px, py, z], axis=-1)  # (..., H, W, 3)

    # forward differences, clamped at the far edge (replicate -> zero diff)
    p_x1 = jnp.concatenate([p[..., :, 1:, :], p[..., :, -1:, :]], axis=-2)
    p_y1 = jnp.concatenate([p[..., 1:, :, :], p[..., -1:, :, :]], axis=-3)
    v1 = p_x1 - p
    v2 = p_y1 - p
    n = jnp.cross(v1, v2)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-8)
    if directx:
        n = n * jnp.array([1.0, -1.0, -1.0], dtype=n.dtype)
    return n


# ---------------------------------------------------------------------------
# Rigid transforms for stereo eyes / cameras
# ---------------------------------------------------------------------------

def rotation_y(angle_rad, dtype=jnp.float32):
    a = jnp.asarray(angle_rad, dtype)
    c, s = jnp.cos(a), jnp.sin(a)
    z = jnp.zeros_like(a)
    o = jnp.ones_like(a)
    rows = [
        jnp.stack([c, z, s, z], axis=-1),
        jnp.stack([z, o, z, z], axis=-1),
        jnp.stack([-s, z, c, z], axis=-1),
        jnp.stack([z, z, z, o], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def translation_matrix(x, y, z, dtype=jnp.float32):
    x = jnp.asarray(x, dtype)
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    yv = jnp.broadcast_to(jnp.asarray(y, dtype), x.shape)
    zv = jnp.broadcast_to(jnp.asarray(z, dtype), x.shape)
    rows = [
        jnp.stack([one, zero, zero, x], axis=-1),
        jnp.stack([zero, one, zero, yv], axis=-1),
        jnp.stack([zero, zero, one, zv], axis=-1),
        jnp.stack([zero, zero, zero, one], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def convergence_angle(distance, pupillary_distance):
    """Per-eye inward (toe-in) rotation so both eyes look at ``distance``:
    atan((IPD/2) / d)."""
    return jnp.arctan2(jnp.asarray(pupillary_distance) / 2.0,
                       jnp.asarray(distance))


def eye_view_transform(side_offset, convergence_angle_rad=0.0, reverse=False):
    """Stereo-eye view transform: translate the eye sideways then rotate it
    inward (toe-in). ``reverse`` gives the exact inverse ordering, matching
    reference get_cam_view (depth_map_tools.py:226-248) whose base look-at
    (origin, -Z, +Y) is the identity.
    """
    if not reverse:
        return rotation_y(convergence_angle_rad) @ translation_matrix(
            side_offset, 0.0, 0.0)
    return translation_matrix(-jnp.asarray(side_offset), 0.0, 0.0) @ rotation_y(
        -jnp.asarray(convergence_angle_rad))


def look_at(eye, target, up):
    """Right-handed look-at view matrix (GL convention: camera looks down -Z)."""
    eye = jnp.asarray(eye, jnp.float32)
    f = target - eye
    f = f / (jnp.linalg.norm(f) + 1e-12)
    s = jnp.cross(f, jnp.asarray(up, jnp.float32))
    s = s / (jnp.linalg.norm(s) + 1e-12)
    u = jnp.cross(s, f)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, :3].set(s).at[1, :3].set(u).at[2, :3].set(-f)
    t = m[:3, :3] @ (-eye)
    return m.at[:3, 3].set(t)


def cv_to_gl_view(cam_to_world):
    """Camera-to-world (OpenCV axes) -> OpenGL view matrix.

    V_gl = inv(A @ inv(c2w) @ A) with A = diag(1, -1, -1, 1)
    (reference depth_map_tools.py:62-75).
    """
    a = jnp.diag(jnp.array([1.0, -1.0, -1.0, 1.0], jnp.float32))
    w2c = jnp.linalg.inv(cam_to_world)
    return jnp.linalg.inv(a @ w2c @ a)


def apply_intrinsic_depth_scale(depth, scale):
    """Uniform depth scaling (master-FOV compensation); broadcast-safe."""
    return depth * jnp.asarray(scale, depth.dtype)


def deg2rad(d):
    return d * (math.pi / 180.0)
