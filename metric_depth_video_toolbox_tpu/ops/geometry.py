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


# ---------------------------------------------------------------------------
# Frustum math (reference depth_map_tools.py:82-193)
# ---------------------------------------------------------------------------

def frustum_planes(k, width, height, near, far, cam_to_world=None):
    """6 frustum planes as (6, 4) [nx, ny, nz, d] with inward normals
    (point p inside iff n.p + d >= 0 for all planes)."""
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    # corner ray directions at z=1
    x0 = (0.0 - cx) / fx
    x1 = (width - cx) / fx
    y0 = (0.0 - cy) / fy
    y1 = (height - cy) / fy

    def plane_through_origin(a, b):
        n = jnp.cross(a, b)
        n = n / (jnp.linalg.norm(n) + 1e-12)
        return jnp.concatenate([n, jnp.zeros(1)])

    tl = jnp.stack([x0, y0, jnp.ones_like(x0)])
    tr = jnp.stack([x1, y0, jnp.ones_like(x0)])
    bl = jnp.stack([x0, y1, jnp.ones_like(x0)])
    br = jnp.stack([x1, y1, jnp.ones_like(x0)])
    planes = jnp.stack([
        plane_through_origin(tl, bl),          # left
        plane_through_origin(br, tr),          # right
        plane_through_origin(tr, tl),          # top
        plane_through_origin(bl, br),          # bottom
        jnp.array([0.0, 0.0, 1.0, -near]),     # near: z >= near
        jnp.array([0.0, 0.0, -1.0, far]),      # far:  z <= far
    ])
    # canonicalize side-plane orientation: inward = positive at a point
    # on the central ray
    p_in = jnp.array([0.0, 0.0, (near + far) / 2.0])
    side = planes[:, :3] @ p_in + planes[:, 3]
    planes = planes * jnp.where(side < 0, -1.0, 1.0)[:, None]
    if cam_to_world is not None:
        # transform planes by (M^-1)^T
        m_inv_t = jnp.linalg.inv(cam_to_world).T
        planes = planes @ m_inv_t.T
        norm = jnp.linalg.norm(planes[:, :3], axis=-1, keepdims=True)
        planes = planes / jnp.maximum(norm, 1e-12)
    return planes


def frustum_corners(k, width, height, near, far, cam_to_world=None):
    """(8, 3) frustum corner points (near plane 4, far plane 4)."""
    fx, fy = k[..., 0, 0], k[..., 1, 1]
    cx, cy = k[..., 0, 2], k[..., 1, 2]
    xs = jnp.array([0.0, width, width, 0.0])
    ys = jnp.array([0.0, 0.0, height, height])
    dirs = jnp.stack([(xs - cx) / fx, (ys - cy) / fy,
                      jnp.ones(4)], axis=-1)
    corners = jnp.concatenate([dirs * near, dirs * far], axis=0)
    if cam_to_world is not None:
        corners = transform_points(corners[None], cam_to_world)[0]
    return corners


def points_in_frustum(points, planes):
    """(N,) bool — inside test against (6, 4) planes."""
    d = points @ planes[:, :3].T + planes[None, :, 3]
    return jnp.all(d >= 0.0, axis=-1)


def frustums_intersect(planes_a, corners_a, planes_b, corners_b):
    """Separating-axis test between two frusta using their face planes
    (the reference's frustum-frustum intersection,
    depth_map_tools.py:124-193): if all corners of one frustum lie outside
    a single plane of the other, they are disjoint."""
    def separated(planes, corners):
        d = corners @ planes[:, :3].T + planes[None, :, 3]
        return jnp.any(jnp.all(d < 0.0, axis=0))

    return ~(separated(planes_a, corners_b)
             | separated(planes_b, corners_a))


def disparity_steepness_mask(depth, k, baseline_m=0.063, threshold_px=1.5):
    """Per-pixel edge mask from the horizontal disparity gradient — the
    reference's alternative edge detector (depth_map_tools.py:541-609,
    superseded by the mesh-angle cull but kept for parity): pixels whose
    neighbor disparity jump exceeds the threshold are silhouette edges.
    """
    fx = k[..., 0, 0]
    disp = fx * baseline_m / jnp.maximum(depth, 1e-6)
    dx = jnp.abs(jnp.diff(disp, axis=-1, append=disp[..., -1:]))
    dy = jnp.abs(jnp.diff(disp, axis=-2, append=disp[..., -1:, :]))
    return (dx > threshold_px) | (dy > threshold_px)


def estimate_focal_from_points(points_cam, height, width, weights=None):
    """Recover effective (fx, fy) from a model's 3D point map — the
    reference's UniK3D focal re-estimation (unik3d_video.py:22-101):
    least-squares fit of u = fx * x/z + cx over all pixels."""
    h, w = height, width
    x = points_cam[..., 0]
    y = points_cam[..., 1]
    z = jnp.maximum(points_cam[..., 2], 1e-6)
    u = jnp.arange(w, dtype=jnp.float32)[None, :] - (w / 2.0)
    v = jnp.arange(h, dtype=jnp.float32)[:, None] - (h / 2.0)
    wts = jnp.ones_like(z) if weights is None else weights
    rx = x / z
    ry = y / z
    fx = jnp.sum(wts * rx * u) / jnp.maximum(
        jnp.sum(wts * rx * rx), 1e-9)
    fy = jnp.sum(wts * ry * v) / jnp.maximum(
        jnp.sum(wts * ry * ry), 1e-9)
    return fx, fy


def normalized_uv(height, width, dtype=jnp.float32):
    """Pixel-center image coordinates normalized by the half-HEIGHT:
    v spans [-1, 1] over rows, u spans [-asp, asp] (asp = W/H) over
    columns. The matching normalized focal f satisfies
    xfov = 2*atan(asp / f). Shape (H, W, 2)."""
    asp = width / height
    u = ((jnp.arange(width, dtype=dtype) + 0.5) / width * 2.0 - 1.0) * asp
    v = (jnp.arange(height, dtype=dtype) + 0.5) / height * 2.0 - 1.0
    uu, vv = jnp.meshgrid(u, v)
    return jnp.stack([uu, vv], axis=-1)


def recover_focal_shift(points, weights=None, focal=None,
                        rounds=3, k=33, eps=1e-6):
    """Recover (normalized focal, z-shift) from an affine-invariant
    point map — the MoGe mechanism behind reference moge_video.py's
    output['intrinsics'] and metric-up-to-scale output['depth']
    (the upstream model predicts points with the camera-space z known
    only up to a global shift; inference solves for the shift and,
    when fov_x is not given, the focal that best reprojects the points
    onto the pixel grid).

    points:  (H, W, 3) affine point map (x, y right/down, z signed).
    weights: (H, W) non-negative (e.g. mask probabilities); None = 1.
    focal:   fixed normalized focal (= asp / tan(xfov/2)) to solve
             shift-only (reference passes fov_x when --xfov given);
             None solves both.
    Returns (focal, shift, rms): scalars; depth = z + shift.

    TPU-native: a fixed-size log-spaced grid over the shift with
    ``rounds`` zoom-in refinements; per-candidate the optimal focal is
    closed-form, so the whole solve is a handful of (k, H, W)
    reductions — no data-dependent control flow, vmap over frames.
    """
    h, w = points.shape[:2]
    uv = normalized_uv(h, w, points.dtype)
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    wts = jnp.ones_like(z) if weights is None else weights
    wsum = jnp.maximum(jnp.sum(wts), eps)

    big = jnp.asarray(1e30, z.dtype)
    zmin = jnp.min(jnp.where(wts > 0, z, big))
    zmax = jnp.max(jnp.where(wts > 0, z, -big))
    span = jnp.maximum(zmax - zmin, eps)

    def cost_for(shift):
        # shift: (k,) -> per-candidate weighted reprojection cost
        zs = z[None] + shift[:, None, None]
        safe = (wts[None] > 0) & (zs > eps)
        denom = jnp.where(safe, zs, 1.0)
        a = jnp.where(safe, x[None] / denom, 0.0)
        b = jnp.where(safe, y[None] / denom, 0.0)
        wk = jnp.where(safe, wts[None], 0.0)
        num = jnp.sum(wk * (a * uv[..., 0] + b * uv[..., 1]), axis=(1, 2))
        den = jnp.sum(wk * (a * a + b * b), axis=(1, 2))
        f = (jnp.maximum(num, eps) / jnp.maximum(den, eps)
             if focal is None else jnp.full_like(num, focal))
        resid = (wk * ((f[:, None, None] * a - uv[..., 0]) ** 2
                       + (f[:, None, None] * b - uv[..., 1]) ** 2))
        # penalize candidates that push pixels behind the camera
        bad = jnp.sum(jnp.where((wts[None] > 0) & ~safe, wts[None], 0.0),
                      axis=(1, 2))
        return jnp.sum(resid, axis=(1, 2)) / wsum + bad / wsum * 1e3, f

    # round 0: log-spaced offsets above -zmin (guarantees z+t > 0)
    lo = jnp.log(span * 1e-3)
    hi = jnp.log(span * 10.0)
    best_t = -zmin + jnp.exp(0.5 * (lo + hi))
    best_f = jnp.asarray(1.0, z.dtype)
    best_c = big
    for _ in range(rounds):
        grid = jnp.exp(jnp.linspace(lo, hi, k))
        cand = -zmin + eps + grid
        c, f = cost_for(cand)
        i = jnp.argmin(c)
        best_t = jnp.where(c[i] < best_c, cand[i], best_t)
        best_f = jnp.where(c[i] < best_c, f[i], best_f)
        best_c = jnp.minimum(c[i], best_c)
        # zoom into the winning cell (one grid step either side)
        step = (hi - lo) / (k - 1)
        center = lo + step * i.astype(lo.dtype)
        lo, hi = center - step, center + step
    return best_f, best_t, jnp.sqrt(best_c)


def xfov_from_normalized_focal(focal, height, width):
    """Inverse of the `normalized_uv` focal convention (degrees)."""
    asp = width / height
    return jnp.degrees(2.0 * jnp.arctan2(asp, focal))


def normalized_focal_from_xfov(xfov_deg, height, width):
    asp = width / height
    return asp / jnp.tan(jnp.radians(xfov_deg) / 2.0)
