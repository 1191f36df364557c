"""Alignment / pose / triangulation solvers (jnp, batched, jit-safe).

Capability parity targets in the reference (file:line cited per function),
re-designed for TPU: every solver takes *weights* instead of boolean
indexing so shapes stay static under jit/vmap, and RANSAC is expressed as a
fixed-size vmap over candidate minimal sets rather than a data-dependent
loop (reference uses OpenCV's solvePnPRansac / madpose's C++ RANSAC).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Scale / shift alignment (metric anchoring of relative depth)
# ---------------------------------------------------------------------------

def scale_and_shift(prediction, target, weights=None):
    """Closed-form least-squares (scale, shift) with optional weights.

    Solves ``argmin_{s,t} sum w (s*prediction + t - target)^2`` via the 2x2
    normal equations (reference video_metric_convert.py:17-41, duplicated in
    depthcrafter_video.py:19-43 and geometrycrafter_video.py:244-268 — here
    it is the single shared implementation). Typically applied to *inverse*
    depths. Returns (1.0, 0.0) when the system is singular.
    """
    p = prediction.astype(jnp.float32)
    t = target.astype(jnp.float32)
    w = jnp.ones_like(t) if weights is None else weights.astype(jnp.float32)
    a00 = jnp.sum(w * p * p)
    a01 = jnp.sum(w * p)
    a11 = jnp.sum(w)
    b0 = jnp.sum(w * p * t)
    b1 = jnp.sum(w * t)
    det = a00 * a11 - a01 * a01
    safe = jnp.where(det == 0, 1.0, det)
    s = jnp.where(det == 0, 1.0, (a11 * b0 - a01 * b1) / safe)
    o = jnp.where(det == 0, 0.0, (-a01 * b0 + a00 * b1) / safe)
    return s, o


def rolling_scale_shift(disp_anchor, inv_anchor, anchor_idx, n_frames,
                        window=60):
    """Per-frame (scale, shift) trajectory from per-anchor closed-form
    fits — the reference's documented rolling-average affine->metric
    alignment (docs/USAGE.md `--no_rolling_average` describes the
    first-60-frames alternative; the rolling mode re-fits continuously
    so long moving-camera videos don't inherit frame-0's scale error).

    disp_anchor: (A, H, W) model inverse depth at the anchor frames;
    inv_anchor:  (A, H, W) metric inverse depth at those frames;
    anchor_idx:  (A,) frame indices (ascending);
    Returns float32 (s, t) arrays of shape (n_frames,): per-anchor fits,
    linearly interpolated to every frame, box-smoothed over `window`
    frames. Host-side numpy (a handful of scalars per anchor).
    """
    import numpy as np

    s_a, t_a = jax.vmap(scale_and_shift)(jnp.asarray(disp_anchor),
                                         jnp.asarray(inv_anchor))
    s_a = np.asarray(s_a, np.float64)
    t_a = np.asarray(t_a, np.float64)
    frames = np.arange(n_frames)
    s = np.interp(frames, np.asarray(anchor_idx), s_a)
    t = np.interp(frames, np.asarray(anchor_idx), t_a)
    k = max(1, int(window))
    if k > 1:
        kern = np.ones(k) / k
        pad = k // 2
        s = np.convolve(np.pad(s, pad, mode="edge"), kern, "same")[
            pad:pad + n_frames]
        t = np.convolve(np.pad(t, pad, mode="edge"), kern, "same")[
            pad:pad + n_frames]
    return s.astype(np.float32), t.astype(np.float32)


def least_squares_scale(reference, prediction, weights=None):
    """argmin_s sum w (s*prediction - reference)^2 = <w r p> / <w p p>.

    The inter-batch depth-scale stitcher for windowed video depth
    (reference video_da3.py:183-192 via DA3's least_squares_scale_scalar).
    """
    r = reference.astype(jnp.float32)
    p = prediction.astype(jnp.float32)
    w = jnp.ones_like(p) if weights is None else weights.astype(jnp.float32)
    denom = jnp.sum(w * p * p)
    return jnp.where(denom == 0, 1.0, jnp.sum(w * r * p) / jnp.where(denom == 0, 1.0, denom))


def median_ratio_scale(reference, prediction, weights=None, eps=1e-9):
    """Robust per-frame rescale ``median(ref/pred)`` (reference
    convert_metric_depth_video_to_other_format.py:884-891 uses the mean of
    ratios; video_mvsa.py:261-297 uses the median — both exposed here)."""
    ratio = reference / jnp.maximum(prediction, eps)
    if weights is None:
        return jnp.median(ratio)
    # weighted median via sorting
    order = jnp.argsort(ratio.reshape(-1))
    rs = ratio.reshape(-1)[order]
    ws = weights.reshape(-1)[order]
    cdf = jnp.cumsum(ws)
    idx = jnp.searchsorted(cdf, cdf[-1] / 2.0)
    return rs[jnp.clip(idx, 0, rs.size - 1)]


# ---------------------------------------------------------------------------
# Rigid / similarity alignment
# ---------------------------------------------------------------------------

def rigid_transform(source_points, target_points, weights=None,
                    zero_centroid=False):
    """Weighted Kabsch/Procrustes: the 4x4 rigid transform mapping source
    onto target in the least-squares sense.

    ``zero_centroid=True`` solves rotation-only about the origin (the
    reference's locked-camera mode, depth_map_tools.py:937-975). Reflection
    case handled by flipping the last singular vector.
    """
    s = source_points.astype(jnp.float32)
    t = target_points.astype(jnp.float32)
    n = s.shape[-2]
    w = (jnp.ones(s.shape[:-1], jnp.float32) if weights is None
         else weights.astype(jnp.float32))
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    if zero_centroid:
        cs = jnp.zeros(s.shape[:-2] + (3,), jnp.float32)
        ct = cs
    else:
        cs = jnp.sum(w[..., None] * s, axis=-2) / wsum
        ct = jnp.sum(w[..., None] * t, axis=-2) / wsum
    sc = s - cs[..., None, :]
    tc = t - ct[..., None, :]
    h = jnp.einsum("...ni,...nj->...ij", w[..., None] * sc, tc)
    u, _, vt = jnp.linalg.svd(h)
    det = jnp.linalg.det(jnp.einsum("...ji,...kj->...ik", vt, u))
    flip = jnp.concatenate(
        [jnp.ones(det.shape + (2,), jnp.float32), det[..., None]], axis=-1)
    rot = jnp.einsum("...ji,...j,...kj->...ik", vt, flip, u)
    trans = ct - jnp.einsum("...ij,...j->...i", rot, cs)
    m = jnp.zeros(s.shape[:-2] + (4, 4), jnp.float32)
    m = m.at[..., :3, :3].set(rot)
    m = m.at[..., :3, 3].set(trans)
    m = m.at[..., 3, 3].set(1.0)
    del n
    return m


def umeyama_sim3(source_points, target_points, weights=None):
    """Weighted Umeyama similarity (s, R, t) with target ~ s R source + t.

    Used to stitch camera trajectories across overlapping video-depth
    batches (reference video_da3.py:203-229 via DA3's align_poses_umeyama).
    Returns (scale, rot 3x3, trans 3).
    """
    s = source_points.astype(jnp.float32)
    t = target_points.astype(jnp.float32)
    w = (jnp.ones(s.shape[:-1], jnp.float32) if weights is None
         else weights.astype(jnp.float32))
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    cs = jnp.sum(w[..., None] * s, axis=-2) / wsum
    ct = jnp.sum(w[..., None] * t, axis=-2) / wsum
    sc = s - cs[..., None, :]
    tc = t - ct[..., None, :]
    var_s = jnp.sum(w[..., None] * sc * sc, axis=(-2, -1)) / wsum[..., 0]
    cov = jnp.einsum("...ni,...nj->...ij", w[..., None] * tc, sc) / wsum[..., None]
    u, d, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("...ij,...jk->...ik", u, vt))
    flip = jnp.concatenate(
        [jnp.ones(det.shape + (2,), jnp.float32), det[..., None]], axis=-1)
    rot = jnp.einsum("...ij,...j,...jk->...ik", u, flip, vt)
    scale = jnp.sum(d * flip, axis=-1) / jnp.maximum(var_s, 1e-12)
    trans = ct - scale[..., None] * jnp.einsum("...ij,...j->...i", rot, cs)
    return scale, rot, trans


def apply_sim3_to_poses(c2w, scale, rot, trans):
    """Apply a sim3 to camera-to-world poses: R' = R_s @ R, t' = s R_s t + t_s."""
    r = jnp.einsum("...ij,...njk->...nik", rot, c2w[..., :3, :3])
    t = (scale[..., None, None]
         * jnp.einsum("...ij,...nj->...ni", rot, c2w[..., :3, 3])
         + trans[..., None, :])
    out = c2w.at[..., :3, :3].set(r)
    return out.at[..., :3, 3].set(t)


# ---------------------------------------------------------------------------
# Multi-ray triangulation
# ---------------------------------------------------------------------------

def ray_diversity_weights(directions, valid=None):
    """Angle-diversity weights: w_i = mean_j (1 - |d_i . d_j|), excluding
    self — rays pointing in unusual directions count more (reference
    convert_metric_depth_video_to_other_format.py:32-60). O(N^2) as one
    matmul on the MXU instead of the reference's chunked host loop.
    """
    d = directions / (jnp.linalg.norm(directions, axis=-1, keepdims=True) + 1e-12)
    v = (jnp.ones(d.shape[:-1], jnp.float32) if valid is None
         else valid.astype(jnp.float32))
    dots = jnp.abs(jnp.einsum("...ni,...mi->...nm", d, d))
    # Each valid j contributes (1 - |d_i.d_j|); the self term is exactly 0
    # because |d_i.d_i| = 1, so no explicit self-exclusion is needed.
    contrib = jnp.einsum("...nm,...m->...n", 1.0 - dots, v)
    n_eff = jnp.maximum(jnp.sum(v, axis=-1, keepdims=True) - 1.0, 1.0)
    return contrib * v / n_eff


def intersect_rays(points, directions, weights=None, valid=None):
    """Weighted least-squares intersection of N rays (origins + directions).

    Minimizes sum_i w_i ||(I - d d^T)(x - p)||^2 in closed form
    (reference convert_metric_depth_video_to_other_format.py:62-119).
    Batched over leading axes; ``valid`` masks padded rays.
    """
    d = directions / (jnp.linalg.norm(directions, axis=-1, keepdims=True) + 1e-12)
    p = points.astype(jnp.float32)
    if weights is None:
        weights = ray_diversity_weights(d, valid=valid)
    w = weights.astype(jnp.float32)
    if valid is not None:
        w = w * valid.astype(jnp.float32)
    outer = jnp.einsum("...n,...ni,...nj->...ij", w, d, d)
    a = jnp.sum(w, axis=-1)[..., None, None] * jnp.eye(3, dtype=jnp.float32) - outer
    dp = jnp.sum(d * p, axis=-1, keepdims=True)
    b = jnp.sum(w[..., None] * (p - d * dp), axis=-2)
    # Regularized solve for robustness to near-parallel bundles.
    a = a + 1e-9 * jnp.eye(3, dtype=jnp.float32)
    return jnp.linalg.solve(a, b[..., None])[..., 0]


# ---------------------------------------------------------------------------
# PnP (pose from 3D<->2D) — fixed-iteration Gauss-Newton + vmapped RANSAC
# ---------------------------------------------------------------------------

def _so3_exp(w):
    """Rodrigues: axis-angle (3,) -> rotation matrix (3, 3).

    Taylor-safe at theta -> 0 so jacfwd through it (Gauss-Newton) never
    sees the NaN gradient of ||w|| at the origin.
    """
    theta2 = jnp.sum(w * w)
    theta = jnp.sqrt(theta2 + 1e-16)
    small = theta < 1e-4
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, 1e-16))
    wx = jnp.array([
        [0.0, -w[2], w[1]],
        [w[2], 0.0, -w[0]],
        [-w[1], w[0], 0.0],
    ])
    eye = jnp.eye(3, dtype=w.dtype)
    return eye + a * wx + b * (wx @ wx)


def _pnp_residuals(rvec, tvec, pts3d, pts2d, K):
    r = _so3_exp(rvec)
    pc = pts3d @ r.T + tvec
    z = jnp.maximum(pc[:, 2], 1e-6)
    u = pc[:, 0] / z * K[0, 0] + K[0, 2]
    v = pc[:, 1] / z * K[1, 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1) - pts2d


def pnp_gauss_newton(pts3d, pts2d, K, weights=None, iters=10,
                     rvec0=None, tvec0=None):
    """Weighted Gauss-Newton PnP refinement (fixed iterations, jit-safe).

    Fills the role of cv2's solvePnP/VVS refine (reference
    depth_map_tools.py:1006-1035). Returns (rvec, tvec, mean_sq_residual).
    """
    n = pts3d.shape[0]
    w = jnp.ones((n,), jnp.float32) if weights is None else weights
    rvec = jnp.zeros(3, jnp.float32) if rvec0 is None else rvec0
    tvec = (jnp.array([0.0, 0.0, 1.0], jnp.float32) if tvec0 is None else tvec0)

    def body(_, carry):
        rv, tv = carry
        def flat_res(x):
            return (_pnp_residuals(x[:3], x[3:], pts3d, pts2d, K)
                    * jnp.sqrt(w)[:, None]).reshape(-1)
        x = jnp.concatenate([rv, tv])
        j = jax.jacfwd(flat_res)(x)
        r = flat_res(x)
        jtj = j.T @ j + 1e-6 * jnp.eye(6, dtype=jnp.float32)
        dx = jnp.linalg.solve(jtj, -(j.T @ r))
        x = x + dx
        return x[:3], x[3:]

    rvec, tvec = jax.lax.fori_loop(0, iters, body, (rvec, tvec))
    res = _pnp_residuals(rvec, tvec, pts3d, pts2d, K)
    msr = jnp.sum(w * jnp.sum(res**2, -1)) / jnp.maximum(jnp.sum(w), 1e-12)
    return rvec, tvec, msr


@partial(jax.jit, static_argnames=("num_hypotheses", "sample_size", "iters"))
def ransac_pnp(key, pts3d, pts2d, K, weights=None, num_hypotheses=256,
               sample_size=6, reproj_threshold=6.0, iters=8):
    """RANSAC PnP as a fixed fan-out: sample ``num_hypotheses`` minimal sets,
    refine each with Gauss-Newton under vmap, score inliers, refine the
    winner on its inliers. TPU-shaped replacement for cv2.solvePnPRansac
    (reference uses reproj err 6 px, depth_map_tools.py:1006-1035).

    Returns (rvec, tvec, inlier_mask).
    """
    n = pts3d.shape[0]
    w_all = jnp.ones((n,), jnp.float32) if weights is None else weights
    keys = jax.random.split(key, num_hypotheses)

    def one(k):
        idx = jax.random.choice(k, n, shape=(sample_size,), replace=False,
                                p=w_all / jnp.sum(w_all))
        rv, tv, _ = pnp_gauss_newton(pts3d[idx], pts2d[idx], K, iters=iters)
        res = _pnp_residuals(rv, tv, pts3d, pts2d, K)
        err = jnp.linalg.norm(res, axis=-1)
        inl = (err < reproj_threshold) & (w_all > 0)
        return rv, tv, jnp.sum(inl)

    rvs, tvs, scores = jax.vmap(one)(keys)
    best = jnp.argmax(scores)
    rv, tv = rvs[best], tvs[best]
    res = _pnp_residuals(rv, tv, pts3d, pts2d, K)
    inliers = (jnp.linalg.norm(res, axis=-1) < reproj_threshold) & (w_all > 0)
    rv, tv, _ = pnp_gauss_newton(pts3d, pts2d, K,
                                 weights=inliers.astype(jnp.float32),
                                 iters=iters, rvec0=rv, tvec0=tv)
    return rv, tv, inliers


def pose_matrix_from_rvec_tvec(rvec, tvec):
    """(rvec, tvec) world->camera -> 4x4 matrix."""
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[:3, :3].set(_so3_exp(rvec))
    return m.at[:3, 3].set(tvec)
