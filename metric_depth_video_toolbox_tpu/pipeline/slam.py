"""Dense SLAM-class camera tracking with global bundle adjustment.

Fills the role of the reference's ``sam_track_video.py`` (Mega-SAM /
DROID-SLAM: CUDA correlation volumes + dense BA,
reference sam_track_video.py:169-206, SURVEY.md §2.4 item 5). TPU-native
re-design instead of a CUDA port:

  - feature tracks come from the jitted pyramidal-LK scan
    (models.tracker) seeded on corner responses — the role of DROID's
    correlation volume lookups;
  - per-pair initial poses from the depth-based solvers (pipeline.align);
  - **global bundle adjustment**: fixed-iteration Gauss-Newton over all
    camera poses jointly, minimizing reprojection error of
    depth-anchored world points, expressed as one jitted program
    (jacfwd over se3 increments, vmapped residuals) — the role of
    DROID's dense BA CUDA kernel. Motion masking weights residuals by a
    per-track movement score (the reference feeds motion-probability
    masks, :233-241). Optional focal refinement mirrors
    ``--optimize_intrinsic`` (:200-206).

Outputs the same artifacts: ``*_transformations.json`` plus an optional
motion-probability video.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.flatten_util
import jax.numpy as jnp

from metric_depth_video_toolbox_tpu.io import sidecar
from metric_depth_video_toolbox_tpu.io import video as vio
from metric_depth_video_toolbox_tpu.ops import codec
from metric_depth_video_toolbox_tpu.ops import geometry as geo
from metric_depth_video_toolbox_tpu.ops import solvers
from metric_depth_video_toolbox_tpu.utils.host import robust_call, to_host


def _se3_apply(rvec, tvec, pts):
    r = solvers._so3_exp(rvec)
    return pts @ r.T + tvec


@partial(jax.jit, static_argnames=("iters", "optimize_focal"))
def bundle_adjust(track_uv, track_valid, anchor_depth, k, rvecs0, tvecs0,
                  iters=10, optimize_focal=False, damping=1e-3):
    """Global Gauss-Newton bundle adjustment.

    track_uv:     (T, N, 2) observed pixel positions per frame.
    track_valid:  (T, N) observation weights (0 = missing; motion-masked
                  tracks get low weight).
    anchor_depth: (N,) depth of each track in its anchor (first) frame —
                  world points are parameterized as anchor-frame
                  unprojections scaled by a per-track inverse-depth
                  correction (DROID's structure parameterization).
    k:            (3, 3) intrinsics.
    rvecs0/tvecs0: (T, 3) initial world->camera poses (frame 0 fixed).

    Returns (rvecs, tvecs, focal_scale, point_logz, mean_residual).
    """
    t_frames, n_tracks = track_valid.shape
    fx, fy = k[0, 0], k[1, 1]
    cx, cy = k[0, 2], k[1, 2]

    # anchor = first valid observation (computed once, static shapes)
    first_idx = jnp.argmax(track_valid > 0, axis=0)  # (N,)
    anchor_uv = jnp.take_along_axis(
        track_uv, first_idx[None, :, None], axis=0)[0]  # (N, 2)

    def world_points(params):
        logz = params["logz"]
        z = anchor_depth * jnp.exp(logz)
        fscale = jnp.exp(params["log_f"]) if optimize_focal else 1.0
        rays = jnp.stack([(anchor_uv[:, 0] - cx) / (fx * fscale),
                          (anchor_uv[:, 1] - cy) / (fy * fscale),
                          jnp.ones_like(z)], axis=-1)
        p_anchor_cam = rays * z[:, None]
        # anchor camera -> world: inverse of that frame's w2c
        rv = params["rvecs"][first_idx]
        tv = params["tvecs"][first_idx]
        r = jax.vmap(solvers._so3_exp)(rv)
        # p_cam = R p_w + t  =>  p_w = R^T (p_cam - t)
        return jnp.einsum("nij,nj->ni", r.transpose(0, 2, 1),
                          p_anchor_cam - tv)

    def residuals(params):
        pw = world_points(params)  # (N, 3)
        rv = params["rvecs"]
        tv = params["tvecs"]
        fscale = jnp.exp(params["log_f"]) if optimize_focal else 1.0
        r = jax.vmap(solvers._so3_exp)(rv)  # (T, 3, 3)
        pc = jnp.einsum("tij,nj->tni", r, pw) + tv[:, None, :]
        z = jnp.maximum(pc[..., 2], 1e-3)
        u = pc[..., 0] / z * fx * fscale + cx
        v = pc[..., 1] / z * fy * fscale + cy
        res = jnp.stack([u, v], axis=-1) - track_uv
        w = track_valid
        # fix frame 0's pose by down-weighting nothing; gauge freedom is
        # removed by zeroing frame-0 updates below
        return res * w[..., None]

    params = {"rvecs": rvecs0, "tvecs": tvecs0,
              "logz": jnp.zeros(n_tracks, jnp.float32)}
    if optimize_focal:
        params["log_f"] = jnp.zeros((), jnp.float32)

    flat, unravel = jax.flatten_util.ravel_pytree(params)

    def loss_vec(x):
        return residuals(unravel(x)).reshape(-1)

    def gn_step(_, x):
        jt = jax.jacfwd(loss_vec)(x)
        r = loss_vec(x)
        jtj = jt.T @ jt
        # Levenberg damping with an absolute floor: parameters with no
        # observations (dead tracks) otherwise make the system singular
        floor = 1e-5 * (1.0 + jnp.max(jnp.diag(jtj)))
        jtj = jtj + damping * jnp.diag(jnp.diag(jtj)) \
            + floor * jnp.eye(jtj.shape[0])
        dx = jnp.linalg.solve(jtj, -(jt.T @ r))
        dx = jnp.nan_to_num(dx)
        x2 = x + dx
        # gauge fix: frame 0 stays at its initial pose
        p2 = unravel(x2)
        p2["rvecs"] = p2["rvecs"].at[0].set(rvecs0[0])
        p2["tvecs"] = p2["tvecs"].at[0].set(tvecs0[0])
        return jax.flatten_util.ravel_pytree(p2)[0]

    x = jax.lax.fori_loop(0, iters, gn_step, flat)
    out = unravel(x)
    res = residuals(out)
    denom = jnp.maximum(track_valid.sum(), 1.0)
    mean_res = jnp.sum(jnp.linalg.norm(res, axis=-1)) / denom
    fscale = jnp.exp(out.get("log_f", jnp.zeros(()))) \
        if optimize_focal else jnp.ones(())
    return out["rvecs"], out["tvecs"], fscale, out["logz"], mean_res


def motion_weights(dense_tracks, transforms, depths_at_tracks, k,
                   z_thresh=2.0):
    """Per-track static-scene weights: tracks whose reprojection moves
    inconsistently with the rigid camera model get down-weighted (the
    motion-probability input of the reference, sam_track_video.py:190)."""
    t, n = dense_tracks.shape[:2]
    errs = np.zeros(n)
    counts = np.zeros(n) + 1e-9
    for fi in range(1, t):
        v = (dense_tracks[fi, :, 2] > 0) & (dense_tracks[0, :, 2] > 0)
        if v.sum() < 8:
            continue
        # predict frame-fi position from frame-0 unprojection
        z0 = depths_at_tracks[0]
        p0 = np.stack([(dense_tracks[0, :, 0] - k[0, 2]) / k[0, 0] * z0,
                       (dense_tracks[0, :, 1] - k[1, 2]) / k[1, 1] * z0,
                       z0], axis=-1)
        m = np.linalg.inv(transforms[fi]) @ transforms[0]
        pc = p0 @ m[:3, :3].T + m[:3, 3]
        zc = np.maximum(pc[:, 2], 1e-3)
        u = pc[:, 0] / zc * k[0, 0] + k[0, 2]
        vv = pc[:, 1] / zc * k[1, 1] + k[1, 2]
        e = np.hypot(u - dense_tracks[fi, :, 0],
                     vv - dense_tracks[fi, :, 1])
        errs[v] += e[v]
        counts[v] += 1
    mean_e = errs / counts
    mu, sd = mean_e.mean(), mean_e.std() + 1e-9
    zscores = (mean_e - mu) / sd
    return np.where(zscores > z_thresh, 0.1, 1.0).astype(np.float32)


def slam_track_video(color_video, depth_video, xfov=None, yfov=None,
                     max_depth=100.0, max_frames=-1, output=None,
                     optimize_intrinsic=False, ba_iters=10,
                     max_tracks=512, grid=24, save_motion_video=False,
                     mask_video=None):
    """Full tracking pipeline: LK tracks -> pairwise init -> global BA.

    Returns (transformations_path, mean_reprojection_error_px).
    """
    from metric_depth_video_toolbox_tpu.pipeline import align as align_mod
    from metric_depth_video_toolbox_tpu.pipeline import tracking as track_mod

    track_path = track_mod.track_video(color_video, grid=grid,
                                       max_frames=max_frames)
    # pairwise initial poses (two-group solver)
    init_path = align_mod.align_video(
        depth_video, track_path, xfov=xfov, yfov=yfov, max_depth=max_depth,
        max_frames=max_frames, max_tracks=max_tracks,
        output=depth_video + "_init_transformations.json")
    transforms = sidecar.load_transformations(init_path)  # c2w

    frames_tr = sidecar.load_tracking(track_path)
    dense, _ = sidecar.tracking_to_dense(frames_tr, max_tracks=max_tracks)
    t_total = min(len(transforms), dense.shape[0])
    dense = dense[:t_total]
    transforms = transforms[:t_total]

    dv = vio.DepthVideoReader(depth_video, max_depth)
    h, w = dv.height, dv.width
    k = np.asarray(geo.camera_matrix_from_fov(
        w, h, xfov_deg=xfov, yfov_deg=yfov), np.float32)

    # per-frame track depths (for anchors + motion weights)
    depths_at = np.zeros((t_total, dense.shape[1]), np.float32)
    fi = 0
    while fi < t_total:
        d = dv.read_depth_batch(1)
        if d is None:
            break
        xi = np.clip(np.round(dense[fi, :, 0]).astype(int), 0, w - 1)
        yi = np.clip(np.round(dense[fi, :, 1]).astype(int), 0, h - 1)
        depths_at[fi] = d[0][yi, xi]
        fi += 1
    dv.close()

    weights = motion_weights(dense, transforms, depths_at, k)
    if mask_video:
        # external motion mask (the reference feeds motion-probability
        # masks into DROID, sam_track_video.py:190): tracks that ever
        # land on a masked pixel are down-weighted to zero
        mv = vio.VideoReader(mask_video, max_frames=max_frames)
        masked_ever = np.zeros(dense.shape[1], bool)
        for fi in range(t_total):
            m = mv.read_batch(1)
            if m is None:
                break
            gray = m[0][..., 0]
            xi = np.clip(np.round(dense[fi, :, 0]).astype(int), 0, w - 1)
            yi = np.clip(np.round(dense[fi, :, 1]).astype(int), 0, h - 1)
            masked_ever |= (dense[fi, :, 2] > 0) & (gray[yi, xi] > 127)
        mv.close()
        weights = np.where(masked_ever, 0.0, weights)
    valid = dense[..., 2] * weights[None, :]

    first_idx = np.argmax(dense[..., 2] > 0, axis=0)
    anchor_depth = depths_at[first_idx, np.arange(dense.shape[1])]
    anchor_depth = np.maximum(anchor_depth, 1e-2)

    # w2c initials from c2w
    w2c = np.linalg.inv(transforms)
    rvecs0 = np.zeros((t_total, 3), np.float32)
    for i in range(t_total):
        rvecs0[i] = _log_so3(w2c[i, :3, :3])
    tvecs0 = w2c[:, :3, 3].astype(np.float32)

    rv, tv, fscale, logz, mean_res = [to_host(x) for x in bundle_adjust(
        jnp.asarray(dense[..., :2]), jnp.asarray(valid),
        jnp.asarray(anchor_depth), jnp.asarray(k),
        jnp.asarray(rvecs0), jnp.asarray(tvecs0), iters=ba_iters,
        optimize_focal=optimize_intrinsic)]

    out_transforms = np.zeros((t_total, 4, 4), np.float32)
    for i in range(t_total):
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = np.asarray(solvers._so3_exp(jnp.asarray(rv[i])))
        m[:3, 3] = tv[i]
        out_transforms[i] = np.linalg.inv(m)  # back to cam-to-world

    output = output or (depth_video + "_transformations.json")
    sidecar.save_transformations(output, out_transforms)

    if save_motion_video:
        _write_motion_video(color_video, dense, weights, output)
    return output, float(mean_res)


def _log_so3(r):
    """Rotation matrix -> axis-angle (host, numpy)."""
    cos = np.clip((np.trace(r) - 1) / 2, -1, 1)
    theta = np.arccos(cos)
    if theta < 1e-8:
        return np.zeros(3, np.float32)
    w = np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
    return (w * theta / (2 * np.sin(theta))).astype(np.float32)


def _write_motion_video(color_video, dense, weights, output_base):
    """Debug motion-probability video (red = moving tracks),
    reference sam_track_video.py:233-241."""
    frames, fps = vio.read_video_frames(color_video)
    t = min(frames.shape[0], dense.shape[0])
    for fi in range(t):
        for ti in range(dense.shape[1]):
            if dense[fi, ti, 2] > 0:
                x, y = int(dense[fi, ti, 0]), int(dense[fi, ti, 1])
                if 0 <= x < frames.shape[2] and 0 <= y < frames.shape[1]:
                    col = [255, 40, 40] if weights[ti] < 0.5 else \
                        [40, 255, 40]
                    frames[fi, max(0, y - 1):y + 2,
                           max(0, x - 1):x + 2] = col
    vio.save_rgb_video(frames[:t], output_base + "_motion.mkv", fps)
